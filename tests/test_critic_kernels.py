"""Fused Pallas critic-cell kernels (interpret mode on CPU) must match the
XLA cell math exactly (f32): the decode path swaps them in at production
width (ops/critic_kernels.cells_qualify)."""
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.models.critic import SegmentCritic
from bmhrl_tpu.ops import critic_kernels as ck


def test_fused_cells_match_xla_step():
    rng = np.random.RandomState(0)
    B, D = 5, 128  # H = 256: qualifies; unaligned B exercises padding
    crit = SegmentCritic(D)
    emb = jnp.asarray(rng.randn(B, 7, D), jnp.float32)
    params = crit.init(jax.random.PRNGKey(0), emb)

    full = np.asarray(crit.apply(params, emb))  # scan path (XLA)

    state = crit.apply(params, B, method="init_state")
    ck.force_interpret(True)
    try:
        steps = []
        for t in range(7):
            s, state = crit.apply(params, emb[:, t], state, method="step")
            steps.append(np.asarray(s))
    finally:
        ck.force_interpret(False)
    inc = np.stack(steps, axis=1)
    np.testing.assert_allclose(inc, full, rtol=1e-5, atol=1e-5)
