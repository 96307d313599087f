"""GatedAdam: torch-semantics Adam with per-leaf step counts and an
activity mask applied at update time.

The reference gates training phases (warmstart / teach_worker / teach_manager)
by flipping ``requires_grad`` on module groups under ONE torch.optim.Adam
(ref: model/bm_hrl_agent.py:555-589, scripts/train_rl_captioning_module.py:80-83):
inactive params receive no grads, so their Adam moments AND per-param step
counts freeze, and resume exactly when re-enabled. Reproducing that faithfully
needs per-leaf counts (optax's global count would skew bias correction after
phase switches), hence this small custom transform.

update(grads, state, params, active, lr) -> (new_params, new_state); inactive
leaves keep params, moments and counts unchanged. ``lr`` is a call argument so
the warmstart->RL learning-rate switch (ref loop :244-246) needs no state
surgery. torch weight_decay semantics (L2 added to the grad) when wd > 0.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: Any  # pytree of int32 per leaf
    mu: Any
    nu: Any


class GatedAdam:
    def __init__(self, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-4,
                 weight_decay: float = 0.0):
        self.b1, self.b2, self.eps, self.wd = b1, b2, eps, weight_decay

    def init(self, params) -> AdamState:
        z = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        c = jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
        return AdamState(count=c, mu=z, nu=jax.tree.map(jnp.copy, z))

    def update(self, grads, state: AdamState, params, active, lr):
        """active: pytree of bool (per leaf) or scalar True."""
        b1, b2, eps, wd = self.b1, self.b2, self.eps, self.wd
        if active is True:
            active = jax.tree.map(lambda _: True, params)

        def leaf(g, p, m, v, c, a):
            g = g.astype(jnp.float32)
            if wd:
                g = g + wd * p.astype(jnp.float32)
            c1 = c + 1
            m1 = b1 * m + (1 - b1) * g
            v1 = b2 * v + (1 - b2) * g * g
            mhat = m1 / (1 - b1 ** c1.astype(jnp.float32))
            vhat = v1 / (1 - b2 ** c1.astype(jnp.float32))
            step = lr * mhat / (jnp.sqrt(vhat) + eps)
            p1 = (p.astype(jnp.float32) - step).astype(p.dtype)
            if a:
                return p1, m1, v1, c1
            return p, m, v, c

        out = jax.tree.map(
            leaf, grads, params, state.mu, state.nu, state.count, active)
        # out is a pytree of 4-tuples at the leaves; transpose it
        new_params = jax.tree.map(lambda t: t[0], out,
                                  is_leaf=lambda t: isinstance(t, tuple))
        new_mu = jax.tree.map(lambda t: t[1], out,
                              is_leaf=lambda t: isinstance(t, tuple))
        new_nu = jax.tree.map(lambda t: t[2], out,
                              is_leaf=lambda t: isinstance(t, tuple))
        new_c = jax.tree.map(lambda t: t[3], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        return new_params, AdamState(count=new_c, mu=new_mu, nu=new_nu)


def clip_by_global_norm(grads, max_norm: float):
    """torch clip_grad_norm_ semantics, plus a non-finite guard: a batch
    whose gradient norm is inf/nan contributes ZERO gradient instead of
    poisoning the parameters. (torch zeroes the grads for inf — scale =
    max/inf — but propagates nan into every parameter; a degenerate batch,
    e.g. one full of zero-filled missing-feature clips, should lose its
    step, not kill the run.)"""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    ok = jnp.isfinite(norm)

    def clip(g):
        # nan * 0 is still nan: replace, don't scale, when the norm is bad
        return jnp.where(ok, (g * scale).astype(g.dtype),
                         jnp.zeros_like(g))

    return jax.tree.map(clip, grads)
