"""Probe: is the Pallas flash kernel actually in the compiled encoder, and
what does it measure in isolation vs the XLA attention chain?"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bmhrl_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np
from bmhrl_tpu.models.bmhrl import BMHrlAgent
from bmhrl_tpu.ops import attention as fused
from bmhrl_tpu.ops.masking import make_masks

B, Sv, Sa = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
model = BMHrlAgent(voc_size=10172)
rng = np.random.RandomState(0)
feats = {
    "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
    "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
    "audio": jnp.asarray(rng.rand(B, Sa, 128), jnp.float32),
}
masks = make_masks(feats, None, "audio_video", 1)
k = jax.random.PRNGKey(0)
trg0 = jnp.full((B, 8), 1, jnp.int32).at[:, 0].set(2)
m0 = make_masks(feats, trg0, "audio_video", 1)
params = jax.jit(model.init)(
    {"params": k, "dropout": k, "noise": k},
    (feats["rgb"] + feats["flow"], feats["audio"]), trg0, m0)
V = feats["rgb"] + feats["flow"]
A = feats["audio"]

def enc(params, V, A, masks):
    out = model.apply(params, V, A, masks, method="encode")
    return jnp.sum(out[0][:, 0, 0]) + jnp.sum(out[1][:, 0, 0])

for name, on in (("xla", False), ("flash", True)):
    fused.enable_flash(on)
    lowered = jax.jit(enc).lower(params, V, A, masks)
    txt = lowered.compile().as_text()
    n_cc = txt.count("tpu_custom_call")
    print(f"{name}: tpu_custom_call count in compiled encoder = {n_cc}", flush=True)
