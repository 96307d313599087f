"""Quick probe: decode clips/s at B=1024 vs B=2048 (and HBM feasibility).

Measured (v5e via axon tunnel, 2026-08-18, production config flash ON):
  B=1024: 214.3 ms/batch -> 4779 clips/s
  B=2048: 442.3 ms/batch -> 4631 clips/s
Throughput saturates at B=1024 — doubling the batch doubles the encoder
and token-loop HBM traffic without amortizing any further fixed cost, and
the folded-attention memory blocks stop fitting larger batch tiles. The
bench headline therefore stays best-of {32, 256, 1024}.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from bmhrl_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import BMHrlAgent
from bmhrl_tpu.ops.attention import enable_flash
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train.decode import decode

_cfg0 = Config(B=16, to_log=False)
enable_flash(_cfg0.use_pallas_attention)

VOC, Sv, Sa = 10172, 128, 256
model = BMHrlAgent(voc_size=VOC)
rng = np.random.RandomState(0)

def feats_for(B):
    return {
        "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "audio": jnp.asarray(rng.rand(B, Sa, 128), jnp.float32),
    }

def masks_for(feats, trg):
    return make_masks(feats, trg, "audio_video", 1)

feats0 = feats_for(16)
trg0 = jnp.full((16, 8), 1, jnp.int32).at[:, 0].set(2)
m0 = masks_for(feats0, trg0)
k = jax.random.PRNGKey(0)
params = jax.jit(model.init)({"params": k, "dropout": k, "noise": k},
                             (feats0["rgb"] + feats0["flow"], feats0["audio"]),
                             trg0, m0)
print("params ready")

for B in (1024, 2048):
    feats = feats_for(B)
    masks_src = masks_for(feats, None)

    def run():
        toks, _ = decode(model, params, feats, masks_src, 30, 2, -1, 1,
                         greedy=True, use_fast=True)
        return np.asarray(toks)

    t0 = time.time(); run(); print(f"B={B} compile+1st {time.time()-t0:.1f}s")
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    print(f"B={B}: {dt*1e3:.1f} ms/batch -> {B/dt:.0f} clips/s")
