"""Probe: beam-search serving cost vs greedy on the real chip.

Measured (v5e via axon tunnel, 2026-08-18, flash ON, Sv=128/Sa=256,
30-token decode):
  B=256 greedy              :  80-90 ms/batch -> 2840-3220 clips/s
  B=256 beam W=4 fast       :    253 ms/batch ->  1012 clips/s
    (295 ms before beam-share: the beam axis now folds into the folded
     kernel's query groups, so each clip's raw memory streams from HBM
     once per step for all W beams instead of W times)
  B=256 beam W=4 full-buffer:   1001 ms/batch ->   256 clips/s
The incremental beam costs ~3.2x greedy (sub-linear in W=4: encoder once,
memory reads shared across beams) and is ~4x faster than the full-buffer
beam — per-step cache-reindex gathers are far cheaper than re-running
the fusion stacks over the whole buffer every token.
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
from bmhrl_tpu.train.decode import beam_decode, decode

_cfg0 = Config(B=16, to_log=False)
enable_flash(_cfg0.use_pallas_attention)

VOC, Sv, Sa, B = 10172, 128, 256, int(os.environ.get("BEAM_PROBE_B", "256"))
W = int(os.environ.get("BEAM_PROBE_W", "4"))
model = BMHrlAgent(voc_size=VOC)
rng = np.random.RandomState(0)
feats = {
    "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
    "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
    "audio": jnp.asarray(rng.rand(B, Sa, 128), jnp.float32),
}
trg0 = jnp.full((B, 8), 1, jnp.int32).at[:, 0].set(2)
m0 = make_masks(feats, trg0, "audio_video", 1)
k = jax.random.PRNGKey(0)
params = jax.jit(model.init)({"params": k, "dropout": k, "noise": k},
                             (feats["rgb"] + feats["flow"], feats["audio"]),
                             trg0, m0)
masks_src = make_masks(feats, None, "audio_video", 1)
print("params ready")


def bench(name, fn, iters=5):
    t0 = time.time(); np.asarray(fn()); print(f"{name} compile+1st {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        np.asarray(fn())
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms/batch -> {B/dt:.0f} clips/s")


bench("greedy", lambda: decode(model, params, feats, masks_src, 30, 2, 3, 1,
                               greedy=True)[0])
bench(f"beam W={W} fast", lambda: beam_decode(
    model, params, feats, masks_src, 30, 2, 3, 1, beam_width=W,
    length_penalty=1.0)[0])
bench(f"beam W={W} full", lambda: beam_decode(
    model, params, feats, masks_src, 30, 2, 3, 1, beam_width=W,
    length_penalty=1.0, use_fast=False)[0], iters=2)
