"""Warmstart-step device-time decomposition (VERDICT r2 item 4): where do
the milliseconds go at the training operating points?

Components timed separately (each jitted, synced by scalar fetch — the
axon tunnel ignores block_until_ready):
  encoder fwd   — bimodal encoder over (Sv, Sa) sources
  caption fwd   — worker+manager fusion stacks + heads (teacher forcing)
  full fwd      — loss forward (encoder + caption + masked NLL)
  fwd+bwd       — value_and_grad of the loss
  full step     — fwd+bwd + gated-Adam update (the bench number)
The deltas attribute time to backward and optimizer. Run on the real
chip: python tools/train_trace.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bmhrl_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.config import Config
from bmhrl_tpu.models.bmhrl import (BMHrlAgent, BMManagerValueFunction,
                                    BMWorkerValueFunction)
from bmhrl_tpu.ops import attention as fused
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train.steps import StepFactory

fused.enable_flash(Config(B=16, to_log=False).use_pallas_attention)

VOC, Sv, Sa, Lc = 10172, 128, 256, 31
model = BMHrlAgent(voc_size=VOC)
BATCHES = [int(b) for b in sys.argv[1:]] or [16, 32, 64]


def timeit(fn, *args, iters=8):
    float(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.time() - t0) / iters * 1e3


for B in BATCHES:
    rng = np.random.RandomState(0)
    cap = np.full((B, Lc + 1), 1, np.int32)
    cap[:, 0] = 2
    cap[:, 1:20] = rng.randint(4, VOC, (B, 19))
    cap[:, 20] = 3
    batch = {
        "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "audio": jnp.asarray(rng.rand(B, Sa, 128), jnp.float32),
        "caption_idx": jnp.asarray(cap),
    }
    cfg = Config(B=B, mesh_shape=(1, 1), to_log=False)
    sf = StepFactory(cfg, model, BMWorkerValueFunction(),
                     BMManagerValueFunction(), emb_trainable=True)
    state = sf.init_state(jax.random.PRNGKey(0), batch)
    k = jax.random.PRNGKey(1)
    params = state.cap_params

    feats = {kk: batch[kk] for kk in ("rgb", "flow", "audio")}
    trg = batch["caption_idx"][:, :-1]
    masks = make_masks(feats, trg, "audio_video", 1)
    V = batch["rgb"] + batch["flow"]
    A = batch["audio"]

    @jax.jit
    def enc(params, V, A, masks):
        out = model.apply(params, V, A, masks, method="encode")
        return jnp.sum(out[0][:, 0, 0]) + jnp.sum(out[1][:, 0, 0])

    @jax.jit
    def fullfwd(params, V, A, trg, masks):
        pred = model.apply(params, (V, A), trg, masks,
                           deterministic=True)[0]
        return jnp.sum(pred[:, 0, 0])

    t_enc = timeit(enc, params, V, A, masks)
    t_fwd = timeit(fullfwd, params, V, A, trg, masks)

    def step(state, batch, k):
        st, m, _ = sf.warmstart_step(state, batch, k, 1e-4)
        return st, m

    # full step (returns new state; time via loss fetch per iter)
    st, m = step(state, batch, k)
    float(m["loss"])
    t0 = time.time()
    iters = 8
    for _ in range(iters):
        st, m = step(st, batch, k)
    float(m["loss"])
    t_step = (time.time() - t0) / iters * 1e3

    print(f"B={B}: encoder_fwd={t_enc:.1f} ms  caption_fwd~="
          f"{t_fwd - t_enc:.1f} ms  full_fwd={t_fwd:.1f} ms  "
          f"full_step={t_step:.1f} ms  (bwd+opt~={t_step - t_fwd:.1f} ms)",
          flush=True)
