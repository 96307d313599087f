"""Benchmark: captioned clips/sec/chip + train steps/sec on the flagship
BMHRL model (full 58M-param size, real A/V feature shapes).

Decode (the reference's validation/serving operating point,
ref: epoch_loops/captioning_bmrl_loops.py:61-76 + validation_loops.py:53-99):
steady-state greedy full-caption generation with the KV-cached incremental
loop (token-exact with the reference decode — tests/test_torch_parity.py),
swept over serving batch sizes; the headline number is the best.

``vs_baseline`` is the speedup against a reference-style decode measured on
the SAME chip at the SAME (best) batch size: a host-driven loop calling a
jitted FULL forward (bimodal encoder included) once per generated token —
exactly the reference's decode algorithm. This keeps the ratio
hardware-controlled: it isolates the framework/algorithm win.

Training half (BASELINE.json names "RL train steps/sec"): steady-state
warmstart and RL worker/manager step rates at the reference's B=16 operating
point (ref: README.md:64), device-side compute (rollout + update; host
reward scoring is pipelined behind device work in the training loop, see
train/loop.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _decode_bench(jax, jnp, model, params_for, feats_for, masks_for,
                  max_len=30):
    from bmhrl_tpu.ops.masking import c_mask
    from bmhrl_tpu.train.decode import decode

    results = {}
    for B in (32, 256, 1024):
        feats = feats_for(B)
        masks_src = masks_for(feats, None)
        params = params_for(B, feats)

        def run():
            toks, _ = decode(model, params, feats, masks_src, max_len, 2, -1,
                             1, greedy=True, use_fast=True)
            return np.asarray(toks)  # host fetch: the only reliable sync

        for attempt in range(3):  # the remote-compile service drops
            try:                  # connections transiently
                run()  # compile
                break
            except Exception:
                if attempt == 2:
                    raise
        iters = 8 if B <= 64 else 5
        t0 = time.time()
        for _ in range(iters):
            run()
        results[B] = B / ((time.time() - t0) / iters)

    best_B = max(results, key=results.get)
    best = results[best_B]

    # reference-style baseline at the same batch size (host loop, full
    # re-forward per token — putting it on-device would let XLA hoist the
    # loop-invariant encoder and stop being the reference algorithm)
    feats = feats_for(best_B)
    masks_src = masks_for(feats, None)
    params = params_for(best_B, feats)

    @jax.jit
    def full_forward(params, feats, masks_src, trg):
        masks = dict(masks_src)
        masks["C_mask"] = c_mask(trg, 1)
        return model.apply(
            params, (feats["rgb"] + feats["flow"], feats["audio"]), trg,
            masks)[0]

    def run_reference_style():
        trg = jnp.full((best_B, max_len + 1), 1, jnp.int32).at[:, 0].set(2)
        for t in range(max_len):
            preds = full_forward(params, feats, masks_src, trg)
            nxt = jnp.argmax(preds[:, t], -1).astype(jnp.int32)
            trg = trg.at[:, t + 1].set(nxt)
        return np.asarray(trg)

    run_reference_style()  # compile
    t0 = time.time()
    ref_iters = 2
    for _ in range(ref_iters):
        run_reference_style()
    ref = best_B / ((time.time() - t0) / ref_iters)
    return results, best_B, best, ref


def _train_bench(jax, jnp, model):
    """Warmstart + RL worker/manager steps/sec at the reference's B=16."""
    from bmhrl_tpu.config import Config
    from bmhrl_tpu.models.bmhrl import (BMManagerValueFunction,
                                        BMWorkerValueFunction)
    from bmhrl_tpu.train.steps import StepFactory

    cfg = Config(B=16, mesh_shape=(1, 1), to_log=False)
    sf = StepFactory(cfg, model, BMWorkerValueFunction(),
                     BMManagerValueFunction(), emb_trainable=True)
    B, Sv, Sa, Lc = 16, 128, 256, 31
    rng = np.random.RandomState(0)
    cap = np.full((B, Lc + 1), 1, np.int32)
    cap[:, 0] = 2
    cap[:, 1:20] = rng.randint(4, 10000, (B, 19))
    cap[:, 20] = 3
    # device-resident batch: steps measure device compute, not the bench
    # tunnel's host->device bandwidth (~10 MB/s here vs PCIe-rate on a
    # real TPU host, where the input pipeline hides the copy anyway)
    batch = {
        "rgb": jnp.asarray(rng.rand(B, Sv, 1024).astype(np.float32)),
        "flow": jnp.asarray(rng.rand(B, Sv, 1024).astype(np.float32)),
        "audio": jnp.asarray(rng.rand(B, Sa, 128).astype(np.float32)),
        "caption_idx": jnp.asarray(cap),
    }
    state = sf.init_state(jax.random.PRNGKey(0), batch)
    k = jax.random.PRNGKey(1)

    def sync(state, m):
        return float(np.asarray(m["loss"]))

    out = {}
    # warmstart
    state, m, aux = sf.warmstart_step(state, batch, k, 1e-4)
    sync(state, m)
    t0 = time.time()
    iters = 8
    for _ in range(iters):
        state, m, aux = sf.warmstart_step(state, batch, k, 1e-4)
    sync(state, m)
    out["warmstart_steps_per_sec"] = iters / (time.time() - t0)
    # RL worker / manager (device-side rollout + update; host scoring is
    # pipelined behind device work in the real loop)
    for name, tw in (("rl_worker", True), ("rl_manager", False)):
        roll = sf.rl_rollout(state, batch, k, tw)
        score = jnp.zeros(roll["sampled"].shape, jnp.float32)
        state, m = sf.rl_update(state, batch, k, 1e-4, roll, score, tw)
        sync(state, m)
        t0 = time.time()
        iters = 6
        for _ in range(iters):
            roll = sf.rl_rollout(state, batch, k, tw)
            state, m = sf.rl_update(state, batch, k, 1e-4, roll, score, tw)
        sync(state, m)
        out[f"{name}_steps_per_sec"] = iters / (time.time() - t0)
    return out


def main():
    from bmhrl_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from bmhrl_tpu.models.bmhrl import BMHrlAgent
    from bmhrl_tpu.ops.masking import make_masks

    VOC, Sv, Sa = 10172, 128, 256
    model = BMHrlAgent(voc_size=VOC)
    rng = np.random.RandomState(0)
    _param_cache = {}

    def feats_for(B):
        return {
            "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
            "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
            "audio": jnp.asarray(rng.rand(B, Sa, 128), jnp.float32),
        }

    def masks_for(feats, trg):
        return make_masks(feats, trg, "audio_video", 1)

    def params_for(B, feats):
        if "p" not in _param_cache:
            k = jax.random.PRNGKey(0)
            trg0 = jnp.full((B, 8), 1, jnp.int32).at[:, 0].set(2)
            m0 = masks_for(feats, trg0)
            _param_cache["p"] = jax.jit(model.init)(
                {"params": k, "dropout": k, "noise": k},
                (feats["rgb"] + feats["flow"], feats["audio"]), trg0, m0)
        return _param_cache["p"]

    per_b, best_B, best, ref = _decode_bench(
        jax, jnp, model, params_for, feats_for, masks_for)
    train = _train_bench(jax, jnp, model)

    extra = {f"decode_B{b}_clips_per_sec": round(v, 2)
             for b, v in per_b.items()}
    extra["best_batch"] = best_B
    extra["reference_style_clips_per_sec"] = round(ref, 2)
    extra.update({k: round(v, 3) for k, v in train.items()})
    print(json.dumps({
        "metric": (f"captioned clips/sec/chip (greedy, KV-cached decode, "
                   f"best of B in {{32,256,1024}}, Sv=128, Sa=256)"),
        "value": round(best, 2),
        "unit": "clips/s",
        "vs_baseline": round(best / ref, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
