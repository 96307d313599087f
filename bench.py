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
warmstart step rates swept over B in {16,32,64,128} with an MFU estimate
from the compiled step's FLOP count, plus RL worker/manager step rates at
the reference's B=16 operating point (ref: README.md:64). Device-side
compute (rollout + update); host reward scoring is pipelined behind device
work in the training loop (train/loop.py). ``rl_sequential_steps_per_sec``
is the same-chip reference-style ordering — rollout, BLOCKING host CIDEr
scoring (our incremental scorer; the reference's O(B*L^2) rescoring loop
would be slower still), then update — i.e. the unpipelined variant.

Everything is measured in the PRODUCTION configuration: the same
enable_flash(cfg.use_pallas_attention) call cli/run_training.py makes
(train/loop.py:40-42) runs here first.

All headline values are MEDIANS over recorded per-iteration (or per-block)
samples; every metric carries a ``*_spread`` field (med/min/max/n) in
``extra`` so run-to-run tunnel variance is auditable (VERDICT r3 item 4).
Compile happens before any timed sample.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _stats(samples):
    """Median + spread of a sample list (VERDICT r3 item 4: the tunnel's
    run-to-run variance must be in the artifact, not averaged away)."""
    s = sorted(samples)
    n = len(s)
    med = s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])
    return med, {"med": round(med, 2), "min": round(s[0], 2),
                 "max": round(s[-1], 2), "n": n}


def _rate_samples(run, B, iters):
    """Per-iteration clips/s samples; ``run`` must block until done."""
    out = []
    for _ in range(iters):
        t0 = time.time()
        run()
        out.append(B / (time.time() - t0))
    return out


def _decode_bench(jax, jnp, model, params_for, feats_for, masks_for,
                  max_len=30):
    from bmhrl_tpu.ops.masking import c_mask
    from bmhrl_tpu.train.decode import decode

    results, spreads = {}, {}
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
        iters = 8 if B <= 64 else 6
        med, sp = _stats(_rate_samples(run, B, iters))
        results[B], spreads[B] = med, sp

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
    ref, ref_sp = _stats(_rate_samples(run_reference_style, best_B, 3))
    spreads["reference_style"] = ref_sp
    return results, spreads, best_B, best, ref


# v5e bf16 peak (MXU): 197 TFLOP/s — the MFU denominator
_PEAK_FLOPS = 197e12


def _make_batch(jnp, B, Sv=128, Sa=256, Lc=31, voc=10000, seed=0):
    # device-resident batch: steps measure device compute, not the bench
    # tunnel's host->device bandwidth (~10 MB/s here vs PCIe-rate on a
    # real TPU host, where the input pipeline hides the copy anyway)
    rng = np.random.RandomState(seed)
    cap = np.full((B, Lc + 1), 1, np.int32)
    cap[:, 0] = 2
    cap[:, 1:20] = rng.randint(4, voc, (B, 19))
    cap[:, 20] = 3
    return {
        "rgb": jnp.asarray(rng.rand(B, Sv, 1024).astype(np.float32)),
        "flow": jnp.asarray(rng.rand(B, Sv, 1024).astype(np.float32)),
        "audio": jnp.asarray(rng.rand(B, Sa, 128).astype(np.float32)),
        "caption_idx": jnp.asarray(cap),
    }


def _step_flops(jax, sf, state, batch, k):
    """FLOPs of one compiled warmstart step (fwd+bwd+update), from XLA's
    own cost model; None when the backend doesn't expose it."""
    try:
        lowered = type(sf).warmstart_step.lower(sf, state, batch, k, 1e-4)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _train_bench(jax, jnp, model):
    """Warmstart steps/sec swept over batch (+ MFU), RL worker/manager
    steps/sec at the reference's B=16, and the sequential (unpipelined,
    reference-ordering) RL rate including blocking host CIDEr scoring."""
    from bmhrl_tpu.config import Config
    from bmhrl_tpu.models.bmhrl import (BMManagerValueFunction,
                                        BMWorkerValueFunction)
    from bmhrl_tpu.train.rewards import CiderReward
    from bmhrl_tpu.train.steps import StepFactory

    cfg = Config(B=16, mesh_shape=(1, 1), to_log=False)
    sf = StepFactory(cfg, model, BMWorkerValueFunction(),
                     BMManagerValueFunction(), emb_trainable=True)
    k = jax.random.PRNGKey(1)

    def sync(m):
        return float(np.asarray(m["loss"]))

    out, spreads = {}, {}
    # warmstart batch sweep (VERDICT r2 item 4: scaling + MFU accounting).
    # Steps dispatch async, so samples are BLOCK-level (5 steps + sync) —
    # per-step syncing would serialize the tunnel latency into the number.
    state = None
    for B in (16, 32, 64, 128):
        batch = _make_batch(jnp, B)
        if state is None:
            state = sf.init_state(jax.random.PRNGKey(0), batch)
        # warm with a FULL block (compile + first-dispatch effects), then
        # sample 5 blocks — the r4 artifact showed occasional cold first
        # blocks polluting the min at n=3
        for _ in range(5):
            state, m, aux = sf.warmstart_step(state, batch, k, 1e-4)
        sync(m)
        samples = []
        for _ in range(5):
            t0 = time.time()
            for _ in range(5):
                state, m, aux = sf.warmstart_step(state, batch, k, 1e-4)
            sync(m)
            samples.append(5 / (time.time() - t0))
        sps, spreads[f"warmstart_B{B}"] = _stats(samples)
        out[f"warmstart_B{B}_steps_per_sec"] = sps
        flops = _step_flops(jax, sf, state, batch, k)
        if flops:
            out[f"warmstart_B{B}_mfu_pct"] = 100 * flops * sps / _PEAK_FLOPS
    out["warmstart_steps_per_sec"] = out["warmstart_B16_steps_per_sec"]

    # RL worker / manager at B=16 (device-side rollout + update; host
    # scoring is pipelined behind device work in the real loop)
    batch = _make_batch(jnp, 16)
    for name, tw in (("rl_worker", True), ("rl_manager", False)):
        roll = sf.rl_rollout(state, batch, k, tw)
        score = jnp.zeros(roll["sampled"].shape, jnp.float32)
        for _ in range(3):  # full warm block (see warmstart note)
            roll = sf.rl_rollout(state, batch, k, tw)
            state, m = sf.rl_update(state, batch, k, 1e-4, roll, score, tw)
        sync(m)
        samples = []
        for _ in range(5):
            t0 = time.time()
            for _ in range(3):
                roll = sf.rl_rollout(state, batch, k, tw)
                state, m = sf.rl_update(state, batch, k, 1e-4, roll, score,
                                        tw)
            sync(m)
            samples.append(3 / (time.time() - t0))
        out[f"{name}_steps_per_sec"], spreads[name] = _stats(samples)

    # reference-style sequential ordering: rollout -> BLOCKING host CIDEr
    # scoring -> update (what the torch loop does,
    # captioning_bmrl_loops.py:271-334, minus its O(B*L^2) rescoring)
    rng = np.random.RandomState(2)
    itos = ["<blank>", "<pad>", "<s>", "</s>"] + [
        f"w{i}" for i in range(10000 - 4)]
    corpus = [[f"w{rng.randint(0, 500)}" for _ in range(12)]
              for _ in range(200)]
    scorer = CiderReward(itos, corpus, 0.8, 0.8)
    trgs = [" ".join(f"w{rng.randint(0, 500)}" for _ in range(12))
            for _ in range(16)]
    roll = sf.rl_rollout(state, batch, k, True)
    sampled = np.asarray(roll["sampled"])
    score0, _ = scorer.delta_worker(sampled, trgs)
    state, m = sf.rl_update(state, batch, k, 1e-4, roll,
                            jnp.asarray(score0), True)
    sync(m)
    samples = []
    for _ in range(6):  # each iteration fully syncs -> per-step samples
        t0 = time.time()
        roll = sf.rl_rollout(state, batch, k, True)
        sampled = np.asarray(roll["sampled"])  # blocking device->host
        sc, _ = scorer.delta_worker(sampled, trgs)
        state, m = sf.rl_update(state, batch, k, 1e-4, roll,
                                jnp.asarray(sc), True)
        sync(m)
        samples.append(1 / (time.time() - t0))
    out["rl_sequential_steps_per_sec"], spreads["rl_sequential"] = \
        _stats(samples)
    return out, spreads


def _decode_long_bench(jax, jnp, model, params, masks_for, max_len=30):
    """Serving rate at the DATASET-MAX source lengths (Sv=300, Sa=800 — the
    caps in runTraining.py:124-127); real eval runs up to here."""
    from bmhrl_tpu.train.decode import decode

    rng = np.random.RandomState(1)
    out = {}
    for B in (32, 256):
        feats = {
            "rgb": jnp.asarray(rng.rand(B, 300, 1024), jnp.float32),
            "flow": jnp.asarray(rng.rand(B, 300, 1024), jnp.float32),
            "audio": jnp.asarray(rng.rand(B, 800, 128), jnp.float32),
        }
        masks_src = masks_for(feats, None)

        def run():
            toks, _ = decode(model, params, feats, masks_src, max_len, 2, -1,
                             1, greedy=True, use_fast=True)
            return np.asarray(toks)

        run()  # compile
        med, sp = _stats(_rate_samples(run, B, 6))
        out[f"decode_long_B{B}_clips_per_sec"] = round(med, 2)
        out[f"decode_long_B{B}_spread"] = sp
    return out


def _beam_bench(jax, jnp, model, params, feats_for, masks_for, max_len=30):
    """Beam-search serving rate (quality knob the reference lacks): W=4
    incremental beam at B=256, worst-case full-length captions."""
    from bmhrl_tpu.train.decode import beam_decode

    B = 256
    feats = feats_for(B)
    masks_src = masks_for(feats, None)

    def run():
        toks, _ = beam_decode(model, params, feats, masks_src, max_len,
                              2, -1, 1, beam_width=4, length_penalty=1.0)
        return np.asarray(toks)

    run()  # compile
    med, sp = _stats(_rate_samples(run, B, 5))
    return {"beam_W4_B256_clips_per_sec": round(med, 2),
            "beam_W4_B256_spread": sp}


def main():
    from bmhrl_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from bmhrl_tpu.config import Config
    from bmhrl_tpu.models.bmhrl import BMHrlAgent
    from bmhrl_tpu.ops.attention import enable_flash
    from bmhrl_tpu.ops.masking import make_masks

    # the production configuration: exactly what cli/run_training.py sets
    # up for every training/eval run (train/loop.py:40-43)
    _cfg0 = Config(B=16, to_log=False)
    enable_flash(_cfg0.use_pallas_attention)

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

    per_b, dec_spreads, best_B, best, ref = _decode_bench(
        jax, jnp, model, params_for, feats_for, masks_for)
    long_decode = _decode_long_bench(jax, jnp, model, _param_cache["p"],
                                     masks_for)
    beam = _beam_bench(jax, jnp, model, _param_cache["p"], feats_for,
                       masks_for)
    train, train_spreads = _train_bench(jax, jnp, model)

    extra = {f"decode_B{b}_clips_per_sec": round(v, 2)
             for b, v in per_b.items()}
    extra.update({f"decode_B{b}_spread": sp for b, sp in dec_spreads.items()
                  if isinstance(b, int)})
    extra["best_batch"] = best_B
    extra["reference_style_clips_per_sec"] = round(ref, 2)
    extra["reference_style_spread"] = dec_spreads["reference_style"]
    extra.update(long_decode)
    extra.update(beam)
    extra.update({k: round(v, 3) for k, v in train.items()})
    extra.update({f"{k}_spread": sp for k, sp in train_spreads.items()})
    extra["flash_attention_on"] = True
    extra["samples"] = "all *_spread fields: med/min/max over n repeats; " \
        "headline value = median over per-iteration samples"
    print(json.dumps({
        "metric": (f"captioned clips/sec/chip (greedy, KV-cached decode, "
                   f"best of B in {{32,256,1024}}, Sv=128, Sa=256)"),
        "value": round(best, 2),
        "unit": "clips/s",
        "vs_baseline": round(best / ref, 2),
        "extra": extra,
    }))


def _watchdog(seconds: float) -> None:
    """The axon tunnel's failure mode is a device-enumeration HANG (not an
    exception): without a deadline this script would block the driver
    forever. If the first backend touch hasn't completed in ``seconds``,
    print an HONEST outage record (pointing at the self-measured artifact
    BENCH_SELF_r03.json, provenance inside) and exit."""
    import os
    import threading

    def fire():
        # Machine-readable fields record the FAILURE (zeros, exit 1) so no
        # harness mistakes this for a fresh measurement; the last
        # self-measured numbers ride along in `extra` for the human reader,
        # clearly marked stale.
        record = {
            "metric": "NOT MEASURED: TPU tunnel down at bench time "
                      "(device enumeration hung)",
            "value": 0.0,
            "unit": "clips/s",
            "vs_baseline": 0.0,
        }
        try:
            import pathlib
            prior = json.loads(
                (pathlib.Path(__file__).parent / "BENCH_SELF_r03.json")
                .read_text())
            record["extra"] = {
                "stale_self_measured_artifact": "BENCH_SELF_r03.json",
                "stale_value": prior["value"],
                "stale_vs_baseline": prior["vs_baseline"],
                "stale_metric": prior["metric"],
            }
        except Exception:
            pass
        print(json.dumps(record), flush=True)
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    _watchdog.timer = t


if __name__ == "__main__":
    _watchdog(600.0)
    import jax as _jax  # noqa: F401  (backend init is the hang point)

    from bmhrl_tpu.utils.jax_setup import setup_jax as _sj

    _sj()
    _jax.devices()
    _watchdog.timer.cancel()
    main()
