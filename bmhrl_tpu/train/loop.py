"""Training orchestrator: ``train_rl_cap(cfg)``.

Parity target: scripts/train_rl_captioning_module.py:32-278 — dataset/model/
scorer/optimizer assembly, warmstart -> RL switch with the learning-rate
change, per-epoch worker/manager alternation, 1-by-1 greedy validation with
best-METEOR checkpointing and early stop. TPU-shaped: datasets stream
bucketed numpy batches through a prefetcher onto the mesh, steps are the
jitted StepFactory functions, and host reward scoring for batch t overlaps
the device rollout of batch t+1.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.config import Config
from bmhrl_tpu.data.dataset import CaptioningDataset, Prefetcher
from bmhrl_tpu.data.vocab import BOS, EOS, PAD
from bmhrl_tpu.eval.anet_eval import calculate_metrics
from bmhrl_tpu.models.bmhrl import (
    BMHrlAgent, BMManagerValueFunction, BMWorkerValueFunction)
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.parallel import mesh as mesh_lib
from bmhrl_tpu.train.decode import decode, detokenize
from bmhrl_tpu.train.rewards import make_scorer
from bmhrl_tpu.train.steps import StepFactory, TrainState
from bmhrl_tpu.utils.checkpoint import (
    install_critic, load_checkpoint, save_checkpoint)
from bmhrl_tpu.utils.logging import ScalarLogger, log_stderr


def build_model(cfg: Config, voc_size: int):
    """Model select by cfg.mode. ref: train_rl_captioning_module.py:54-61."""
    from bmhrl_tpu.ops.attention import enable_flash

    enable_flash(cfg.use_pallas_attention)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.mode in ("BMHRL", "BM", "verbose", "eval"):
        return BMHrlAgent(
            voc_size=voc_size, d_video=cfg.d_vid, d_audio=cfg.d_aud,
            d_model=cfg.d_model, d_model_caps=cfg.d_model_caps,
            att_heads=cfg.rl_att_heads, att_layers=cfg.rl_att_layers,
            dout_p=cfg.dout_p, d_goal=cfg.rl_goal_d, d_ff_v=cfg.rl_ff_v,
            d_ff_a=cfg.rl_ff_a, d_ff_c=cfg.rl_ff_c,
            critic_score_threshold=cfg.rl_critic_score_threshhold,
            dtype=dtype)
    if cfg.mode == "AHRL":
        from bmhrl_tpu.models.unimodal import AudioAgent

        return AudioAgent.build(cfg, voc_size, dtype)
    if cfg.mode == "VHRL":
        from bmhrl_tpu.models.unimodal import VideoAgent

        return VideoAgent.build(cfg, voc_size, dtype)
    if cfg.mode == "DETR":
        from bmhrl_tpu.models.detr import DetrCaption

        return DetrCaption.build(cfg, voc_size, dtype)
    raise ValueError(f"unknown mode {cfg.mode}")


def device_batch(batch: Dict, mesh) -> Dict:
    arrays = {k: batch[k] for k in ("rgb", "flow", "audio", "caption_idx")}
    return mesh_lib.shard_batch(mesh, arrays)


def eval_model(cfg: Config, sf: StepFactory, state: TrainState,
               dataset: CaptioningDataset, epoch: int, logger: ScalarLogger,
               reference_path: str, max_batches: Optional[int] = None) -> Dict:
    """Greedy-decode a val split, dump the ANet submission JSON, score it.
    ref: validation_loops.py:13-137 + eval_model (:258-278)."""
    if max_batches is None:
        max_batches = cfg.eval_max_batches
    model = sf.model
    predictions = {"version": "VERSION 1.0",
                   "external_data": {"used": True, "details": ""},
                   "results": {}}
    itos = dataset.train_vocab.itos
    for bi, batch in enumerate(
            Prefetcher(dataset.batches(epoch, shuffle=False, drop_last=False),
                       cfg.prefetch_batches)):
        if max_batches is not None and bi >= max_batches:
            break
        feats = {k: jnp.asarray(batch[k]) for k in ("rgb", "flow", "audio")}
        masks_src = make_masks(feats, None, "audio_video", PAD)
        if getattr(cfg, "beam_width", 1) > 1:
            from bmhrl_tpu.train.decode import beam_decode

            tokens, _ = beam_decode(
                model, state.cap_params, feats, masks_src, cfg.max_len,
                BOS, EOS, PAD, beam_width=cfg.beam_width,
                length_penalty=cfg.length_penalty)
        else:
            tokens, _ = decode(
                model, state.cap_params, feats, masks_src, cfg.max_len,
                BOS, EOS, PAD, greedy=True)
        sentences = detokenize(np.asarray(tokens)[: batch["n_valid"]], itos)
        for vid, s, e, sent in zip(batch["video_ids"], batch["starts"],
                                   batch["ends"], sentences):
            seg = {"sentence": sent, "timestamp": [float(s), float(e)]}
            predictions["results"].setdefault(vid, []).append(seg)

    if cfg.log_path is not None:
        os.makedirs(cfg.log_path, exist_ok=True)
        sub_path = os.path.join(
            cfg.log_path, f"captioning_results_{dataset.phase}_e{epoch}.json")
        with open(sub_path, "w") as f:
            json.dump(predictions, f)
    if dataset.phase == "learned_props":
        # predicted proposals: all reference files, full tIoU sweep
        # (ref: validation_loops.py:46-49)
        refs = [p for p in cfg.reference_paths if os.path.exists(p)]
        tious = list(cfg.tIoUs)
    else:
        refs, tious = [reference_path], [0.5]
    metrics = calculate_metrics(
        refs, predictions, tious, cfg.max_prop_per_vid,
        meteor_preset=getattr(cfg, "meteor_preset", "nltk"),
        meteor_paraphrase_path=getattr(cfg, "meteor_paraphrase_path", None))
    avg = metrics["Average across tIoUs"]
    if logger is not None:
        for m in ("METEOR", "Bleu_4", "Bleu_3", "Precision", "Recall"):
            if m in avg:
                logger.add_scalar(f"{dataset.phase}/{m.lower()}",
                                  avg[m] * 100, epoch)
    return avg


def find_latest_checkpoint(log_dir: str):
    """Newest ``.../checkpoints/E_{n}`` under ``log_dir``'s run dirs (by
    run-dir mtime, then by highest epoch). Returns (path, n) or None."""
    import glob

    if not log_dir or not os.path.isdir(log_dir):
        return None
    candidates = []
    for d in glob.glob(os.path.join(log_dir, "**", "checkpoints", "E_*"),
                       recursive=True):
        name = os.path.basename(d)
        try:
            epoch = int(name.split("_", 1)[1])
        except ValueError:
            continue
        if os.path.isdir(d):
            candidates.append((os.path.getmtime(d), epoch, d))
    if not candidates:
        return None
    _, epoch, d = max(candidates)
    return d, epoch


def reference_json_for(cfg: Config, phase: str) -> Optional[str]:
    """Phase -> reference JSON routing. ref: validation_loops.py:34-49."""
    idx = {"val_1": 0, "val_2": 1, "vatex_val": 2, "msrvtt_val": 3}.get(phase)
    if idx is None:
        return None
    path = cfg.reference_paths[idx]
    return path if os.path.exists(path) else None


class ReduceLROnPlateau:
    """factor=0.1, patience=10 LR scheduler on the teacher-forced val loss.
    ref: train_rl_captioning_module.py:85-90, 196-210."""

    def __init__(self, factor: float = 0.1, patience: int = 10):
        self.factor = factor
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, val_loss: float) -> float:
        if val_loss < self.best - 1e-6:
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


def train_rl_cap(cfg: Config, max_steps_per_epoch: Optional[int] = None):
    """Full training procedure. ref: train_rl_captioning_module.py:32-251."""
    if cfg.debug_nans:
        from bmhrl_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)
    rng = jax.random.PRNGKey(cfg.seed)
    mesh = mesh_lib.make_mesh(cfg.mesh_shape)

    train_ds = CaptioningDataset(cfg, "train")
    val_datasets: List[CaptioningDataset] = []
    for phase in ("val_1", "vatex_val", "msrvtt_val"):
        try:
            meta = {"val_1": cfg.val_1_meta_path, "vatex_val": cfg.vatex_meta_path,
                    "msrvtt_val": cfg.msrvtt_meta_path}[phase]
            if os.path.exists(meta) and reference_json_for(cfg, phase):
                val_datasets.append(
                    CaptioningDataset(cfg, phase, vocab=train_ds.train_vocab))
        except Exception as e:  # missing assets are non-fatal (subset runs)
            log_stderr(f"skipping {phase}: {e}")
    # predicted-proposals eval (ref: validation_loops.py:34-49 routing; the
    # reference dataset supports the phase at captioning_dataset.py:358-359
    # but its orchestrator never constructs it — intent fix, eval mode only)
    if (cfg.mode == "eval" and cfg.val_prop_meta_path
            and os.path.exists(cfg.val_prop_meta_path)):
        val_datasets.append(
            CaptioningDataset(cfg, "learned_props", vocab=train_ds.train_vocab))

    model = build_model(cfg, train_ds.trg_voc_size)
    wv_model = BMWorkerValueFunction(cfg.d_model_caps, cfg.dout_p)
    mv_model = BMManagerValueFunction(cfg.d_model_caps, cfg.dout_p)
    scorer = make_scorer(
        cfg.scorer, train_ds.train_vocab.itos,
        getattr(train_ds.train_vocab, "token_lists", []),
        cfg.rl_gamma_worker, cfg.rl_gamma_manager)

    glove_loaded = train_ds.train_vocab.vectors is not None
    emb_trainable = (not glove_loaded) or cfg.unfreeze_word_emb
    is_detr = cfg.mode == "DETR"
    if is_detr:
        from bmhrl_tpu.train.steps_detr import DetrStepFactory

        sf = DetrStepFactory(cfg, model, wv_model, mv_model, emb_trainable)
    else:
        sf = StepFactory(cfg, model, wv_model, mv_model, emb_trainable)

    example = train_ds.make_batch(list(range(min(cfg.train_batch_size,
                                                 len(train_ds)))),
                                  pad_to_batch=cfg.train_batch_size)
    rng, init_rng = jax.random.split(rng)
    state = sf.init_state(init_rng, example)

    # GloVe init of the embedding table (ref: blocks.py:50-67)
    if glove_loaded:
        p = state.cap_params
        p["params"]["emb_C"]["embedding"]["embedding"] = jnp.asarray(
            train_ds.train_vocab.vectors)
        state = state._replace(cap_params=p)
    # pretrained frozen critic (ref: bm_hrl_agent.py:201)
    if cfg.rl_critic_path and os.path.exists(cfg.rl_critic_path):
        state = state._replace(
            cap_params=install_critic(state.cap_params, cfg.rl_critic_path))
        log_stderr(f"loaded critic: {cfg.rl_critic_path}")
    # checkpoint restore (ref: train_rl_captioning_module.py:101-105)
    start_epoch = 0
    if cfg.rl_pretrained_model_dir:
        abstract = jax.tree.map(np.asarray, state)
        state = load_checkpoint(cfg.rl_pretrained_model_dir, abstract)
        state = jax.tree.map(jnp.asarray, state)
        log_stderr(f"restored from {cfg.rl_pretrained_model_dir}")
    elif getattr(cfg, "auto_resume", False):
        # preemption-safe continuation (SURVEY §5.3): find the newest
        # E_{n} checkpoint under log_dir's run dirs and continue at n+1 —
        # data order is epoch-seeded, so the stream resumes deterministically
        found = find_latest_checkpoint(cfg.log_dir)
        if found is not None:
            ckpt_dir, ckpt_epoch = found
            abstract = jax.tree.map(np.asarray, state)
            state = load_checkpoint(ckpt_dir, abstract)
            state = jax.tree.map(jnp.asarray, state)
            start_epoch = ckpt_epoch + 1
            log_stderr(f"auto-resume: restored {ckpt_dir}, "
                       f"continuing at epoch {start_epoch}")
        else:
            log_stderr("auto-resume: no prior checkpoint found; "
                       "starting fresh")

    n_params = sum(x.size for x in jax.tree.leaves(state.cap_params))
    print(f"Total Number of Parameters: {n_params / 1e6:.2f} Mil.")
    logger = ScalarLogger(cfg.log_path, f"_{cfg.mode}_{cfg.scorer}")
    logger.add_scalar("debug/param_number", n_params, 0)

    if cfg.mode == "eval":
        results = {}
        for ds in val_datasets:
            results[ds.phase] = eval_model(
                cfg, sf, state, ds, 0, logger, reference_json_for(cfg, ds.phase))
        logger.close()
        return results

    if cfg.mode == "verbose":
        # diagnostic loss-decomposition pass (ref: analyze_bimodal_div)
        from bmhrl_tpu.train.analyze import analyze_batch

        results = []
        for bi, batch in enumerate(train_ds.batches(0)):
            if max_steps_per_epoch is not None and bi >= max_steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            results.append(analyze_batch(
                sf, state, scorer, device_batch(batch, mesh),
                batch["captions"], train_ds.train_vocab.itos, step_rng))
        logger.close()
        return results

    best_metric = 0.0
    epochs_unchanged = 0
    # warmstart/alternation state at start_epoch (resume lands mid-schedule).
    # Closed forms of the loop's own recurrences: the warmstart flag turns
    # off at the END of epoch ws (the reference's off-by-one switch,
    # ref :188-194/:244-246 — epochs 0..ws inclusive run warmstart), and
    # train_worker flips at the end of every epoch (ref :247).
    is_warmstart = (cfg.rl_warmstart_epochs > 0
                    and start_epoch <= cfg.rl_warmstart_epochs)
    train_worker = (cfg.rl_train_worker if start_epoch % 2 == 0
                    else not cfg.rl_train_worker)
    scheduler = (ReduceLROnPlateau() if cfg.scheduler == "reduce_on_plateau"
                 else None)
    lr_scale = 1.0
    from bmhrl_tpu.utils.profiling import StepTimer

    timer = StepTimer()
    profiling = False
    if cfg.profile_dir:
        import jax.profiler as _prof

        _prof.start_trace(cfg.profile_dir)
        profiling = True

    for epoch in range(start_epoch, cfg.epoch_num):
        if epochs_unchanged == cfg.early_stop_after:
            break
        t0 = time.time()
        lr = (cfg.rl_cap_warmstart_lr if is_warmstart else cfg.rl_cap_lr)
        lr = lr * lr_scale
        epoch_loss, n_steps = 0.0, 0

        # --- one-batch-deep host-score pipeline (SURVEY §7.5) ---------------
        # The device step for batch t+1 is DISPATCHED (async) before batch t
        # is scored on host, so reward scoring overlaps device compute:
        #   warmstart: scoring(t) overlaps warmstart_step(t+1); the cap-param
        #     stream is unaffected (value nets update one batch late);
        #   RL: rollout(t+1) is dispatched before update(t) — rollouts run on
        #     params one optimizer update stale (depth-1 pipeline);
        #   DETR: scoring + Hungarian matching(t) overlap rollout(t+1).
        # cfg.rl_pipeline=False restores the reference's sequential order
        # (ref boundary: epoch_loops/captioning_bmrl_loops.py:287-289).
        loss_terms: List = []  # device scalars; fetched once per epoch

        def process(item):
            """Host-score the pending batch and run its (score-dependent)
            update against the CURRENT state."""
            nonlocal state
            kind, batch, bdev, payload, step_rng = item
            if kind == "warmstart":
                aux = payload
                with timer.phase("host_score"):
                    w, m, _ = scorer.delta_both(
                        np.asarray(aux["argmax"]), batch["captions"],
                        np.asarray(aux["token_mask"]), np.asarray(aux["seg"]))
                with timer.phase("value_update"):
                    state, _vm = sf.value_warmstart_step(
                        state, aux["wf"], aux["mf"], jnp.asarray(w),
                        jnp.asarray(m), aux["token_mask"], aux["seg"])
            elif kind == "detr":
                roll = payload
                sampled = np.asarray(roll["sampled"])
                with timer.phase("host_score"):
                    score, _ = scorer.delta_worker(sampled, batch["captions"])
                if cfg.with_reinforce:
                    state, metrics = sf.reinforce_update(
                        state, bdev, step_rng, lr, roll["sampled"],
                        jnp.asarray(score))
                else:
                    with timer.phase("host_match"):
                        tc = sf.match_targets(roll["pred_classes"],
                                              roll["x_idx"])
                    state, metrics = sf.detr_update(
                        state, bdev, step_rng, lr, roll["sampled"],
                        jnp.asarray(score), jnp.asarray(tc))
                loss_terms.append(metrics["loss"])
            else:  # rl
                roll, step_i = payload
                sampled = np.asarray(roll["sampled"])
                with timer.phase("host_score"):
                    if train_worker:
                        score, _ = scorer.delta_worker(sampled,
                                                       batch["captions"])
                    else:
                        score, _ = scorer.delta_manager(
                            sampled, batch["captions"],
                            np.asarray(roll["loss_mask"]),
                            np.asarray(roll["seg"]))
                with timer.phase("update"):
                    state, metrics = sf.rl_update(
                        state, bdev, step_rng, lr, roll,
                        jnp.asarray(score), train_worker)
                loss_terms.append(metrics["loss"])
                if step_i % 100 == 0:
                    # periodic sample log (ref: log_iteration,
                    # captioning_bmrl_loops.py:459-469, every 100 iters)
                    itos = train_ds.train_vocab.itos
                    hyp = " ".join(itos[i] for i in sampled[0])
                    log_stderr(f"Pred[0]: {hyp}")
                    log_stderr(f"Trg[0]: {batch['captions'][0]}")
                    log_stderr(f"Score[0] sum: {float(np.sum(score[0])):.3f}")

        pending = None
        for batch in Prefetcher(train_ds.batches(epoch), cfg.prefetch_batches,
                                sharding=mesh_lib.batch_sharding(mesh)):
            if max_steps_per_epoch is not None and n_steps >= max_steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            bdev = device_batch(batch, mesh)
            if is_detr:
                # DETR mode trains the same way in warmstart and RL epochs
                # (ref: train_rl_captioning_module.py:140-145)
                with timer.phase("rollout"):
                    roll = sf.detr_rollout(state, bdev, step_rng)
                item = ("detr", batch, bdev, roll, step_rng)
            elif is_warmstart:
                with timer.phase("warmstart"):
                    state, metrics, aux = sf.warmstart_step(
                        state, bdev, step_rng, lr)
                loss_terms.append(metrics["loss"])
                item = ("warmstart", batch, bdev, aux, step_rng)
            else:
                with timer.phase("rollout"):
                    roll = sf.rl_rollout(state, bdev, step_rng, train_worker)
                item = ("rl", batch, bdev, (roll, n_steps), step_rng)
            if cfg.rl_pipeline:
                if pending is not None:
                    process(pending)
                pending = item
            else:
                process(item)
            n_steps += 1
        if pending is not None:
            process(pending)
        epoch_loss = float(np.sum([np.asarray(x) for x in loss_terms])) \
            if loss_terms else 0.0

        logger.add_scalar("debug/train_loss_epoch",
                          epoch_loss / max(n_steps, 1), epoch)
        logger.add_scalar("debug/lr", lr, epoch)

        # LR scheduler on teacher-forced val loss (ref :196-210)
        if scheduler is not None and val_datasets:
            val_losses = []
            for bi, vb in enumerate(val_datasets[0].batches(
                    epoch, shuffle=False)):
                if bi >= 8:
                    break
                val_losses.append(float(
                    sf.val_loss_step(state, device_batch(vb, mesh))))
            if val_losses:
                lr_scale = scheduler.step(float(np.mean(val_losses)))
                logger.add_scalar("debug/val_loss",
                                  float(np.mean(val_losses)), epoch)
        log_stderr(
            f"epoch {epoch} ({'warmstart' if is_warmstart else ('worker' if train_worker else 'manager')}) "
            f"loss={epoch_loss / max(n_steps, 1):.4f} steps={n_steps} "
            f"time={time.time() - t0:.1f}s")
        if timer.samples:
            for name, s in timer.summary().items():
                logger.add_scalar(f"time/{name}_ms", s["mean_ms"], epoch)
            timer.reset()
        if profiling:  # trace covers the first epoch only
            import jax.profiler as _prof

            _prof.stop_trace()
            profiling = False

        # periodic checkpoint before 1-by-1 starts (ref :214-221)
        ckpt_root = cfg.model_checkpoint_path
        if ckpt_root and epoch % 2 == 0 and epoch < cfg.one_by_one_starts_at:
            save_checkpoint(os.path.join(ckpt_root, "checkpoints",
                                         f"E_{epoch}"), state)
        # 1-by-1 validation + best-METEOR checkpointing (ref :222-240)
        if epoch >= cfg.one_by_one_starts_at and val_datasets:
            metrics_avg = []
            for ds in val_datasets:
                metrics_avg.append(eval_model(
                    cfg, sf, state, ds, epoch, logger,
                    reference_json_for(cfg, ds.phase)))
            meteor = metrics_avg[0].get("METEOR", 0.0)
            log_stderr(f"epoch {epoch} METEOR={meteor * 100:.2f}")
            if meteor > best_metric:
                best_metric = meteor
                if ckpt_root:
                    save_checkpoint(os.path.join(ckpt_root, "checkpoints",
                                                 f"E_{epoch}"), state)
                epochs_unchanged = 0
            else:
                epochs_unchanged += 1

        if is_warmstart and epoch > (cfg.rl_warmstart_epochs - 1):
            is_warmstart = False  # lr switch handled via `lr` each epoch
        train_worker = not train_worker  # ref :247

    logger.close()
    return {"best_metric": best_metric, "state": state,
            "start_epoch": start_epoch}
