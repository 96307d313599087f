"""Jitted training steps: supervised warmstart and RL (worker/manager phases).

Parity targets: epoch_loops/captioning_bmrl_loops.py —
warmstart_bimodal_bl (:1132-1189), train_bimodal_bl (:797-890),
biased_kl (:271-334), generate_synonyms (:510-528), with the §2.12 warts fixed
toward intent (the manager RL branch is implemented instead of raising).

Design (three-phase RL step):
  1. ``rl_rollout`` (jit): forward, sample, value estimate — no grads;
  2. host scoring: the string-world reward scorer consumes sampled ids
     (the axon TPU runtime does not support jax host callbacks). The split
     is what enables the loop's one-batch-deep pipeline: rollout t+1 is
     dispatched before update t, so scoring batch t overlaps device compute
     (train/loop.py; cfg.rl_pipeline);
  3. ``rl_update`` (jit): re-runs the forward with the SAME rngs (identical
     logits), builds the biased-KL amplitude from the host score, updates the
     captioner through the phase-gated GatedAdam, then the active value net.

Phase gating is a static param mask (moments/counts freeze exactly like
requires_grad flips). The manager's per-segment probability products and
expected-score sums (reference Python loops :299-317) are the vectorized
ops/segments forms.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.data.vocab import EOS, PAD
from bmhrl_tpu.ops import segments as seg_ops
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train import losses as L
from bmhrl_tpu.train.optim import AdamState, GatedAdam, clip_by_global_norm

# loss normalization constants (ref: captioning_bmrl_loops.py:831-833)
NORM_FACTOR = 20.0
IMPACT_FACTOR = 4.0
LOSS_FACTOR = IMPACT_FACTOR / NORM_FACTOR


class TrainState(NamedTuple):
    cap_params: Any
    wv_params: Any
    mv_params: Any
    cap_opt: AdamState
    wv_opt: AdamState
    mv_opt: AdamState


def param_groups(cap_params) -> Dict[str, Any]:
    """Label each captioner param leaf by module group.
    ref grouping: bm_hrl_agent.py:544-545 (worker_modules / manager_modules)."""
    def label_of(path) -> str:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        top = names[1] if len(names) > 1 else names[0]
        if top == "critic":
            return "frozen"
        if top == "emb_C":
            return "embedding"
        if top == "worker" or top.startswith(
                ("bm_enc", "bm_worker_fus", "uni_enc", "uni_worker_fus",
                 # DETR family: everything but the critic trains in its single
                 # (worker) phase — ref: det_bmhrl_agent.py:72-73,118-124
                 "worker_decoder", "linear", "encoder", "object_detector",
                 "input_proj", "input_norm")):
            return "worker"
        if top == "manager" or top.startswith(
                ("bm_manager_fus", "uni_manager_fus")):
            return "manager"
        return "other"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_of(path), cap_params)


def phase_mask(groups, phase: str, emb_trainable: bool):
    """Active-leaf mask for a phase. warmstart trains worker+manager groups;
    worker/manager phases train only their group; the embedding follows
    unfreeze_word_emb / from-scratch status; the critic never trains."""
    active = {
        "warmstart": {"worker", "manager", "other"},
        "worker": {"worker", "other"},
        "manager": {"manager", "other"},
    }[phase]
    if emb_trainable:
        active = active | {"embedding"}
    return jax.tree.map(lambda g: g in active, groups)


def synonym_noise(
    rng: jax.Array, caption: jnp.ndarray, voc_size: int,
    p: float = 0.3, pad_idx: int = PAD, end_idx: int = EOS,
) -> jnp.ndarray:
    """Word-dropout augmentation: with prob p per word, 80% -> pad, 10% ->
    random vocab word, 10% keep; the first end token becomes pad and noise
    stops there. ref: captioning_bmrl_loops.py:510-528 (vectorized)."""
    B, Lc = caption.shape
    r1, r2, r3 = jax.random.split(rng, 3)
    u1 = jax.random.uniform(r1, (B, Lc))
    u2 = jax.random.uniform(r2, (B, Lc))
    rand_word = jax.random.randint(r3, (B, Lc), 2, voc_size)
    noised = jnp.where(
        u1 < p,
        jnp.where(u2 < 0.8, pad_idx, jnp.where(u2 >= 0.9, rand_word, caption)),
        caption,
    )
    is_end = caption == end_idx
    first_end = jnp.where(is_end.any(-1), jnp.argmax(is_end, -1), Lc)
    pos = jnp.arange(Lc)[None, :]
    out = jnp.where(pos < first_end[:, None], noised, caption)
    return jnp.where(pos == first_end[:, None], pad_idx, out)


class StepFactory:
    """Builds the jitted warmstart / RL steps for one model + value nets."""

    def __init__(self, cfg, model, wv_model, mv_model, emb_trainable: bool):
        self.cfg = cfg
        self.model = model
        self.wv_model = wv_model
        self.mv_model = mv_model
        self.cap_optim = GatedAdam(
            cfg.betas[0], cfg.betas[1], cfg.eps, cfg.weight_decay)
        self.val_optim = GatedAdam(cfg.betas[0], cfg.betas[1], 1e-8, 0.0)
        self.emb_trainable = emb_trainable
        self._groups = None
        self.voc_size = model.voc_size
        self._init_jit = jax.jit(self.model.init)

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch) -> TrainState:
        V = jnp.asarray(example_batch["rgb"] + example_batch["flow"])
        A = jnp.asarray(example_batch["audio"])
        trg = jnp.asarray(example_batch["caption_idx"][:, :-1])
        # same rgb-channel-0 mask convention as _prep / serving (masks only
        # shape the init trace here; param values depend on shapes alone)
        masks = make_masks({"rgb": jnp.asarray(example_batch["rgb"]),
                            "audio": A}, trg, "audio_video", PAD)
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        cap_params = self._init_jit(
            {"params": r1, "dropout": r2, "noise": r3}, (V, A), trg, masks)
        out = jax.eval_shape(
            lambda p: self.model.apply(p, (V, A), trg, masks), cap_params)
        wf = jnp.zeros(out[1].shape, jnp.float32)
        # distinct keys: the worker/manager value nets share an architecture,
        # so one key would start the two baselines byte-identical
        wv_params = self.wv_model.init(r4, (wf, None))
        mv_params = self.mv_model.init(r5, wf)
        self._groups = param_groups(cap_params)
        return TrainState(
            cap_params=cap_params, wv_params=wv_params, mv_params=mv_params,
            cap_opt=self.cap_optim.init(cap_params),
            wv_opt=self.val_optim.init(wv_params),
            mv_opt=self.val_optim.init(mv_params),
        )

    def groups(self, state: TrainState):
        if self._groups is None:
            self._groups = param_groups(state.cap_params)
        return self._groups

    # -- shared forward prep -------------------------------------------------
    def _prep(self, batch, rng):
        rng, r_syn, r_drop, r_noise, r_samp = jax.random.split(rng, 5)
        V = batch["rgb"] + batch["flow"]
        A = batch["audio"]
        cap = batch["caption_idx"]
        x_idx, y_idx = cap[:, :-1], cap[:, 1:]
        x_idx = synonym_noise(r_syn, x_idx, self.voc_size)
        masks = make_masks({"rgb": batch["rgb"], "audio": A}, x_idx,
                           "audio_video", PAD)
        return (V, A, x_idx, y_idx, masks,
                {"dropout": r_drop, "noise": r_noise}, r_samp)

    # -- warmstart -----------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("state",))
    def warmstart_step(self, state: TrainState, batch, rng, lr):
        """Supervised captioner update; returns aux tensors for host scoring
        + value pretraining. ref: captioning_bmrl_loops.py:1132-1160."""
        cfg = self.cfg
        V, A, x_idx, y_idx, masks, rngs, _ = self._prep(batch, rng)
        token_mask = (y_idx != PAD)
        n_tokens = token_mask.sum()

        def loss_fn(cap_params):
            pred, wf, mf, goals, seg = self.model.apply(
                cap_params, (V, A), x_idx, masks,
                exploration=True, deterministic=False, rngs=rngs)
            loss = jnp.sum(
                L.label_smoothing(pred, y_idx, cfg.smoothing, PAD)) / n_tokens
            return loss, (pred, wf, mf, seg)

        (loss, (pred, wf, mf, seg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.cap_params)
        if cfg.grad_clip is not None:
            grads = clip_by_global_norm(grads, cfg.grad_clip)
        mask = phase_mask(self.groups(state), "warmstart", self.emb_trainable)
        cap_params, cap_opt = self.cap_optim.update(
            grads, state.cap_opt, state.cap_params, mask, lr)
        new_state = state._replace(cap_params=cap_params, cap_opt=cap_opt)
        aux = {
            "argmax": jnp.argmax(pred, -1).astype(jnp.int32),
            "token_mask": token_mask,
            "seg": jax.lax.stop_gradient(seg),
            "wf": jax.lax.stop_gradient(wf),
            "mf": jax.lax.stop_gradient(mf),
        }
        return new_state, {"loss": loss, "n_tokens": n_tokens}, aux

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("state",))
    def value_warmstart_step(self, state: TrainState, wf, mf, w_score, m_score,
                             token_mask, seg):
        """Value-net pretraining on host-computed scores.
        ref: captioning_bmrl_loops.py:1162-1181."""
        cfg = self.cfg

        def wv_loss_fn(p):
            ev = self.wv_model.apply(p, (wf, None))[..., 0]
            return L.masked_mse(ev, w_score, token_mask.astype(jnp.float32))

        def mv_loss_fn(p):
            ev = self.mv_model.apply(p, mf)[..., 0]
            return L.masked_mse(ev, m_score, seg.astype(jnp.float32))

        wv_l, wv_g = jax.value_and_grad(wv_loss_fn)(state.wv_params)
        mv_l, mv_g = jax.value_and_grad(mv_loss_fn)(state.mv_params)
        wv_params, wv_opt = self.val_optim.update(
            wv_g, state.wv_opt, state.wv_params, True, cfg.rl_value_function_lr)
        mv_params, mv_opt = self.val_optim.update(
            mv_g, state.mv_opt, state.mv_params, True, cfg.rl_value_function_lr)
        new_state = state._replace(
            wv_params=wv_params, mv_params=mv_params,
            wv_opt=wv_opt, mv_opt=mv_opt)
        return new_state, {"wv_loss": wv_l, "mv_loss": mv_l}

    # -- RL ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "train_worker"))
    def rl_rollout(self, state: TrainState, batch, rng,
                   train_worker: bool = True):
        """Forward + sample + value estimate; no grads. Everything rl_update
        needs from the pre-update policy is computed here once (the update's
        only forward is the grad pass — reference cost parity: one forward +
        one backward per step). ref: biased_kl sampling :273-285."""
        V, A, x_idx, y_idx, masks, rngs, r_samp = self._prep(batch, rng)
        pred, wf, mf, goals, seg = jax.lax.stop_gradient(self.model.apply(
            state.cap_params, (V, A), x_idx, masks,
            exploration=not train_worker, deterministic=False, rngs=rngs))
        if train_worker:
            sampled = jax.random.categorical(r_samp, pred, axis=-1)
        else:
            sampled = jnp.argmax(pred, axis=-1)
        sampled = sampled.astype(jnp.int32)
        sampled_probs = jnp.take_along_axis(
            jnp.exp(pred), sampled[..., None], axis=-1)[..., 0]
        if train_worker:
            expected_value = self.wv_model.apply(
                state.wv_params, (wf, goals))[..., 0]
        else:
            expected_value = self.mv_model.apply(state.mv_params, mf)[..., 0]
        return {
            "sampled": sampled,
            "sampled_probs": sampled_probs,
            "expected_value": jax.lax.stop_gradient(expected_value),
            "seg": seg,
            "loss_mask": (y_idx != PAD),
        }

    @functools.partial(
        jax.jit, static_argnames=("self", "train_worker"),
        donate_argnames=("state",))
    def rl_update(self, state: TrainState, batch, rng, lr, roll, score,
                  train_worker: bool = True):
        """Biased-KL update from the host score + the rl_rollout outputs
        (``roll``). The grad forward re-runs with the same rngs as the
        rollout; with the default one-batch-deep pipeline
        (cfg.rl_pipeline, train/loop.py) the rollout for batch t was taken
        on params one optimizer step older than this update's forward, so
        the sampled tokens/probs are one-step off-policy (standard
        async-RL staleness; `--no_rl_pipeline` restores the reference's
        strictly sequential on-policy order, where rollout and update
        logits match exactly).
        ref: train_bimodal_bl (:797-890) + biased_kl (:271-334)."""
        cfg = self.cfg
        V, A, x_idx, y_idx, masks, rngs, _ = self._prep(batch, rng)
        loss_mask = (y_idx != PAD)
        n_tokens = loss_mask.sum()
        B, Lc = y_idx.shape

        def forward(cap_params):
            return self.model.apply(
                cap_params, (V, A), x_idx, masks,
                exploration=not train_worker, deterministic=False, rngs=rngs)

        sampled = roll["sampled"]
        sampled_probs = roll["sampled_probs"]
        expected_value = roll["expected_value"]
        seg0 = roll["seg"]

        if train_worker:
            norm_factor = loss_mask.sum(-1, keepdims=True).astype(jnp.float32)
        else:
            norm_factor = seg0.sum(-1, keepdims=True).astype(jnp.float32)
            # ref :299-317 vectorized: per-segment prob products and
            # expected-score segment sums. Reference-faithful quirk: score
            # is zeroed at non-boundary positions (score * segments,
            # ref :300) while probs/expected values are segment-EXPANDED,
            # so with stabilize the mid-segment amplitude is driven by
            # -expected_value alone (ref :318-322 does exactly this) —
            # kept as the semantics the published 10.80 was trained with
            segf = seg0.astype(jnp.float32)
            score = score * segf
            log_p = jnp.log(jnp.clip(sampled_probs, 1e-30))
            sampled_probs = jnp.exp(seg_ops.segment_sum_expand(log_p, seg0))
            nb = seg_ops.next_boundary(seg0)
            sampled_probs = jnp.where(nb < Lc, sampled_probs, 0.0)
            expected_value = seg_ops.segment_sum_expand(expected_value, seg0)

        expected_value = jax.lax.stop_gradient(expected_value)
        if cfg.rl_stabilize:
            score = (score - expected_value) * loss_mask.astype(jnp.float32)
        amplitude = jnp.clip(score * sampled_probs * norm_factor, 0.0, 1.0)
        amplitude = jax.lax.stop_gradient(amplitude)

        def cap_loss_fn(cap_params):
            pred, wf, mf, goals, seg = forward(cap_params)
            div = L.biased_kl(pred, y_idx, sampled, amplitude, 0.7, PAD)
            cap_loss = jnp.sum(div) / (n_tokens * LOSS_FACTOR)  # ref :862
            return cap_loss, (wf, mf)

        (cap_loss, (wf, mf)), grads = jax.value_and_grad(
            cap_loss_fn, has_aux=True)(state.cap_params)
        if cfg.grad_clip is not None:
            grads = clip_by_global_norm(grads, cfg.grad_clip)
        phase = "worker" if train_worker else "manager"
        mask = phase_mask(self.groups(state), phase, self.emb_trainable)
        cap_params, cap_opt = self.cap_optim.update(
            grads, state.cap_opt, state.cap_params, mask, lr)

        # --- value update (ref :871-877; regresses onto the post-stabilize
        # score, a deliberate reference behavior)
        vmask = (loss_mask.astype(jnp.float32) if train_worker
                 else seg0.astype(jnp.float32))
        wf_d, mf_d = jax.lax.stop_gradient(wf), jax.lax.stop_gradient(mf)
        score_d = jax.lax.stop_gradient(score)

        if train_worker:
            def v_loss_fn(p):
                ev = self.wv_model.apply(p, (wf_d, None))[..., 0]
                return L.masked_mse(ev, score_d, vmask)
            v_l, v_g = jax.value_and_grad(v_loss_fn)(state.wv_params)
            wv_params, wv_opt = self.val_optim.update(
                v_g, state.wv_opt, state.wv_params, True,
                cfg.rl_value_function_lr)
            new_state = state._replace(
                cap_params=cap_params, cap_opt=cap_opt,
                wv_params=wv_params, wv_opt=wv_opt)
        else:
            def v_loss_fn(p):
                ev = self.mv_model.apply(p, mf_d)[..., 0]
                return L.masked_mse(ev, score_d, vmask)
            v_l, v_g = jax.value_and_grad(v_loss_fn)(state.mv_params)
            mv_params, mv_opt = self.val_optim.update(
                v_g, state.mv_opt, state.mv_params, True,
                cfg.rl_value_function_lr)
            new_state = state._replace(
                cap_params=cap_params, cap_opt=cap_opt,
                mv_params=mv_params, mv_opt=mv_opt)

        metrics = {"loss": cap_loss, "value_loss": v_l,
                   "score_sum": jnp.sum(score), "n_tokens": n_tokens}
        return new_state, metrics

    # -- teacher-forced validation (ref :189-216) ---------------------------
    @functools.partial(jax.jit, static_argnames=("self",))
    def val_loss_step(self, state: TrainState, batch):
        cfg = self.cfg
        V = batch["rgb"] + batch["flow"]
        A = batch["audio"]
        cap = batch["caption_idx"]
        x_idx, y_idx = cap[:, :-1], cap[:, 1:]
        masks = make_masks({"rgb": batch["rgb"], "audio": A}, x_idx,
                           "audio_video", PAD)
        pred = self.model.apply(state.cap_params, (V, A), x_idx, masks)[0]
        n_tokens = (y_idx != PAD).sum()
        return jnp.sum(
            L.label_smoothing(pred, y_idx, cfg.smoothing, PAD)) / n_tokens
