"""DETR-mode training steps.

Parity target: epoch_loops/captioning_bmrl_loops.py train_detr (:992-1107,
always worker phase) and reinforce_detr (:696-794, value update disabled in
the reference). Same rollout -> host (reward score + Hungarian matching) ->
update split as the base StepFactory; the update combines
cap_loss + 0.5 * value_loss + word_loss in one backward pass through both the
captioner and the worker value net (ref :1080-1083).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.data.vocab import PAD
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train import losses as L
from bmhrl_tpu.train.optim import clip_by_global_norm
from bmhrl_tpu.train.steps import LOSS_FACTOR, StepFactory, TrainState, phase_mask


class DetrStepFactory(StepFactory):
    """train_detr semantics: synonym noise at 0.15 (ref :989), worker-only
    phase, Hungarian word-detection loss added to the RL objective."""

    SYNONYM_P = 0.15

    def _prep(self, batch, rng):
        # override the noise rate (ref :989 vs :487)
        from bmhrl_tpu.train.steps import synonym_noise

        rng, r_syn, r_drop, r_noise, r_samp = jax.random.split(rng, 5)
        V = batch["rgb"] + batch["flow"]
        A = batch["audio"]
        cap = batch["caption_idx"]
        x_idx, y_idx = cap[:, :-1], cap[:, 1:]
        x_idx = synonym_noise(r_syn, x_idx, self.voc_size, p=self.SYNONYM_P)
        masks = make_masks({"rgb": batch["rgb"], "audio": A}, x_idx,
                           "audio_video", PAD)
        return (V, A, x_idx, y_idx, masks,
                {"dropout": r_drop, "noise": r_noise}, r_samp)

    @functools.partial(jax.jit, static_argnames=("self",))
    def detr_rollout(self, state: TrainState, batch, rng):
        V, A, x_idx, y_idx, masks, rngs, r_samp = self._prep(batch, rng)
        out = jax.lax.stop_gradient(self.model.apply(
            state.cap_params, (V, A), x_idx, masks, deterministic=False,
            rngs=rngs))
        pred, wf, memory, goals, seg, pred_classes = out
        sampled = jax.random.categorical(r_samp, pred, axis=-1).astype(jnp.int32)
        return {
            "sampled": sampled,
            "pred_classes": pred_classes,
            "x_idx": x_idx,
            "loss_mask": (y_idx != PAD),
        }

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("state",))
    def detr_update(self, state: TrainState, batch, rng, lr, sampled, score,
                    target_classes):
        """Combined biased-KL + 0.5*value + Hungarian word loss update.
        ref: train_detr :1033-1083."""
        cfg = self.cfg
        V, A, x_idx, y_idx, masks, rngs, _ = self._prep(batch, rng)
        loss_mask = (y_idx != PAD)
        # num_words counts non-pad in the (noised) input captions (ref :1046)
        num_words = (x_idx != PAD).sum()

        def forward(cap_params):
            return self.model.apply(
                cap_params, (V, A), x_idx, masks, deterministic=False,
                rngs=rngs)

        out0 = jax.lax.stop_gradient(forward(state.cap_params))
        pred0 = out0[0]
        sampled_probs = jnp.take_along_axis(
            jnp.exp(pred0), sampled[..., None], axis=-1)[..., 0]
        wf0, goals0 = out0[1], out0[3]
        expected_value0 = jax.lax.stop_gradient(self.wv_model.apply(
            state.wv_params, (wf0, goals0))[..., 0])
        norm_factor = loss_mask.sum(-1, keepdims=True).astype(jnp.float32)
        if cfg.rl_stabilize:
            score = (score - expected_value0) * loss_mask.astype(jnp.float32)
        amplitude = jax.lax.stop_gradient(
            jnp.clip(score * sampled_probs * norm_factor, 0.0, 1.0))
        score_d = jax.lax.stop_gradient(score)
        vmask = loss_mask.astype(jnp.float32)

        def loss_fn(cap_params, wv_params):
            pred, wf, memory, goals, seg, pred_classes = forward(cap_params)
            div = L.biased_kl(pred, y_idx, sampled, amplitude, 0.7, PAD)
            cap_loss = jnp.sum(div) / (num_words * LOSS_FACTOR)  # ref :1065
            ev = self.wv_model.apply(wv_params, (wf, goals))[..., 0]
            # ref :1076 masks the prediction before the MSE
            value_loss = L.masked_mse(ev * vmask, score_d, vmask)
            word_loss = L.detr_word_loss(pred_classes, target_classes)
            total = cap_loss + 0.5 * value_loss + word_loss  # ref :1080
            return total, (cap_loss, value_loss, word_loss)

        (total, (cap_l, val_l, word_l)), (cap_g, wv_g) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.cap_params, state.wv_params)
        if cfg.grad_clip is not None:
            cap_g = clip_by_global_norm(cap_g, cfg.grad_clip)
        mask = phase_mask(self.groups(state), "worker", self.emb_trainable)
        cap_params, cap_opt = self.cap_optim.update(
            cap_g, state.cap_opt, state.cap_params, mask, lr)
        wv_params, wv_opt = self.val_optim.update(
            wv_g, state.wv_opt, state.wv_params, True, cfg.rl_value_function_lr)
        new_state = state._replace(cap_params=cap_params, cap_opt=cap_opt,
                                   wv_params=wv_params, wv_opt=wv_opt)
        metrics = {"loss": cap_l, "value_loss": val_l, "word_loss": word_l,
                   "total_loss": total}
        return new_state, metrics

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnames=("state",))
    def reinforce_update(self, state: TrainState, batch, rng, lr, sampled,
                         score):
        """REINFORCE variant (--with_reinforce). ref: reinforce_detr
        :696-794 — captioner update only; the reference's value update is
        commented out there."""
        cfg = self.cfg
        V, A, x_idx, y_idx, masks, rngs, _ = self._prep(batch, rng)

        def forward(cap_params):
            return self.model.apply(
                cap_params, (V, A), x_idx, masks, deterministic=False,
                rngs=rngs)

        out0 = jax.lax.stop_gradient(forward(state.cap_params))
        wf0, goals0 = out0[1], out0[3]
        expected_value = jax.lax.stop_gradient(self.wv_model.apply(
            state.wv_params, (wf0, goals0))[..., 0])

        def loss_fn(cap_params):
            pred = forward(cap_params)[0]
            return L.reinforce_loss(jnp.exp(pred), sampled, score,
                                    expected_value)

        loss, grads = jax.value_and_grad(loss_fn)(state.cap_params)
        if cfg.grad_clip is not None:
            grads = clip_by_global_norm(grads, cfg.grad_clip)
        mask = phase_mask(self.groups(state), "worker", self.emb_trainable)
        cap_params, cap_opt = self.cap_optim.update(
            grads, state.cap_opt, state.cap_params, mask, lr)
        new_state = state._replace(cap_params=cap_params, cap_opt=cap_opt)
        return new_state, {"loss": loss}

    # host-side helper for the loop
    def match_targets(self, pred_classes, x_idx) -> np.ndarray:
        return L.hungarian_match(np.asarray(pred_classes), np.asarray(x_idx),
                                 PAD)
