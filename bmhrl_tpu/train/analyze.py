"""Diagnostic "verbose" mode: roll out the model, compare plain / biased /
weighted KL losses per sample, and print the top outliers.

Parity target: epoch_loops/captioning_bmrl_loops.py analyze_bimodal_div
(:915-980) + w_b_n_kl (:377-406) + utilities/analyze.py get_top_outliers
(intent: rank sentences by |biased - plain| divergence; the reference's L1
reduction collapses to a scalar — fixed toward intent here).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.data.vocab import PAD
from bmhrl_tpu.train import losses as L
from bmhrl_tpu.train.steps import StepFactory, TrainState
from bmhrl_tpu.utils.logging import log_stderr


def get_top_outliers(biased_l: np.ndarray, plain_l: np.ndarray, top_k: int
                     ) -> np.ndarray:
    """Indices of the samples with the largest mean |biased - plain| loss."""
    per_sentence = np.abs(biased_l - plain_l).mean(axis=-1)
    return np.argsort(-per_sentence)[:top_k]


def analyze_batch(
    sf: StepFactory,
    state: TrainState,
    scorer,
    batch_dev: Dict,
    captions,
    itos,
    rng,
    norm_factor: float = 20.0,
    top_k: int = 1,
) -> Dict[str, np.ndarray]:
    """One diagnostic pass over a batch; returns the per-sample loss
    decomposition and prints outliers (ref :947-975)."""
    roll = sf.rl_rollout(state, batch_dev, rng, train_worker=True)
    sampled = np.asarray(roll["sampled"])
    score, rewards = sf_scorer_worker(scorer, sampled, captions)

    # forward once more for the logits (same rngs as the rollout)
    V = batch_dev["rgb"] + batch_dev["flow"]
    A = batch_dev["audio"]
    cap = batch_dev["caption_idx"]
    x_idx, y_idx = cap[:, :-1], cap[:, 1:]
    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.train.steps import synonym_noise

    rngs = jax.random.split(rng, 5)
    x_noised = synonym_noise(rngs[1], x_idx, sf.voc_size)
    masks = make_masks({"rgb": batch_dev["rgb"], "audio": A}, x_noised,
                       "audio_video", PAD)
    pred = sf.model.apply(
        state.cap_params, (V, A), x_noised, masks, deterministic=False,
        exploration=False, rngs={"dropout": rngs[2], "noise": rngs[3]})[0]

    loss_mask = np.asarray(y_idx != PAD)
    sampled_probs = np.asarray(jnp.take_along_axis(
        jnp.exp(pred), jnp.asarray(sampled)[..., None], axis=-1)[..., 0])
    nf = loss_mask.sum(-1, keepdims=True)
    amplitude = np.clip(score * sampled_probs * nf, 0.0, 1.0)

    plain = np.asarray(L.label_smoothing(pred, y_idx, 0.7, PAD)).sum(-1)
    biased = np.asarray(L.biased_kl(
        pred, y_idx, jnp.asarray(sampled), jnp.asarray(amplitude), 0.7,
        PAD)).sum(-1)
    # weighted KL: plain divergence scaled by the clamped amplitude floor
    # (ref get_weighted_amplitude :419-424)
    w_amp = np.clip(amplitude, 1.0 / norm_factor, 1.0)
    weighted = plain / w_amp

    outliers = get_top_outliers(biased, plain, top_k)
    for idx in outliers:
        hyp = " ".join(itos[i] for i in sampled[idx])
        log_stderr("--" * 25)
        log_stderr(f"GT:\t{captions[idx]}")
        log_stderr(f"HY:\t{hyp}")
        log_stderr(f"Prob.:\t{sampled_probs[idx]}")
        log_stderr(f"Ampl.:\t{amplitude[idx]}")
        log_stderr(f"Scr.:\t{score[idx]}")
        log_stderr("--" * 10)
        log_stderr(f"L:\t{plain[idx]}")
        log_stderr(f"BL:\t{biased[idx]}")
        log_stderr(f"WL:\t{weighted[idx]}")
    return {"plain": plain, "biased": biased, "weighted": weighted,
            "score": score, "sampled": sampled, "outliers": outliers}


def sf_scorer_worker(scorer, sampled, captions):
    score, rewards = scorer.delta_worker(sampled, captions)
    return np.asarray(score), rewards
