"""Training losses as pure functions.

Parity targets: loss/label_smoothing.py, loss/biased_kl.py in the reference.
All losses take log-probabilities (the model emits log_softmax) and return
elementwise tensors; callers reduce (sum / n_tokens) to match the reference
epoch loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy


def _kl_div_elementwise(pred_log: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """torch F.kl_div(pred, dist, reduction='none') = dist*(log dist - pred),
    with 0*log(0) = 0."""
    return xlogy(dist, dist) - dist * pred_log


def label_smoothing(
    pred_log: jnp.ndarray, target: jnp.ndarray, smoothing: float, pad_idx: int
) -> jnp.ndarray:
    """KL(pred || smoothed one-hot). ref: loss/label_smoothing.py:12-32.

    - uniform prior smoothing/(V-2); ground truth gets 1-smoothing;
    - the pad column is zeroed; rows whose target is pad are zeroed.
    pred_log: (B, S, V) log-probs; target: (B, S) ids -> (B, S, V).
    """
    B, S, V = pred_log.shape
    dist = jnp.full((B, S, V), smoothing / (V - 2), pred_log.dtype)
    one_hot = jax.nn.one_hot(target, V, dtype=pred_log.dtype)
    dist = dist * (1.0 - one_hot) + one_hot * (1.0 - smoothing)
    dist = dist.at[:, :, pad_idx].set(0.0)
    dist = jnp.where((target == pad_idx)[:, :, None], 0.0, dist)
    return _kl_div_elementwise(pred_log, dist)


def biased_kl(
    pred_log: jnp.ndarray,
    target: jnp.ndarray,
    sampled: jnp.ndarray,
    amplitude: jnp.ndarray,
    smoothing: float,
    pad_idx: int,
) -> jnp.ndarray:
    """Label smoothing with a reward-weighted spike on the sampled token.

    ref: loss/biased_kl.py:22-53 — GT mass is (1-ls)*(1-amplitude), the
    sampled token receives amplitude*(1-ls) (added AFTER the pad column is
    zeroed, so a pad-sample keeps its spike — exact reference order), rows
    whose target is pad are zeroed, and the final divergence uses dist+1e-8.
    """
    B, S, V = pred_log.shape
    trg_factor = 1.0 - smoothing
    trg_ampl = trg_factor * (1.0 - amplitude)  # (B, S)
    normed_offset = amplitude * trg_factor

    one_hot_t = jax.nn.one_hot(target, V, dtype=pred_log.dtype)
    dist = jnp.full((B, S, V), smoothing / (V - 2), pred_log.dtype)
    # scatter GT amplitude (overwrites the uniform prior at the target id)
    dist = dist * (1.0 - one_hot_t) + one_hot_t * trg_ampl[:, :, None]
    dist = dist.at[:, :, pad_idx].set(0.0)
    # biased spike on the sampled token (scatter = overwrite in the reference
    # biased_dist, then added to dist)
    one_hot_s = jax.nn.one_hot(sampled, V, dtype=pred_log.dtype)
    dist = dist + one_hot_s * normed_offset[:, :, None]
    dist = jnp.where((target == pad_idx)[:, :, None], 0.0, dist)
    return _kl_div_elementwise(pred_log, dist + 1e-8)


def reinforce_loss(
    pred_probs: jnp.ndarray,
    action: jnp.ndarray,
    value: jnp.ndarray,
    critic_value: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Actor-critic: -mean(detached advantage * log pi(a)) + mean(advantage^2).
    ref: loss/biased_kl.py:61-81 (entropy term disabled there too)."""
    pred_probs = jnp.clip(pred_probs, eps, 1.0 - eps)
    V = pred_probs.shape[-1]
    one_hot = jax.nn.one_hot(action, V, dtype=pred_probs.dtype)
    policy_action = jnp.sum(one_hot * pred_probs, axis=-1)
    advantage = value - critic_value
    policy_loss = -jnp.mean(
        jax.lax.stop_gradient(advantage) * jnp.log(policy_action))
    value_loss = jnp.mean(advantage ** 2)
    return policy_loss + value_loss


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSELoss(reduction='none') * mask, then mean — the value-net loss shape
    used throughout the reference epoch loops."""
    return jnp.mean((pred - target) ** 2 * mask)


# ---------------------------------------------------------------------------
# DETR word-set loss (host matching + device CE)
# ---------------------------------------------------------------------------


def hungarian_match(pred_logits, targets, pad_idx: int = 1):
    """Host-side optimal assignment of DETR queries to caption words.
    ref: loss/hungarian_matcher.py:5-59 — cost is -softmax_prob[target word],
    one assignment per batch row over its non-pad tokens.

    pred_logits: np (B, Q, C); targets: np (B, L) token ids.
    Returns target_classes np (B, Q) int: matched word id per query, or the
    "no word" class C-1 for unmatched queries (the layout loss_labels builds,
    ref: captioning_bmrl_loops.py:1114-1129)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment
    from scipy.special import softmax

    pred_logits = np.asarray(pred_logits)
    targets = np.asarray(targets)
    B, Q, C = pred_logits.shape
    num_classes = C - 1
    out = np.full((B, Q), num_classes, np.int64)
    probs = softmax(pred_logits, axis=-1)
    for b in range(B):
        tgt = targets[b][targets[b] != pad_idx]
        if len(tgt) == 0:
            continue
        cost = -probs[b][:, tgt]  # (Q, T)
        qi, ti = linear_sum_assignment(cost)
        out[b, qi] = tgt[ti]
    return out


def detr_word_loss(pred_logits: jnp.ndarray, target_classes: jnp.ndarray,
                   eos_coef: float = 0.1) -> jnp.ndarray:
    """Weighted CE over query classifications; the "no word" class is
    down-weighted by eos_coef. torch F.cross_entropy(weight=empty_weight)
    semantics: sum(w_t * nll_t) / sum(w_t).
    ref: captioning_bmrl_loops.py:1114-1129."""
    B, Q, C = pred_logits.shape
    num_classes = C - 1
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = jnp.where(target_classes == num_classes, eos_coef, 1.0)
    return jnp.sum(w * nll) / jnp.sum(w)
