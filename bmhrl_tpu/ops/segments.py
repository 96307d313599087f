"""Vectorized segment/goal/discounting ops.

The reference implements these with Python loops over ``torch.nonzero`` on the
host (ref: model/bm_hrl_agent.py:415-429, metrics/batched_meteor.py:19-36,
metrics/util.py:54-89). Here they are closed-form jnp expressions with static
shapes so they fuse into the jitted step. Sequences are short (L <= ~64), so
O(L^2) einsum formulations are cheap and MXU/VPU friendly.

Conventions: ``segment_mask`` is (B, L) {0,1}; a 1 at position j marks the
*end* (boundary) of a segment covering positions (prev boundary, j].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def next_boundary(segment_mask: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest boundary at or after each position; L if none.

    segment_mask: (B, L) int/bool -> (B, L) int32.
    """
    B, L = segment_mask.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    idx = jnp.where(segment_mask.astype(bool), pos, jnp.int32(L))
    # reversed cumulative min: min over k >= i
    return jax.lax.cummin(idx, axis=1, reverse=True)


def expand_goals(x: jnp.ndarray, segment_mask: jnp.ndarray) -> jnp.ndarray:
    """Broadcast each boundary's goal vector back over its segment.

    Positions after the last boundary become 0 (the reference zeroes those
    tails for every batch row except the last — a loop-finalization bug; we
    zero all rows, the evident intent). ref: model/bm_hrl_agent.py:415-429.

    x: (B, L, D); segment_mask: (B, L) -> (B, L, D).
    """
    B, L, D = x.shape
    nb = next_boundary(segment_mask)  # (B, L)
    gathered = jnp.take_along_axis(x, jnp.minimum(nb, L - 1)[:, :, None], axis=1)
    return jnp.where((nb < L)[:, :, None], gathered, 0.0)


def segment_sum_expand(reward: jnp.ndarray, segment_mask: jnp.ndarray) -> jnp.ndarray:
    """Sum step rewards within each segment; write the sum over the segment.

    Tail positions (after the last boundary) get 0.
    ref: metrics/batched_meteor.py:19-36 (segment_reward).

    reward, segment_mask: (B, L) -> (B, L).
    """
    B, L = reward.shape
    nb = next_boundary(segment_mask)
    same = (nb[:, :, None] == nb[:, None, :]) & (nb[:, :, None] < L)
    return jnp.einsum("bik,bk->bi", same.astype(reward.dtype), reward, precision="highest")


def discounted_return(delta: jnp.ndarray, gamma: float, n_step: int = 100) -> jnp.ndarray:
    """Forward-discounted return: out[i] = sum_{k>=i, k-i<n_step} gamma^(k-i) delta[k].

    Replaces the reference's triple-nested Python loop
    (ref: metrics/util.py:54-65) with a Toeplitz matmul.
    """
    B, L = delta.shape
    i = jnp.arange(L)[:, None]
    k = jnp.arange(L)[None, :]
    d = k - i
    valid = (d >= 0) & (d < n_step)
    gam = jnp.asarray(gamma, dtype=delta.dtype)
    T = jnp.where(valid, jnp.power(gam, jnp.maximum(d, 0).astype(delta.dtype)), 0.0)
    return jnp.einsum("ik,bk->bi", T, delta, precision="highest")


def discounted_segment_return(
    reward: jnp.ndarray, segment_mask: jnp.ndarray, gamma: float
) -> jnp.ndarray:
    """Discounted return over *segment boundaries*, expanded over segments.

    For boundary ranks m < n, boundary m receives gamma^(n-m) * reward[j_n]
    summed over subsequent boundaries j_n in the same row; each position then
    takes its next boundary's value; tails are 0.
    ref: metrics/util.py:66-87 (discontinue_reward with segments).

    reward here is typically the *boundary-valued* segment sum (the value at a
    boundary position is used; other positions are ignored via the mask).
    """
    B, L = reward.shape
    m_ = segment_mask.astype(reward.dtype)
    c = jnp.cumsum(m_, axis=-1)  # rank (1-based) at boundaries
    nb = next_boundary(segment_mask)
    # boundaries strictly before i:
    m_before = c - m_
    i = jnp.arange(L)[:, None]
    k = jnp.arange(L)[None, :]
    after = (k >= i)[None, :, :]
    expo = c[:, None, :] - m_before[:, :, None] - 1.0  # (B, i, k)
    gam = jnp.asarray(gamma, dtype=reward.dtype)
    w = jnp.where(
        after & (m_[:, None, :] > 0),
        jnp.power(gam, jnp.maximum(expo, 0.0)),
        0.0,
    )
    out = jnp.einsum("bik,bk->bi", w, reward * m_, precision="highest")
    return jnp.where(nb < L, out, 0.0)
