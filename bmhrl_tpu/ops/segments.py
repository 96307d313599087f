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


def _later_rows_have(has_boundary: jnp.ndarray) -> jnp.ndarray:
    """later[b] = any(has_boundary[b+1:]). has_boundary: (B,) bool."""
    hb = has_boundary.astype(jnp.int32)
    suffix = jnp.cumsum(hb[::-1])[::-1]  # inclusive suffix count
    return (suffix - hb) > 0


def expand_goals(x: jnp.ndarray, segment_mask: jnp.ndarray) -> jnp.ndarray:
    """Broadcast each boundary's goal vector back over its segment,
    reproducing the reference loop's EXACT finalization semantics
    (model/bm_hrl_agent.py:415-429), verified logit-level against the torch
    model (tests/test_torch_parity*.py). The in-place loop over
    ``torch.nonzero`` implies, for a row b:

    - boundary at position j: positions (prev boundary, j] get x[b, j];
    - positions after the row's LAST boundary are zeroed only when a LATER
      row also has a boundary (the zeroing happens as a side effect of
      advancing to that row); the last boundary-row keeps its raw tail;
    - rows with NO boundary are never written — they keep raw x — EXCEPT
      row 0, which is fully zeroed whenever any boundary exists in a later
      row (``old_b`` initializes to 0, so the first advance zeroes row 0);
    - an all-zero mask returns x unchanged.

    x: (B, L, D); segment_mask: (B, L) -> (B, L, D).
    """
    B, L, D = x.shape
    m = segment_mask.astype(bool)
    nb = next_boundary(m)  # (B, L)
    gathered = jnp.take_along_axis(x, jnp.minimum(nb, L - 1)[:, :, None], axis=1)
    hb = m.any(axis=1)  # (B,) row has a boundary
    later = _later_rows_have(hb)
    is_tail = (nb >= L)[:, :, None]
    # boundary rows: expanded values; tail zeroed only if a later row has one
    tail_val = jnp.where(later[:, None, None], jnp.zeros_like(x), x)
    boundary_rows = jnp.where(is_tail, tail_val, gathered)
    # boundary-less rows: raw, except the row-0 quirk
    row0_zeroed = (~hb) & (jnp.arange(B) == 0) & jnp.any(hb)
    no_boundary_rows = jnp.where(row0_zeroed[:, None, None],
                                 jnp.zeros_like(x), x)
    return jnp.where(hb[:, None, None], boundary_rows, no_boundary_rows)


def frontier_goal(x_t: jnp.ndarray, label_t: jnp.ndarray,
                  has_boundary: jnp.ndarray) -> jnp.ndarray:
    """expand_goals at a single decode-frontier position t.

    Given each row's raw goal ``x_t`` (B, 1, D), its critic label at t, and
    whether the row has any boundary at positions <= t (INCLUDING t), applies
    the reference finalization semantics row-wise: a row keeps its raw goal
    iff t is itself a boundary, OR the row is the last boundary-row (raw
    tail), OR it is a boundary-less row other than the zeroed row 0."""
    B = x_t.shape[0]
    hb = has_boundary.astype(bool)
    lab = label_t.astype(bool)
    later = _later_rows_have(hb)
    any_hb = jnp.any(hb)
    row0_zeroed = (jnp.arange(B) == 0) & any_hb
    keep_raw = lab | (hb & ~later) | (~hb & ~row0_zeroed)
    return jnp.where(keep_raw[:, None, None], x_t, jnp.zeros_like(x_t))


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


def frontier_exploration_noise(x_full, t, d_goal, rng,
                               mean_factor, std_factor):
    """Manager exploration noise at the decode frontier, with statistics
    over positions <= t of the goal-linear activations — exactly the
    reference's growing-buffer stats (ref bm_hrl_agent.py:444-452).
    Shared by the bimodal and unimodal agents' decode_frontier.
    x_full: (B, L, d_goal) f32; returns a (d_goal,) noise vector."""
    import jax

    pos = jnp.arange(x_full.shape[1])[None, :, None]
    valid = (pos <= t).astype(jnp.float32)
    cnt = jnp.asarray(t + 1, jnp.float32) * x_full.shape[0] * d_goal
    mean = jnp.sum(x_full * valid) / cnt
    var = jnp.sum((x_full - mean) ** 2 * valid) / cnt
    mean = jax.lax.stop_gradient(mean / mean_factor)
    std = jax.lax.stop_gradient(jnp.sqrt(var) / std_factor)
    return (jax.random.normal(rng, (d_goal,)) * std + mean - 0.5 * mean)
