"""Cross-dimensional multi-headed attention.

Parity target: model/multihead_attention.py in the reference —
- separate Q/K/V projections from (possibly different) model dims into a
  shared ``d_model``; H heads; scaled dot product;
- masking via additive -1e9 where mask is False (NOT -inf: all-masked rows
  would NaN, ref :17-22);
- optional causal flag adds a tril mask on the fly (ref :18-21);
- dropout applies to the attention *output*, not the weights (ref :27-28);
- the output is re-projected to the query dim ``d_model_Q`` (ref :89).

TPU notes: QK^T and PV run in bf16 on the MXU with f32 accumulation; the
softmax is f32. A fused Pallas kernel (ops/attention.py) replaces the XLA
path for long sources. ``project_kv`` exposes the K/V projections so the
autoregressive decoder can compute cross-attention keys/values from the
static A/V memories ONCE per clip instead of every generated token.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    causal: bool = False,
) -> jnp.ndarray:
    """q,k,v: (B, H, S, d_k); mask broadcastable to (B, 1, 1|Sq, Sk)."""
    d_k = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    if causal:
        Sq, Sk = scores.shape[-2], scores.shape[-1]
        tril = jnp.tril(jnp.ones((Sq, Sk), dtype=bool))
        scores = jnp.where(tril[None, None], scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )


class MultiheadedAttention(nn.Module):
    d_model_Q: int
    d_model_K: int
    d_model_V: int
    H: int
    dout_p: float = 0.0
    d_model: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        d_model = self.d_model if self.d_model is not None else self.d_model_Q
        assert d_model % self.H == 0
        self._d = d_model
        self._d_k = d_model // self.H
        self.linear_Q2d = nn.Dense(d_model, dtype=self.dtype,
                                   name="linear_Q2d")
        self.linear_K2d = nn.Dense(d_model, dtype=self.dtype,
                                   name="linear_K2d")
        self.linear_V2d = nn.Dense(d_model, dtype=self.dtype,
                                   name="linear_V2d")
        self.linear_d2Q = nn.Dense(self.d_model_Q, dtype=self.dtype,
                                   name="linear_d2Q")
        self.dropout = nn.Dropout(self.dout_p)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        B, S, _ = x.shape
        return x.reshape(B, S, self.H, self._d_k).transpose(0, 2, 1, 3)

    def project_kv(self, K: jnp.ndarray, V: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Headed key/value projections (B, H, Sk, d_k) for reuse across
        decode steps (the memories are static per clip)."""
        return self._heads(self.linear_K2d(K)), self._heads(self.linear_V2d(V))

    def attend_step(self, q_in, kv_in, k_cache, v_cache, t,
                    deterministic: bool = True):
        """Single-position causal attention with a KV cache.

        q_in: (B, 1, Dq); kv_in: (B, 1, Dk) — projected and written into
        cache slot ``t``; attention runs over cache positions <= t.
        Returns (out (B, 1, Dq), k_cache, v_cache)."""
        import jax

        q = self._heads(self.linear_Q2d(q_in))  # (B, H, 1, d_k)
        k_t, v_t = self.project_kv(kv_in, kv_in)  # (B, H, 1, d_k)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_t.astype(k_cache.dtype), t, axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_t.astype(v_cache.dtype), t, axis=2)
        L = k_cache.shape[2]
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_cache,
            preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(self._d_k, jnp.float32))
        pos = jnp.arange(L)[None, None, None, :]
        scores = jnp.where(pos <= t, scores, NEG_INF)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
        out = self.dropout(out, deterministic=deterministic)
        B = q_in.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, self._d)
        return self.linear_d2Q(out), k_cache, v_cache

    def kv_cache_shape(self, B: int, L: int):
        return (B, self.H, L, self._d_k)

    def __call__(
        self,
        Q: jnp.ndarray,
        K: Optional[jnp.ndarray],
        V: Optional[jnp.ndarray],
        mask: Optional[jnp.ndarray],
        causal: bool = False,
        deterministic: bool = True,
        precomputed_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        B, Sq, _ = Q.shape
        q = self._heads(self.linear_Q2d(Q))
        if precomputed_kv is not None:
            k, v = precomputed_kv
        else:
            k, v = self.project_kv(K, V)
        Sk = k.shape[2]

        if mask is not None:
            # (B, 1, Sk) or (B, Sq, Sk) -> (B, 1, ., Sk): same for all heads
            mask = mask[:, None, :, :]

        from bmhrl_tpu.ops import attention as fused

        is_key_pad_mask = mask is None or mask.shape[2] == 1
        if (is_key_pad_mask and not causal
                and fused.flash_qualifies(Sq, Sk, self._d_k)):
            out = fused.flash_attention(q, k, v, mask).astype(self.dtype)
        else:
            out = scaled_dot_attention(q, k, v, mask, causal=causal)
        out = self.dropout(out, deterministic=deterministic)

        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, self._d)
        return self.linear_d2Q(out)
