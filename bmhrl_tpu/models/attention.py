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
softmax is f32. A fused Pallas kernel (ops/attention.py) can replace the
XLA path for long sources; both produce identical math.
"""
from __future__ import annotations

from typing import Optional

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

    @nn.compact
    def __call__(
        self,
        Q: jnp.ndarray,
        K: jnp.ndarray,
        V: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        causal: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_model = self.d_model if self.d_model is not None else self.d_model_Q
        assert d_model % self.H == 0
        d_k = d_model // self.H
        B, Sq, _ = Q.shape
        Sk = K.shape[1]

        q = nn.Dense(d_model, dtype=self.dtype, name="linear_Q2d")(Q)
        k = nn.Dense(d_model, dtype=self.dtype, name="linear_K2d")(K)
        v = nn.Dense(d_model, dtype=self.dtype, name="linear_V2d")(V)

        q = q.reshape(B, Sq, self.H, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, Sk, self.H, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(B, Sk, self.H, d_k).transpose(0, 2, 1, 3)

        if mask is not None:
            # (B, 1, Sk) or (B, Sq, Sk) -> (B, 1, ., Sk): same for all heads
            mask = mask[:, None, :, :]

        from bmhrl_tpu.ops import attention as fused

        is_key_pad_mask = mask is None or mask.shape[2] == 1
        if (is_key_pad_mask and not causal
                and fused.flash_qualifies(Sq, Sk, d_k)):
            out = fused.flash_attention(q, k, v, mask).astype(self.dtype)
        else:
            out = scaled_dot_attention(q, k, v, mask, causal=causal)
        out = nn.Dropout(self.dout_p)(out, deterministic=deterministic)

        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, d_model)
        return nn.Dense(self.d_model_Q, dtype=self.dtype, name="linear_d2Q")(out)
