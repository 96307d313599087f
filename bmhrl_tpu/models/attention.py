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

    def attend_step_shared(self, h, k_cache, v_cache, t,
                           deterministic: bool = True, key_mask=None):
        """Single-position causal self-attention with a KV cache (query and
        key/value are the SAME input ``h``): the Q/K/V projections collapse
        into one ``h @ [W_Q; W_K; W_V]`` matmul (weight concat is
        loop-invariant and hoisted out of the decode while_loop).
        Token-exact with __call__'s causal row t up to f32 reassociation.

        ``key_mask``: optional (B, L) validity of cached positions — the
        full-buffer path's c_mask excludes PAD tokens from the keys, so the
        incremental path must too (a degenerate model can emit PAD
        mid-caption)."""
        import jax

        w, b = self.merged_qkv_params()
        qkv = h.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)
        q, k_t, v_t = (self._heads(y) for y in jnp.split(qkv, 3, axis=-1))
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
        ok = pos <= t
        if key_mask is not None:
            ok = ok & key_mask[:, None, None, :]
        scores = jnp.where(ok, scores, NEG_INF)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
        out = self.dropout(out, deterministic=deterministic)
        B = h.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, self._d)
        return self.linear_d2Q(out), k_cache, v_cache

    def attend_step_qkv(self, q_in, k_in, v_in, k_cache, v_cache, t,
                        deterministic: bool = True, key_mask=None):
        """Generic single-position causal attention with a KV cache where
        query/key/value come from (possibly) different inputs — the DETR
        decoder's self-attention projects Q and K from the pos-encoded
        stream but V from the raw stream (models/detr.py). Writes the
        projected k/v of position t, attends keys <= t (AND key_mask when
        given). q_in/k_in/v_in: (B, 1, D)."""
        import jax

        q = self._heads(self.linear_Q2d(q_in.astype(self.dtype)))
        k_t = self._heads(self.linear_K2d(k_in.astype(self.dtype)))
        v_t = self._heads(self.linear_V2d(v_in.astype(self.dtype)))
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
        ok = pos <= t
        if key_mask is not None:
            ok = ok & key_mask[:, None, None, :]
        scores = jnp.where(ok, scores, NEG_INF)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
        out = self.dropout(out, deterministic=deterministic)
        B = q_in.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, self._d)
        return self.linear_d2Q(out), k_cache, v_cache

    def folded_weights(self):
        """Fold the K/V projections out of the per-token path (associativity):

        scores^h = (q W_Q^h + b_q^h) (M W_K^h + b_k^h)^T
                 = q (W_Q^h W_K^h,T) M^T + b_q^h W_K^h,T M^T + const(key)
        where the key-constant term is uniform across keys, hence dropped
        (softmax-invariant), and
        out = sum_h softmax^h M (W_V^h W_O^h) + (b_v W_O + b_o)
        using sum_j p_j = 1 to fold the value bias.

        Attention then runs against the RAW memory M instead of
        precomputed K/V caches: per-token HBM traffic drops from
        2*d_model to d_raw bytes per key (16x for the 128-d audio memory,
        2x for the 1024-d video memory) and the (B, H, Sk, d_k) caches
        are never materialized. Returns f32
        (W_qk (H, Dq, Draw), b_qk (H, Draw), W_vo (H, Draw, Dout), b_vo).
        """
        H, dk = self.H, self._d_k
        pq = self.linear_Q2d.variables["params"]
        pk = self.linear_K2d.variables["params"]
        pv = self.linear_V2d.variables["params"]
        po = self.linear_d2Q.variables["params"]
        wq = pq["kernel"].astype(jnp.float32).reshape(-1, H, dk)
        wk = pk["kernel"].astype(jnp.float32).reshape(-1, H, dk)
        wv = pv["kernel"].astype(jnp.float32).reshape(-1, H, dk)
        wo = po["kernel"].astype(jnp.float32).reshape(H, dk, -1)
        bq = pq["bias"].astype(jnp.float32).reshape(H, dk)
        bv = pv["bias"].astype(jnp.float32).reshape(H, dk)
        w_qk = jnp.einsum("qhd,khd->hqk", wq, wk)
        b_qk = jnp.einsum("hd,khd->hk", bq, wk)
        w_vo = jnp.einsum("khd,hdo->hko", wv, wo)
        b_vo = (jnp.einsum("hd,hdo->o", bv, wo)
                + po["bias"].astype(jnp.float32))
        return w_qk, b_qk, w_vo, b_vo

    def folded_q(self, q_in: jnp.ndarray) -> jnp.ndarray:
        """Effective queries for folded attention: (B, 1|·, Dq) ->
        (B, H, Draw). The raw-memory contraction itself is done by the
        caller (ops.attention.folded_attend) so it can batch several
        attention groups into one kernel."""
        w_qk, b_qk, _, _ = self.folded_weights()
        q = q_in.reshape(q_in.shape[0], -1).astype(self.dtype)
        return (jnp.einsum("bq,hqk->bhk", q, w_qk.astype(self.dtype),
                           preferred_element_type=jnp.float32) + b_qk[None])

    def folded_out(self, ctx: jnp.ndarray) -> jnp.ndarray:
        """Folded value+output projection: ctx (B, H, Draw) -> (B, Dq_out)."""
        _, _, w_vo, b_vo = self.folded_weights()
        return (jnp.einsum("bhk,hko->bo", ctx.astype(self.dtype),
                           w_vo.astype(self.dtype),
                           preferred_element_type=jnp.float32) + b_vo[None])

    @property
    def folded_scale(self) -> float:
        return 1.0 / float(self._d_k) ** 0.5

    def attend_folded(self, q_in, mem, mask, deterministic: bool = True):
        """Single-position cross-attention against the raw memory ``mem``
        (B, Sk, Draw) with K/V/out projections folded (folded_weights).
        q_in: (B, 1, Dq); mask: (B, 1, Sk) key-pad mask. Token-exact with
        the precomputed-KV full path up to bf16/f32 reassociation."""
        w_qk, b_qk, w_vo, b_vo = self.folded_weights()
        q = q_in[:, 0].astype(self.dtype)
        q_eff = (jnp.einsum("bq,hqk->bhk", q, w_qk.astype(self.dtype),
                            preferred_element_type=jnp.float32)
                 + b_qk[None])
        scores = jnp.einsum(
            "bhk,bsk->bhs", q_eff.astype(self.dtype), mem.astype(self.dtype),
            preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(self._d_k, jnp.float32))
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        probs = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhs,bsk->bhk", probs.astype(self.dtype),
                         mem.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        ctx = self.dropout(ctx, deterministic=deterministic)
        out = (jnp.einsum("bhk,hko->bo", ctx.astype(self.dtype),
                          w_vo.astype(self.dtype),
                          preferred_element_type=jnp.float32)
               + b_vo[None])
        return out[:, None, :].astype(self.dtype)

    def kv_cache_shape(self, B: int, L: int):
        return (B, self.H, L, self._d_k)

    def merged_qkv_params(self):
        """Concatenated (W, b) of the Q/K/V projections, f32: one
        (d_in, 3*d_model) matmul produces all three un-headed projections
        (exact — kernel concat). Used by the fused encoder path."""
        pq = self.linear_Q2d.variables["params"]
        pk = self.linear_K2d.variables["params"]
        pv = self.linear_V2d.variables["params"]
        w = jnp.concatenate([pq["kernel"], pk["kernel"], pv["kernel"]],
                            axis=1)
        b = jnp.concatenate([pq["bias"], pk["bias"], pv["bias"]])
        return w, b

    def _project_qkv(self, Q, K, V):
        """Un-headed (B, S, d_model) Q/K/V projections, merged into fewer
        matmuls when the inputs alias (always the case in this model: self
        attention passes the same tensor three times, cross attention the
        same memory twice). Merging reads the activation from HBM once
        instead of 2-3x; each output column is the same dot product as in
        the separate matmuls (kernel concat is exact). Init time takes the
        plain per-module path so every Dense gets its params created."""
        if self.is_initializing() or (K is not V):
            return self.linear_Q2d(Q), self.linear_K2d(K), self.linear_V2d(V)
        pk = self.linear_K2d.variables["params"]
        pv = self.linear_V2d.variables["params"]
        dt = self.dtype
        if Q is K:
            w, b = self.merged_qkv_params()
            qkv = Q.astype(dt) @ w.astype(dt) + b.astype(dt)
            return tuple(jnp.split(qkv, 3, axis=-1))
        w = jnp.concatenate([pk["kernel"], pv["kernel"]], axis=1).astype(dt)
        b = jnp.concatenate([pk["bias"], pv["bias"]]).astype(dt)
        kv = K.astype(dt) @ w + b
        k3, v3 = jnp.split(kv, 2, axis=-1)
        return self.linear_Q2d(Q), k3, v3

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

        from bmhrl_tpu.ops import attention as fused

        # (B, 1, Sk) masks are key pad masks, identical across query rows
        is_key_pad_mask = mask is None or mask.shape[1] == 1
        if precomputed_kv is None:
            Sk = K.shape[1]
            if (is_key_pad_mask and not causal
                    and fused.flash_qualifies(Sq, Sk, self._d_k)):
                # fused path: un-headed projections feed the Pallas kernel
                # directly — no (B,H,S,d) transposes, scores stay in VMEM
                q3, k3, v3 = self._project_qkv(Q, K, V)
                key_mask = None if mask is None else mask[:, 0, :]
                out = fused.flash_attention_bsd(
                    q3, k3, v3, key_mask, self.H).astype(self.dtype)
                out = self.dropout(out, deterministic=deterministic)
                return self.linear_d2Q(out)
            q3, k3, v3 = self._project_qkv(Q, K, V)
            q, k, v = self._heads(q3), self._heads(k3), self._heads(v3)
        else:
            q = self._heads(self.linear_Q2d(Q))
            k, v = precomputed_kv

        if mask is not None:
            # (B, 1, Sk) or (B, Sq, Sk) -> (B, 1, ., Sk): same for all heads
            mask = mask[:, None, :, :]

        out = scaled_dot_attention(q, k, v, mask, causal=causal)
        out = self.dropout(out, deterministic=deterministic)

        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, self._d)
        return self.linear_d2Q(out)
