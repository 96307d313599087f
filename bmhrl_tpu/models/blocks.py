"""Transformer building blocks (flax.linen).

Behavioral parity targets (cited per class): model/blocks.py in the reference.
Params are float32; matmul inputs are cast to ``dtype`` (bfloat16 by default)
so the MXU runs at full rate; softmax/logits stay float32.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoid_table(seq_len: int, d_model: int) -> np.ndarray:
    """Positional table with the reference's column convention: even columns
    sin, odd columns cos, each column using its *own* index in the frequency
    exponent (ref: model/blocks.py:95-103)."""
    pos = np.arange(seq_len, dtype=np.float64)[:, None]
    tab = np.zeros((seq_len, d_model), dtype=np.float64)
    even = np.arange(0, d_model, 2)
    odd = np.arange(1, d_model, 2)
    tab[:, even] = np.sin(pos / (10000.0 ** (even / d_model)))
    tab[:, odd] = np.cos(pos / (10000.0 ** (odd / d_model)))
    return tab.astype(np.float32)


class PositionalEncoder(nn.Module):
    """Add sinusoid position encoding then dropout. ref: model/blocks.py:88-112."""

    d_model: int
    dout_p: float
    seq_len: int = 3660

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        S = x.shape[1]
        table = jnp.asarray(sinusoid_table(self.seq_len, self.d_model))[:S]
        x = x + table[None, :, :].astype(x.dtype)
        return nn.Dropout(self.dout_p)(x, deterministic=deterministic)


class VocabularyEmbedder(nn.Module):
    """Token embedding scaled by sqrt(emb_dim). ref: model/blocks.py:35-48.

    GloVe initialization (ref :50-67) is applied post-init by overwriting the
    ``embedding`` param (see data/vocab.py); freezing is an optimizer mask.
    """

    voc_size: int
    emb_dim: int

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.voc_size, self.emb_dim, name="embedding",
                       embedding_init=nn.initializers.normal(1.0))(tokens)
        return emb * jnp.asarray(np.sqrt(self.emb_dim), emb.dtype)


class FeatureEmbedder(nn.Module):
    """Linear feature projection * sqrt(d_model) + ReLU. ref: model/blocks.py:70-85."""

    d_model: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.d_model, dtype=self.dtype, name="embedder")(x)
        x = x * jnp.asarray(np.sqrt(self.d_model), x.dtype)
        return nn.relu(x)


class PositionwiseFeedForward(nn.Module):
    """fc1 -> relu -> dropout -> fc2. ref: model/blocks.py:164-187.

    setup-style (attribute names are the param paths, identical to the
    earlier compact layout, preserving the strict .pt interop surface)."""

    d_model: int
    d_ff: int
    dout_p: float
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.fc1 = nn.Dense(self.d_ff, dtype=self.dtype)
        self.fc2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dout_p)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.relu(self.fc1(x))
        h = self.drop(h, deterministic=deterministic)
        return self.fc2(h)


class ResidualConnection(nn.Module):
    """Prenorm residual: x + dropout(sublayer(LN(x))). ref: model/blocks.py:128-144.

    The sublayer is passed at call time so one module owns the LayerNorm+dropout
    params, mirroring the reference structure. ``pre``/``post`` expose the two
    halves for the incremental decoder, which must thread KV caches through
    the sublayer.
    """

    size: int
    dout_p: float

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.drop = nn.Dropout(self.dout_p)

    def pre(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.norm(x.astype(jnp.float32))

    def post(self, x: jnp.ndarray, res: jnp.ndarray,
             deterministic: bool = True) -> jnp.ndarray:
        return x + self.drop(res, deterministic=deterministic)

    def __call__(
        self,
        x: jnp.ndarray,
        sublayer: Callable[[jnp.ndarray], jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self.post(x, sublayer(self.pre(x)), deterministic)


class BridgeConnection(nn.Module):
    """LN -> Linear -> dropout -> ReLU. ref: model/blocks.py:147-161."""

    out_dim: int
    dout_p: float
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x.astype(jnp.float32))
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(x)
        x = nn.Dropout(self.dout_p)(x, deterministic=deterministic)
        return nn.relu(x)


class AReLU(nn.Module):
    """Learnable ReLU variant used by the segment critic.
    forward: relu(x)*beta - relu(-x)*alpha with alpha clamped to [.01,.99] and
    beta = 1 + sigmoid(beta_raw). ref: model/bm_hrl_agent.py:13-23."""

    alpha_init: float = 0.90
    beta_init: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", lambda k: jnp.array([self.alpha_init], jnp.float32))
        beta = self.param("beta", lambda k: jnp.array([self.beta_init], jnp.float32))
        a = jnp.clip(alpha, 0.01, 0.99)
        b = 1.0 + nn.sigmoid(beta)
        x32 = x.astype(jnp.float32)
        return nn.relu(x32) * b - nn.relu(-x32) * a
