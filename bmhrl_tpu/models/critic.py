"""Frozen SegmentCritic: 4-layer LSTM(300->600) -> AReLU -> 2-layer GRU(600)
-> AReLU -> Linear(600->1). ref: model/bm_hrl_agent.py:186-215.

Cells are implemented with torch's exact gate math and parameter layout
(w_ih: (4H, in) with gate order [i, f, g, o]; GRU [r, z, n] with
n = tanh(W_in x + b_in + r * (W_hn h + b_hn))) so pretrained ``critic.cp``
PyTorch weights map 1:1 (utils/checkpoint.py). The time loop is a
``lax.scan``; carries are (B, H). The critic is frozen: its output is wrapped
in ``stop_gradient`` (ref :206 torch.no_grad) and its params are masked out of
every optimizer.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bmhrl_tpu.models.blocks import AReLU


def _rnn_param(shape):
    # torch nn.LSTM/GRU default init: U(-1/sqrt(H), 1/sqrt(H))
    def init(key):
        h = shape[0] // 4 if len(shape) > 0 else 1
        bound = 1.0 / jnp.sqrt(jnp.asarray(max(h, 1), jnp.float32))
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    """Single torch-semantics LSTM layer over (B, L, D_in) -> (B, L, H)."""

    d_in: int
    d_hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.d_hidden
        w_ih = self.param("weight_ih", _rnn_param((4 * H, self.d_in)))
        w_hh = self.param("weight_hh", _rnn_param((4 * H, H)))
        b_ih = self.param("bias_ih", _rnn_param((4 * H,)))
        b_hh = self.param("bias_hh", _rnn_param((4 * H,)))
        B = x.shape[0]
        xg = jnp.einsum("bld,gd->blg", x.astype(jnp.float32), w_ih) + b_ih

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ w_hh.T + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        _, hs = jax.lax.scan(step, init, xg.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


class GRULayer(nn.Module):
    """Single torch-semantics GRU layer over (B, L, D_in) -> (B, L, H)."""

    d_in: int
    d_hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.d_hidden
        w_ih = self.param("weight_ih", _rnn_param((3 * H, self.d_in)))
        w_hh = self.param("weight_hh", _rnn_param((3 * H, H)))
        b_ih = self.param("bias_ih", _rnn_param((3 * H,)))
        b_hh = self.param("bias_hh", _rnn_param((3 * H,)))
        B = x.shape[0]
        xg = jnp.einsum("bld,gd->blg", x.astype(jnp.float32), w_ih) + b_ih

        def step(h, xt):
            hg = h @ w_hh.T + b_hh
            xr, xz, xn = jnp.split(xt, 3, axis=-1)
            hr, hz, hn = jnp.split(hg, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        init = jnp.zeros((B, H), jnp.float32)
        _, hs = jax.lax.scan(step, init, xg.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


class SegmentCritic(nn.Module):
    """Frozen pretrained segment-boundary detector. ref: bm_hrl_agent.py:186-215."""

    d_model_caps: int = 300

    @nn.compact
    def __call__(self, embedded: jnp.ndarray) -> jnp.ndarray:
        D = self.d_model_caps
        H = 2 * D
        h = embedded.astype(jnp.float32)
        for l in range(4):
            h = LSTMLayer(D if l == 0 else H, H, name=f"lstm_l{l}")(h)
        h = AReLU(name="relu")(h)
        for l in range(2):
            h = GRULayer(H, H, name=f"gru_l{l}")(h)
        h = AReLU(name="relu2")(h)
        out = nn.Dense(1, dtype=jnp.float32, name="lin")(h)
        return jax.lax.stop_gradient(out)
