"""Frozen SegmentCritic: 4-layer LSTM(300->600) -> AReLU -> 2-layer GRU(600)
-> AReLU -> Linear(600->1). ref: model/bm_hrl_agent.py:186-215.

Cells are implemented with torch's exact gate math and parameter layout
(w_ih: (4H, in) with gate order [i, f, g, o]; GRU [r, z, n] with
n = tanh(W_in x + b_in + r * (W_hn h + b_hn))) so pretrained ``critic.cp``
PyTorch weights map 1:1 (utils/checkpoint.py).

Two evaluation paths over the same params:
- ``__call__``: full-sequence ``lax.scan`` (training / teacher forcing);
- ``init_state`` + ``step``: incremental single-token stepping for the
  autoregressive decoder — the RNN state carries across decode steps, so
  each generated token costs 6 cell updates instead of a full 6-layer
  rescan of the whole buffer (critical on TPU, where a scan nested inside
  the decode loop both compiles and dispatches pathologically).

The critic is frozen: outputs are wrapped in ``stop_gradient``
(ref :206 torch.no_grad) and its params are masked out of every optimizer.
"""
from __future__ import annotations

from typing import Any, List, Tuple

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
    """Torch-semantics LSTM layer; full scan or single cell step."""

    d_in: int
    d_hidden: int

    def setup(self):
        H = self.d_hidden
        self.weight_ih = self.param("weight_ih", _rnn_param((4 * H, self.d_in)))
        self.weight_hh = self.param("weight_hh", _rnn_param((4 * H, H)))
        self.bias_ih = self.param("bias_ih", _rnn_param((4 * H,)))
        self.bias_hh = self.param("bias_hh", _rnn_param((4 * H,)))

    def _cell(self, xg, h, c):
        gates = xg + h @ self.weight_hh.T + self.bias_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, c

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        H = self.d_hidden
        xg = jnp.einsum("bld,gd->blg", x.astype(jnp.float32),
                        self.weight_ih) + self.bias_ih

        def step(carry, xt):
            h, c = self._cell(xt, *carry)
            return (h, c), h

        init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        _, hs = jax.lax.scan(step, init, xg.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)

    def step(self, xt: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]):
        """xt: (B, d_in); state: (h, c) each (B, H).

        One merged ``[x, h] @ [W_ih; W_hh]^T`` matmul instead of two: the
        weight concat is loop-invariant (hoisted out of the decode
        while_loop by XLA), and the decode loop body is op-count-bound on
        TPU, so halving the matmul count is a direct latency win. Relative
        to two separate matmuls this reassociates the f32 reduction across
        the K dim (~1 ulp difference).

        At production width the whole cell runs as ONE fused Pallas kernel
        (ops/critic_kernels.lstm_cell, exact f32)."""
        from bmhrl_tpu.ops import critic_kernels as ck

        h, c = state
        if ck.cells_qualify(self.d_hidden):
            h, c = ck.lstm_cell(xt, h, c, self.weight_ih, self.weight_hh,
                                self.bias_ih + self.bias_hh)
            return h, (h, c)
        w = jnp.concatenate([self.weight_ih, self.weight_hh], axis=1)
        xh = jnp.concatenate([xt.astype(jnp.float32), h], axis=1)
        gates = xh @ w.T + (self.bias_ih + self.bias_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, (h, c)


class GRULayer(nn.Module):
    """Torch-semantics GRU layer; full scan or single cell step."""

    d_in: int
    d_hidden: int

    def setup(self):
        H = self.d_hidden
        self.weight_ih = self.param("weight_ih", _rnn_param((3 * H, self.d_in)))
        self.weight_hh = self.param("weight_hh", _rnn_param((3 * H, H)))
        self.bias_ih = self.param("bias_ih", _rnn_param((3 * H,)))
        self.bias_hh = self.param("bias_hh", _rnn_param((3 * H,)))

    def _cell(self, xg, h):
        hg = h @ self.weight_hh.T + self.bias_hh
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        H = self.d_hidden
        xg = jnp.einsum("bld,gd->blg", x.astype(jnp.float32),
                        self.weight_ih) + self.bias_ih

        def step(h, xt):
            h = self._cell(xt, h)
            return h, h

        init = jnp.zeros((B, H), jnp.float32)
        _, hs = jax.lax.scan(step, init, xg.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)

    def step(self, xt: jnp.ndarray, h: jnp.ndarray):
        """One block-diagonal ``[x, h] @ [[W_ih, 0], [0, W_hh]]^T`` matmul
        yielding (xg, hg) together (the GRU's n-gate needs hg separate, so
        a plain concat merge like the LSTM's is impossible). The zero
        blocks double the cell's FLOPs, but the decode loop body is
        op-count-bound, not FLOP-bound — one MXU op beats two. The padded
        weight is loop-invariant (hoisted out of the while_loop).

        At production width the whole cell runs as ONE fused Pallas kernel
        (ops/critic_kernels.gru_cell, exact f32)."""
        from bmhrl_tpu.ops import critic_kernels as ck

        if ck.cells_qualify(self.d_hidden):
            return (ck.gru_cell(xt, h, self.weight_ih, self.weight_hh,
                                self.bias_ih, self.bias_hh),) * 2
        H3 = 3 * self.d_hidden
        w = jnp.concatenate([
            jnp.concatenate(
                [self.weight_ih,
                 jnp.zeros((H3, self.d_hidden), jnp.float32)], axis=1),
            jnp.concatenate(
                [jnp.zeros((H3, self.d_in), jnp.float32),
                 self.weight_hh], axis=1)], axis=0)
        xh = jnp.concatenate([xt.astype(jnp.float32), h], axis=1)
        out = xh @ w.T
        xg = out[:, :H3] + self.bias_ih
        hg = out[:, H3:] + self.bias_hh
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h


class SegmentCritic(nn.Module):
    """Frozen pretrained segment-boundary detector. ref: bm_hrl_agent.py:186-215."""

    d_model_caps: int = 300

    def setup(self):
        D = self.d_model_caps
        H = 2 * D
        self.lstm_layers = [
            LSTMLayer(D if l == 0 else H, H, name=f"lstm_l{l}")
            for l in range(4)]
        self.gru_layers = [GRULayer(H, H, name=f"gru_l{l}") for l in range(2)]
        self.relu = AReLU(name="relu")
        self.relu2 = AReLU(name="relu2")
        self.lin = nn.Dense(1, dtype=jnp.float32, name="lin")

    def logits_trainable(self, embedded: jnp.ndarray) -> jnp.ndarray:
        """Forward WITHOUT the freeze (critic pretraining only)."""
        h = embedded.astype(jnp.float32)
        for layer in self.lstm_layers:
            h = layer(h)
        h = self.relu(h)
        for layer in self.gru_layers:
            h = layer(h)
        h = self.relu2(h)
        return self.lin(h)

    def __call__(self, embedded: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.stop_gradient(self.logits_trainable(embedded))

    # -- incremental stepping (decode path) ---------------------------------
    def init_state(self, B: int) -> Any:
        H = 2 * self.d_model_caps
        z = jnp.zeros((B, H), jnp.float32)
        return {
            "lstm": [(z, z) for _ in range(4)],
            "gru": [z for _ in range(2)],
        }

    def step(self, emb_t: jnp.ndarray, state: Any):
        """emb_t: (B, d_caps) scaled token embedding -> ((B, 1) logit, state)."""
        h = emb_t.astype(jnp.float32)
        new_lstm: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        for layer, st in zip(self.lstm_layers, state["lstm"]):
            h, st2 = layer.step(h, st)
            new_lstm.append(st2)
        h = self.relu(h[:, None, :])[:, 0]
        new_gru: List[jnp.ndarray] = []
        for layer, st in zip(self.gru_layers, state["gru"]):
            h, st2 = layer.step(h, st)
            new_gru.append(st2)
        h = self.relu2(h[:, None, :])[:, 0]
        out = jax.lax.stop_gradient(self.lin(h))
        return out, {"lstm": new_lstm, "gru": new_gru}
