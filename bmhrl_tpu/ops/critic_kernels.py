"""Fused Pallas cell kernels for the frozen SegmentCritic's decode path.

The critic advances 6 RNN cells (4 LSTM + 2 GRU) per generated token
(models/critic.py ``step``; ref model/bm_hrl_agent.py:186-215). As plain XLA
that is ~35 small sequential ops per token — pure dispatch overhead on TPU,
where each op also re-streams its weights from HBM. Here each cell is ONE
``pallas_call``: the two gate matmuls, bias add and the full gate
nonlinearity/state update execute in a single kernel, with the cell's
weights held in VMEM across batch-tile grid steps (the weight block index
is constant, so Pallas loads it once per call).

Padding scheme: the hidden dim is zero-padded to a lane multiple
(600 -> 640). Padded lanes provably stay exactly zero through the
recurrences — LSTM: pre-activations are 0 there, so c' = sig(0)*0 +
sig(0)*tanh(0) = 0 and h' = sig(0)*tanh(0) = 0; GRU: n = tanh(0 + sig(0)*0)
= 0 and h' = (1-z)*0 + z*0 = 0 — so results equal the unpadded math
exactly (f32).

Interpret mode runs the same kernels on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_FORCE_INTERPRET = False  # tests flip this to exercise the kernels on CPU


def force_interpret(on: bool = True) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = on


_CELLS_ENABLED = False


def enable_cells(on: bool = True) -> None:
    """Opt-in: measured on the current v5e the 6 fused cell kernels run the
    critic chain in 956 us/token vs 907 us for the merged-matmul XLA cells
    — the platform's per-sequential-stage latency dominates either way, so
    the kernels don't pay for their launch cost there. Kept for platforms
    with cheaper kernel launches."""
    global _CELLS_ENABLED
    _CELLS_ENABLED = on


def cells_qualify(H: int) -> bool:
    """Use the fused kernels at production width on TPU (tiny test models
    stay on the XLA path, where kernel-launch padding would dominate)."""
    if _FORCE_INTERPRET:
        return True
    return (_CELLS_ENABLED and jax.default_backend() == "tpu"
            and H >= 128)


def _lstm_kernel(x_ref, h_ref, c_ref, wih_ref, whh_ref, b_ref,
                 ho_ref, co_ref, *, H: int):
    """One batch-tile: gates = x Wih^T + h Whh^T + b (gate order i,f,g,o,
    each H-padded wide), then the LSTM state update."""
    x = x_ref[:]
    h = h_ref[:]
    c = c_ref[:]
    gates = (
        jax.lax.dot_general(x, wih_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(h, whh_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c + i * g
    ho_ref[:] = o * jnp.tanh(c_new)
    co_ref[:] = c_new


def _gru_kernel(x_ref, h_ref, wih_ref, whh_ref, bih_ref, bhh_ref,
                ho_ref, *, H: int):
    """One batch-tile: torch-semantics GRU (n = tanh(xn + bn + r*(hn_lin)))."""
    x = x_ref[:]
    h = h_ref[:]
    xg = jax.lax.dot_general(x, wih_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) + bih_ref[:]
    hg = jax.lax.dot_general(h, whh_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) + bhh_ref[:]
    r = jax.nn.sigmoid(xg[:, :H] + hg[:, :H])
    z = jax.nn.sigmoid(xg[:, H:2 * H] + hg[:, H:2 * H])
    n = jnp.tanh(xg[:, 2 * H:] + r * hg[:, 2 * H:])
    ho_ref[:] = (1.0 - z) * n + z * h


def _pad_gate_weights(w, n_gates: int, H: int, Hp: int, Kp: int):
    """(n_gates*H, K) -> (n_gates*Hp, Kp): pad each gate's rows to Hp and
    the contraction dim to Kp with zeros (hoisted out of the decode loop)."""
    K = w.shape[1]
    w = w.reshape(n_gates, H, K)
    w = jnp.pad(w, ((0, 0), (0, Hp - H), (0, Kp - K)))
    return w.reshape(n_gates * Hp, Kp)


def _pad_gate_bias(b, n_gates: int, H: int, Hp: int):
    b = b.reshape(n_gates, H)
    return jnp.pad(b, ((0, 0), (0, Hp - H))).reshape(1, n_gates * Hp)


def _bt(B: int) -> int:
    return min(64, _ceil_to(B, 8))


def lstm_cell(x, h, c, w_ih, w_hh, b_sum):
    """Fused single-step LSTM cell. x: (B, K); h, c: (B, H) f32;
    w_ih: (4H, K); w_hh: (4H, H); b_sum = b_ih + b_hh (4H,).
    Returns (h', c'). Exact (f32) vs the XLA cell."""
    from jax.experimental import pallas as pl

    B, K = x.shape
    H = h.shape[1]
    Hp = _ceil_to(H, 128)
    Kp = _ceil_to(K, 128)
    Bt = _bt(B)
    Bp = _ceil_to(B, Bt)

    xp = jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, Kp - K)))
    hp = jnp.pad(h, ((0, Bp - B), (0, Hp - H)))
    cp = jnp.pad(c, ((0, Bp - B), (0, Hp - H)))
    wihp = _pad_gate_weights(w_ih, 4, H, Hp, Kp)
    whhp = _pad_gate_weights(w_hh, 4, H, Hp, Hp)
    bp = _pad_gate_bias(b_sum, 4, H, Hp)

    kernel = functools.partial(_lstm_kernel, H=Hp)
    interpret = _FORCE_INTERPRET or jax.default_backend() != "tpu"
    grid = (Bp // Bt,)
    row = lambda i: (i, 0)  # noqa: E731
    whole = lambda i: (0, 0)  # noqa: E731
    ho, co = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, Kp), row),
            pl.BlockSpec((Bt, Hp), row),
            pl.BlockSpec((Bt, Hp), row),
            pl.BlockSpec((4 * Hp, Kp), whole),
            pl.BlockSpec((4 * Hp, Hp), whole),
            pl.BlockSpec((1, 4 * Hp), whole),
        ],
        out_specs=[pl.BlockSpec((Bt, Hp), row),
                   pl.BlockSpec((Bt, Hp), row)],
        out_shape=[jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, Hp), jnp.float32)],
        interpret=interpret,
    )(xp, hp, cp, wihp, whhp, bp)
    return ho[:B, :H], co[:B, :H]


def gru_cell(x, h, w_ih, w_hh, b_ih, b_hh):
    """Fused single-step GRU cell (torch gate semantics). x: (B, K);
    h: (B, H) f32; w_ih: (3H, K); w_hh: (3H, H). Returns h'."""
    from jax.experimental import pallas as pl

    B, K = x.shape
    H = h.shape[1]
    Hp = _ceil_to(H, 128)
    Kp = _ceil_to(K, 128)
    Bt = _bt(B)
    Bp = _ceil_to(B, Bt)

    xp = jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, Kp - K)))
    hp = jnp.pad(h, ((0, Bp - B), (0, Hp - H)))
    wihp = _pad_gate_weights(w_ih, 3, H, Hp, Kp)
    whhp = _pad_gate_weights(w_hh, 3, H, Hp, Hp)
    bihp = _pad_gate_bias(b_ih, 3, H, Hp)
    bhhp = _pad_gate_bias(b_hh, 3, H, Hp)

    kernel = functools.partial(_gru_kernel, H=Hp)
    interpret = _FORCE_INTERPRET or jax.default_backend() != "tpu"
    grid = (Bp // Bt,)
    row = lambda i: (i, 0)  # noqa: E731
    whole = lambda i: (0, 0)  # noqa: E731
    ho = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, Kp), row),
            pl.BlockSpec((Bt, Hp), row),
            pl.BlockSpec((3 * Hp, Kp), whole),
            pl.BlockSpec((3 * Hp, Hp), whole),
            pl.BlockSpec((1, 3 * Hp), whole),
            pl.BlockSpec((1, 3 * Hp), whole),
        ],
        out_specs=pl.BlockSpec((Bt, Hp), row),
        out_shape=jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        interpret=interpret,
    )(xp, hp, wihp, whhp, bihp, bhhp)
    return ho[:B, :H]
