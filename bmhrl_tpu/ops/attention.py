"""Fused (flash-style) attention kernel for TPU via Pallas.

Motivation: the encoder attentions run over up to 300 video / 800 audio
frames; unfused attention materializes (B, H, S, S) score tensors in HBM —
the trace at the serving point (B=1024, Sv=128, Sa=256) attributes 55 of the
encoder's 110 device-ms to the scores/softmax/PV chain, plus 5 ms of head
transposes. This kernel computes each row's full (Sq, Sk) softmax in VMEM
(sources are <= 900 keys, so scores never touch HBM) and consumes the
UN-headed (B, S, H*d_k) projections directly, so the (B,S,H,d)->(B,H,S,d)
transposes disappear too.

Layout (round 3 — the round-2 kernel lost to XLA at every shape): programs
are batch-TILED, grid (B/bt, Sq/bq) with ALL heads per program. The round-2
layout ran one (batch*head, q-tile) program each — 4096+ programs at serving
batch, and per-program launch overhead ate the HBM win (147 vs 114 ms XLA at
B=1024/Sa=256). Batch-tiling is exactly what fixed the folded decode kernel
(see enable_folded_kernel). Measured via tools/flash_ab.py (v5e, encoder
forward wall-clock incl. ~tunnel dispatch, xla -> flash):
  B=32   Sv=128 Sa=256:   8.8 ->   7.7 ms (1.14x)
  B=256  Sv=128 Sa=256:  37.5 ->  32.9 ms (1.14x)
  B=1024 Sv=128 Sa=256: 139.3 -> 114.2 ms (1.22x)
  B=32   Sv=300 Sa=800:  21.3 ->  16.0 ms (1.33x)
  B=256  Sv=300 Sa=800: 182.3 -> 115.0 ms (1.59x)
The kernel wins at every serving shape, so config.use_pallas_attention
defaults to True and bench.py measures with it on (the production
configuration). Shapes whose (bt, bq) tiling can't fit VMEM fall back to
plain XLA attention inside _flash_bsd_call; short sources (< MIN_SK keys)
never enter the kernel at all. The key floor dropped 256 -> 128 after a
second A/B on the re-tiled grid (see MIN_SK below): letting the Sv=128
attention sites into the kernel took the B=1024 encoder forward
114 -> 103 ms (1.34x vs XLA). A VMEM-budget sweep then took it to
95 ms (1.45x) at a 14 MB budget — see _VMEM_BUDGET.

Numerics match models/attention.scaled_dot_attention exactly: scale by
1/sqrt(d_k), additive -1e9 where the (B, Sk) key mask is False, optional
causal tril, f32 scores/accumulation, dtype-preserving I/O. This includes
fully-masked rows (zero-filled missing features, ref convention at
model/multihead_attention.py:17-22 + load_features.py:278-284): softmax
probabilities are zeroed on kernel-padding key columns, so degenerate rows
normalize by the ACTUAL key count — mean(V) over the real key range, the
same value the XLA/torch uniform-softmax-over--1e9 path produces,
independent of each kernel's padding granularity.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9
# Minimum key length for the flash kernel. The original 256 floor was
# measured on the round-2 (batch*head, q-tile) grid, whose per-program
# launch overhead lost to XLA at short keys. On the re-tiled (batch-tile,
# q-tile) grid the on-chip A/B (v5e, 2026-08-18) shows 128-key sites WIN at
# serving batch — encoder fwd B=1024 Sv=128/Sa=256: 113.5 -> 103.3 ms
# (1.34x vs XLA, was 1.21x), B=256: 30.6 -> 28.8 ms — because the Sv=128
# self/cross attention sites previously fell back to the XLA headed path.
# B=32 is inconclusive under tunnel dispatch noise (flash leg 6.5-9.1 ms
# across repeats, both settings). Floor kept at 128: shorter keys were
# never measured and the per-head loop's lane-aligned slices assume
# d_k-wide tiles. Env-overridable for A/B.
MIN_SK = int(os.environ.get("BMHRL_FLASH_MIN_SK", "128"))

_FLASH_ENABLED = False


def enable_flash(on: bool = True) -> None:
    global _FLASH_ENABLED
    _FLASH_ENABLED = on


def flash_enabled() -> bool:
    return _FLASH_ENABLED


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_qualifies(Sq: int, Sk: int, d_k: int) -> bool:
    return (_FLASH_ENABLED and Sk >= MIN_SK and d_k % 128 == 0
            and d_k <= 512)


def _flash_bsd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, bq: int,
                      H: int, scale: float, causal: bool, sk_actual: int):
    """One (batch-tile, q-tile) program: bt rows x bq queries, ALL heads
    (contiguous HBM blocks — slicing the d_k-per-head out of H*d_k in the
    BlockSpec would make every DMA strided at 1/H density).

    q_ref: (bt, bq, H*d); k_ref/v_ref: (bt, Sk_pad, H*d) — their block index
    is constant across the (innermost) q-tile axis, so Mosaic keeps K/V
    resident in VMEM across q-tiles of the same batch rows; mask_ref:
    (bt, 1, Sk_pad) int32 (1 = attend); o_ref: (bt, bq, H*d) in q's dtype.
    Per head (static loop, lane-aligned slices): batched (bt) f32 scores
    and softmax living only in VMEM; PV in the input dtype with f32
    accumulation; normalization after PV (exactly the one-pass softmax —
    Sk fits VMEM at this model's source lengths)."""
    from jax.experimental import pallas as pl

    sk = k_ref.shape[1]
    d = q_ref.shape[2] // H
    mask = mask_ref[:] > 0  # (bt, 1, Sk), broadcasts over queries
    # padding-invariant convention: p is zeroed on key columns beyond the
    # ACTUAL key length, so fully-masked rows (every actual key masked, as
    # zero-filled missing features produce) normalize by sk_actual — the
    # mean of V over the real key range, exactly the XLA/torch uniform-
    # softmax-over--1e9 behavior, independent of kernel padding.
    if sk_actual < sk:
        kp = jax.lax.broadcasted_iota(jnp.int32, (1, sk), 1)
        pad_valid = (kp < sk_actual)[None]  # (1, 1, sk)
    else:
        pad_valid = None
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        # batched (bt) dot: Mosaic pipelines the per-row MXU passes
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (bt, bq, Sk) f32
        s = jnp.where(mask, s, NEG_INF)
        if causal:
            q0 = pl.program_id(1) * bq
            q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, sk), 0) + q0
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, sk), 1)
            s = jnp.where((k_pos <= q_pos)[None], s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        if pad_valid is not None:
            # no-op for live rows (those columns already underflowed to 0);
            # for fully-masked rows it pins l to sk_actual (see above)
            p = jnp.where(pad_valid, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (bt, bq, d)
        # fully-masked rows: every s == NEG_INF -> p == 1 on actual keys
        # -> o = mean(V) over the real key range, matching the XLA path's
        # uniform softmax over -1e9 rows
        o = o / jnp.maximum(l, 1e-30)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


# per-program VMEM budget for picking the (batch, query) tile. v5e scoped
# VMEM is 16 MB; the estimate below counts double-buffered input/output
# blocks explicitly, so the budget can sit close to the hardware limit.
# Swept on-chip (tools/flash_ab.py, 2026-08-19, encoder fwd vs XLA):
#   budget    B=1024 Sv=128/Sa=256   B=256 Sv=300/Sa=800
#   10 MB        103.4 ms               112.3 ms
#   12 MB         96.8                  108.9
#   14 MB         95.1 (1.45x XLA)      107.4 (1.68x)   <- default
#   15 MB         94.8                  115.2 (regresses: long-source
#                                        K/V blocks crowd the scratch)
# 14 MB also wins/ties at B=32 and B=256 standard shapes (6.1/28.6 ms).
# Env-overridable for A/B.
_VMEM_BUDGET = int(os.environ.get("BMHRL_FLASH_VMEM_MB", "14")) * 1024 * 1024


def _vmem_estimate(bt: int, bq: int, Sk_pad: int, HD: int,
                   itemsize: int) -> int:
    return (2 * 2 * bt * bq * HD * itemsize      # q + o, double-buffered
            + 2 * 2 * bt * Sk_pad * HD * itemsize  # k + v, double-buffered
            + bt * bq * Sk_pad * 4 * 2)            # s + p, f32, one head


def _pick_tiles(B: int, Sq_pad: int, Sk_pad: int, HD: int, itemsize: int,
                sq_align: int):
    """Largest (bt, bq) under the VMEM budget; bt first (fewer programs —
    per-program launch overhead is what sank the round-2 (B*H, q-tile)
    layout), then bq. Returns None when even (1, sq_align) doesn't fit
    (caller falls back to the XLA path)."""
    for bt in (16, 8, 4, 2, 1):
        if bt > max(B, 1):
            continue
        for bq in (Sq_pad, 512, 256, 128, 64, 32, 16, 8):
            if bq > Sq_pad or bq % sq_align:
                continue
            if _vmem_estimate(bt, bq, Sk_pad, HD, itemsize) <= _VMEM_BUDGET:
                return bt, bq
    return None


# --- K/V-streaming (online-softmax) variant -------------------------------
#
# The one-pass kernel holds the FULL padded key range in VMEM per program,
# which caps the batch tile hard at long sources: at the dataset-max shapes
# (Sv=300, Sa=800, HD=1024) the video->audio cross-attention's K/V blocks
# cost 7.3 MB double-buffered PER batch row, so the picker lands on bt=1
# and MXU occupancy with it. Streaming adds an innermost Sk-block grid axis
# with flash-style online softmax (running max m, normalizer l and an f32
# context accumulator carried in scratch across k-blocks), shrinking K/V
# residency to one (bt, sk, HD) block and freeing VMEM for larger batch
# tiles (bt=1 -> 4 at the site above). The cost is K/V re-reads: every
# q-tile streams the full key range again. `auto` mode uses streaming as
# COVERAGE ONLY: it dispatches the streaming kernel exactly when no
# one-pass tiling fits the VMEM budget at all (_stream_wins) — e.g. f32
# HD=1024 sources beyond ~880 keys, where the alternative is the unfused
# XLA fallback. It never replaces a runnable one-pass config: the r3
# hypothesis that bt=1 one-pass configs are residency-starved did NOT
# survive re-measurement. Measured (tools/flash_site_ab.py, v5e,
# 2026-08-19, TWO independent runs, reps=20; isolated site, bf16):
#   B=256 Sq=300 Sk=800 HD=1024: one-pass (bt=1,bq=304)  7.22 / 7.20 ms
#     best streaming (4,128,128) 12.05 / 11.98 ms (0.60x); the picker's
#     (8,32,128) 19.04 / 18.78 ms (0.38x)
#   B=256 Sq=800 Sk=800 HD=1024: one-pass (bt=1,bq=256) 13.14 ms
#     best streaming (4,128,128) 20.64 ms (0.64x)
# Encoder forward, same day (tools/flash_ab.py, B=256 Sv=300/Sa=800):
# stream-auto-with-the-old-bt-gate 179.7 ms vs one-pass-only 108.4 ms vs
# XLA 181.3 ms — the r3 gate was a ~1.66x regression at the long-source
# shape, and the r3 notes' streaming wins (14.8 -> 10.7 etc.) were
# measured against a one-pass baseline ~2x slower than today's
# reproducible numbers (chip/tunnel state at measurement time).
# BMHRL_FLASH_STREAM=on/off force the kernel for A/B.
_STREAM_MODE = os.environ.get("BMHRL_FLASH_STREAM", "auto")


def _stream_wins(tiles, stiles) -> bool:
    """auto-mode dispatch: stream only when NO one-pass tiling fits the
    VMEM budget (streaming then beats the unfused XLA fallback — one HBM
    pass over K/V per q-tile vs a materialized (B,H,Sq,Sk) score tensor).
    Whenever one-pass runs at all it wins: the 2026-08-19 re-measurement
    (two runs, both long-source sites) put the best streaming config at
    0.60-0.64x one-pass even where one-pass is capped at bt=1."""
    return stiles is not None and tiles is None


def set_stream_mode(mode: str) -> None:
    """'auto' (default: stream only when it raises the batch tile),
    'on' (stream whenever a streaming tiling fits), 'off'."""
    global _STREAM_MODE
    _STREAM_MODE = mode


def _stream_vmem_estimate(bt: int, bq: int, sk: int, HD: int,
                          itemsize: int) -> int:
    return (2 * 2 * bt * bq * HD * itemsize    # q + o, double-buffered
            + 2 * 2 * bt * sk * HD * itemsize  # k + v blocks, double-buffered
            + bt * bq * sk * 4 * 2             # s + p, f32, one head
            + bt * bq * HD * 4)                # f32 context accumulator


def _pick_stream_tiles(B: int, Sq_pad: int, Sk_pad: int, HD: int,
                       itemsize: int, sq_align: int):
    """Largest (bt, bq, sk) for the streaming kernel: bt first (the whole
    point is raising it), then bq (the MXU's M dim), then the k-block.
    Only k-blocks that actually split the key range qualify (one block ==
    the one-pass kernel with extra scratch)."""
    for bt in (16, 8, 4, 2, 1):
        if bt > max(B, 1):
            continue
        for bq in (256, 128, 64, 32, 16, 8):
            if bq > Sq_pad or bq % sq_align:
                continue
            for sk in (512, 256, 128):
                if sk >= Sk_pad:
                    continue
                if _stream_vmem_estimate(bt, bq, sk, HD,
                                         itemsize) <= _VMEM_BUDGET:
                    return bt, bq, sk
    return None


def _flash_stream_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref,
                         m_ref, l_ref, *, bq: int, sk: int, H: int,
                         scale: float, causal: bool, nk: int,
                         sk_actual: int):
    """One (batch-tile, q-tile, k-block) program step of online-softmax
    flash. Scratch persists across the innermost k-block axis: acc_ref
    (bt, bq, H*d) f32 unnormalized context, m_ref/l_ref (H, bt, bq) f32
    running max / normalizer per head. Initialized at k-block 0, finalized
    (normalize + cast) at k-block nk-1. Fully-masked rows reproduce the
    one-pass kernel / XLA path exactly: m stays NEG_INF, p == 1 on actual
    key columns and 0 on kernel padding (see the one-pass kernel), so the
    output is the mean of V over the ACTUAL key range — padding-invariant,
    independent of the k-block size."""
    from jax.experimental import pallas as pl

    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = mask_ref[:] > 0  # (bt, 1, sk), broadcasts over queries
    d = q_ref.shape[2] // H
    k0 = kb * sk
    if sk_actual < nk * sk:
        kp = jax.lax.broadcasted_iota(jnp.int32, (1, sk), 1) + k0
        pad_valid = (kp < sk_actual)[None]  # (1, 1, sk)
    else:
        pad_valid = None
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (bt, bq, sk) f32
        s = jnp.where(mask, s, NEG_INF)
        if causal:
            q0 = pl.program_id(1) * bq
            q_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, sk), 0) + q0
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, sk), 1) + k0
            s = jnp.where((k_pos <= q_pos)[None], s, NEG_INF)
        m_prev = m_ref[h]                                  # (bt, bq)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        corr = jnp.exp(m_prev - m_new)                     # (bt, bq)
        p = jnp.exp(s - m_new[..., None])                  # (bt, bq, sk)
        if pad_valid is not None:
            p = jnp.where(pad_valid, p, 0.0)
        l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=-1)
        m_ref[h] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (bt, bq, d)
        acc_ref[:, :, sl] = acc_ref[:, :, sl] * corr[..., None] + pv

    @pl.when(kb == nk - 1)
    def _finalize():
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            o = acc_ref[:, :, sl] / jnp.maximum(l_ref[h][..., None], 1e-30)
            o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _flash_stream_call(q, k, v, mask, H: int, causal: bool,
                       tiles) -> jnp.ndarray:
    """Streaming-kernel launch; same contract as the one-pass branch of
    _flash_bsd_call. tiles = (bt, bq, sk) from _pick_stream_tiles."""
    from jax.experimental import pallas as pl

    B, Sq, HD = q.shape
    Sk = k.shape[1]
    d = HD // H
    bt, bq, sk = tiles
    Sq_pad = _ceil_to(Sq, bq)
    Sk_pad = _ceil_to(Sk, sk)
    Bp = _ceil_to(B, bt)
    q = jnp.pad(q, ((0, Bp - B), (0, Sq_pad - Sq), (0, 0)))
    k = jnp.pad(k, ((0, Bp - B), (0, Sk_pad - Sk), (0, 0)))
    v = jnp.pad(v, ((0, Bp - B), (0, Sk_pad - Sk), (0, 0)))
    mask = jnp.pad(mask, ((0, Bp - B), (0, Sk_pad - Sk)))

    scale = 1.0 / float(np.sqrt(d))
    nk = Sk_pad // sk
    grid = (Bp // bt, Sq_pad // bq, nk)
    kernel = functools.partial(_flash_stream_kernel, bq=bq, sk=sk, H=H,
                               scale=scale, causal=causal, nk=nk,
                               sk_actual=Sk)

    interpret = jax.default_backend() != "tpu"
    kwargs = {}
    from jax.experimental.pallas import tpu as pltpu
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bq, HD), lambda b, i, kb: (b, i, 0)),
            pl.BlockSpec((bt, sk, HD), lambda b, i, kb: (b, kb, 0)),
            pl.BlockSpec((bt, sk, HD), lambda b, i, kb: (b, kb, 0)),
            pl.BlockSpec((bt, 1, sk), lambda b, i, kb: (b, 0, kb)),
        ],
        out_specs=pl.BlockSpec((bt, bq, HD), lambda b, i, kb: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Sq_pad, HD), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, bq, HD), jnp.float32),
            pltpu.VMEM((H, bt, bq), jnp.float32),
            pltpu.VMEM((H, bt, bq), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(q, k, v, mask[:, None, :].astype(jnp.int32))
    return out[:B, :Sq]


def _flash_bsd_call(q, k, v, mask, H: int, causal: bool):
    """q,k,v: (B, S, H*d) un-headed projections; mask: (B, Sk) int32.
    Returns (B, Sq, H*d) in q's dtype."""
    from jax.experimental import pallas as pl

    B, Sq, HD = q.shape
    Sk = k.shape[1]
    d = HD // H
    sq_align = 8 if q.dtype == jnp.float32 else 16
    Sq_pad = _ceil_to(Sq, sq_align)
    Sk_pad = _ceil_to(Sk, 128)
    tiles = _pick_tiles(B, Sq_pad, Sk_pad, HD, q.dtype.itemsize, sq_align)
    if _STREAM_MODE != "off":
        stiles = _pick_stream_tiles(B, Sq_pad, Sk_pad, HD, q.dtype.itemsize,
                                    sq_align)
        if stiles is not None and (_STREAM_MODE == "on"
                                   or _stream_wins(tiles, stiles)):
            return _flash_stream_call(q, k, v, mask, H, causal, stiles)
    if tiles is None:
        # shape too large for any tile config: plain XLA attention
        m4 = (mask > 0)[:, None, None, :]
        p = _xla_attention_probs(_heads_of(q, H).astype(jnp.float32),
                                 _heads_of(k, H).astype(jnp.float32),
                                 m4, causal)
        o = jnp.einsum("bhqk,bhkd->bhqd", p,
                       _heads_of(v, H).astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return _unheads(o).astype(q.dtype)
    bt, bq = tiles
    Sq_pad = _ceil_to(Sq, bq)
    Bp = _ceil_to(B, bt)
    q = jnp.pad(q, ((0, Bp - B), (0, Sq_pad - Sq), (0, 0)))
    k = jnp.pad(k, ((0, Bp - B), (0, Sk_pad - Sk), (0, 0)))
    v = jnp.pad(v, ((0, Bp - B), (0, Sk_pad - Sk), (0, 0)))
    mask = jnp.pad(mask, ((0, Bp - B), (0, Sk_pad - Sk)))

    scale = 1.0 / float(np.sqrt(d))
    # q-tiles innermost: consecutive programs share the K/V block index, so
    # Mosaic skips the re-fetch and K/V stream from HBM once per batch tile
    grid = (Bp // bt, Sq_pad // bq)
    kernel = functools.partial(_flash_bsd_kernel, bq=bq, H=H, scale=scale,
                               causal=causal, sk_actual=Sk)

    interpret = jax.default_backend() != "tpu"
    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bq, HD), lambda b, i: (b, i, 0)),
            pl.BlockSpec((bt, Sk_pad, HD), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bt, Sk_pad, HD), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bt, 1, Sk_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, bq, HD), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Sq_pad, HD), q.dtype),
        interpret=interpret,
        **kwargs,
    )(q, k, v, mask[:, None, :].astype(jnp.int32))
    return out[:B, :Sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_bsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    H: int = 1,
    causal: bool = False,
) -> jnp.ndarray:
    """Fused attention on UN-headed (B, S, H*d_k) projections with a (B, Sk)
    key pad mask (True/1 = attend). Returns (B, Sq, H*d_k) in q's dtype —
    ready for the output projection with no head transposes anywhere.

    Differentiable: the forward is the fused Pallas kernel; the backward
    recomputes attention with standard XLA ops from (q, k, v, mask)
    residuals (flash-style recompute — no score tensor is saved)."""
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    if mask is None:
        mask = jnp.ones((B, Sk), jnp.int32)
    return _flash_bsd_call(q, k, v, mask.astype(jnp.int32), H, causal)


def _heads_of(x, H):
    B, S, HD = x.shape
    return x.reshape(B, S, H, HD // H).transpose(0, 2, 1, 3)


def _unheads(x):
    B, H, S, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * d)


def _flash_bsd_fwd(q, k, v, mask, H, causal):
    return flash_attention_bsd(q, k, v, mask, H, causal), (q, k, v, mask)


def _flash_bsd_bwd(H, causal, res, g):
    # Matmul operands stay in the INPUT dtype (bf16 in production — full
    # MXU rate, same precision profile as the forward kernel) with f32
    # accumulation; softmax and the ds reduction run in f32. f32 inputs
    # get a fully-f32 backward (grad-parity tests, debugging).
    q3, k3, v3, mask = res
    dt = q3.dtype
    q = _heads_of(q3, H)
    k = _heads_of(k3, H)
    v = _heads_of(v3, H)
    g = _heads_of(g, H).astype(dt)
    m4 = None if mask is None else (mask[:, None, None, :] > 0)
    p = _xla_attention_probs(q, k, m4, causal)  # f32 probs
    pm = p.astype(dt)
    dv = jnp.einsum("bhqk,bhqd->bhkd", pm, g,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    dsm = ds.astype(dt)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dsm, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dsm, q,
                    preferred_element_type=jnp.float32) * scale
    return (_unheads(dq).astype(q3.dtype), _unheads(dk).astype(k3.dtype),
            _unheads(dv).astype(v3.dtype), None)


flash_attention_bsd.defvjp(_flash_bsd_fwd, _flash_bsd_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    causal: bool = False,
) -> jnp.ndarray:
    """Compatibility wrapper on HEADED (B, H, S, d) inputs with a mask
    broadcastable to (B, 1, 1|Sq, Sk): un-heads, runs the fused BSD kernel,
    re-heads. The model path (MultiheadedAttention.__call__) calls
    flash_attention_bsd directly and never builds the headed layout."""
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    if mask is None:
        key_mask = None
    else:
        # (B, 1, 1|Sq, Sk) -> key mask (B, Sk); source masks are per-key
        key_mask = mask.reshape(B, -1, Sk)[:, -1, :].astype(jnp.int32)
    out = flash_attention_bsd(_unheads(q), _unheads(k), _unheads(v),
                              key_mask, H, causal)
    return _heads_of(out, H).astype(jnp.float32)


_FOLDED_KERNEL = True


def enable_folded_kernel(on: bool = True) -> None:
    """Default ON: the fused kernel reads the raw memory from HBM once per
    call where the XLA path reads it twice (score + context products).
    With 8 batch rows per program (block-diagonal contraction — wasted
    cross-row FLOPs are free, the op is HBM-bound) it measured
    3044/3854/4477 clips/s at B=256/512/1024 on the v5e vs 2860/3483/3961
    for the XLA contraction. An earlier grid=(B,) single-row layout lost
    its advantage to per-program launch overhead (2719 at B=256)."""
    global _FOLDED_KERNEL
    _FOLDED_KERNEL = on


def folded_qualifies(S: int, draw: int) -> bool:
    """Fused folded-attention kernel gate: the raw-memory dim must tile the
    lane width; tiny key counts are faster on the XLA path."""
    return _FOLDED_KERNEL and S >= 64 and draw % 128 == 0


def _folded_kernel(q_ref, mem_ref, mask_ref, o_ref, *, bt: int, gp: int,
                   sp: int):
    """One batch-tile program of decode-side folded attention.

    q_ref: (bt*gp, draw) f32 — pre-scaled effective queries of ``bt``
    batch rows (G = collapsed stack*head groups each); mem_ref:
    (bt*sp, draw) raw memories of the same rows, flattened; mask_ref:
    (bt, sp) int32 (1 = attend). The per-row attentions are computed as
    ONE block-diagonal contraction: q_flat @ mem_flat^T yields scores of
    every query against every row's keys, and the cross-row blocks are
    masked to NEG_INF before the softmax — exact, and the wasted FLOPs
    are free (the op is HBM-bound: the memory is read from HBM ONCE for
    both the score and the context product, where the XLA path reads it
    twice, and the score matrix never leaves VMEM)."""
    q = q_ref[:].astype(jnp.float32)          # (bt*gp, draw)
    mem = mem_ref[:].astype(jnp.float32)      # (bt*sp, draw)
    s = jax.lax.dot_general(
        q, mem, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # (bt*gp, bt*sp)
    # block-diagonal validity: query row i attends only keys of row i,
    # where its (1, sp) pad mask also applies
    q_row = jax.lax.broadcasted_iota(jnp.int32, (bt * gp, bt * sp), 0) // gp
    k_row = jax.lax.broadcasted_iota(jnp.int32, (bt * gp, bt * sp), 1) // sp
    # mask block is (bt, 1, sp): the middle singleton keeps the BlockSpec's
    # last two dims equal to the array's when bt < 8 (Mosaic tiling rule)
    pad = mask_ref[:].reshape(1, bt * sp) > 0
    s = jnp.where((q_row == k_row) & pad, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        p, mem, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (bt*gp, draw)
    o_ref[:] = ctx / jnp.maximum(l, 1e-30)


def folded_attend(q_eff: jnp.ndarray, mem: jnp.ndarray,
                  mask: Optional[jnp.ndarray], scale: float) -> jnp.ndarray:
    """Fused decode-side folded attention.

    q_eff: (B, G, draw) effective queries (K-projection already folded in);
    mem: (B, S, draw) raw memory; mask: (B, S) boolean key mask or None.
    Returns softmax(scale * q_eff mem^T) mem as (B, G, draw) f32 — the
    value/output projections are applied by the caller (also folded).

    Dispatches to the fused Pallas kernel when shapes qualify (one HBM
    read of the memory per call); otherwise an equivalent XLA contraction.
    """
    from jax.experimental import pallas as pl

    B, G, draw = q_eff.shape
    S = mem.shape[1]
    if not folded_qualifies(S, draw):
        s = jnp.einsum("bgk,bsk->bgs", (q_eff * scale).astype(mem.dtype),
                       mem, preferred_element_type=jnp.float32)
        if mask is not None:
            s = jnp.where(mask[:, None, :], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bgs,bsk->bgk", p.astype(mem.dtype), mem,
                          preferred_element_type=jnp.float32)

    # batch rows per program: fewer/bigger programs amortize launch overhead
    # (8 measured best at the serving shapes), shrunk when the memory block
    # would blow scoped VMEM (long sources: Sv=300/Sa=800 at the dataset cap)
    S_pad = _ceil_to(S, 128)

    def folded_vmem(bt):
        return (2 * 2 * bt * G * draw * 4               # q + o, f32, dbl-buf
                + 2 * bt * S_pad * draw * mem.dtype.itemsize  # mem, dbl-buf
                + (bt * G) * (bt * S_pad) * 4 * 2)      # s + p, f32

    bt = 1
    for cand in (8, 4, 2):
        if folded_vmem(cand) <= _VMEM_BUDGET:
            bt = cand
            break
    Bp = _ceil_to(B, bt)
    q = jnp.pad((q_eff * scale).astype(jnp.float32),
                ((0, Bp - B), (0, 0), (0, 0)))
    memp = jnp.pad(mem, ((0, Bp - B), (0, S_pad - S), (0, 0)))
    if mask is None:
        maskp = (jnp.arange(S_pad) < S)[None].astype(jnp.int32)
        maskp = jnp.broadcast_to(maskp, (B, S_pad))
    else:
        maskp = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, S_pad - S)))
    maskp = jnp.pad(maskp, ((0, Bp - B), (0, 0)))

    q = q.reshape(Bp * G, draw)
    memp = memp.reshape(Bp * S_pad, draw)

    interpret = jax.default_backend() != "tpu"
    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    kernel = functools.partial(_folded_kernel, bt=bt, gp=G, sp=S_pad)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt * G, draw), lambda b: (b, 0)),
            pl.BlockSpec((bt * S_pad, draw), lambda b: (b, 0)),
            pl.BlockSpec((bt, 1, S_pad), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt * G, draw), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp * G, draw), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(q, memp, maskp[:, None, :])
    return out.reshape(Bp, G, draw)[:B]


def _xla_attention_probs(q, k, mask, causal):
    d_k = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    if causal:
        Sq, Sk = s.shape[-2], s.shape[-1]
        tril = jnp.tril(jnp.ones((Sq, Sk), dtype=bool))
        s = jnp.where(tril[None, None], s, NEG_INF)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    return jax.nn.softmax(s, axis=-1)


