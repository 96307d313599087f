"""Fused encoder-layer building blocks (Pallas, TPU).

Round-3 floor analysis (ROUND3_NOTES.md §1): with flash attention on, the
BMHRL encoder is HBM-bound at ~478 GB/s (58% of the v5e's ~819 GB/s
roofline) with a ~1.7x traffic headroom that lives entirely in the
LN/residual/FFN chains AROUND the attention ops — every LayerNorm, residual
add and FFN intermediate round-trips the full (B, S, D) activation through
HBM because XLA does not fuse elementwise/reduction producers into dot
operands on TPU.

These kernels were built to close that gap for the encoder forward
(serving/eval — the decode headline's dominant device cost); the on-chip
measurement below shows how much of it they actually close. Weights at this model's dims are
small enough to sit RESIDENT in VMEM (merged QKV (1024, 3072) bf16 = 6 MB is
the largest), so each op streams activation row-tiles from HBM exactly once:

  ln_matmul(x, g, b, W, bias)       y = LN(x) @ W + bias      [opt. relu]
      replaces LN-write + LN-read + matmul-read  (3 passes -> 1)
  matmul_residual(y, W, bias, x)    out = x + y @ W + bias
      replaces proj-write + proj-read + residual-read (attention epilogue)
  proj_res_ffn(ctx, Wo, bo, x, g, b, W1, b1, W2, b2)
      x2 = x + ctx @ Wo + bo;  out = x2 + relu(LN(x2) @ W1 + b1) @ W2 + b2
      the whole cross-attention epilogue + FFN block in one pass: the
      XLA chain is ~9 activation passes (proj, residual, LN, fc1, relu,
      fc2, residual), the kernel reads ctx + x and writes out (3 passes).

All three are differentiable via custom VJPs that recompute the pure-XLA
twin (flash-style: no intermediate is saved), though the model only routes
here when deterministic (no dropout inside the fused blocks; training keeps
the plain path).

ON-CHIP MEASUREMENT (v5e, 2026-08-18; tools/encoder_fused_kernbench.py,
tools/encoder_fused_ab.py, tools/encoder_hlo_diff.py):

1. Per-op, the picture splits by arithmetic intensity. The
   bandwidth-dominated tail fusions WIN in isolation — proj_res_ffn
   1.18-1.27x, matmul_residual_ln 1.03-1.55x, ffn_residual_ln 0.97-1.20x,
   matmul_residual 0.94-1.21x — but ln_matmul LOSES at every serving row
   count (0.53-0.92x): the QKV GEMM is compute-bound (~768 FLOP/byte), XLA
   already runs it at ~49% MFU, and the row-tiled schedule (M<=128
   rows/program against the full (1024, 3072) resident weight) starves the
   MXU while the LN fusion saves only ~15% of traffic. The glue therefore
   routes LN+QKV through _ln_matmul_xla (keeping the merged single-GEMM
   projection) and uses Pallas only where it measured faster.
2. In COMPOSITION the glue still loses or ties: optimized-HLO cost
   analysis shows the restructured graph moves MORE XLA-visible bytes than
   the plain flax composition (60.9 vs 54.5 GB at B=1024 with kernels on;
   72.4 GB with the f32-epilogue twins) — extra layout copies and convert
   chains appear at the Pallas/XLA boundaries (e.g. 67 MB `_heads` copies
   on the attention sites that fall back to the XLA path). After the flash
   MIN_SK floor dropped to 128 (ops/attention.py — the real win extracted
   from this investigation: it removed the fallback sites and sped the
   production flash path ~10% at B=1024), the glue measures 0.98x at the
   serving shapes: a wash. `use_fused_encoder` therefore stays OPT-IN/off;
   flash-only is the measured production configuration.
3. Diagnostics kept for future work: BMHRL_FUSED_OPS (per-op
   kill-switches, _op_on below) and BMHRL_FUSED_PARTS (sublayer bisect in
   BMEncoderLayer). ln_matmul stays (tested, differentiable) as the record
   of the experiment.

Parity targets: the composition ResidualConnection/PositionwiseFeedForward/
Dense in models/blocks.py (ref: model/blocks.py:128-187) — the kernels
compute the same math with f32 LN/accumulation and compute-dtype matmuls.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-5

_ENC_FUSED = False

# per-program VMEM budget; resident weights + double-buffered row blocks
# must fit (v5e scoped VMEM is ~16 MB). Higher than the flash kernel's
# 10 MB: the weight blocks have a CONSTANT grid index, so they are fetched
# once and hold one buffer (not two), and the f32 scratch is counted
# explicitly in each per-row estimate. 12 MB doubles the row tile of the
# video-side proj_res_ffn (64 -> 128 rows/program) and the DETR
# ffn_residual_ln (32 -> 64), halving program count at serving batch.
# Re-A/B'd at 14 MB after the flash budget raise (2026-08-19): the fused
# composition still measures 0.95-0.98x of flash-only, so the opt-in/off
# default stands. Env-overridable (BMHRL_FUSED_VMEM_MB) for future A/Bs.
_VMEM_BUDGET = (int(os.environ.get("BMHRL_FUSED_VMEM_MB", "12"))
                * 1024 * 1024)


def enable_encoder_fusion(on: bool = True) -> None:
    global _ENC_FUSED
    _ENC_FUSED = on


def encoder_fusion_enabled() -> bool:
    return _ENC_FUSED


def encoder_fusion_qualifies(*dims: int) -> bool:
    """All participating model dims must tile the 128-lane width."""
    return _ENC_FUSED and all(d % 128 == 0 and d > 0 for d in dims)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pl():
    from jax.experimental import pallas as pl
    return pl


def _compiler_params(n_axes: int):
    if _interpret():
        return {}
    from jax.experimental.pallas import tpu as pltpu
    return {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=("parallel",) * n_axes)}


def _pick_rows(weight_bytes: int, per_row_bytes: int, rows: int = 1 << 30):
    """Row tile choice: among tiles whose double-buffered blocks + resident
    weights fit the VMEM budget, take the one minimizing the padded row
    count (small/eval batches would otherwise pad up to 70% dead rows),
    tie-broken toward the LARGEST tile (fewest programs). Tiles are
    multiples of 16 (bf16 sublane). Returns None when even a 16-row tile
    does not fit (caller must fall back to the pure-XLA twin — mirrors the
    flash kernel's VMEM-overflow fallback)."""
    rows = max(rows, 1)
    best = None  # (padded_rows, -br)
    for br in (1024, 512, 256, 128, 64, 32, 16):
        if weight_bytes + 2 * br * per_row_bytes > _VMEM_BUDGET:
            continue
        padded = _ceil_to(rows, br)
        if best is None or padded < best[0]:
            best = (padded, br)
    return None if best is None else best[1]


def _ln_rows(x32: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 LayerNorm over the last dim (flax semantics, eps inside sqrt)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + _EPS) * g + b


# ---------------------------------------------------------------------------
# ln_matmul: y = [relu](LN(x) @ W + b)
# ---------------------------------------------------------------------------

def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *,
                      relu: bool, cdt):
    xn = _ln_rows(x_ref[:].astype(jnp.float32),
                  g_ref[:].astype(jnp.float32),
                  b_ref[:].astype(jnp.float32))
    y = jax.lax.dot(xn.astype(cdt), w_ref[:],
                    preferred_element_type=jnp.float32)
    y = y + bias_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_matmul_ref(x, g, b, w, bias, relu, cdt):
    """Pure-XLA twin: ResidualConnection.pre + Dense(dtype=cdt) semantics."""
    xn = _ln_rows(x.astype(jnp.float32), g.astype(jnp.float32),
                  b.astype(jnp.float32))
    y = (xn.astype(cdt) @ w.astype(cdt)).astype(jnp.float32)
    y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(cdt)


def _ln_matmul_xla(x, g, b, w, bias, relu, cdt):
    """Glue-path XLA LN+matmul with the FLAX epilogue (bias add in the
    compute dtype, no f32 round trip of the (R, Dout) output) — exactly what
    the plain layer computes via norm + nn.Dense(dtype=cdt). The kernel-exact
    twin _ln_matmul_ref keeps its f32 epilogue for VJP recompute/parity, but
    routing THAT through the glue costs a full-width f32 materialization of
    the projection output (3.2 GB on the audio QKV at B=1024), which showed
    up as composition loss in the on-chip A/B."""
    xn = _ln_rows(x.astype(jnp.float32), g.astype(jnp.float32),
                  b.astype(jnp.float32))
    y = xn.astype(cdt) @ w.astype(cdt) + bias.astype(cdt)
    if relu:
        y = jnp.maximum(y, 0)
    return y.astype(cdt)


def _ln_matmul_impl(x, g, b, w, bias, relu, cdt):
    pl = _pl()
    R, D = x.shape
    Dout = w.shape[1]
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    per_row = (D * x.dtype.itemsize + Dout * itemsize  # x + o blocks
               + D * 4 + Dout * 4)       # f32 LN scratch + f32 accumulator
    br = _pick_rows(D * Dout * itemsize + (2 * D + Dout) * 4, per_row, R)
    if br is None:
        return _ln_matmul_ref(x, g, b, w, bias, relu, cdt)
    Rp = _ceil_to(R, br)
    xp = jnp.pad(x, ((0, Rp - R), (0, 0)))
    kernel = functools.partial(_ln_matmul_kernel, relu=relu, cdt=cdt)
    out = pl.pallas_call(
        kernel,
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, D), lambda r: (r, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((D, Dout), lambda r: (0, 0)),
            pl.BlockSpec((1, Dout), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, Dout), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, Dout), cdt),
        interpret=_interpret(),
        **_compiler_params(1),
    )(xp, g.reshape(1, D), b.reshape(1, D), w.astype(cdt),
      bias.reshape(1, Dout))
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_matmul(x, g, b, w, bias, relu=False, cdt=jnp.bfloat16):
    """y = [relu](LN(x) @ W + bias) over rows. x: (R, D); w: (D, Dout);
    g/b: LN scale/bias (D,). Returns (R, Dout) in ``cdt``."""
    return _ln_matmul_impl(x, g, b, w, bias, relu, cdt)


def _ln_matmul_fwd(x, g, b, w, bias, relu, cdt):
    return ln_matmul(x, g, b, w, bias, relu, cdt), (x, g, b, w, bias)


def _ln_matmul_bwd(relu, cdt, res, ct):
    x, g, b, w, bias = res
    _, vjp = jax.vjp(lambda *a: _ln_matmul_ref(*a, relu, cdt),
                     x, g, b, w, bias)
    return vjp(ct)


ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


# ---------------------------------------------------------------------------
# matmul_residual: out = x + y @ W + b   (attention out-proj epilogue)
# ---------------------------------------------------------------------------

def _matmul_residual_kernel(y_ref, w_ref, bias_ref, x_ref, o_ref, *, cdt):
    p = jax.lax.dot(y_ref[:].astype(cdt), w_ref[:],
                    preferred_element_type=jnp.float32)
    p = p + bias_ref[:].astype(jnp.float32)
    o_ref[:] = (x_ref[:].astype(jnp.float32) + p).astype(o_ref.dtype)


def _matmul_residual_ref(y, w, bias, x, cdt):
    p = (y.astype(cdt) @ w.astype(cdt)).astype(jnp.float32)
    p = p + bias.astype(jnp.float32)
    return (x.astype(jnp.float32) + p).astype(x.dtype)


def _matmul_residual_impl(y, w, bias, x, cdt):
    pl = _pl()
    R, D = y.shape
    Dout = w.shape[1]
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    per_row = (D * y.dtype.itemsize + 2 * Dout * x.dtype.itemsize
               + Dout * 4)
    br = _pick_rows(D * Dout * itemsize + Dout * 4, per_row, R)
    if br is None:
        return _matmul_residual_ref(y, w, bias, x, cdt)
    Rp = _ceil_to(R, br)
    yp = jnp.pad(y, ((0, Rp - R), (0, 0)))
    xp = jnp.pad(x, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_matmul_residual_kernel, cdt=cdt),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, D), lambda r: (r, 0)),
            pl.BlockSpec((D, Dout), lambda r: (0, 0)),
            pl.BlockSpec((1, Dout), lambda r: (0, 0)),
            pl.BlockSpec((br, Dout), lambda r: (r, 0)),
        ],
        out_specs=pl.BlockSpec((br, Dout), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, Dout), x.dtype),
        interpret=_interpret(),
        **_compiler_params(1),
    )(yp, w.astype(cdt), bias.reshape(1, Dout), xp)
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def matmul_residual(y, w, bias, x, cdt=jnp.bfloat16):
    """out = x + y @ W + bias. y: (R, D); w: (D, Dout); x: (R, Dout).
    Returns (R, Dout) in x's dtype."""
    return _matmul_residual_impl(y, w, bias, x, cdt)


def _matmul_residual_fwd(y, w, bias, x, cdt):
    return matmul_residual(y, w, bias, x, cdt), (y, w, bias, x)


def _matmul_residual_bwd(cdt, res, ct):
    y, w, bias, x = res
    _, vjp = jax.vjp(lambda *a: _matmul_residual_ref(*a, cdt), y, w, bias, x)
    return vjp(ct)


matmul_residual.defvjp(_matmul_residual_fwd, _matmul_residual_bwd)


# ---------------------------------------------------------------------------
# proj_res_ffn: cross-attention epilogue + prenorm FFN block in one pass
#   x2  = x + ctx @ Wo + bo
#   out = x2 + relu(LN(x2) @ W1 + b1) @ W2 + b2
# ---------------------------------------------------------------------------

def _proj_res_ffn_kernel(ctx_ref, wo_ref, bo_ref, x_ref, g_ref, b_ref,
                         w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, cdt):
    p = jax.lax.dot(ctx_ref[:].astype(cdt), wo_ref[:],
                    preferred_element_type=jnp.float32)
    x2 = x_ref[:].astype(jnp.float32) + p + bo_ref[:].astype(jnp.float32)
    xn = _ln_rows(x2, g_ref[:].astype(jnp.float32),
                  b_ref[:].astype(jnp.float32))
    h = jax.lax.dot(xn.astype(cdt), w1_ref[:],
                    preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
    f = jax.lax.dot(h.astype(cdt), w2_ref[:],
                    preferred_element_type=jnp.float32)
    o_ref[:] = (x2 + f + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _proj_res_ffn_ref(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt):
    x2 = (x.astype(jnp.float32)
          + (ctx.astype(cdt) @ wo.astype(cdt)).astype(jnp.float32)
          + bo.astype(jnp.float32))
    xn = _ln_rows(x2, g.astype(jnp.float32), b.astype(jnp.float32))
    h = (xn.astype(cdt) @ w1.astype(cdt)).astype(jnp.float32)
    h = jnp.maximum(h + b1.astype(jnp.float32), 0.0)
    f = (h.astype(cdt) @ w2.astype(cdt)).astype(jnp.float32)
    return (x2 + f + b2.astype(jnp.float32)).astype(x.dtype)


def _proj_res_ffn_impl(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt):
    pl = _pl()
    R, Din = ctx.shape
    D = x.shape[1]
    Dff = w1.shape[1]
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    weight_bytes = (Din * D + D * Dff + Dff * D) * itemsize + (
        2 * D + D + Dff + D) * 4
    per_row = (Din * ctx.dtype.itemsize + 2 * D * x.dtype.itemsize
               + (2 * D + Dff) * 4)  # x2/xn/h f32 scratch
    br = _pick_rows(weight_bytes, per_row, R)
    if br is None:
        return _proj_res_ffn_ref(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt)
    Rp = _ceil_to(R, br)
    ctxp = jnp.pad(ctx, ((0, Rp - R), (0, 0)))
    xp = jnp.pad(x, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_proj_res_ffn_kernel, cdt=cdt),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, Din), lambda r: (r, 0)),
            pl.BlockSpec((Din, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((br, D), lambda r: (r, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((D, Dff), lambda r: (0, 0)),
            pl.BlockSpec((1, Dff), lambda r: (0, 0)),
            pl.BlockSpec((Dff, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, D), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        interpret=_interpret(),
        **_compiler_params(1),
    )(ctxp, wo.astype(cdt), bo.reshape(1, D), xp, g.reshape(1, D),
      b.reshape(1, D), w1.astype(cdt), b1.reshape(1, Dff), w2.astype(cdt),
      b2.reshape(1, D))
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def proj_res_ffn(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt=jnp.bfloat16):
    """Fused cross-attention epilogue + prenorm FFN block (see module doc).
    ctx: (R, Din) attention context; x: (R, D) residual stream;
    wo: (Din, D); w1: (D, Dff); w2: (Dff, D); g/b: LN params (D,).
    Returns (R, D) in x's dtype."""
    return _proj_res_ffn_impl(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt)


def _proj_res_ffn_fwd(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt):
    out = proj_res_ffn(ctx, wo, bo, x, g, b, w1, b1, w2, b2, cdt)
    return out, (ctx, wo, bo, x, g, b, w1, b1, w2, b2)


def _proj_res_ffn_bwd(cdt, res, ct):
    _, vjp = jax.vjp(lambda *a: _proj_res_ffn_ref(*a, cdt), *res)
    return vjp(ct)


proj_res_ffn.defvjp(_proj_res_ffn_fwd, _proj_res_ffn_bwd)


# ---------------------------------------------------------------------------
# Post-norm variants (DETR encoder, ref encoder.py:39-75):
#   matmul_residual_ln: out = LN(x + y @ W + b)      (attention epilogue)
#   ffn_residual_ln:    out = LN(x + fc2(relu(fc1(x))))
# ---------------------------------------------------------------------------

def _matmul_residual_ln_kernel(y_ref, w_ref, bias_ref, x_ref, g_ref, b_ref,
                               o_ref, *, cdt):
    p = jax.lax.dot(y_ref[:].astype(cdt), w_ref[:],
                    preferred_element_type=jnp.float32)
    x2 = x_ref[:].astype(jnp.float32) + p + bias_ref[:].astype(jnp.float32)
    o_ref[:] = _ln_rows(x2, g_ref[:].astype(jnp.float32),
                        b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _matmul_residual_ln_ref(y, w, bias, x, g, b, cdt):
    x2 = (x.astype(jnp.float32)
          + (y.astype(cdt) @ w.astype(cdt)).astype(jnp.float32)
          + bias.astype(jnp.float32))
    return _ln_rows(x2, g.astype(jnp.float32),
                    b.astype(jnp.float32)).astype(x.dtype)


def _matmul_residual_ln_impl(y, w, bias, x, g, b, cdt):
    pl = _pl()
    R, D = y.shape
    Dout = w.shape[1]
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    per_row = (D * y.dtype.itemsize + 2 * Dout * x.dtype.itemsize
               + 2 * Dout * 4)
    br = _pick_rows(D * Dout * itemsize + 3 * Dout * 4, per_row, R)
    if br is None:
        return _matmul_residual_ln_ref(y, w, bias, x, g, b, cdt)
    Rp = _ceil_to(R, br)
    yp = jnp.pad(y, ((0, Rp - R), (0, 0)))
    xp = jnp.pad(x, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_matmul_residual_ln_kernel, cdt=cdt),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, D), lambda r: (r, 0)),
            pl.BlockSpec((D, Dout), lambda r: (0, 0)),
            pl.BlockSpec((1, Dout), lambda r: (0, 0)),
            pl.BlockSpec((br, Dout), lambda r: (r, 0)),
            pl.BlockSpec((1, Dout), lambda r: (0, 0)),
            pl.BlockSpec((1, Dout), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, Dout), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, Dout), x.dtype),
        interpret=_interpret(),
        **_compiler_params(1),
    )(yp, w.astype(cdt), bias.reshape(1, Dout), xp, g.reshape(1, Dout),
      b.reshape(1, Dout))
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def matmul_residual_ln(y, w, bias, x, g, b, cdt=jnp.bfloat16):
    """out = LN(x + y @ W + bias) (post-norm attention epilogue).
    y: (R, D); w: (D, Dout); x: (R, Dout); g/b: LN params (Dout,)."""
    return _matmul_residual_ln_impl(y, w, bias, x, g, b, cdt)


def _matmul_residual_ln_fwd(y, w, bias, x, g, b, cdt):
    return matmul_residual_ln(y, w, bias, x, g, b, cdt), (y, w, bias, x, g, b)


def _matmul_residual_ln_bwd(cdt, res, ct):
    _, vjp = jax.vjp(lambda *a: _matmul_residual_ln_ref(*a, cdt), *res)
    return vjp(ct)


matmul_residual_ln.defvjp(_matmul_residual_ln_fwd, _matmul_residual_ln_bwd)


def _ffn_residual_ln_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                            b_ref, o_ref, *, cdt):
    x = x_ref[:].astype(jnp.float32)
    h = jax.lax.dot(x.astype(cdt), w1_ref[:],
                    preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
    f = jax.lax.dot(h.astype(cdt), w2_ref[:],
                    preferred_element_type=jnp.float32)
    x2 = x + f + b2_ref[:].astype(jnp.float32)
    o_ref[:] = _ln_rows(x2, g_ref[:].astype(jnp.float32),
                        b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_residual_ln_ref(x, w1, b1, w2, b2, g, b, cdt):
    h = (x.astype(cdt) @ w1.astype(cdt)).astype(jnp.float32)
    h = jnp.maximum(h + b1.astype(jnp.float32), 0.0)
    f = (h.astype(cdt) @ w2.astype(cdt)).astype(jnp.float32)
    x2 = x.astype(jnp.float32) + f + b2.astype(jnp.float32)
    return _ln_rows(x2, g.astype(jnp.float32),
                    b.astype(jnp.float32)).astype(x.dtype)


def _ffn_residual_ln_impl(x, w1, b1, w2, b2, g, b, cdt):
    pl = _pl()
    R, D = x.shape
    Dff = w1.shape[1]
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    weight_bytes = 2 * D * Dff * itemsize + (Dff + 3 * D) * 4
    per_row = 2 * D * x.dtype.itemsize + (2 * D + Dff) * 4
    br = _pick_rows(weight_bytes, per_row, R)
    if br is None:
        return _ffn_residual_ln_ref(x, w1, b1, w2, b2, g, b, cdt)
    Rp = _ceil_to(R, br)
    xp = jnp.pad(x, ((0, Rp - R), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ffn_residual_ln_kernel, cdt=cdt),
        grid=(Rp // br,),
        in_specs=[
            pl.BlockSpec((br, D), lambda r: (r, 0)),
            pl.BlockSpec((D, Dff), lambda r: (0, 0)),
            pl.BlockSpec((1, Dff), lambda r: (0, 0)),
            pl.BlockSpec((Dff, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
            pl.BlockSpec((1, D), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, D), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        interpret=_interpret(),
        **_compiler_params(1),
    )(xp, w1.astype(cdt), b1.reshape(1, Dff), w2.astype(cdt),
      b2.reshape(1, D), g.reshape(1, D), b.reshape(1, D))
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ffn_residual_ln(x, w1, b1, w2, b2, g, b, cdt=jnp.bfloat16):
    """out = LN(x + fc2(relu(fc1(x)))) (post-norm FFN block). x: (R, D);
    w1: (D, Dff); w2: (Dff, D); g/b: LN params (D,). One read of x, one
    write of out — the Dff intermediate never touches HBM."""
    return _ffn_residual_ln_impl(x, w1, b1, w2, b2, g, b, cdt)


def _ffn_residual_ln_fwd(x, w1, b1, w2, b2, g, b, cdt):
    out = ffn_residual_ln(x, w1, b1, w2, b2, g, b, cdt)
    return out, (x, w1, b1, w2, b2, g, b)


def _ffn_residual_ln_bwd(cdt, res, ct):
    _, vjp = jax.vjp(lambda *a: _ffn_residual_ln_ref(*a, cdt), *res)
    return vjp(ct)


ffn_residual_ln.defvjp(_ffn_residual_ln_fwd, _ffn_residual_ln_bwd)


# ---------------------------------------------------------------------------
# Encoder-layer glue: fused blocks over bound flax modules. Shared by
# BMEncoderLayer (models/bmhrl.py) and UnimodalEncoderLayer
# (models/unimodal.py); the callers gate on encoder_fusion_qualifies +
# deterministic before routing here.
# ---------------------------------------------------------------------------


def attend_bsd(att, q3, k3, v3, mask, dtype):
    """Attention middle on un-headed (B, S, H*d_k) projections: the flash
    kernel when the shape qualifies, else the XLA headed path. ``att`` is a
    bound MultiheadedAttention; ``mask`` is a (B, 1, Sk) key-pad mask."""
    from bmhrl_tpu.ops import attention as fused

    B, Sq, _ = q3.shape
    Sk = k3.shape[1]
    key_mask = None if mask is None else mask[:, 0, :]
    if fused.flash_qualifies(Sq, Sk, att._d_k):
        return fused.flash_attention_bsd(
            q3, k3, v3, key_mask, att.H).astype(dtype)
    from bmhrl_tpu.models.attention import scaled_dot_attention

    m4 = None if mask is None else mask[:, None, :, :]
    out = scaled_dot_attention(att._heads(q3), att._heads(k3),
                               att._heads(v3), m4)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, -1).astype(dtype)


def _ln_params(res):
    n = res.norm.variables["params"]
    return n["scale"], n["bias"]


def _op_on(name: str) -> bool:
    """Diagnostic kill-switch (trace-time): BMHRL_FUSED_OPS limits which
    Pallas ops the glue uses — a comma list of op names, or unset/'all'
    for all. Ops switched off run their pure-XLA twins, keeping the glue
    structure (merged projections, BSD attend) intact so A/B runs can
    separate kernel cost from composition cost."""
    import os
    v = os.environ.get("BMHRL_FUSED_OPS", "all")
    return v == "all" or name in v.split(",")


# ---------------------------------------------------------------------------
# Monolithic flash + epilogue kernels (the "next frontier" named by the
# round-3 composition A/B): the attention middle and its epilogue run in ONE
# Pallas program, so the (B, S, H*d_k) context NEVER exists — each head's
# (bt, bq, d_k) context block is multiplied into the matching resident
# out-proj weight slice and accumulated in f32 — and there is no Pallas/XLA
# boundary between attention and epilogue for the compiler to insert layout
# copies at (the measured composition tax, ROUND3_NOTES §9.2).
#
# Per attention site vs the split flash + epilogue-op composition this
# removes one full (B, Sq, H*d_k) write + read (the ctx round trip) on top
# of the per-op fusions' savings. Three epilogues, matching the split ops:
#
#   flash_mr  (self-att):      out = x + ctx @ Wo + bo
#   flash_prf (cross-att+FFN): x2 = x + ctx @ Wo + bo
#                              out = x2 + relu(LN(x2) @ W1 + b1) @ W2 + b2
#   flash_mrl (DETR postnorm): out = LN(x + ctx @ Wo + bo)
#
# Grid/tiling follow ops/attention.py's batch-tiled flash layout
# ((B/bt, Sq/bq), q-tiles innermost so K/V blocks stay VMEM-resident across
# q-tiles); weights have constant block indices (fetched once). Numerics
# match the split path exactly-in-kind: f32 scores/softmax/accumulation,
# compute-dtype (cdt) matmul operands, f32 LN.
# ---------------------------------------------------------------------------


def _attend_outproj_acc(q_ref, k_ref, v_ref, mask_ref, wo_ref, *, H: int,
                        scale: float, cdt):
    """Flash attention over all heads with the out-projection folded in:
    returns sum_h softmax(q_h k_h^T) v_h @ Wo[h] as (bt, bq, Dq) f32.
    Refs as in ops/attention._flash_bsd_kernel plus resident wo (HD, Dq)."""
    d = q_ref.shape[2] // H
    Dq = wo_ref.shape[1]
    bt, bq = q_ref.shape[0], q_ref.shape[1]
    mask = mask_ref[:] > 0  # (bt, 1, Sk), broadcasts over queries
    acc = jnp.zeros((bt, bq, Dq), jnp.float32)
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (bt, bq, Sk) f32
        s = jnp.where(mask, s, -1e9)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (bt, bq, d)
        o = o / jnp.maximum(l, 1e-30)
        # fold the head's context straight into its out-proj slice: the
        # (bt, bq, HD) ctx never exists, in VMEM or HBM
        acc = acc + jax.lax.dot_general(
            o.astype(cdt), wo_ref[sl, :], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _flash_mr_kernel(q_ref, k_ref, v_ref, mask_ref, x_ref, wo_ref, bo_ref,
                     o_ref, *, H: int, scale: float, cdt):
    acc = _attend_outproj_acc(q_ref, k_ref, v_ref, mask_ref, wo_ref,
                              H=H, scale=scale, cdt=cdt)
    out = x_ref[:].astype(jnp.float32) + acc + bo_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _flash_prf_kernel(q_ref, k_ref, v_ref, mask_ref, x_ref, wo_ref, bo_ref,
                      g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                      H: int, scale: float, cdt):
    acc = _attend_outproj_acc(q_ref, k_ref, v_ref, mask_ref, wo_ref,
                              H=H, scale=scale, cdt=cdt)
    x2 = x_ref[:].astype(jnp.float32) + acc + bo_ref[:].astype(jnp.float32)
    xn = _ln_rows(x2, g_ref[:].astype(jnp.float32),
                  b_ref[:].astype(jnp.float32))
    h = jax.lax.dot_general(
        xn.astype(cdt), w1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
    f = jax.lax.dot_general(
        h.astype(cdt), w2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (x2 + f + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _flash_mrl_kernel(q_ref, k_ref, v_ref, mask_ref, x_ref, wo_ref, bo_ref,
                      g_ref, b_ref, o_ref, *, H: int, scale: float, cdt):
    acc = _attend_outproj_acc(q_ref, k_ref, v_ref, mask_ref, wo_ref,
                              H=H, scale=scale, cdt=cdt)
    x2 = x_ref[:].astype(jnp.float32) + acc + bo_ref[:].astype(jnp.float32)
    o_ref[:] = _ln_rows(x2, g_ref[:].astype(jnp.float32),
                        b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _epi_pick_tiles(B, Sq_pad, Sk_pad, HD, Dq, Dff, q_item, x_item,
                    weight_bytes, sq_align):
    """Largest (bt, bq) whose double-buffered activation blocks + resident
    weights + f32 scratch fit the VMEM budget. bt first (fewer programs),
    then bq — same preference order as the flash kernel's _pick_tiles."""
    for bt in (16, 8, 4, 2, 1):
        if bt > max(B, 1):
            continue
        for bq in (Sq_pad, 512, 256, 128, 64, 32, 16, 8):
            if bq > Sq_pad or bq % sq_align:
                continue
            need = (weight_bytes
                    + 2 * bt * bq * HD * q_item          # q, dbl-buffered
                    + 2 * 2 * bt * Sk_pad * HD * q_item  # k + v, dbl-buffered
                    + 2 * 2 * bt * bq * Dq * x_item      # x + out, dbl-buf
                    + bt * bq * Sk_pad * 4 * 2           # s + p f32, one head
                    + bt * bq * Dq * 4                   # out-proj acc f32
                    + bt * bq * (Dq + Dff) * 4)          # x2 + h f32 (prf)
            if need <= _VMEM_BUDGET:
                return bt, bq
    return None


def _epi_tiles(kind, B, Sq, Sk, HD, Dq, weights, q_dtype, x_dtype, cdt):
    """Tile config for a monolithic kernel launch, or None when no (bt, bq)
    fits VMEM with the weights resident (e.g. the prf kernel at Sa=800:
    full-Sk K/V blocks plus ~6 MB of FFN weights overflow the budget).
    Shared by _flash_epi_call and the glue's qualify gate so the glue can
    route non-fitting sites to the SPLIT flash + epilogue-op composition —
    the measured-faster path — instead of reaching the custom_vjp wrappers'
    pure-XLA safety fallback."""
    itemsize = 2 if cdt == jnp.bfloat16 else 4
    # 2D weights sit resident in the compute dtype; 1D biases/LN params in f32
    weight_bytes = sum(
        int(np.prod(w.shape)) * (itemsize if w.ndim == 2 else 4)
        for w in weights)
    Dff = weights[4].shape[1] if kind == "prf" else 0
    sq_align = 8 if jnp.dtype(q_dtype) == jnp.float32 else 16
    return _epi_pick_tiles(B, _ceil_to(Sq, sq_align), _ceil_to(Sk, 128),
                           HD, Dq, Dff, jnp.dtype(q_dtype).itemsize,
                           jnp.dtype(x_dtype).itemsize, weight_bytes,
                           sq_align)


def _flash_epi_call(kind, q, k, v, key_mask, x, weights, H: int, cdt):
    """Shared pallas_call driver for the three monolithic kernels.
    q/k/v: (B, Sq|Sk, HD) projections; key_mask: (B, Sk) int32 or None;
    x: (B, Sq, Dq) residual stream; weights: flat tuple of 2D/1D params
    (wo first — biases/LN params reshaped to (1, n) here). Returns
    (B, Sq, Dq) in x's dtype, or None when no tile config fits VMEM
    (caller falls back to the split composition)."""
    pl = _pl()
    B, Sq, HD = q.shape
    Sk = k.shape[1]
    Dq = x.shape[2]
    d = HD // H
    Sk_pad = _ceil_to(Sk, 128)
    tiles = _epi_tiles(kind, B, Sq, Sk, HD, Dq, weights, q.dtype, x.dtype,
                       cdt)
    if tiles is None:
        return None
    bt, bq = tiles
    Sq_pad = _ceil_to(Sq, bq)
    Bp = _ceil_to(B, bt)
    qp = jnp.pad(q, ((0, Bp - B), (0, Sq_pad - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, Bp - B), (0, Sk_pad - Sk), (0, 0)))
    vp = jnp.pad(v, ((0, Bp - B), (0, Sk_pad - Sk), (0, 0)))
    xp = jnp.pad(x, ((0, Bp - B), (0, Sq_pad - Sq), (0, 0)))
    if key_mask is None:
        key_mask = jnp.ones((B, Sk), jnp.int32)
    maskp = jnp.pad(key_mask.astype(jnp.int32),
                    ((0, Bp - B), (0, Sk_pad - Sk)))[:, None, :]

    scale = 1.0 / float(np.sqrt(d))
    kernels = {"mr": _flash_mr_kernel, "prf": _flash_prf_kernel,
               "mrl": _flash_mrl_kernel}
    kernel = functools.partial(kernels[kind], H=H, scale=scale, cdt=cdt)
    # weights: 2D stay 2D (constant index), 1D become (1, n)
    wargs, wspecs = [], []
    for w in weights:
        if w.ndim == 1:
            wargs.append(w.reshape(1, -1).astype(jnp.float32))
            wspecs.append(pl.BlockSpec((1, w.shape[0]), lambda b, i: (0, 0)))
        else:
            wargs.append(w.astype(cdt))
            wspecs.append(pl.BlockSpec(w.shape, lambda b, i: (0, 0)))
    grid = (Bp // bt, Sq_pad // bq)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bq, HD), lambda b, i: (b, i, 0)),
            pl.BlockSpec((bt, Sk_pad, HD), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bt, Sk_pad, HD), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bt, 1, Sk_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((bt, bq, Dq), lambda b, i: (b, i, 0)),
        ] + wspecs,
        out_specs=pl.BlockSpec((bt, bq, Dq), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Sq_pad, Dq), x.dtype),
        interpret=_interpret(),
        **_compiler_params(2),
    )(qp, kp, vp, maskp, xp, *wargs)
    return out[:B, :Sq]


def _heads(x, H):
    B, S, HD = x.shape
    return x.reshape(B, S, H, HD // H).transpose(0, 2, 1, 3)


def _xla_ctx(q3, k3, v3, key_mask, H, cdt):
    """XLA twin of the attention middle on un-headed projections, matching
    ops/attention's fallback numerics: f32 scores/softmax, PV in f32."""
    from bmhrl_tpu.ops.attention import _xla_attention_probs

    B, Sq, _ = q3.shape
    m4 = None if key_mask is None else (key_mask > 0)[:, None, None, :]
    p = _xla_attention_probs(_heads(q3, H).astype(jnp.float32),
                             _heads(k3, H).astype(jnp.float32), m4, False)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, _heads(v3, H).astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(B, Sq, -1).astype(cdt)


def _flash_mr_ref(q3, k3, v3, key_mask, x, wo, bo, H, cdt):
    ctx = _xla_ctx(q3, k3, v3, key_mask, H, cdt)
    B, Sq, Dq = x.shape
    out = _matmul_residual_ref(ctx.reshape(B * Sq, -1), wo, bo,
                               x.reshape(B * Sq, Dq), cdt)
    return out.reshape(B, Sq, Dq)


def _flash_prf_ref(q3, k3, v3, key_mask, x, wo, bo, g, b, w1, b1, w2, b2,
                   H, cdt):
    ctx = _xla_ctx(q3, k3, v3, key_mask, H, cdt)
    B, Sq, Dq = x.shape
    out = _proj_res_ffn_ref(ctx.reshape(B * Sq, -1), wo, bo,
                            x.reshape(B * Sq, Dq), g, b, w1, b1, w2, b2, cdt)
    return out.reshape(B, Sq, Dq)


def _flash_mrl_ref(q3, k3, v3, key_mask, x, wo, bo, g, b, H, cdt):
    ctx = _xla_ctx(q3, k3, v3, key_mask, H, cdt)
    B, Sq, Dq = x.shape
    out = _matmul_residual_ln_ref(ctx.reshape(B * Sq, -1), wo, bo,
                                  x.reshape(B * Sq, Dq), g, b, cdt)
    return out.reshape(B, Sq, Dq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def flash_mr(q3, k3, v3, key_mask, x, wo, bo, H, cdt=jnp.bfloat16):
    """Monolithic flash attention + out-proj + residual:
    out = x + attend(q3, k3, v3) @ Wo + bo, context never materialized.
    q3/k3/v3: (B, S, H*d_k); key_mask: (B, Sk) or None; x: (B, Sq, Dq)."""
    out = _flash_epi_call("mr", q3, k3, v3, key_mask, x, (wo, bo), H, cdt)
    if out is None:
        return _flash_mr_ref(q3, k3, v3, key_mask, x, wo, bo, H, cdt)
    return out


def _flash_mr_fwd(q3, k3, v3, key_mask, x, wo, bo, H, cdt):
    return (flash_mr(q3, k3, v3, key_mask, x, wo, bo, H, cdt),
            (q3, k3, v3, key_mask, x, wo, bo))


def _flash_mr_bwd(H, cdt, res, ct):
    q3, k3, v3, key_mask, x, wo, bo = res
    _, vjp = jax.vjp(
        lambda q, k, v, xx, w, bb: _flash_mr_ref(q, k, v, key_mask, xx, w,
                                                 bb, H, cdt),
        q3, k3, v3, x, wo, bo)
    dq, dk, dv, dx, dwo, dbo = vjp(ct)
    return dq, dk, dv, None, dx, dwo, dbo


flash_mr.defvjp(_flash_mr_fwd, _flash_mr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def flash_prf(q3, k3, v3, key_mask, x, wo, bo, g, b, w1, b1, w2, b2, H,
              cdt=jnp.bfloat16):
    """Monolithic flash attention + cross-attention epilogue + prenorm FFN:
    x2 = x + attend(q3,k3,v3) @ Wo + bo;
    out = x2 + relu(LN(x2) @ W1 + b1) @ W2 + b2 — one kernel, the context
    and the Dff intermediate never touch HBM."""
    out = _flash_epi_call("prf", q3, k3, v3, key_mask, x,
                          (wo, bo, g, b, w1, b1, w2, b2), H, cdt)
    if out is None:
        return _flash_prf_ref(q3, k3, v3, key_mask, x, wo, bo, g, b,
                              w1, b1, w2, b2, H, cdt)
    return out


def _flash_prf_fwd(q3, k3, v3, key_mask, x, wo, bo, g, b, w1, b1, w2, b2,
                   H, cdt):
    out = flash_prf(q3, k3, v3, key_mask, x, wo, bo, g, b, w1, b1, w2, b2,
                    H, cdt)
    return out, (q3, k3, v3, key_mask, x, wo, bo, g, b, w1, b1, w2, b2)


def _flash_prf_bwd(H, cdt, res, ct):
    q3, k3, v3, key_mask, x, wo, bo, g, b, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda q, k, v, *rest: _flash_prf_ref(q, k, v, key_mask, *rest,
                                              H, cdt),
        q3, k3, v3, x, wo, bo, g, b, w1, b1, w2, b2)
    grads = vjp(ct)
    return grads[:3] + (None,) + grads[3:]


flash_prf.defvjp(_flash_prf_fwd, _flash_prf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def flash_mrl(q3, k3, v3, key_mask, x, wo, bo, g, b, H, cdt=jnp.bfloat16):
    """Monolithic flash attention + post-norm epilogue (DETR encoder):
    out = LN(x + attend(q3,k3,v3) @ Wo + bo)."""
    out = _flash_epi_call("mrl", q3, k3, v3, key_mask, x, (wo, bo, g, b),
                          H, cdt)
    if out is None:
        return _flash_mrl_ref(q3, k3, v3, key_mask, x, wo, bo, g, b, H, cdt)
    return out


def _flash_mrl_fwd(q3, k3, v3, key_mask, x, wo, bo, g, b, H, cdt):
    return (flash_mrl(q3, k3, v3, key_mask, x, wo, bo, g, b, H, cdt),
            (q3, k3, v3, key_mask, x, wo, bo, g, b))


def _flash_mrl_bwd(H, cdt, res, ct):
    q3, k3, v3, key_mask, x, wo, bo, g, b = res
    _, vjp = jax.vjp(
        lambda q, k, v, *rest: _flash_mrl_ref(q, k, v, key_mask, *rest,
                                              H, cdt),
        q3, k3, v3, x, wo, bo, g, b)
    grads = vjp(ct)
    return grads[:3] + (None,) + grads[3:]


flash_mrl.defvjp(_flash_mrl_fwd, _flash_mrl_bwd)


def _flash_epi_qualifies(att, kind, B, Sq, Sk, x, q_dtype, cdt,
                         weights) -> bool:
    """Gate for the monolithic kernels: the attention middle must qualify
    for flash (enabled + key floor + lane-aligned d_k), every resident
    weight's output dim must tile the lane width, and a (bt, bq) config
    must FIT VMEM with the weights resident (_epi_tiles) — otherwise the
    glue keeps the split flash + epilogue-op composition, which the on-chip
    A/B measured faster than the XLA twin at every overflow-prone shape
    (Sv=300/Sa=800). The `flash_epi` op name participates in the
    BMHRL_FUSED_OPS kill-switch for A/B bisects."""
    from bmhrl_tpu.ops import attention as fatt

    Dq = x.shape[2]
    dims = [w.shape[1] for w in weights if w.ndim == 2]
    if not (fatt.flash_qualifies(Sq, Sk, att._d_k) and _op_on("flash_epi")
            and Dq % 128 == 0 and all(dm % 128 == 0 for dm in dims)):
        return False
    return _epi_tiles(kind, B, Sq, Sk, att.H * att._d_k, Dq, weights,
                      q_dtype, x.dtype, cdt) is not None


def fused_self_attention(att, res, x, mask, dtype):
    """res(x, self-attention(LN(x))): merged-QKV as ONE (D, 3D) GEMM (XLA —
    the on-chip per-op A/B measured the Pallas ln_matmul at 0.53-0.92x of
    XLA at every serving row count: the GEMM is compute-bound, so the
    row-tiled schedule's M=~128 programs starve the MXU while the LN fusion
    saves almost no traffic; see tools/encoder_fused_kernbench.py), then
    out-proj+residual as a single-pass Pallas op."""
    B, S, Dm = x.shape
    w, b = att.merged_qkv_params()
    g, be = _ln_params(res)
    qkv = _ln_matmul_xla(x.reshape(B * S, Dm), g, be, w, b, False, dtype)
    q3, k3, v3 = jnp.split(qkv.reshape(B, S, -1), 3, axis=-1)
    po = att.linear_d2Q.variables["params"]
    if _flash_epi_qualifies(att, "mr", B, S, S, x, q3.dtype, dtype,
                            (po["kernel"], po["bias"])):
        key_mask = None if mask is None else mask[:, 0, :].astype(jnp.int32)
        return flash_mr(q3, k3, v3, key_mask, x, po["kernel"], po["bias"],
                        att.H, dtype)
    ctx3 = attend_bsd(att, q3, k3, v3, mask, dtype)
    mr = matmul_residual if _op_on("matmul_residual") else \
        (lambda y, w, bias, xx, cdt: _matmul_residual_ref(y, w, bias, xx, cdt))
    out = mr(ctx3.reshape(B * S, -1), po["kernel"], po["bias"],
             x.reshape(B * S, Dm), dtype)
    return out.reshape(B, S, Dm)


def _attention_epilogue_ffn(att, ff, res_ff, ctx3, xq, dtype):
    """out-proj + residual + LN + FFN + residual in ONE pass."""
    B, Sq, Dq = xq.shape
    po = att.linear_d2Q.variables["params"]
    g, be = _ln_params(res_ff)
    p1 = ff.fc1.variables["params"]
    p2 = ff.fc2.variables["params"]
    prf = proj_res_ffn if _op_on("proj_res_ffn") else \
        (lambda *a: _proj_res_ffn_ref(*a))
    out = prf(
        ctx3.reshape(B * Sq, -1), po["kernel"], po["bias"],
        xq.reshape(B * Sq, Dq), g, be,
        p1["kernel"], p1["bias"], p2["kernel"], p2["bias"], dtype)
    return out.reshape(B, Sq, Dq)


def fused_cross_ffn(att, res_att, ff, res_ff, xq, xkv, mask_kv, dtype):
    """res(xq, cross-attention) then res(., FFN): the Q projection takes the
    fused LN+matmul; the K/V projections of the raw other-modality memory
    merge into one XLA matmul (no LN ahead of them — the reference applies
    cross-attention to the raw residual stream); the tail is one pass."""
    B, Sq, Dq = xq.shape
    g, be = _ln_params(res_att)
    pq = att.linear_Q2d.variables["params"]
    # XLA LN+matmul: the Pallas ln_matmul measured slower (see
    # fused_self_attention); the tail proj_res_ffn is the measured winner.
    q3 = _ln_matmul_xla(xq.reshape(B * Sq, Dq), g, be,
                        pq["kernel"], pq["bias"], False, dtype)
    q3 = q3.reshape(B, Sq, -1)
    pk = att.linear_K2d.variables["params"]
    pv = att.linear_V2d.variables["params"]
    wkv = jnp.concatenate([pk["kernel"], pv["kernel"]], axis=1).astype(dtype)
    bkv = jnp.concatenate([pk["bias"], pv["bias"]]).astype(dtype)
    kv = xkv.astype(dtype) @ wkv + bkv
    k3, v3 = jnp.split(kv, 2, axis=-1)
    Sk = xkv.shape[1]
    p1 = ff.fc1.variables["params"]
    po = att.linear_d2Q.variables["params"]
    gf, bf = _ln_params(res_ff)
    p2 = ff.fc2.variables["params"]
    wts = (po["kernel"], po["bias"], gf, bf, p1["kernel"], p1["bias"],
           p2["kernel"], p2["bias"])
    if _flash_epi_qualifies(att, "prf", B, Sq, Sk, xq, q3.dtype, dtype, wts):
        key_mask = (None if mask_kv is None
                    else mask_kv[:, 0, :].astype(jnp.int32))
        return flash_prf(q3, k3, v3, key_mask, xq, *wts, att.H, dtype)
    ctx3 = attend_bsd(att, q3, k3, v3, mask_kv, dtype)
    return _attention_epilogue_ffn(att, ff, res_ff, ctx3, xq, dtype)


def fused_postnorm_layer(att, norm1, lin1, lin2, norm2, src, q, mask, dtype):
    """DETR post-norm encoder layer body (ref encoder.py:39-75) after
    ``q = pos_enc(src)``: Q/K project from the pos-carrying ``q`` (merged
    matmul), V from the raw ``src``; then LN(src + out-proj(ctx)) and
    LN(x + FFN(x)) each run as one fused pass. ``norm1``/``norm2`` are
    bound nn.LayerNorm modules, ``lin1``/``lin2`` bound nn.Dense."""
    B, S, D = src.shape
    pq = att.linear_Q2d.variables["params"]
    pk = att.linear_K2d.variables["params"]
    wqk = jnp.concatenate([pq["kernel"], pk["kernel"]], axis=1).astype(dtype)
    bqk = jnp.concatenate([pq["bias"], pk["bias"]]).astype(dtype)
    qk = q.astype(dtype) @ wqk + bqk
    q3, k3 = jnp.split(qk, 2, axis=-1)
    v3 = att.linear_V2d(src.astype(dtype))
    po = att.linear_d2Q.variables["params"]
    n1 = norm1.variables["params"]
    if _flash_epi_qualifies(att, "mrl", B, S, S, src, q3.dtype, dtype,
                            (po["kernel"], po["bias"], n1["scale"],
                             n1["bias"])):
        key_mask = None if mask is None else mask[:, 0, :].astype(jnp.int32)
        x1 = flash_mrl(q3, k3, v3, key_mask, src, po["kernel"], po["bias"],
                       n1["scale"], n1["bias"], att.H, dtype)
        x1 = x1.reshape(B * S, D)
    else:
        ctx3 = attend_bsd(att, q3, k3, v3, mask, dtype)
        mrl = matmul_residual_ln if _op_on("matmul_residual_ln") else \
            (lambda *a: _matmul_residual_ln_ref(*a))
        x1 = mrl(
            ctx3.reshape(B * S, -1), po["kernel"], po["bias"],
            src.reshape(B * S, D), n1["scale"], n1["bias"], dtype)
    p1 = lin1.variables["params"]
    p2 = lin2.variables["params"]
    n2 = norm2.variables["params"]
    frl = ffn_residual_ln if _op_on("ffn_residual_ln") else \
        (lambda *a: _ffn_residual_ln_ref(*a))
    out = frl(x1, p1["kernel"], p1["bias"], p2["kernel"],
              p2["bias"], n2["scale"], n2["bias"], dtype)
    return out.reshape(B, S, D).astype(dtype)


def fused_self_ffn(att, res_att, ff, res_ff, x, mask, dtype):
    """Unimodal layer body: res(x, self-attention) then res(., FFN) with the
    whole attention epilogue + FFN block as one pass."""
    B, S, Dm = x.shape
    w, b = att.merged_qkv_params()
    g, be = _ln_params(res_att)
    # XLA LN + merged-QKV GEMM (Pallas ln_matmul measured slower; see
    # fused_self_attention)
    qkv = _ln_matmul_xla(x.reshape(B * S, Dm), g, be, w, b, False, dtype)
    q3, k3, v3 = jnp.split(qkv.reshape(B, S, -1), 3, axis=-1)
    p1 = ff.fc1.variables["params"]
    po = att.linear_d2Q.variables["params"]
    gf, bf = _ln_params(res_ff)
    p2 = ff.fc2.variables["params"]
    wts = (po["kernel"], po["bias"], gf, bf, p1["kernel"], p1["bias"],
           p2["kernel"], p2["bias"])
    if _flash_epi_qualifies(att, "prf", B, S, S, x, q3.dtype, dtype, wts):
        key_mask = None if mask is None else mask[:, 0, :].astype(jnp.int32)
        return flash_prf(q3, k3, v3, key_mask, x, *wts, att.H, dtype)
    ctx3 = attend_bsd(att, q3, k3, v3, mask, dtype)
    return _attention_epilogue_ffn(att, ff, res_ff, ctx3, x, dtype)
