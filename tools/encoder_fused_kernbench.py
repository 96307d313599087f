"""Kernel-level A/B for the fused encoder ops (ops/encoder_fused.py):
each op vs its pure-XLA twin, in isolation, at the serving row counts.

The integration-level A/B (tools/encoder_fused_ab.py) showed flash+fused
LOSING to flash-only at every shape (0.84-0.98x, 2026-08-18 on-chip run)
even though the byte model predicts ~1.6x less HBM traffic. This tool
answers WHERE the loss comes from: the kernels themselves, or the
composition (layout changes / lost XLA fusion around them).

Usage: python tools/encoder_fused_kernbench.py [rows ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bmhrl_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.ops import encoder_fused as ef

ROWS = [int(a) for a in sys.argv[1:]] or [131072, 32768, 76800]
D = int(os.environ.get("KB_D", "1024"))      # model dim (audio side: 128)
DFF = int(os.environ.get("KB_DFF", str(D)))  # prenorm FFN dim (audio: 512)
rng = np.random.RandomState(0)


def bench(fn, *args):
    # host-fetch sync (axon tunnel: block_until_ready can return early);
    # every operand is a jit ARG so no array is baked into the executable
    f = jax.jit(lambda *a: jnp.sum(fn(*a)[:1, :1]))
    float(f(*args))
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        s = f(*args)
    float(s)
    return (time.time() - t0) / iters * 1e3


for R in ROWS:
    x = jnp.asarray(rng.rand(R, D), jnp.bfloat16)
    ctx = jnp.asarray(rng.rand(R, D), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    wqkv = jnp.asarray(rng.rand(D, 3 * D) * 0.02, jnp.float32)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wo = jnp.asarray(rng.rand(D, D) * 0.02, jnp.float32)
    bo = jnp.zeros((D,), jnp.float32)
    w1 = jnp.asarray(rng.rand(D, DFF) * 0.02, jnp.float32)
    b1 = jnp.zeros((DFF,), jnp.float32)
    w2 = jnp.asarray(rng.rand(DFF, D) * 0.02, jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)

    legs = [
        ("ln_matmul(QKV 1024->3072)",
         lambda xx, cc: ef.ln_matmul(xx, g, b, wqkv, bqkv),
         lambda xx, cc: ef._ln_matmul_ref(xx, g, b, wqkv, bqkv, False,
                                          jnp.bfloat16)),
        ("matmul_residual(1024->1024)",
         lambda xx, cc: ef.matmul_residual(cc, wo, bo, xx),
         lambda xx, cc: ef._matmul_residual_ref(cc, wo, bo, xx,
                                                jnp.bfloat16)),
        ("proj_res_ffn(d_ff=1024)",
         lambda xx, cc: ef.proj_res_ffn(cc, wo, bo, xx, g, b, w1, b1, w2, b2),
         lambda xx, cc: ef._proj_res_ffn_ref(cc, wo, bo, xx, g, b, w1, b1,
                                             w2, b2, jnp.bfloat16)),
    ]
    w1d = jnp.asarray(rng.rand(D, 2 * D) * 0.02, jnp.float32)
    b1d = jnp.zeros((2 * D,), jnp.float32)
    w2d = jnp.asarray(rng.rand(2 * D, D) * 0.02, jnp.float32)
    legs += [
        ("matmul_residual_ln(1024->1024, DETR post-norm)",
         lambda xx, cc: ef.matmul_residual_ln(cc, wo, bo, xx, g, b),
         lambda xx, cc: ef._matmul_residual_ln_ref(cc, wo, bo, xx, g, b,
                                                   jnp.bfloat16)),
        ("ffn_residual_ln(d_ff=2048, DETR post-norm)",
         lambda xx, cc: ef.ffn_residual_ln(xx, w1d, b1d, w2d, b2, g, b),
         lambda xx, cc: ef._ffn_residual_ln_ref(xx, w1d, b1d, w2d, b2, g, b,
                                                jnp.bfloat16)),
    ]
    for name, fused_fn, ref_fn in legs:
        tf = bench(fused_fn, x, ctx)
        tr = bench(ref_fn, x, ctx)
        print(f"R={R} {name}: fused={tf:.2f} ms  xla={tr:.2f} ms  "
              f"(fused vs xla {tr / tf:.2f}x)", flush=True)
