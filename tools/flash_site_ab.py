"""A/B the K/V-streaming flash kernel against the one-pass kernel on
ISOLATED attention sites (no encoder around them), across candidate tile
configs. The interesting sites are the long-source ones where the one-pass
picker lands on bt=1 (VERDICT r2 item 6's shapes: Sv=300, Sa=800 dataset
caps). Usage:

    python tools/flash_site_ab.py [BxSqxSkxHD ...]
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

from bmhrl_tpu.ops import attention as A

H = 4
SITES = [(256, 300, 800, 1024), (256, 800, 800, 1024), (256, 300, 300, 1024),
         (32, 300, 800, 1024), (1024, 128, 256, 1024)]
if len(sys.argv) > 1:
    SITES = [tuple(int(x) for x in s.split("x")) for s in sys.argv[1:]]

A.enable_flash(True)


def bench(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out[:, 0, 0]))  # compile + sync (tunnel-reliable)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out[:, 0, 0]))
    return (time.perf_counter() - t0) / reps * 1e3


for B, Sq, Sk, HD in SITES:
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Sq, HD) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, Sk, HD) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, Sk, HD) * 0.1, jnp.bfloat16)
    mask = jnp.ones((B, Sk), jnp.int32)

    sq_align = 16
    Sq_pad = A._ceil_to(Sq, sq_align)
    Sk_pad = A._ceil_to(Sk, 128)
    one_tiles = A._pick_tiles(B, Sq_pad, Sk_pad, HD, 2, sq_align)
    print(f"\n== B={B} Sq={Sq} Sk={Sk} HD={HD}  one-pass tiles={one_tiles}",
          flush=True)

    A._STREAM_MODE = "off"
    t_one = bench(jax.jit(lambda q, k, v, m: A._flash_bsd_call(
        q, k, v, m, H, False)), q, k, v, mask)
    print(f"  one-pass: {t_one:7.2f} ms", flush=True)

    # candidate streaming tile configs that fit the budget
    cands = []
    for bt in (16, 8, 4, 2, 1):
        if bt > B:
            continue
        for bq in (256, 128, 64, 32):
            if bq > Sq_pad:
                continue
            for sk in (512, 256, 128):
                if sk >= Sk_pad:
                    continue
                if A._stream_vmem_estimate(bt, bq, sk, HD,
                                           2) <= A._VMEM_BUDGET:
                    cands.append((bt, bq, sk))
                    break  # largest fitting sk per (bt, bq)
    # keep it bounded: the best (largest) bq per bt plus the picker's pick
    seen, keep = set(), []
    for c in cands:
        if c[0] not in seen:
            keep.append(c)
            seen.add(c[0])
    pick = A._pick_stream_tiles(B, Sq_pad, Sk_pad, HD, 2, sq_align)
    if pick is not None and pick not in keep:
        keep.append(pick)
    for tiles in keep:
        t = bench(jax.jit(lambda q, k, v, m, _t=tiles: A._flash_stream_call(
            q, k, v, m, H, False, _t)), q, k, v, mask)
        tag = " <- picker" if tiles == pick else ""
        print(f"  stream bt={tiles[0]:2d} bq={tiles[1]:3d} sk={tiles[2]:3d}:"
              f" {t:7.2f} ms ({t_one / t:.2f}x){tag}", flush=True)
