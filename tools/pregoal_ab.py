"""A/B: pre_goal_attention frontier decode with vs without the per-clip
precomputed memory/object K/V (VERDICT r2 item 9 measured-speedup
artifact). Also measures the default DETR frontier loop both ways."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bmhrl_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.models.detr import DetrCaption
from bmhrl_tpu.ops.masking import make_masks
from bmhrl_tpu.train import decode as D

B, Sv, MAXLEN = 32, 300, 30
VOC = 10172

for pre_goal in (True, False):
    model = DetrCaption(voc_size=VOC, pre_goal_attention=pre_goal)
    rng = np.random.RandomState(0)
    feats = {
        "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "audio": jnp.asarray(rng.rand(B, 8, 128), jnp.float32),
    }
    masks_src = make_masks(feats, None, "audio_video", 1)
    trg0 = jnp.full((B, 8), 1, jnp.int32).at[:, 0].set(2)
    m0 = make_masks(feats, trg0, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, m0)
    V = feats["rgb"] + feats["flow"]
    Va, Av = jax.jit(lambda p, V, A, m: model.apply(p, V, A, m,
                                                    method="encode"))(
        params, V, feats["audio"], masks_src)

    res = {}
    for name, with_kv in (("cached", True), ("uncached", False)):
        if with_kv:
            loop = jax.jit(lambda p, Va, Av, m: D._decode_loop(
                model, p, Va, Av, m, B, MAXLEN, 2, -1, 1, True, None),
                static_argnums=())
        else:
            # disable the precompute hook for this trace
            saved = DetrCaption.precompute_fusion_kv
            del DetrCaption.precompute_fusion_kv
            loop = jax.jit(lambda p, Va, Av, m: D._decode_loop(
                model, p, Va, Av, m, B, MAXLEN, 2, -1, 1, True, None))
        toks, _ = loop(params, Va, Av, masks_src)
        first = np.asarray(toks)
        iters = 4
        t0 = time.time()
        for _ in range(iters):
            toks, _ = loop(params, Va, Av, masks_src)
        np.asarray(toks)
        res[name] = (time.time() - t0) / iters * 1e3
        if not with_kv:
            DetrCaption.precompute_fusion_kv = saved
        else:
            cached_toks = first
    same = np.array_equal(cached_toks, np.asarray(toks))
    print(f"pre_goal={pre_goal}: uncached={res['uncached']:.0f} ms "
          f"cached={res['cached']:.0f} ms "
          f"({res['uncached']/res['cached']:.2f}x)  tokens_equal={same}",
          flush=True)
