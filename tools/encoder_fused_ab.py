"""A/B: encoder forward with the fused encoder-layer Pallas ops
(ops/encoder_fused.py) on/off, at the serving shapes from VERDICT item 1.
Flash attention stays ON both ways (the production baseline this round
improves on); a third leg measures everything off for reference.

Usage: python tools/encoder_fused_ab.py [BxSvxSa ...]
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

from bmhrl_tpu.models.bmhrl import BMHrlAgent
from bmhrl_tpu.ops import attention as fused
from bmhrl_tpu.ops import encoder_fused as enc_fused
from bmhrl_tpu.ops.masking import make_masks

VOC = 10172
model = BMHrlAgent(voc_size=VOC)
rng = np.random.RandomState(0)

SHAPES = [(1024, 128, 256), (256, 300, 800), (32, 128, 256),
          (256, 128, 256), (32, 300, 800)]
if len(sys.argv) > 1:
    SHAPES = [tuple(int(x) for x in s.split("x")) for s in sys.argv[1:]]

for B, Sv, Sa in SHAPES:
    feats = {
        "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
        "audio": jnp.asarray(rng.rand(B, Sa, 128), jnp.float32),
    }
    masks = make_masks(feats, None, "audio_video", 1)
    k = jax.random.PRNGKey(0)
    trg0 = jnp.full((B, 8), 1, jnp.int32).at[:, 0].set(2)
    m0 = make_masks(feats, trg0, "audio_video", 1)
    params = jax.jit(model.init)(
        {"params": k, "dropout": k, "noise": k},
        (feats["rgb"] + feats["flow"], feats["audio"]), trg0, m0)

    def make_enc():
        # fresh function object per setting: the gates are globals read at
        # TRACE time and jit's cache is keyed on function identity
        @jax.jit
        def enc(params, V, A, masks):
            out = model.apply(params, V, A, masks, method="encode")
            # scalar reduce: host-fetch is the only reliable sync on the
            # axon tunnel (block_until_ready returns early there)
            return jnp.sum(out[0][:, 0, 0]) + jnp.sum(out[1][:, 0, 0])
        return enc

    V = feats["rgb"] + feats["flow"]
    A = feats["audio"]
    res = {}
    legs = (("xla", False, False), ("flash", True, False),
            ("flash+fused", True, True))
    for name, flash_on, fused_on in legs:
        fused.enable_flash(flash_on)
        enc_fused.enable_encoder_fusion(fused_on)
        enc = make_enc()
        float(enc(params, V, A, masks))  # compile + warm
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            s = enc(params, V, A, masks)
        float(s)
        res[name] = (time.time() - t0) / iters * 1e3
    print(f"B={B} Sv={Sv} Sa={Sa}: xla={res['xla']:.1f} ms "
          f"flash={res['flash']:.1f} ms "
          f"flash+fused={res['flash+fused']:.1f} ms  "
          f"(fused vs flash {res['flash']/res['flash+fused']:.2f}x)",
          flush=True)


# ---- DETR encoder (post-norm kernels) at its serving shapes ----------------
from bmhrl_tpu.models.detr import DetrCaption  # noqa: E402

for B, Sv in ((32, 300), (128, 300)):
  try:
      dmodel = DetrCaption(voc_size=VOC)
      feats = {
          "rgb": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
          "flow": jnp.asarray(rng.rand(B, Sv, 1024), jnp.float32),
          "audio": jnp.asarray(rng.rand(B, 128, 128), jnp.float32),
      }
      masks = make_masks(feats, None, "audio_video", 1)
      trg0 = jnp.full((B, 8), 1, jnp.int32).at[:, 0].set(2)
      m0 = make_masks(feats, trg0, "audio_video", 1)
      k = jax.random.PRNGKey(0)
      params = jax.jit(dmodel.init)(
          {"params": k, "dropout": k, "noise": k},
          (feats["rgb"] + feats["flow"], feats["audio"]), trg0, m0)

      def make_detr_enc():
          @jax.jit
          def enc(params, V, A, masks):
              mem, hs_obj = dmodel.apply(params, V, A, masks, method="encode")
              return jnp.sum(mem[:, 0, 0]) + jnp.sum(hs_obj[:, 0, 0])
          return enc

      V = feats["rgb"] + feats["flow"]
      A = feats["audio"]
      res = {}
      for name, flash_on, fused_on in legs:
          fused.enable_flash(flash_on)
          enc_fused.enable_encoder_fusion(fused_on)
          enc = make_detr_enc()
          float(enc(params, V, A, masks))
          iters = 5
          t0 = time.time()
          for _ in range(iters):
              s = enc(params, V, A, masks)
          float(s)
          res[name] = (time.time() - t0) / iters * 1e3
      if res:
          print(f"DETR B={B} Sv={Sv}: xla={res['xla']:.1f} ms "
                f"flash={res['flash']:.1f} ms "
                f"flash+fused={res['flash+fused']:.1f} ms  "
                f"(fused vs flash {res['flash']/res['flash+fused']:.2f}x)",
                flush=True)
  except Exception as e:
    print(f"DETR leg B={B} failed: {e}", flush=True)
