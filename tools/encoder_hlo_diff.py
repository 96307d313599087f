"""Dump + summarize the optimized HLO of the encoder forward with the
fused-glue routing on vs off, to localize the composition penalty the
on-chip A/B measured (glue slower even with ALL Pallas ops replaced by
XLA twins). Prints per-leg: #fusions by kind, big convert/copy/transpose
ops, and XLA cost-analysis bytes.

Usage: python tools/encoder_hlo_diff.py [BxSvxSa]
"""
import os
import re
import sys
from collections import Counter

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

B, Sv, Sa = (int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                              else "1024x128x256").split("x"))
VOC = 10172
model = BMHrlAgent(voc_size=VOC)
rng = np.random.RandomState(0)
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
V = feats["rgb"] + feats["flow"]
A = feats["audio"]


def analyze(name, fused_on):
    fused.enable_flash(True)
    enc_fused.enable_encoder_fusion(fused_on)

    @jax.jit
    def enc(params, V, A, masks):
        out = model.apply(params, V, A, masks, method="encode")
        return jnp.sum(out[0][:, 0, 0]) + jnp.sum(out[1][:, 0, 0])

    compiled = enc.lower(params, V, A, masks).compile()
    txt = compiled.as_text()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    kinds = Counter()
    big = Counter()
    for line in txt.splitlines():
        m = re.search(r"= (\w+)\(", line)
        line_s = line.strip()
        m2 = re.match(r"%?[\w.\-]+ = (\S+?)\{?\[", line_s)
        if "fusion(" in line:
            km = re.search(r"kind=(\w+)", line)
            kinds["fusion:" + (km.group(1) if km else "?")] += 1
        for op in ("copy(", "transpose(", "convert(", "custom-call(",
                   "all-reduce(", "bitcast-convert("):
            if "= " in line and op in line.split("= ", 1)[-1][:60]:
                # estimate tensor bytes from the result shape
                sm = re.match(r"\s*%?[\w.\-]+ = (\w+)\[([\d,]*)\]", line)
                bytes_ = 0
                if sm:
                    dt, dims = sm.groups()
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    bytes_ = n * {"f32": 4, "bf16": 2, "s32": 4, "pred": 1,
                                  "u32": 4, "f16": 2}.get(dt, 4)
                if bytes_ >= 64 * 1024 * 1024:
                    big[f"{op[:-1]} >=64MB"] += 1
                kinds[op[:-1]] += 1
    print(f"== {name} ==")
    print(f"  bytes accessed: {ca.get('bytes accessed', 0)/1e9:.2f} GB   "
          f"flops: {ca.get('flops', 0)/1e12:.2f} TF")
    for kk, v in sorted(kinds.items()):
        print(f"  {kk}: {v}")
    for kk, v in sorted(big.items()):
        print(f"  BIG {kk}: {v}")
    with open(f"/tmp/hlo_{name}.txt", "w") as f:
        f.write(txt)
    print(f"  (full HLO -> /tmp/hlo_{name}.txt)", flush=True)


analyze("plain", False)
analyze("glue", True)
