"""AOT serving bundles: compile the decode once, deploy it without model code.

``jax.export`` serializes the jitted greedy decode (encoder + KV-cached
token loop, ref semantics: epoch_loops/validation_loops.py:13-117) to
StableHLO per (batch, video-bucket, audio-bucket) shape. A bundle directory
holds those blobs plus the params (npz) and the vocab, so a serving host
needs only this loader — no flax model classes, no retracing, no compile
wait beyond XLA's final lowering of the portable artifact.

Layout of a bundle dir:
    bundle.json                     shapes, vocab itos, max_len, platform
    params.npz                      flattened param tree ("a/b/c" keys)
    decode_B{B}xV{vb}xA{ab}.bin     serialized jax.export blob per shape

Blobs are platform-checked by jax.export at call time (a TPU-exported
bundle refuses to run on CPU and vice versa — record keeping, not policy).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from bmhrl_tpu.data.vocab import BOS, EOS, PAD
from bmhrl_tpu.serve import CaptionServer


def _to_plain(tree):
    """FrozenDict/Mapping -> plain nested dict (stable export pytree)."""
    try:
        items = tree.items()
    except AttributeError:
        return tree
    return {k: _to_plain(v) for k, v in items}


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if hasattr(v, "items"):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _blob_name(B: int, vb: int, ab: int) -> str:
    return f"decode_B{B}xV{vb}xA{ab}.bin"


def export_decode_bundle(
    cfg,
    model,
    params,
    itos: Sequence[str],
    shapes: Sequence[Tuple[int, int, int]],
    out_dir: str,
    beam_width: int = 1,
    length_penalty: float = 0.0,
) -> Dict:
    """Export the decode at each (B, video_bucket, audio_bucket) shape —
    greedy by default, beam search when ``beam_width`` > 1 (baked into the
    compiled artifact).

    ``params`` is the model variable collection ({"params": ...}); it is
    saved once and passed to every exported call (blobs stay small — the
    weights are inputs, not baked-in constants)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from bmhrl_tpu.ops.masking import make_masks
    from bmhrl_tpu.train.decode import beam_decode, decode

    os.makedirs(out_dir, exist_ok=True)
    params = _to_plain(params)

    def decode_fn(p, rgb, flow, audio):
        feats = {"rgb": rgb, "flow": flow, "audio": audio}
        masks_src = make_masks(feats, None, "audio_video", PAD)
        if beam_width > 1:
            tokens, _ = beam_decode(model, p, feats, masks_src, cfg.max_len,
                                    BOS, EOS, PAD, beam_width=beam_width,
                                    length_penalty=length_penalty)
        else:
            tokens, _ = decode(model, p, feats, masks_src, cfg.max_len,
                               BOS, EOS, PAD, greedy=True)
        return tokens

    if not shapes:
        raise ValueError("export_decode_bundle: no shapes requested")
    p_avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
    manifest_shapes: List[List[int]] = []
    for (B, vb, ab) in shapes:
        exp = jexport.export(jax.jit(decode_fn))(
            p_avals,
            jax.ShapeDtypeStruct((B, vb, cfg.d_vid), jnp.float32),
            jax.ShapeDtypeStruct((B, vb, cfg.d_vid), jnp.float32),
            jax.ShapeDtypeStruct((B, ab, cfg.d_aud), jnp.float32),
        )
        with open(os.path.join(out_dir, _blob_name(B, vb, ab)), "wb") as f:
            f.write(exp.serialize())
        manifest_shapes.append([int(B), int(vb), int(ab)])

    np.savez(os.path.join(out_dir, "params.npz"), **_flatten(params))
    manifest = {
        "shapes": manifest_shapes,
        "itos": list(itos),
        "max_len": int(cfg.max_len),
        "d_vid": int(cfg.d_vid),
        "d_aud": int(cfg.d_aud),
        "mode": cfg.mode,
        "beam_width": int(beam_width),
        "length_penalty": float(length_penalty),
        "platforms": list(getattr(exp, "platforms", ())),
    }
    with open(os.path.join(out_dir, "bundle.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


class ExportedCaptionServer(CaptionServer):
    """CaptionServer that runs a pre-exported bundle — no model classes.

    Scheduling/IO is inherited; only the decode call differs: each batch's
    (B, vb, ab) shape must exactly match an exported blob, so tail batches
    are always row-padded to the bundle's batch sizes."""

    def __init__(self, bundle_dir: str, video_features_path: str,
                 audio_features_path: str, mesh=None):
        import jax

        from bmhrl_tpu.config import Config

        with open(os.path.join(bundle_dir, "bundle.json")) as f:
            self.manifest = json.load(f)
        m = self.manifest
        vbuckets = tuple(sorted({s[1] for s in m["shapes"]}))
        abuckets = tuple(sorted({s[2] for s in m["shapes"]}))
        cfg = Config(
            mode=m.get("mode", "BMHRL"), max_len=m["max_len"],
            d_vid=m["d_vid"], d_aud=m["d_aud"],
            video_buckets=vbuckets, audio_buckets=abuckets,
            video_features_path=video_features_path,
            audio_features_path=audio_features_path, to_log=False)
        flat = np.load(os.path.join(bundle_dir, "params.npz"))
        params = _unflatten({k: flat[k] for k in flat.files})
        super().__init__(cfg, model=None, params=params, itos=m["itos"],
                         mesh=mesh)
        self._fixed_batch = True
        self._batch_sizes = sorted({s[0] for s in m["shapes"]})
        if mesh is not None:
            n = int(mesh.devices.shape[0])
            bad = [b for b in self._batch_sizes if b % n]
            if bad:
                raise ValueError(
                    f"bundle batch sizes {bad} are not divisible by the "
                    f"mesh data axis ({n}); batches would pad to shapes "
                    "with no exported blob — re-export with divisible "
                    "batch sizes or serve on a matching mesh")
        self._calls = {}
        from jax import export as jexport

        for (B, vb, ab) in m["shapes"]:
            with open(os.path.join(bundle_dir, _blob_name(B, vb, ab)),
                      "rb") as f:
                exp = jexport.deserialize(f.read())
            self._calls[(B, vb, ab)] = jax.jit(exp.call)

    def _decode(self, feats: Dict, masks_src: Dict) -> np.ndarray:
        B, vb = feats["rgb"].shape[:2]
        ab = feats["audio"].shape[1]
        key = (int(B), int(vb), int(ab))
        call = self._calls.get(key)
        if call is None:
            raise KeyError(
                f"no exported decode for shape {key}; bundle has "
                f"{sorted(self._calls)}")
        return np.asarray(call(self.params, feats["rgb"], feats["flow"],
                               feats["audio"]))

    def caption(self, reqs, batch_size: Optional[int] = None, **kw):
        bs = batch_size or max(self._batch_sizes)
        if bs not in self._batch_sizes:
            raise ValueError(
                f"batch_size {bs} not in bundle (has {self._batch_sizes})")
        return super().caption(reqs, batch_size=bs, **kw)
