"""Offline batch-captioning serving engine.

The reference's only inference surface is the validation loop
(ref: epoch_loops/validation_loops.py:13-117): dataset-order batches, a full
model re-forward per generated token, no length grouping — fine for eval,
not a serving path. This engine is the production counterpart:

- **Length-aware scheduling.** Each request's post-crop feature lengths are
  computed from the ``.npy`` headers alone (``np.load(mmap_mode="r")`` reads
  the shape without the data, plus the proportional-crop arithmetic of
  data/features.crop_a_segment, ref: load_features.py:14-34). Requests are
  grouped by (video-bucket, audio-bucket) so short clips never pay
  dataset-max padding, and the compile count is bounded by the bucket grid
  (default 5x5) times the distinct batch shapes.
- **Static shapes.** Full batches run at (batch_size, vb, ab); the tail of
  each bucket group is row-padded up to the next power of two (masked out
  via ``n_valid``), so the jitted decode compiles once per bucket pair for
  full batches plus at most log2(batch_size) tail shapes — small tails
  don't pay a full-batch decode and the compile count stays bounded.
- **Overlapped IO.** Feature loading runs in a thread pool; a background
  prefetcher dispatches async host->device transfers so the copy of batch
  t+1 overlaps the decode of batch t (data/dataset.Prefetcher).
- **KV-cached decode.** train/decode.decode — encoder once per clip, O(1)
  positions per token (token-exact with the full-buffer path, tested).
- **Data-parallel mesh.** Pass ``mesh_shape=(n, 1)`` to shard request
  batches across chips; params are replicated, batches land pre-sharded.

Results come back in the ANet submission format the reference emits
(ref: validation_loops.py:87-117), so downstream eval tooling is shared.
"""
from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from bmhrl_tpu.config import Config
from bmhrl_tpu.data import features as F
from bmhrl_tpu.data.dataset import Prefetcher
from bmhrl_tpu.data.vocab import BOS, EOS, PAD


@dataclass
class ClipRequest:
    """One segment to caption: feature files + the event time span."""

    video_id: str
    start: float
    end: float
    duration: float
    # per-request feature-dir overrides (mirrors MetaRow's)
    video_dir: Optional[str] = None
    audio_dir: Optional[str] = None


@dataclass
class ServeStats:
    clips: int = 0
    batches: int = 0
    compiles: int = 0  # distinct (B, vb, ab) shapes seen
    wall_s: float = 0.0
    batch_latency_s: List[float] = field(default_factory=list)
    padded_rows: int = 0
    padded_frac: float = 0.0

    def summary(self) -> Dict:
        lat = sorted(self.batch_latency_s)
        p = (lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
             if lat else 0.0)
        return {
            "clips": self.clips,
            "batches": self.batches,
            "distinct_shapes": self.compiles,
            "wall_s": round(self.wall_s, 3),
            "clips_per_sec": round(self.clips / self.wall_s, 2)
            if self.wall_s else 0.0,
            "batch_latency_p50_s": round(p(0.50), 4),
            "batch_latency_p95_s": round(p(0.95), 4),
            "padded_row_frac": round(self.padded_frac, 4),
        }


def read_proposals_json(path: str,
                        durations: Optional[Dict[str, float]] = None
                        ) -> List[ClipRequest]:
    """ANet-format proposals: {vid: {duration, timestamps: [[s, e], ...]}}
    — the same schema as the reference's val JSONs (data/*_no_missings.json)
    and learned-proposal outputs.

    Submission-style wrappers ({"results": {vid: [{timestamp}, ...]}})
    carry NO video duration, which the proportional feature crop
    (data/features.crop_a_segment) requires — pass ``durations``
    ({vid: seconds}, e.g. from the GT reference JSON). Guessing it from
    the proposals' max end would silently mis-crop every feature."""
    with open(path) as f:
        data = json.load(f)
    if "results" in data:  # submission-style wrapper
        if durations is None:
            raise ValueError(
                f"{path} is a submission-style proposals file with no "
                "video durations; supply durations= (CLI: "
                "--durations_json, an ANet JSON or {vid: seconds} map)")
        data = {
            vid: {"duration": durations[vid],
                  "timestamps": [seg["timestamp"] for seg in segs]}
            for vid, segs in data["results"].items() if segs
        }
    reqs = []
    for vid, meta in data.items():
        dur = float(meta["duration"])
        for s, e in meta["timestamps"]:
            reqs.append(ClipRequest(vid, float(s), float(e), dur))
    return reqs


def read_durations_json(path: str) -> Dict[str, float]:
    """{vid: seconds} from either a plain map or an ANet-format JSON."""
    with open(path) as f:
        data = json.load(f)
    return {vid: (float(meta["duration"]) if isinstance(meta, dict)
                  else float(meta))
            for vid, meta in data.items()}


def read_meta_tsv(path: str) -> List[ClipRequest]:
    """Reference meta-TSV rows (caption column ignored if present).
    Schema: video_id  caption  start  end  duration  ... (ref: data/*.csv)."""
    import csv

    reqs = []
    with open(path, newline="", encoding="utf-8") as f:
        for r in csv.DictReader(f, delimiter="\t"):
            reqs.append(ClipRequest(r["video_id"], float(r["start"]),
                                    float(r["end"]), float(r["duration"])))
    return reqs


def _npy_rows(path: str) -> Optional[int]:
    """Row count from the .npy header only (no data read)."""
    try:
        return int(np.load(path, mmap_mode="r").shape[0])
    except (FileNotFoundError, ValueError):
        return None


def _cropped_len(total: Optional[int], start: float, end: float,
                 duration: float) -> int:
    """Post-crop length from the header row count — slice semantics of
    crop_a_segment over the shared crop_span indices (missing file or
    empty crop => the 1-row zero fill)."""
    if total is None or total == 0 or duration <= 0:
        return 1
    s, e = F.crop_span(total, start, end, duration)
    return max(min(e, total) - min(max(s, 0), total), 1)


def plan_batches(
    reqs: Sequence[ClipRequest],
    cfg: Config,
    batch_size: int,
) -> List[Tuple[List[int], int, int]]:
    """Group request indices into (idxs, video_bucket, audio_bucket) batches.

    Requests are bucketed by their post-crop lengths (probed from npy
    headers), so a 14-frame clip shares a (32, 64) compile with its peers
    instead of riding a dataset-max (300, 800) batch. Within a bucket pair,
    order is preserved; the tail batch is row-padded by the caller.

    Malformed requests (duration <= 0) are rejected here with a clear
    error: the load path's proportional crop divides by duration
    (data/features.crop_span), so letting one through would kill the whole
    caption() run deep inside the IO pool."""
    bad = [i for i, r in enumerate(reqs) if r.duration <= 0]
    if bad:
        ex = reqs[bad[0]]
        raise ValueError(
            f"{len(bad)} request(s) with duration <= 0 (first: index "
            f"{bad[0]}, video_id={ex.video_id!r}, duration={ex.duration}); "
            "fix or drop them before serving")
    buckets: Dict[Tuple[int, int], List[int]] = {}

    # many proposals per video: probe each header once — and concurrently,
    # since serial np.load header reads on networked storage would add
    # O(unique files) latency before the decode pipeline even starts
    paths = set()
    for r in reqs:
        vdir = r.video_dir or cfg.video_features_path
        adir = r.audio_dir or cfg.audio_features_path
        paths.add(os.path.join(vdir, f"{r.video_id}_rgb.npy"))
        paths.add(os.path.join(adir, f"{r.video_id}.npy"))
    paths = sorted(paths)
    with ThreadPoolExecutor(max_workers=8) as probe_pool:
        rows_cache: Dict[str, Optional[int]] = dict(
            zip(paths, probe_pool.map(_npy_rows, paths)))

    def probe(path: str) -> Optional[int]:
        return rows_cache[path]

    for i, r in enumerate(reqs):
        vdir = r.video_dir or cfg.video_features_path
        adir = r.audio_dir or cfg.audio_features_path
        vlen = _cropped_len(
            probe(os.path.join(vdir, f"{r.video_id}_rgb.npy")),
            r.start, r.end, r.duration)
        alen = _cropped_len(
            probe(os.path.join(adir, f"{r.video_id}.npy")),
            r.start, r.end, r.duration)
        vb = F.pick_bucket(min(vlen, cfg.pad_video_feats_up_to),
                           cfg.video_buckets)
        ab = F.pick_bucket(min(alen, cfg.pad_audio_feats_up_to),
                           cfg.audio_buckets)
        buckets.setdefault((vb, ab), []).append(i)
    plan = []
    for (vb, ab) in sorted(buckets):
        idxs = buckets[(vb, ab)]
        for s in range(0, len(idxs), batch_size):
            plan.append((idxs[s: s + batch_size], vb, ab))
    return plan


def _load_batch(reqs: Sequence[ClipRequest], idxs: List[int], vb: int,
                ab: int, cfg: Config, pad_to: int,
                pool: ThreadPoolExecutor) -> Dict:
    def load(i):
        r = reqs[i]
        return F.load_features_from_npy(
            r.video_dir or cfg.video_features_path,
            r.audio_dir or cfg.audio_features_path,
            r.video_id, r.start, r.end, r.duration,
            d_vid=cfg.d_vid, d_aud=cfg.d_aud)

    feats = list(pool.map(load, idxs))
    n_valid = len(idxs)
    while len(feats) < pad_to:  # row-pad the tail batch (masked via n_valid)
        feats.append({k: np.zeros((1, v.shape[1]), np.float32)
                      for k, v in feats[0].items()})
    batch = {
        "rgb": F.pad_stack([f["rgb"] for f in feats], vb),
        "flow": F.pad_stack([f["flow"] for f in feats], vb),
        "audio": F.pad_stack([f["audio"] for f in feats], ab),
        "n_valid": n_valid,
        "idxs": idxs,
    }
    return batch


class CaptionServer:
    """Builds the model once, then captions request lists at will.

    ``params`` must be the model's variable collection ({"params": ...});
    use utils/checkpoint.load_checkpoint or import_torch_* to obtain it.
    """

    def __init__(self, cfg: Config, model, params, itos: List[str],
                 mesh=None, beam_width: int = 1,
                 length_penalty: float = 0.0, sample: bool = False,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 0.0, sample_seed: int = 0):
        self.cfg = cfg
        self.model = model
        self.itos = itos
        self.mesh = mesh
        # beam_width > 1: beam-search decode (train/decode.beam_decode);
        # sample: stochastic decode with temperature/top-k/nucleus
        # shaping (train/decode.sample_filter) — serving knobs the
        # reference lacks (it decodes greedily only)
        self.beam_width = int(beam_width)
        self.length_penalty = float(length_penalty)
        self.sample = bool(sample)
        if self.sample and self.beam_width > 1:
            raise ValueError("choose sampling OR beam search, not both")
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        if self.sample:
            # validate up front: bad knobs would otherwise surface as a
            # trace-time crash (top_k > vocab) or NaN sampling probs
            # (temperature 0) deep inside the first caption() call
            if self.temperature <= 0.0:
                raise ValueError("temperature must be > 0 (use sample=False "
                                 "for greedy decoding)")
            if self.top_k < 0 or self.top_k > len(itos):
                raise ValueError(f"top_k={self.top_k} out of range for a "
                                 f"{len(itos)}-word vocabulary")
            if not 0.0 <= self.top_p <= 1.0:
                raise ValueError(f"top_p={self.top_p} must be in [0, 1]")
        self._sample_rng = None
        if self.sample:
            import jax

            self._sample_rng = jax.random.PRNGKey(sample_seed)
        # AOT bundles compile fixed (B, vb, ab) shapes: tails pad to full B
        self._fixed_batch = False
        self._sharding = None
        if mesh is not None and np.prod(mesh.devices.shape) > 1:
            from bmhrl_tpu.parallel import mesh as mesh_lib

            params = mesh_lib.replicate_tree(mesh, params)
            self._sharding = mesh_lib.batch_sharding(mesh)
        self.params = params

    def _mesh_pad(self, b: int) -> int:
        if self.mesh is None:
            return b
        n = int(self.mesh.devices.shape[0])
        return ((b + n - 1) // n) * n

    def _decode(self, feats: Dict, masks_src: Dict) -> np.ndarray:
        """One batch -> token ids (B, max_len+1). Overridden by the AOT
        bundle server (serve_export.ExportedCaptionServer)."""
        from bmhrl_tpu.train.decode import beam_decode, decode

        if self.beam_width > 1:
            tokens, _ = beam_decode(
                self.model, self.params, feats, masks_src, self.cfg.max_len,
                BOS, EOS, PAD, beam_width=self.beam_width,
                length_penalty=self.length_penalty)
        elif self.sample:
            import jax

            self._sample_rng, sub = jax.random.split(self._sample_rng)
            tokens, _ = decode(self.model, self.params, feats, masks_src,
                               self.cfg.max_len, BOS, EOS, PAD,
                               greedy=False, rng=sub,
                               temperature=self.temperature,
                               top_k=self.top_k, top_p=self.top_p)
        else:
            tokens, _ = decode(self.model, self.params, feats, masks_src,
                               self.cfg.max_len, BOS, EOS, PAD, greedy=True)
        return np.asarray(tokens)

    def caption(self, reqs: Sequence[ClipRequest],
                batch_size: Optional[int] = None,
                io_threads: int = 8,
                prefetch: int = 2) -> Tuple[Dict, ServeStats]:
        """Caption every request. Returns (ANet submission dict, stats)."""
        import jax.numpy as jnp

        from bmhrl_tpu.ops.masking import make_masks
        from bmhrl_tpu.train.decode import detokenize

        cfg = self.cfg
        bs = batch_size or max(cfg.inference_batch_size, 1)
        plan = plan_batches(reqs, cfg, bs)
        stats = ServeStats()
        shapes_seen = set()
        sentences: List[Optional[str]] = [None] * len(reqs)

        pool = ThreadPoolExecutor(max_workers=io_threads)

        def batch_iter() -> Iterator[Dict]:
            for idxs, vb, ab in plan:
                full = len(idxs) == bs or self._fixed_batch
                if full:
                    pad_to = bs
                else:
                    # round tails up to the next power of two: bounds the
                    # distinct decode shapes at log2(bs) per bucket pair
                    # without charging a 3-row tail a full-bs decode
                    pad_to = min(bs, 1 << (len(idxs) - 1).bit_length())
                yield _load_batch(reqs, idxs, vb, ab, cfg,
                                  self._mesh_pad(pad_to), pool)

        t0 = time.time()
        for batch in Prefetcher(batch_iter(), prefetch,
                                sharding=self._sharding):
            bt0 = time.time()
            feats = {k: batch[k] for k in ("rgb", "flow", "audio")}
            if not hasattr(feats["rgb"], "devices"):  # prefetcher bypassed
                feats = {k: jnp.asarray(v) for k, v in feats.items()}
            masks_src = make_masks(feats, None, "audio_video", PAD)
            toks = self._decode(feats, masks_src)[: batch["n_valid"]]
            for i, sent in zip(batch["idxs"], detokenize(toks, self.itos)):
                sentences[i] = sent
            dt = time.time() - bt0
            stats.batches += 1
            stats.clips += batch["n_valid"]
            stats.padded_rows += int(feats["rgb"].shape[0]) - batch["n_valid"]
            stats.batch_latency_s.append(dt)
            shapes_seen.add(tuple(int(feats[k].shape[i])
                                  for k in ("rgb", "audio") for i in (0, 1)))
        stats.wall_s = time.time() - t0
        stats.compiles = len(shapes_seen)
        total_rows = stats.clips + stats.padded_rows
        stats.padded_frac = stats.padded_rows / max(total_rows, 1)
        pool.shutdown()

        predictions = {"version": "VERSION 1.0",
                       "external_data": {"used": True, "details": ""},
                       "results": {}}
        for r, sent in zip(reqs, sentences):
            seg = {"sentence": sent,
                   "timestamp": [float(r.start), float(r.end)]}
            predictions["results"].setdefault(r.video_id, []).append(seg)
        return predictions, stats
