"""Dataset + input pipeline.

Replaces the reference's inverted torchtext/pandas batching
(ref: captioning_datasets/captioning_dataset.py) with a host-side pipeline
built for static-shape TPU compiles:

- meta TSV rows are tokenized once at construction;
- per-epoch shuffling is seeded and deterministic (preemption-safe resume);
- features load through a thread pool, are segment-cropped, and padded into
  *bucketed* static shapes (limits recompiles to a few bucket combos);
- batches are numpy dicts; device placement/sharding happens in the train
  loop; a background prefetcher keeps ``prefetch_batches`` in flight.

Batch dict fields mirror the reference batch (ref: captioning_dataset.py:304-316):
``video_ids, captions (raw strings), starts, ends, rgb, flow, audio,
caption_idx (B, Lc int32), n_valid``.
"""
from __future__ import annotations

import csv
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from bmhrl_tpu.config import Config
from bmhrl_tpu.data import features as F
from bmhrl_tpu.data.tokenizer import tokenize_lower
from bmhrl_tpu.data.vocab import BOS, EOS, PAD, Vocab, build_vocab_from_tsv


class MetaRow:
    __slots__ = ("video_id", "caption", "start", "end", "duration", "tokens",
                 "video_dir", "audio_dir", "caption_choices")

    def __init__(self, video_id, caption, start, end, duration, tokens,
                 video_dir=None, audio_dir=None, caption_choices=None):
        self.video_id = video_id
        self.caption = caption
        self.start = float(start)
        self.end = float(end)
        self.duration = float(duration)
        self.tokens = tokens
        # per-row feature-dir overrides (VATEX concat training rows)
        self.video_dir = video_dir
        self.audio_dir = audio_dir
        # multi-caption rows: [(caption, tokens), ...] sampled per epoch
        self.caption_choices = caption_choices


def _read_meta(path: str) -> List[MetaRow]:
    rows = []
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for r in reader:
            rows.append(
                MetaRow(
                    r["video_id"], r["caption"], r["start"], r["end"],
                    r["duration"], tokenize_lower(r["caption"]),
                )
            )
    return rows


class CaptioningDataset:
    """Phase-routed captioning dataset (ActivityNet / VATEX / MSR-VTT).
    ref: captioning_dataset.py:322-410."""

    def __init__(self, cfg: Config, phase: str, vocab: Optional[Vocab] = None):
        self.cfg = cfg
        self.phase = phase
        data_root = os.path.dirname(os.path.abspath(cfg.train_meta_path))
        self.video_path = cfg.video_features_path
        self.audio_path = cfg.audio_features_path
        if phase == "train":
            self.meta_path = cfg.train_meta_path
            self.batch_size = cfg.train_batch_size
        elif phase == "val_1":
            self.meta_path = cfg.val_1_meta_path
            self.batch_size = cfg.inference_batch_size
        elif phase == "val_2":
            self.meta_path = cfg.val_2_meta_path
            self.batch_size = cfg.inference_batch_size
        elif phase == "vatex_val":
            # ref: captioning_dataset.py:348-352
            self.meta_path = cfg.vatex_meta_path
            self.video_path = os.path.join(data_root, "i3d/")
            self.audio_path = os.path.join(data_root, "vggish/")
            self.batch_size = cfg.inference_batch_size
        elif phase == "msrvtt_val":
            self.meta_path = cfg.msrvtt_meta_path
            self.video_path = os.path.join(data_root, "msrvtt/i3d/")
            self.audio_path = os.path.join(data_root, "msrvtt/vggish/")
            self.batch_size = cfg.inference_batch_size
        elif phase == "learned_props":
            self.meta_path = cfg.val_prop_meta_path
            self.batch_size = cfg.inference_batch_size
        else:
            raise NotImplementedError(phase)

        if vocab is None:
            vocab = build_vocab_from_tsv(
                cfg.train_meta_path, cfg.min_freq_caps, cfg.glove_path,
                cfg.d_model_caps)
        self.train_vocab = vocab
        self.trg_voc_size = len(vocab)
        self.pad_idx, self.start_idx, self.end_idx = PAD, BOS, EOS
        self.rows = _read_meta(self.meta_path)
        # VATEX training concat (ref: captioning_dataset.py:224-227)
        if (phase == "train" and cfg.train_with_all
                and os.path.exists(cfg.vatex_training_json)):
            from bmhrl_tpu.data.vatex import convert_vatex_training

            data_root = os.path.dirname(os.path.abspath(cfg.train_meta_path))
            vdir = os.path.join(data_root, "i3d_vatex")
            adir = os.path.join(data_root, "vggish_vatex")
            for vr in convert_vatex_training(cfg.vatex_training_json):
                self.rows.append(MetaRow(
                    vr.feature_id(), vr.captions[0], vr.start, vr.end,
                    vr.duration, vr.tokens[0], video_dir=vdir, audio_dir=adir,
                    caption_choices=list(zip(vr.captions, vr.tokens))))
        self.cap_max = cfg.caption_max()
        self._pool = ThreadPoolExecutor(max_workers=cfg.num_data_workers)

    def __len__(self) -> int:
        return len(self.rows)

    def num_batches(self, drop_last: bool = True) -> int:
        n = len(self.rows)
        b = self.batch_size
        return n // b if drop_last else -(-n // b)

    # -- batch assembly ------------------------------------------------------
    def _encode_caption(self, tokens: List[str], bucket: int) -> np.ndarray:
        ids = [self.start_idx] + self.train_vocab.encode(tokens) + [self.end_idx]
        ids = ids[:bucket]
        out = np.full((bucket,), self.pad_idx, dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def _load_row(self, row: MetaRow) -> Dict[str, np.ndarray]:
        return F.load_features_from_npy(
            row.video_dir or self.video_path,
            row.audio_dir or self.audio_path, row.video_id,
            row.start, row.end, row.duration,
            self.cfg.d_vid, self.cfg.d_aud)

    def make_batch(self, idxs: List[int], pad_to_batch: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
        rows = [self.rows[i] for i in idxs]
        feats = list(self._pool.map(self._load_row, rows))
        cfg = self.cfg
        vb = F.pick_bucket(max(f["rgb"].shape[0] for f in feats),
                           cfg.video_buckets)
        ab = F.pick_bucket(max(f["audio"].shape[0] for f in feats),
                           cfg.audio_buckets)
        cb = F.pick_bucket(
            max(len(r.tokens) + 2 for r in rows), cfg.caption_buckets)
        n_valid = len(rows)
        B = pad_to_batch or n_valid
        rgb = F.pad_stack([f["rgb"] for f in feats], vb)
        flow = F.pad_stack([f["flow"] for f in feats], vb)
        audio = F.pad_stack([f["audio"] for f in feats], ab)
        caps = np.stack([self._encode_caption(r.tokens, cb) for r in rows])
        if B > n_valid:  # pad batch rows for static batch shape (eval tail)
            def padb(x):
                reps = np.repeat(x[:1], B - n_valid, axis=0)
                return np.concatenate([x, reps], axis=0)
            rgb, flow, audio, caps = map(padb, (rgb, flow, audio, caps))
        return {
            "video_ids": [r.video_id for r in rows],
            "captions": [r.caption for r in rows],
            "starts": np.asarray([r.start for r in rows], np.float32),
            "ends": np.asarray([r.end for r in rows], np.float32),
            "rgb": rgb, "flow": flow, "audio": audio,
            "caption_idx": caps,
            "n_valid": n_valid,
        }

    def batches(
        self,
        epoch: int,
        shuffle: bool = True,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        idxs = np.arange(len(self.rows))
        rng = np.random.RandomState(self.cfg.seed * 100003 + epoch)
        # sample one caption per multi-caption (VATEX) row each epoch
        for row in self.rows:
            if row.caption_choices:
                row.caption, row.tokens = row.caption_choices[
                    rng.randint(len(row.caption_choices))]
        if shuffle:
            rng.shuffle(idxs)
        b = self.batch_size
        n = len(idxs)
        stop = n - (n % b) if drop_last else n
        for s in range(0, stop, b):
            chunk = idxs[s: s + b].tolist()
            yield self.make_batch(chunk, pad_to_batch=b)


class Prefetcher:
    """Background-thread batch prefetcher with device staging.

    The worker thread also dispatches the async host->device transfer of
    the numeric feature arrays (``jax.device_put`` returns immediately),
    so with depth >= 2 the copy of batch t+1 overlaps the device compute
    of batch t instead of serializing in front of each train step. String
    metadata (video_ids, captions) stays on host."""

    DEVICE_KEYS = ("rgb", "flow", "audio", "caption_idx")

    def __init__(self, it: Iterator, depth: int = 2, to_device: bool = True,
                 sharding=None):
        """``sharding``: optional jax.sharding.Sharding (e.g.
        mesh.batch_sharding) so multi-chip batches are staged directly in
        the mesh layout — without it arrays land on the default device."""
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error: Optional[BaseException] = None

        def work():
            try:
                for item in it:
                    if to_device and isinstance(item, dict):
                        import jax

                        item = dict(item)
                        for k in self.DEVICE_KEYS:
                            if k in item:
                                item[k] = (jax.device_put(item[k], sharding)
                                           if sharding is not None
                                           else jax.device_put(item[k]))
                    self.q.put(item)
            except BaseException as e:  # surface loader errors, don't
                self._error = e         # truncate the stream silently
            finally:
                self.q.put(self._done)

        self.t = threading.Thread(target=work, daemon=True)
        self.t.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._done:
                if self._error is not None:
                    raise RuntimeError(
                        "Prefetcher source iterator failed"
                    ) from self._error
                return
            yield item
