"""Multimodal event-proposal generator.

The reference *trains and validates* a ``MultimodalProposalGenerator``
(epoch_loops/proposal_epoch_loops.py:27-140) whose class is absent from its
repo — a BMT leftover (SURVEY §2.6 #36). Its contract is pinned by the loop
and the toolkit that survived:

- model(feature_stacks, targets, masks) -> (predictions, loss, losses_A,
  losses_V) with per-modality loss dicts (proposal_epoch_loops.py:39-41);
- predictions (B, A*S, 3) rows of (center, length, confidence) consumed by
  postprocess (top-k by col 2, center/length -> corners, trim to duration,
  NMS; utilities/proposal_utils.py:136-212) — i.e. a YOLO-style 1D anchor
  head: k-means anchor lengths (proposal_dataset kmeans targets), per-cell
  offsets, objectness confidence;
- a ``.anchors`` attribute saved with checkpoints (proposal_epoch_loops.py:18).

This rebuild keeps that contract TPU-shaped: the bimodal encoder is reused
at proposal dims, each modality gets a conv anchor head over its (static,
padded) stream, targets are precomputed on host (data/proposal.py — the
data-dependent GT matching stays out of the jitted step), and the loss is
a fully-vectorized YOLO objective (coord MSE on matched cells, weighted
objectness BCE with ignore regions).

Grid-to-seconds convention: cell ``s`` of a stream with ``orig_len`` valid
positions covers ``duration / orig_len`` seconds; a prediction at (s, k) is
    center_sec = (s + sigmoid(o_c)) * duration / orig_len
    length_sec = anchor_k * exp(o_l)
so predictions leave the model already in seconds, matching the reference
postprocess which trims straight against ``duration_in_secs``
(utilities/proposal_utils.py:195-212).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bmhrl_tpu.models.blocks import FeatureEmbedder, PositionalEncoder
from bmhrl_tpu.models.bmhrl import BMEncoder


class ProposalHead(nn.Module):
    """Conv anchor head over one modality stream: (B, S, D) ->
    (B, S, K, 3) raw (center_logit, log_length_scale, conf_logit)."""

    d_model: int
    num_anchors: int
    dout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x.astype(self.dtype)
        for i in range(2):
            h = nn.Conv(self.d_model, kernel_size=(3,), dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"norm_{i}")(h)
            h = nn.relu(h).astype(self.dtype)
            h = nn.Dropout(self.dout_p)(h, deterministic=deterministic)
        out = nn.Dense(3 * self.num_anchors, dtype=jnp.float32,
                       name="head")(h.astype(jnp.float32))
        B, S, _ = out.shape
        return out.reshape(B, S, self.num_anchors, 3)


class MultimodalProposalGenerator(nn.Module):
    """Bimodal encoder + per-modality YOLO-style anchor heads."""

    d_vid: int = 1024
    d_aud: int = 128
    d_model: int = 1024
    d_model_aud: int = 128
    d_ff_v: int = 1024
    d_ff_a: int = 512
    att_heads: int = 4
    att_layers: int = 2
    num_anchors: int = 10
    dout_p: float = 0.1
    lambda_coord: float = 5.0
    lambda_noobj: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.emb_V = FeatureEmbedder(self.d_model, self.dtype)
        self.emb_A = FeatureEmbedder(self.d_model_aud, self.dtype)
        self.pos_V = PositionalEncoder(self.d_model, self.dout_p)
        self.pos_A = PositionalEncoder(self.d_model_aud, self.dout_p)
        self.encoder = BMEncoder(
            d_model_M1=self.d_model, d_model_M2=self.d_model_aud,
            d_model=self.d_model, d_ff_M1=self.d_ff_v, d_ff_M2=self.d_ff_a,
            dout_p=self.dout_p, H=self.att_heads, N=self.att_layers,
            dtype=self.dtype)
        self.head_V = ProposalHead(self.d_model, self.num_anchors,
                                   self.dout_p)
        self.head_A = ProposalHead(self.d_model_aud, self.num_anchors,
                                   self.dout_p)

    def encode_heads(self, V, A, masks, deterministic: bool = True):
        """(B, Sv, K, 3) and (B, Sa, K, 3) raw head outputs."""
        v = self.pos_V(self.emb_V(V), deterministic).astype(self.dtype)
        a = self.pos_A(self.emb_A(A), deterministic).astype(self.dtype)
        Vm, Am = self.encoder((v, a), masks, deterministic)
        return (self.head_V(Vm, deterministic),
                self.head_A(Am, deterministic))

    @staticmethod
    def _to_seconds(raw, anchors, duration, orig_len):
        """Raw head output -> (B, S*K, 3) seconds-space (start, end, conf);
        padded cells (s >= orig_len) get confidence 0."""
        B, S, K, _ = raw.shape
        cells = jnp.arange(S, dtype=jnp.float32)[None, :, None]  # (1,S,1)
        sec_per_cell = (duration / jnp.maximum(orig_len, 1.0))[:, None, None]
        center = (cells + jax.nn.sigmoid(raw[..., 0])) * sec_per_cell
        length = anchors[None, None, :] * jnp.exp(raw[..., 1])
        conf = jax.nn.sigmoid(raw[..., 2])
        validity = cells < orig_len[:, None, None]
        conf = jnp.where(validity, conf, 0.0)
        out = jnp.stack([center - length / 2.0, center + length / 2.0,
                         conf], axis=-1)
        return out.reshape(B, S * K, 3)

    @staticmethod
    def _yolo_loss(raw, tgt, orig_len, lambda_coord, lambda_noobj):
        """Vectorized YOLO objective for one modality.

        tgt: {"obj", "ignore", "t_center", "t_length"} each (B, S, K); cells
        past orig_len contribute nothing (padding)."""
        B, S, K, _ = raw.shape
        valid = (jnp.arange(S, dtype=jnp.float32)[None, :, None]
                 < orig_len[:, None, None])
        obj = tgt["obj"] * valid
        pc = jax.nn.sigmoid(raw[..., 0])
        pl = raw[..., 1]
        n_pos = jnp.maximum(jnp.sum(obj), 1.0)
        loss_loc = jnp.sum(
            obj * ((pc - tgt["t_center"]) ** 2
                   + (pl - tgt["t_length"]) ** 2)) / n_pos
        logits = raw[..., 2]
        bce = jnp.maximum(logits, 0) - logits * obj + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        noobj_w = (1.0 - obj) * (1.0 - tgt["ignore"]) * valid
        n_cells = jnp.maximum(jnp.sum(valid) * K, 1.0)  # valid (b,s) x K
        loss_conf = jnp.sum(bce * (obj + lambda_noobj * noobj_w)) / n_cells
        return {"loss_loc": lambda_coord * loss_loc, "loss_conf": loss_conf}

    def __call__(self, feature_stacks: Dict, targets: Dict, masks: Dict,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict, Dict]:
        """The reference loop contract (proposal_epoch_loops.py:39):
        (predictions (B, SvK+SaK, 3) in seconds, total loss, losses_A,
        losses_V). ``targets`` carries per-modality YOLO targets plus
        ``anchors_v/anchors_a`` (seconds), ``duration`` and
        ``orig_len_video/audio`` (B,)."""
        V, A = feature_stacks["V"], feature_stacks["A"]
        raw_V, raw_A = self.encode_heads(V, A, masks, deterministic)
        lv = self._yolo_loss(raw_V, targets["video"],
                             targets["orig_len_video"].astype(jnp.float32),
                             self.lambda_coord, self.lambda_noobj)
        la = self._yolo_loss(raw_A, targets["audio"],
                             targets["orig_len_audio"].astype(jnp.float32),
                             self.lambda_coord, self.lambda_noobj)
        preds_V = self._to_seconds(
            raw_V, targets["anchors_v"], targets["duration"],
            targets["orig_len_video"].astype(jnp.float32))
        preds_A = self._to_seconds(
            raw_A, targets["anchors_a"], targets["duration"],
            targets["orig_len_audio"].astype(jnp.float32))
        predictions = jnp.concatenate([preds_V, preds_A], axis=1)
        loss = lv["loss_loc"] + lv["loss_conf"] + la["loss_loc"] + la["loss_conf"]
        return predictions, loss, la, lv


def yolo_targets(gt_segments: np.ndarray, duration: float, orig_len: int,
                 grid: int, anchors: np.ndarray,
                 ignore_iou: float = 0.5) -> Dict[str, np.ndarray]:
    """Host-side YOLO target assignment for one video and one modality.

    Each GT segment is assigned to the cell containing its center (within
    the valid prefix ``orig_len`` of the padded ``grid``) and its best
    anchor by length ratio. Anchor windows elsewhere whose tIoU with any GT
    exceeds ``ignore_iou`` are marked ignore (no objectness penalty) — the
    standard YOLO scheme, matching the toolkit's anchor-window matching
    (data/proposal.py anchor_targets).
    Returns {"obj", "ignore", "t_center", "t_length"} each (grid, K) f32.
    """
    from bmhrl_tpu.utils.proposals import tiou_vectorized

    K = len(anchors)
    obj = np.zeros((grid, K), np.float32)
    ignore = np.zeros((grid, K), np.float32)
    t_center = np.zeros((grid, K), np.float32)
    t_length = np.zeros((grid, K), np.float32)
    gt = np.asarray(gt_segments, np.float32).reshape(-1, 2)
    if len(gt) == 0 or orig_len <= 0 or duration <= 0:
        return {"obj": obj, "ignore": ignore, "t_center": t_center,
                "t_length": t_length}
    sec_per_cell = duration / float(orig_len)
    # ignore mask: anchor windows at every valid cell vs every GT
    centers = (np.arange(orig_len) + 0.5) * sec_per_cell  # (orig_len,)
    for k, a in enumerate(anchors):
        wins = np.stack([centers - a / 2.0, centers + a / 2.0], 1)
        iou = tiou_vectorized(np.clip(wins, 0, duration), gt)
        ignore[:orig_len, k] = iou.max(axis=1) > ignore_iou
    # positive assignment: center cell + best-length anchor
    for s0, e0 in gt:
        c = (s0 + e0) / 2.0
        length = max(e0 - s0, 1e-6)
        cell = min(int(c / sec_per_cell), orig_len - 1)
        ratios = np.minimum(anchors / length, length / np.asarray(anchors))
        k = int(np.argmax(ratios))
        obj[cell, k] = 1.0
        ignore[cell, k] = 0.0
        t_center[cell, k] = np.clip(c / sec_per_cell - cell, 0.0, 1.0)
        t_length[cell, k] = np.log(length / anchors[k])
    return {"obj": obj, "ignore": ignore, "t_center": t_center,
            "t_length": t_length}
