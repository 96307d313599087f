"""Mask builders.

Semantics match the reference (ref: model/masking.py:1-55):
- source masks test feature channel 0 against the data pad value 0.0 and have
  shape (B, 1, S);
- the caption mask combines padding (token != pad_idx) with a causal lower
  triangle and has shape (B, Lc, Lc).
Masks are boolean; True = attend.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

DATA_PAD = 0.0


def subsequent_mask(size: int) -> jnp.ndarray:
    """(1, size, size) lower-triangular causal mask. ref: model/masking.py:3-11."""
    return jnp.tril(jnp.ones((1, size, size), dtype=bool))


def c_mask(trg: jnp.ndarray, pad_idx: int) -> jnp.ndarray:
    """Caption pad+causal mask (B, Lc, Lc). ref: model/masking.py:13-15."""
    pad_mask = (trg != pad_idx)[:, None, :]
    return pad_mask & subsequent_mask(trg.shape[-1])


def src_mask(src_channel0: jnp.ndarray, data_pad: float = DATA_PAD) -> jnp.ndarray:
    """Source pad mask (B, 1, S) from feature channel 0. ref: model/masking.py:18-20."""
    return (src_channel0 != data_pad)[:, None, :]


def make_masks(
    feature_stacks: Dict[str, jnp.ndarray],
    captions: Optional[jnp.ndarray],
    modality: str,
    pad_idx: int,
) -> Dict[str, jnp.ndarray]:
    """Build V/A/C masks for a batch. ref: model/masking.py:28-55."""
    masks: Dict[str, jnp.ndarray] = {}
    if modality in ("video", "audio_video"):
        masks["V_mask"] = src_mask(feature_stacks["rgb"][:, :, 0])
    if modality in ("audio", "audio_video"):
        masks["A_mask"] = src_mask(feature_stacks["audio"][:, :, 0])
    if captions is not None:
        masks["C_mask"] = c_mask(captions, pad_idx)
    return masks
