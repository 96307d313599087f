"""VATEX training-set integration.

ref: captioning_datasets/captioning_dataset.py:196-207 (convert_to_meta:
videoID "XXX_000006_000016" -> id/start/end split) and :224-263
(train_with_all concat + list-caption sampling + mangled feature filenames,
loaded from the data/i3d_vatex, data/vggish_vatex dirs —
load_features.py:59,74).
"""
from __future__ import annotations

import json
from typing import List

from bmhrl_tpu.data.tokenizer import tokenize_lower


class VatexRow:
    __slots__ = ("base_id", "captions", "start", "end", "duration", "tokens")

    def __init__(self, base_id, captions, start, end):
        self.base_id = base_id
        self.captions = captions
        self.start = float(start)
        self.end = float(end)
        self.duration = float(end - start)
        self.tokens = [tokenize_lower(c) for c in captions]

    def feature_id(self) -> str:
        """Mangled id used for the VATEX feature files."""
        return f"{self.base_id}_{int(self.start):06d}_{int(self.end):06d}"

    def pick(self, rng) -> int:
        return int(rng.randint(0, len(self.captions)))


def convert_vatex_training(json_path: str) -> List[VatexRow]:
    """vatex_training.json ([{videoID, enCap}, ...] or column-dict) ->
    VatexRow list."""
    with open(json_path) as f:
        data = json.load(f)
    if isinstance(data, dict):  # column-oriented
        ids = data["videoID"]
        caps = data["enCap"]
        items = [{"videoID": ids[k], "enCap": caps[k]} for k in ids]
    else:
        items = data
    rows = []
    for item in items:
        vid = item["videoID"]
        base = vid[:-14]
        start = int(vid[-13:-7])
        end = int(vid[-6:])
        caps = item["enCap"]
        if isinstance(caps, str):
            caps = [caps]
        rows.append(VatexRow(base, caps, start, end))
    return rows
