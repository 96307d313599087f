"""Vocabulary with the torchtext ordering convention and optional GloVe init.

Special index convention (must match the reference training data):
``<unk>=0, <blank>=1 (pad), <s>=2, </s>=3``
(ref: captioning_datasets/captioning_dataset.py:20-43; token-id comment at
epoch_loops/captioning_epoch_loops.py:129).

Word order replicates torchtext.vocab.Vocab: words sorted alphabetically,
then stably by descending frequency; words below ``min_freq`` are dropped.
GloVe vectors initialize the embedding when a vector file is available;
out-of-vocabulary rows are zeros (torchtext behavior). Without GloVe the
embedding trains from scratch (ref: model/blocks.py:50-67).
"""
from __future__ import annotations

import os
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from bmhrl_tpu.data.tokenizer import tokenize_lower

UNK, PAD, BOS, EOS = 0, 1, 2, 3
SPECIALS = ["<unk>", "<blank>", "<s>", "</s>"]


class Vocab:
    def __init__(self, itos: List[str]):
        self.itos = itos
        self.stoi: Dict[str, int] = {w: i for i, w in enumerate(itos)}
        self.vectors: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.itos)

    def encode(self, tokens: Sequence[str]) -> List[int]:
        stoi = self.stoi
        return [stoi.get(t, UNK) for t in tokens]

    def decode(self, ids: Iterable[int]) -> List[str]:
        return [self.itos[i] for i in ids]

    @staticmethod
    def build(
        token_lists: Iterable[Sequence[str]],
        min_freq: int = 1,
        specials: Sequence[str] = SPECIALS,
    ) -> "Vocab":
        counter: Counter = Counter()
        for toks in token_lists:
            counter.update(toks)
        for s in specials:
            counter.pop(s, None)
        words = sorted(counter.items())  # alphabetical
        words.sort(key=lambda kv: kv[1], reverse=True)  # stable by freq desc
        itos = list(specials) + [w for w, c in words if c >= min_freq]
        return Vocab(itos)

    def load_glove(self, path: str, dim: int = 300) -> np.ndarray:
        """Load GloVe vectors for in-vocab words; OOV rows are zeros."""
        vecs = np.zeros((len(self.itos), dim), dtype=np.float32)
        wanted = self.stoi
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip().split(" ")
                w = parts[0]
                i = wanted.get(w)
                if i is not None and len(parts) == dim + 1:
                    vecs[i] = np.asarray(parts[1:], dtype=np.float32)
        self.vectors = vecs
        return vecs


def build_vocab_from_tsv(
    meta_path: str,
    min_freq: int = 1,
    glove_path: Optional[str] = None,
    emb_dim: int = 300,
) -> Vocab:
    """Build the training vocabulary from the train meta TSV (always the train
    file, regardless of phase — ref: captioning_dataset.py:39-44)."""
    import csv

    token_lists: List[List[str]] = []
    with open(meta_path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            token_lists.append(tokenize_lower(row["caption"]))
    vocab = Vocab.build(token_lists, min_freq=min_freq)
    vocab.token_lists = token_lists  # corpus for CIDEr document frequencies
    if glove_path and os.path.exists(glove_path):
        vocab.load_glove(glove_path, emb_dim)
    return vocab
