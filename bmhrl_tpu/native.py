"""ctypes bindings for the native host-side reward kernels (native/).

``meteor_prefix_rewards`` computes per-prefix METEOR scores in C++ with
Python-side word/stem interning (stems from NLTK's Porter stemmer, so parity
with the pure-Python aligner is exact by construction). Auto-builds
``native/libreward.so`` with make on first use; falls back to None when no
toolchain is available (callers keep the Python path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libreward.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.meteor_prefix_rewards.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.meteor_prefix_rewards.restype = None
        lib.meteor_prefix_rewards_syn.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.meteor_prefix_rewards_syn.restype = None
        lib.cider_new.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32]
        lib.cider_new.restype = ctypes.c_void_p
        lib.cider_free.argtypes = [ctypes.c_void_p]
        lib.cider_free.restype = None
        lib.cider_prefix_rewards.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint16,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
        lib.cider_prefix_rewards.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_synonym_table(path: str) -> dict:
    """Parse a wordnet synonym table file (one ``word<TAB>lemma lemma ...``
    line per word; see tools/export_wordnet_synonyms.py) into a dict."""
    table = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word, _, lemmas = line.partition("\t")
            table[word] = lemmas.split() if lemmas else []
    return table


class MeteorNative:
    """Per-prefix METEOR via the C++ aligner (exact + stem + optional
    wordnet-synonym stages).

    ``syn_lookup`` maps a word to its synonym lemma strings — NLTK's
    hypothesis-side relation (lemma names without '_' across
    wordnet.synsets(word), ref: nltk/translate/meteor_score.py
    _enum_wordnetsyn_match). NB the lookup is queried with the STEMMED
    leftover word and lemma names are compared against STEMMED reference
    surfaces: nltk's _enum_stem_match hands the stemmed enum lists to the
    synonym stage, so that stage runs entirely in stem space (verified
    against nltk 3.10; the quirk is inherited by anything scoring through
    single_meteor_score, incl. the reference's batched_meteor.py). Pass a
    real-wordnet-backed callable, a dict loaded via load_synonym_table, or
    None for exact+stem only.

    Words are lowercased before interning/stemming, matching
    single_meteor_score's preprocess=str.lower default."""

    def __init__(self, alpha: float = 0.9, beta: float = 3.0,
                 gamma: float = 0.5, syn_lookup=None):
        from nltk.stem.porter import PorterStemmer

        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self._stemmer = PorterStemmer()
        self._stem = lru_cache(maxsize=200_000)(self._stemmer.stem)
        if isinstance(syn_lookup, dict):
            table = syn_lookup
            syn_lookup = lambda w: table.get(w, ())  # noqa: E731
        self._syn_lookup = (lru_cache(maxsize=200_000)(
            lambda w: tuple(syn_lookup(w))) if syn_lookup else None)
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("native libreward.so unavailable")

    def prefix_rewards(self, hyp_tokens: Sequence[Sequence[str]],
                       refs: Sequence[Sequence[str]]) -> np.ndarray:
        """hyp_tokens: B lists of L token strings; refs: B token lists.
        Returns (B, L) float32 per-prefix METEOR."""
        B = len(hyp_tokens)
        L = max(len(h) for h in hyp_tokens)
        intern = {}

        def wid(w: str) -> int:
            i = intern.get(w)
            if i is None:
                i = len(intern)
                intern[w] = i
            return i

        hyp_ids = np.full((B, L), -1, np.int32)
        hyp_st = np.full((B, L), -2, np.int32)
        ref_ids_l: List[int] = []
        ref_st_l: List[int] = []
        offsets = np.zeros(B + 1, np.int32)
        hyp_stems = set()
        for b in range(B):
            for l, w in enumerate(hyp_tokens[b]):
                w = w.lower()
                st = self._stem(w)
                hyp_ids[b, l] = wid(w)
                hyp_st[b, l] = wid("\x00stem:" + st)
                hyp_stems.add(st)
            for w in refs[b]:
                w = w.lower()
                ref_ids_l.append(wid(w))
                ref_st_l.append(wid("\x00stem:" + self._stem(w)))
            offsets[b + 1] = len(ref_ids_l)
        ref_ids = np.asarray(ref_ids_l, np.int32)
        ref_st = np.asarray(ref_st_l, np.int32)
        out = np.zeros((B, L), np.float32)

        # CSR synonym table in STEM space (see class docstring): rows are
        # keyed by the stem id of each hypothesis stem; values are the stem
        # ids whose STRING CONTENT equals a synonym lemma name — i.e. a
        # lemma L matches reference word r iff L == stem(r), so the
        # candidate id is intern["\x00stem:" + L]. Only ids interned from
        # this batch can ever match, so everything else is dropped here.
        n_words = len(intern)
        syn_ids_l: List[int] = []
        syn_offsets = np.zeros(n_words + 1, np.int32)
        if self._syn_lookup is not None:
            per_word: List[List[int]] = [[] for _ in range(n_words)]
            for st in hyp_stems:
                ids = sorted({
                    intern[key] for s in self._syn_lookup(st)
                    if (key := "\x00stem:" + s) in intern})
                per_word[intern["\x00stem:" + st]] = ids
            for i, ids in enumerate(per_word):
                syn_ids_l.extend(ids)
                syn_offsets[i + 1] = len(syn_ids_l)
        syn_ids = np.asarray(syn_ids_l or [0], np.int32)

        c_i32 = ctypes.POINTER(ctypes.c_int32)
        c_f32 = ctypes.POINTER(ctypes.c_float)
        self.lib.meteor_prefix_rewards_syn(
            hyp_ids.ctypes.data_as(c_i32), hyp_st.ctypes.data_as(c_i32),
            B, L,
            ref_ids.ctypes.data_as(c_i32), ref_st.ctypes.data_as(c_i32),
            offsets.ctypes.data_as(c_i32),
            syn_ids.ctypes.data_as(c_i32), syn_offsets.ctypes.data_as(c_i32),
            n_words if self._syn_lookup is not None else 0,
            self.alpha, self.beta, self.gamma,
            out.ctypes.data_as(c_f32))
        return out


class CiderNative:
    """Per-prefix CIDEr via the C++ kernel; word ids are the vocab indices
    (hypothesis side) plus on-the-fly interning for ref/corpus OOV words.
    Falls back is the caller's job when ids exceed uint16 range."""

    MAX_ID = 65000

    def __init__(self, itos: Sequence[str],
                 corpus_token_lists: Sequence[Sequence[str]],
                 n: int = 4, sigma: float = 6.0, eos_token: str = "</s>"):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("native libreward.so unavailable")
        self.sigma = sigma
        self.intern = {w: i for i, w in enumerate(itos)}
        if len(self.intern) >= self.MAX_ID:
            raise RuntimeError("vocab too large for uint16 interning")
        self.eos_id = self.intern[eos_token]
        flat: List[int] = []
        offsets = [0]
        for cap in corpus_token_lists or []:
            flat.extend(self._wid(w) for w in cap)
            offsets.append(len(flat))
        corpus = np.asarray(flat, np.uint16)
        offs = np.asarray(offsets, np.int64)
        self._handle = self.lib.cider_new(
            corpus.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(offsets) - 1, n)

    def _wid(self, w: str) -> int:
        i = self.intern.get(w)
        if i is None:
            i = len(self.intern)
            if i >= self.MAX_ID:
                raise RuntimeError("intern table overflow")
            self.intern[w] = i
        return i

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self.lib.cider_free(self._handle)
        except Exception:
            pass

    def raw_rewards(self, pred_ids: np.ndarray,
                    ref_token_lists: Sequence[Sequence[str]]) -> np.ndarray:
        """pred_ids: (B, L) vocab ids; refs: B lowercased token lists."""
        B, L = pred_ids.shape
        hyp = np.ascontiguousarray(pred_ids, np.uint16)
        flat: List[int] = []
        offsets = [0]
        for ref in ref_token_lists:
            flat.extend(self._wid(w) for w in ref)
            offsets.append(len(flat))
        refs = np.asarray(flat, np.uint16)
        offs = np.asarray(offsets, np.int64)
        out = np.zeros((B, L), np.float32)
        self.lib.cider_prefix_rewards(
            self._handle,
            hyp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            B, L, self.eos_id,
            refs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.sigma,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
