"""Host-side RL reward scorers: per-prefix CIDEr / BLEU / METEOR deltas.

Parity targets: metrics/cider.py, metrics/bleu.py, metrics/batched_meteor.py,
metrics/util.py. The reference re-scores every prefix from scratch
(O(B*L^2) string work per training step — its hottest host loop); here the
n-gram state is updated incrementally per appended word, producing identical
values in O(B*L).

Deliberately reproduced reference quirks (they define the training signal):
- CIDEr: ref_len = log(#refs) = log(1) = 0, giving *negative* TF-IDF weights;
  "length" counts bigrams (n==1 index); doc frequencies come from the raw
  training-corpus n-gram counts with count>1 kept (ref: cider.py:114-122,
  180-192, 222); an immediate '</s>' first token scores -0.1 and scoring
  stops at '</s>' (ref: cider.py:41-51).
- BLEU: tiny/small smoothing, per-k geometric means averaged uniformly,
  brevity penalty when ratio<1; scores every prefix incl. specials
  (ref: bleu.py:214-279).
- METEOR: NLTK single_meteor_score on whitespace-split raw strings
  (ref: batched_meteor.py:63-89); the WordNet synonym stage degrades
  gracefully to exact+stem when the corpus is unavailable.
- Discounting/segment aggregation: worker rewards get plain n-step
  discounting; manager rewards are segment-summed then discounted — CIDEr
  discounts across *segment boundaries* while METEOR/BLEU discount the
  expanded values per-step, exactly as the reference dispatches
  (cider.py:101-104 vs batched_meteor.py:91-94, bleu.py:80-83); the CIDEr
  manager forces a boundary at the reference length (cider.py:72-80).

All functions take/return numpy; they run on the host BETWEEN the jitted
rollout and update dispatches (the axon TPU runtime does not support jax
host callbacks) — the training loop pipelines them behind the next batch's
already-dispatched device step (train/loop.py).
"""
from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# numpy twins of ops/segments.py (host side; golden-tested against them)
# ---------------------------------------------------------------------------


def discounted_return_np(delta: np.ndarray, gamma: float, n_step: int = 100) -> np.ndarray:
    B, L = delta.shape
    i = np.arange(L)[:, None]
    k = np.arange(L)[None, :]
    d = k - i
    T = np.where((d >= 0) & (d < n_step), np.power(float(gamma), np.maximum(d, 0)), 0.0)
    return (delta @ T.T).astype(np.float32)


def _next_boundary_np(mask: np.ndarray) -> np.ndarray:
    B, L = mask.shape
    pos = np.where(mask.astype(bool), np.arange(L)[None, :], L)
    return np.minimum.accumulate(pos[:, ::-1], axis=1)[:, ::-1]


def segment_sum_expand_np(reward: np.ndarray, mask: np.ndarray) -> np.ndarray:
    B, L = reward.shape
    nb = _next_boundary_np(mask)
    same = (nb[:, :, None] == nb[:, None, :]) & (nb[:, :, None] < L)
    return np.einsum("bik,bk->bi", same.astype(reward.dtype), reward).astype(np.float32)


def discounted_segment_return_np(reward: np.ndarray, mask: np.ndarray, gamma: float) -> np.ndarray:
    B, L = reward.shape
    m = mask.astype(np.float64)
    c = np.cumsum(m, axis=-1)
    nb = _next_boundary_np(mask)
    m_before = c - m
    i = np.arange(L)[:, None]
    k = np.arange(L)[None, :]
    after = (k >= i)[None]
    expo = c[:, None, :] - m_before[:, :, None] - 1.0
    w = np.where(after & (m[:, None, :] > 0), np.power(float(gamma), np.maximum(expo, 0.0)), 0.0)
    out = np.einsum("bik,bk->bi", w, reward * m)
    return np.where(nb < L, out, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# CIDEr
# ---------------------------------------------------------------------------


def precook_corpus(token_lists: Sequence[Sequence[str]], n: int = 4) -> Dict[tuple, float]:
    """log doc-"frequency" table from raw corpus n-gram counts (count>1 kept).
    ref: cider.py:114-122 (counts, not documents — reference behavior)."""
    counts: Dict[tuple, int] = defaultdict(int)
    for cap in token_lists:
        for k in range(1, n + 1):
            for i in range(len(cap) - k + 1):
                counts[tuple(cap[i: i + k])] += 1
    return {g: math.log(c) for g, c in counts.items() if c > 1}


def _ngram_counts(words: Sequence[str], n: int) -> Dict[tuple, int]:
    counts: Dict[tuple, int] = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i: i + k])] += 1
    return counts


class _PrefixCider:
    """Incremental per-prefix CIDEr against a fixed single reference."""

    def __init__(self, df_log: Dict[tuple, float], ref_words: List[str],
                 n: int = 4, sigma: float = 6.0):
        self.df = df_log
        self.n = n
        self.sigma = sigma
        # reference vector (vec = tf * (0 - df))
        ref_counts = _ngram_counts(ref_words, n)
        self.ref_vec: Dict[tuple, float] = {}
        self.ref_norm2 = [0.0] * n
        self.ref_len_terms = 0.0
        for g, tf in ref_counts.items():
            w = -self.df.get(g, 0.0)
            v = tf * w
            self.ref_vec[g] = v
            self.ref_norm2[len(g) - 1] += v * v
            if len(g) - 1 == 1:
                self.ref_len_terms += tf
        self.reset()

    def reset(self):
        self.words: List[str] = []
        self.tf: Dict[tuple, int] = defaultdict(int)
        self.norm2 = [0.0] * self.n
        self.dot = [0.0] * self.n
        self.len_terms = 0.0  # bigram term count ("length", ref: cider.py:190-191)

    def append(self, word: str) -> float:
        """Add one word; return the CIDEr score of the current prefix."""
        self.words.append(word)
        L = len(self.words)
        for k in range(1, self.n + 1):
            if L - k < 0:
                continue
            g = tuple(self.words[L - k: L])
            w = -self.df.get(g, 0.0)
            tf_old = self.tf[g]
            tf_new = tf_old + 1
            self.tf[g] = tf_new
            ni = k - 1
            if w != 0.0:
                v_old, v_new = tf_old * w, tf_new * w
                self.norm2[ni] += v_new * v_new - v_old * v_old
                r = self.ref_vec.get(g)
                if r is not None:
                    self.dot[ni] += min(v_new, r) * r - (min(v_old, r) * r if tf_old else 0.0)
            if ni == 1:
                self.len_terms += 1
        return self._score()

    def _score(self) -> float:
        delta = float(self.len_terms - self.ref_len_terms)
        pen = math.exp(-(delta ** 2) / (2.0 * self.sigma ** 2))
        total = 0.0
        for ni in range(self.n):
            nh = math.sqrt(self.norm2[ni])
            nr = math.sqrt(self.ref_norm2[ni])
            val = self.dot[ni] / (nh * nr) if (nh != 0.0 and nr != 0.0) else 0.0
            total += val * pen
        return total / self.n  # mean over n, /len(refs)=1 (ref: cider.py:234-241)


class CiderReward:
    type = "CIDER"

    def __init__(self, itos: Sequence[str],
                 corpus_token_lists: Sequence[Sequence[str]],
                 gamma: float, gamma_manager: float,
                 n: int = 4, sigma: float = 6.0):
        self.itos = list(itos)
        self.df_log = precook_corpus(corpus_token_lists, n)
        self.gamma = gamma
        self.gamma_m = gamma_manager
        self.n = n
        self.sigma = sigma
        # C++ fast path (same math; host scoring sits on the on-policy RL
        # critical path, so its latency adds to every train step)
        self.native = None
        try:
            from bmhrl_tpu.native import CiderNative

            self.native = CiderNative(itos, corpus_token_lists, n, sigma)
        except Exception:
            self.native = None

    def _prefix_rewards_row(self, pred_row: np.ndarray, trg: str) -> List[float]:
        hypo = [self.itos[i] for i in pred_row]
        ref_words = trg.lower().split()
        pc = _PrefixCider(self.df_log, ref_words, self.n, self.sigma)
        scores: List[float] = []
        for w in hypo:
            if w == "</s>":
                if not scores:
                    scores.append(-0.1)
                break
            scores.append(pc.append(w))
        return scores

    def raw_rewards(self, pred: np.ndarray, trgs: Sequence[str]) -> np.ndarray:
        """(B, L) per-prefix CIDEr, trailing positions padded with the last
        value (ref: cider.py:53-58)."""
        B, L = pred.shape
        if self.native is not None:
            try:
                refs = [t.lower().split() for t in trgs]
                return self.native.raw_rewards(np.asarray(pred), refs)
            except RuntimeError:  # intern overflow etc. -> python path
                self.native = None
        out = np.zeros((B, L), np.float32)
        for b in range(B):
            s = self._prefix_rewards_row(pred[b], trgs[b])
            out[b, : len(s)] = s
            if len(s) < L:
                out[b, len(s):] = s[-1]
        return out

    def deltas(self, pred: np.ndarray, trgs: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        rewards = self.raw_rewards(pred, trgs)
        delta = np.concatenate([rewards[:, :1], np.diff(rewards, axis=1)], axis=1)
        return delta.astype(np.float32), rewards

    # -- public reward API (shared across scorers) --------------------------
    def delta_worker(self, pred: np.ndarray, trgs: Sequence[str],
                     mask: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
        delta, rewards = self.deltas(pred, trgs)
        return discounted_return_np(delta, self.gamma), rewards

    def _manager_sections(self, trgs: Sequence[str], sections: np.ndarray) -> np.ndarray:
        """Force a boundary at the reference length. ref: cider.py:72-80."""
        sections = sections.copy()
        L = sections.shape[1]
        for i, t in enumerate(trgs):
            end = len(t.split())
            if end < L:
                sections[i, end] = 1
                sections[i, end + 1:] = 0
        return sections

    def delta_manager(self, pred: np.ndarray, trgs: Sequence[str],
                      mask: Optional[np.ndarray], sections: np.ndarray
                      ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        sections = self._manager_sections(trgs, sections)
        step, rewards = self.delta_worker(pred, trgs, mask)
        seg = segment_sum_expand_np(step, sections)
        # CIDEr discounts across segment boundaries with the WORKER gamma
        # (cider.py:98 passes self.gamma); gamma_manager is stored but
        # unused in every reference scorer (batched_meteor.py:127-129
        # even carries a '# TODO use different gamm' note) — self.gamma_m
        # here mirrors that stored-but-unused wart, so the
        # rl_gamma_manager config knob is a no-op exactly as upstream
        return discounted_segment_return_np(seg, sections, self.gamma), None

    def delta_both(self, pred: np.ndarray, trgs: Sequence[str],
                   mask: Optional[np.ndarray], sections: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Warmstart value-net pretraining scores (worker + manager).
        ref intent of scorer.delta_cider at captioning_bmrl_loops.py:1163."""
        step, rewards = self.delta_worker(pred, trgs, mask)
        seg = segment_sum_expand_np(step, sections)
        manager = discounted_segment_return_np(seg, sections, self.gamma)
        return step, manager, rewards


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------


class _PrefixBleu:
    """Incremental smoothed BLEU (mean of BLEU-1..4) vs one reference."""

    def __init__(self, ref_words: List[str], n: int = 4):
        self.n = n
        self.reflen = len(ref_words)
        self.refmax: Dict[tuple, int] = {}
        for g, c in _ngram_counts(ref_words, n).items():
            self.refmax[g] = max(self.refmax.get(g, 0), c)
        self.words: List[str] = []
        self.tf: Dict[tuple, int] = defaultdict(int)
        self.correct = [0] * n

    def append(self, word: str) -> float:
        self.words.append(word)
        L = len(self.words)
        for k in range(1, self.n + 1):
            if L - k < 0:
                continue
            g = tuple(self.words[L - k: L])
            if self.tf[g] < self.refmax.get(g, 0):
                self.correct[k - 1] += 1
            self.tf[g] += 1
        return self._score()

    def _score(self) -> float:
        small, tiny = 1e-9, 1e-15
        testlen = len(self.words)
        bleus = []
        bleu = 1.0
        for k in range(self.n):
            guess = max(0, testlen - k)
            bleu *= (self.correct[k] + tiny) / (guess + small)
            bleus.append(bleu ** (1.0 / (k + 1)))
        ratio = (testlen + tiny) / (self.reflen + small)
        if ratio < 1:
            bleus = [b * math.exp(1 - 1 / ratio) for b in bleus]
        return float(np.mean(bleus))


class BleuReward:
    type = "BLEU"

    def __init__(self, itos: Sequence[str], gamma: float, gamma_manager: float, n: int = 4):
        self.itos = list(itos)
        self.gamma = gamma
        self.gamma_m = gamma_manager
        self.n = n

    def raw_rewards(self, pred: np.ndarray, trgs: Sequence[str]) -> np.ndarray:
        B, L = pred.shape
        out = np.zeros((B, L), np.float32)
        for b in range(B):
            ref = trgs[b].lower().split()
            pb = _PrefixBleu(ref, self.n)
            for l in range(L):
                out[b, l] = pb.append(self.itos[pred[b, l]].lower())
        return out

    def deltas(self, pred, trgs):
        rewards = self.raw_rewards(pred, trgs)
        delta = np.concatenate([rewards[:, :1], np.diff(rewards, axis=1)], axis=1)
        return delta.astype(np.float32), rewards

    def delta_worker(self, pred, trgs, mask=None):
        delta, rewards = self.deltas(pred, trgs)
        return discounted_return_np(delta, self.gamma), rewards

    def delta_manager(self, pred, trgs, mask, sections):
        step, rewards = self.delta_worker(pred, trgs, mask)
        seg = segment_sum_expand_np(step, sections)
        # BLEU/METEOR discount the expanded values per-step (bleu.py:80-83)
        return discounted_return_np(seg, self.gamma), None

    def delta_both(self, pred, trgs, mask, sections):
        step, rewards = self.delta_worker(pred, trgs, mask)
        seg = segment_sum_expand_np(step, sections)
        return step, discounted_return_np(seg, self.gamma), rewards


# ---------------------------------------------------------------------------
# METEOR
# ---------------------------------------------------------------------------


class _DummyWordnet:
    """Stand-in when the NLTK wordnet corpus is unavailable (no synonym
    stage); METEOR then uses exact + stem matching only."""

    def synsets(self, word):
        return []


def _get_wordnet():
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("dog")
        return wordnet
    except Exception:
        return _DummyWordnet()


class MeteorReward:
    type = "METEOR"

    def __init__(self, itos: Sequence[str], gamma: float, gamma_manager: float):
        from nltk.stem.porter import PorterStemmer

        self.itos = list(itos)
        self.gamma = gamma
        self.gamma_m = gamma_manager
        self.stemmer = PorterStemmer()
        self.wordnet = _get_wordnet()
        # native C++ aligner: runs the same alignment stages as NLTK's
        # scorer (exact + stem, plus the wordnet-synonym stage when the
        # corpus is present — the synset groups are fed to the kernel as a
        # lookup, see native.MeteorNative) -> identical scores, without the
        # reference's per-prefix O(B*L^2) host loop (batched_meteor.py:68-83)
        self.native = None
        try:
            from bmhrl_tpu.native import MeteorNative

            syn = (None if isinstance(self.wordnet, _DummyWordnet)
                   else self._wordnet_synonyms)
            self.native = MeteorNative(syn_lookup=syn)
        except Exception:
            self.native = None

    def _wordnet_synonyms(self, word: str):
        """NLTK's hypothesis-side synonym set (minus the word itself —
        the native aligner queries this with the STEMMED leftover word, and
        stem-equal pairs are exhausted by the stem stage): raw lemma names
        without '_' across wordnet.synsets(word).
        Ref: nltk _enum_wordnetsyn_match (via stemmed _enum_stem_match
        leftovers — see native.MeteorNative docstring)."""
        return [
            name
            for ss in self.wordnet.synsets(word)
            for name in (lemma.name() for lemma in ss.lemmas())
            if "_" not in name and name != word
        ]

    def _meteor(self, ref_tokens: List[str], hyp_tokens: List[str]) -> float:
        from nltk.translate.meteor_score import single_meteor_score

        return single_meteor_score(
            ref_tokens, hyp_tokens, stemmer=self.stemmer, wordnet=self.wordnet)

    def raw_rewards(self, pred: np.ndarray, trgs: Sequence[str]) -> np.ndarray:
        """Per-prefix METEOR on whitespace-split raw reference strings
        (ref: batched_meteor.py:68-83 — no case folding there)."""
        B, L = pred.shape
        if self.native is not None:
            hyps = [[self.itos[i] for i in pred[b]] for b in range(B)]
            refs = [t.split() for t in trgs]
            return self.native.prefix_rewards(hyps, refs)
        out = np.zeros((B, L), np.float32)
        for b in range(B):
            ref = trgs[b].split()
            hyp: List[str] = []
            for l in range(L):
                hyp.append(self.itos[pred[b, l]])
                out[b, l] = self._meteor(ref, hyp)
        return out

    def deltas(self, pred, trgs):
        rewards = self.raw_rewards(pred, trgs)
        delta = np.concatenate([rewards[:, :1], np.diff(rewards, axis=1)], axis=1)
        return delta.astype(np.float32), rewards

    def delta_worker(self, pred, trgs, mask=None):
        delta, rewards = self.deltas(pred, trgs)
        return discounted_return_np(delta, self.gamma), rewards

    def delta_manager(self, pred, trgs, mask, sections):
        step, rewards = self.delta_worker(pred, trgs, mask)
        seg = segment_sum_expand_np(step, sections)
        return discounted_return_np(seg, self.gamma), None

    def delta_both(self, pred, trgs, mask, sections):
        step, rewards = self.delta_worker(pred, trgs, mask)
        seg = segment_sum_expand_np(step, sections)
        return step, discounted_return_np(seg, self.gamma), rewards


def make_scorer(name: str, itos, corpus_token_lists, gamma, gamma_manager):
    """Scorer factory. ref: train_rl_captioning_module.py:72-78."""
    if name == "CIDER":
        return CiderReward(itos, corpus_token_lists, gamma, gamma_manager)
    if name == "BLEU":
        return BleuReward(itos, gamma, gamma_manager)
    if name == "METEOR":
        return MeteorReward(itos, gamma, gamma_manager)
    raise ValueError(f"unknown scorer {name}")
