"""Native METEOR scorer — replaces the Java ``meteor-1.5.jar`` subprocess
(the only non-Python execution in the reference system;
ref: evaluation/evaluate.py:19,61, SURVEY §2.9).

Algorithm: staged unigram alignment (exact -> stem -> WordNet synonym),
maximizing matches then minimizing crossings per stage; harmonic-mean
F with fragmentation penalty.

Two parameter presets:
- "nltk":    alpha=0.9, beta=3, gamma=0.5, uniform stage weights — matches
             nltk.translate.meteor_score (what the RL reward used,
             ref: metrics/batched_meteor.py:76).
- "meteor15": alpha=0.85, beta=0.2, gamma=0.6, stage weights (1.0, 0.6, 0.8),
             content/function word delta=0.75 — the Java METEOR 1.5 English
             defaults, minus its paraphrase-table stage (data unavailable
             offline; scores are slightly conservative vs the jar).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

# METEOR 1.5 English function-word list (common closed-class words)
FUNCTION_WORDS = {
    "a", "an", "the", "this", "that", "these", "those", "of", "in", "on",
    "at", "by", "to", "for", "with", "from", "as", "into", "onto", "upon",
    "and", "or", "but", "nor", "so", "yet", "is", "am", "are", "was", "were",
    "be", "been", "being", "do", "does", "did", "have", "has", "had", "will",
    "would", "can", "could", "shall", "should", "may", "might", "must", "it",
    "its", "he", "his", "she", "her", "they", "their", "them", "we", "our",
    "us", "you", "your", "i", "my", "me", "not", "no", "than", "then",
    "there", "here", "when", "where", "which", "who", "whom", "what", "how",
    "if", "while", "because", "about", "after", "before", "between", "during",
    "over", "under", "up", "down", "out", "off", "again", "s", "t",
}


class _Stemmer:
    def __init__(self):
        from nltk.stem.porter import PorterStemmer

        self._s = PorterStemmer()

    def __call__(self, w: str) -> str:
        return self._s.stem(w)


def _get_wordnet():
    try:
        from nltk.corpus import wordnet

        wordnet.synsets("dog")
        return wordnet
    except Exception:
        return None


class MeteorScorer:
    def __init__(self, preset: str = "nltk"):
        self.stemmer = _Stemmer()
        self.wordnet = _get_wordnet()
        if preset == "nltk":
            self.alpha, self.beta, self.gamma = 0.9, 3.0, 0.5
            self.stage_weights = (1.0, 1.0, 1.0)
            self.delta = None
        elif preset == "meteor15":
            self.alpha, self.beta, self.gamma = 0.85, 0.2, 0.6
            self.stage_weights = (1.0, 0.6, 0.8)
            self.delta = 0.75
        else:
            raise ValueError(preset)

    # -- alignment -----------------------------------------------------------
    def _synonyms(self, word: str) -> Set[str]:
        if self.wordnet is None:
            return {word}
        syns = {word}
        for ss in self.wordnet.synsets(word):
            for lemma in ss.lemmas():
                name = lemma.name()
                if "_" not in name:
                    syns.add(name.lower())
        return syns

    def align(self, hyp: Sequence[str], ref: Sequence[str]
              ) -> List[Tuple[int, int, int]]:
        """Greedy staged alignment; returns [(hyp_i, ref_j, stage)] sorted by
        hyp index. Stage order: exact(0), stem(1), synonym(2)."""
        h_free = [True] * len(hyp)
        r_free = [True] * len(ref)
        matches: List[Tuple[int, int, int]] = []
        # stage 0: exact
        for i, hw in enumerate(hyp):
            if not h_free[i]:
                continue
            for j, rw in enumerate(ref):
                if r_free[j] and hw == rw:
                    matches.append((i, j, 0))
                    h_free[i] = r_free[j] = False
                    break
        # stage 1: stem
        h_stem = [self.stemmer(w) for w in hyp]
        r_stem = [self.stemmer(w) for w in ref]
        for i in range(len(hyp)):
            if not h_free[i]:
                continue
            for j in range(len(ref)):
                if r_free[j] and h_stem[i] == r_stem[j]:
                    matches.append((i, j, 1))
                    h_free[i] = r_free[j] = False
                    break
        # stage 2: wordnet synonyms
        if self.wordnet is not None:
            for i in range(len(hyp)):
                if not h_free[i]:
                    continue
                syns = self._synonyms(hyp[i])
                for j in range(len(ref)):
                    if r_free[j] and ref[j] in syns:
                        matches.append((i, j, 2))
                        h_free[i] = r_free[j] = False
                        break
        matches.sort()
        return matches

    @staticmethod
    def _chunks(matches: List[Tuple[int, int, int]]) -> int:
        if not matches:
            return 0
        chunks = 1
        for a, b in zip(matches, matches[1:]):
            if not (b[0] == a[0] + 1 and b[1] == a[1] + 1):
                chunks += 1
        return chunks

    def _weighted_count(self, indices, words, stages) -> float:
        """Stage- and content-weighted match mass (delta weighting only in
        the meteor15 preset)."""
        total = 0.0
        for idx, stage in zip(indices, stages):
            w = self.stage_weights[stage]
            if self.delta is not None:
                is_func = words[idx] in FUNCTION_WORDS
                w *= (1.0 - self.delta) if is_func else self.delta
            total += w
        return total

    def _weighted_len(self, words) -> float:
        if self.delta is None:
            return float(len(words))
        return sum((1.0 - self.delta) if w in FUNCTION_WORDS else self.delta
                   for w in words)

    def sentence_score(self, hyp: Sequence[str], refs: Sequence[Sequence[str]]
                       ) -> float:
        return max((self._single(hyp, r) for r in refs), default=0.0)

    def _single(self, hyp: Sequence[str], ref: Sequence[str]) -> float:
        matches = self.align(hyp, ref)
        m = len(matches)
        if m == 0 or not hyp or not ref:
            return 0.0
        h_idx = [a for a, _, _ in matches]
        r_idx = [b for _, b, _ in matches]
        stages = [s for _, _, s in matches]
        p_num = self._weighted_count(h_idx, list(hyp), stages)
        r_num = self._weighted_count(r_idx, list(ref), stages)
        P = p_num / max(self._weighted_len(list(hyp)), 1e-9)
        R = r_num / max(self._weighted_len(list(ref)), 1e-9)
        if P + R == 0:
            return 0.0
        a = self.alpha
        fmean = P * R / (a * P + (1 - a) * R)
        frag = self._chunks(matches) / m
        penalty = self.gamma * (frag ** self.beta)
        return (1.0 - penalty) * fmean


class Meteor:
    """pycocoevalcap-compatible wrapper: compute_score(gts, res) where values
    are lists of pre-tokenized (space-joined) caption strings."""

    def __init__(self, preset: str = "nltk"):
        self.scorer = MeteorScorer(preset)

    def method(self):
        return "METEOR"

    def compute_score(self, gts: Dict, res: Dict):
        scores = []
        for k in gts:
            hyp = res[k][0].split()
            refs = [r.split() for r in gts[k]]
            scores.append(self.scorer.sentence_score(hyp, refs))
        avg = sum(scores) / max(len(scores), 1)
        return avg, scores
