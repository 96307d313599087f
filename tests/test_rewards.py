"""Golden tests for the incremental reward scorers.

The oracle below independently re-states the reference CIDEr/BLEU math
(metrics/cider.py:123-253, metrics/bleu.py:94-279) as straightforward
per-prefix re-scoring; the incremental scorers must produce identical values.
"""
import math
from collections import defaultdict

import numpy as np
import pytest

from bmhrl_tpu.train import rewards as R

ITOS = ["<unk>", "<blank>", "<s>", "</s>", "a", "man", "is", "running",
        "the", "dog", "jumps", "fast", "woman"]
STOI = {w: i for i, w in enumerate(ITOS)}


def ids(words):
    return np.array([[STOI[w] for w in words.split()]], np.int64)


# ---------------------------------------------------------------------------
# oracle: direct per-prefix CIDEr as specified by the reference math
# ---------------------------------------------------------------------------

def ngrams(words, n=4):
    c = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            c[tuple(words[i:i + k])] += 1
    return c


def oracle_cider(prefix_words, ref_words, df_log, n=4, sigma=6.0):
    ref_len = 0.0  # log(1)

    def counts2vec(cnts):
        vec = [defaultdict(float) for _ in range(n)]
        norm = [0.0] * n
        length = 0
        for g, tf in cnts.items():
            df = df_log.get(g, 0.0)
            ni = len(g) - 1
            vec[ni][g] = tf * (ref_len - df)
            norm[ni] += vec[ni][g] ** 2
            if ni == 1:
                length += tf
        return vec, [math.sqrt(x) for x in norm], length

    vh, nh, lh = counts2vec(ngrams(prefix_words, n))
    vr, nr, lr = counts2vec(ngrams(ref_words, n))
    delta = float(lh - lr)
    val = np.zeros(n)
    for ni in range(n):
        for g, c in vh[ni].items():
            val[ni] += min(vh[ni][g], vr[ni][g]) * vr[ni][g]
        if nh[ni] != 0 and nr[ni] != 0:
            val[ni] /= nh[ni] * nr[ni]
        val[ni] *= math.e ** (-(delta ** 2) / (2 * sigma ** 2))
    return float(np.mean(val))


def oracle_bleu(prefix_words, ref_words, n=4):
    small, tiny = 1e-9, 1e-15
    refmax = {}
    for g, c in ngrams(ref_words, n).items():
        refmax[g] = max(refmax.get(g, 0), c)
    counts = ngrams(prefix_words, n)
    correct = [0] * n
    for g, c in counts.items():
        correct[len(g) - 1] += min(refmax.get(g, 0), c)
    testlen, reflen = len(prefix_words), len(ref_words)
    bleu, bleus = 1.0, []
    for k in range(n):
        guess = max(0, testlen - k)
        bleu *= (correct[k] + tiny) / (guess + small)
        bleus.append(bleu ** (1.0 / (k + 1)))
    ratio = (testlen + tiny) / (reflen + small)
    if ratio < 1:
        bleus = [b * math.exp(1 - 1 / ratio) for b in bleus]
    return float(np.mean(bleus))


CORPUS = [
    "a man is running".split(),
    "a man is running fast".split(),
    "the dog jumps".split(),
    "the dog is running".split(),
    "a woman is running".split(),
]


def test_cider_prefixes_match_oracle():
    scorer = R.CiderReward(ITOS, CORPUS, gamma=0.0, gamma_manager=0.0)
    pred = ids("a man is running fast the dog")
    trg = ["The dog is running"]
    rewards = scorer.raw_rewards(pred, trg)
    hypo = "a man is running fast the dog".split()
    ref = trg[0].lower().split()
    for l in range(len(hypo)):
        want = oracle_cider(hypo[:l + 1], ref, scorer.df_log)
        np.testing.assert_allclose(rewards[0, l], want, rtol=1e-5, atol=1e-7,
                                   err_msg=f"prefix len {l+1}")


def test_cider_eos_break_and_padding():
    scorer = R.CiderReward(ITOS, CORPUS, gamma=0.0, gamma_manager=0.0)
    pred = ids("a man </s> dog dog")
    rewards = scorer.raw_rewards(pred, ["a man is running"])
    # positions 0..1 scored; 2.. padded with the value at position 1
    assert rewards[0, 2] == rewards[0, 1]
    assert rewards[0, 4] == rewards[0, 1]
    # immediate </s> -> -0.1 everywhere
    pred2 = ids("</s> a man is")
    r2 = scorer.raw_rewards(pred2, ["a man is"])
    np.testing.assert_allclose(r2[0], -0.1)


def test_cider_positive_on_good_caption():
    scorer = R.CiderReward(ITOS, CORPUS, gamma=0.0, gamma_manager=0.0)
    good = ids("the dog is running")
    bad = ids("fast fast fast fast")
    rg = scorer.raw_rewards(good, ["the dog is running"])
    rb = scorer.raw_rewards(bad, ["the dog is running"])
    assert rg[0, -1] > rb[0, -1]
    # perfect match scores mean over n of 1 for every n whose n-grams carry
    # nonzero df weight (here n=1,2 -> 0.5); the quirky-but-faithful ceiling
    assert rg[0, -1] >= 0.5 - 1e-6


def test_bleu_prefixes_match_oracle():
    scorer = R.BleuReward(ITOS, gamma=0.0, gamma_manager=0.0)
    pred = ids("a man is running fast dog")
    trg = ["a man is running"]
    rewards = scorer.raw_rewards(pred, trg)
    hypo = "a man is running fast dog".split()
    for l in range(len(hypo)):
        want = oracle_bleu(hypo[:l + 1], trg[0].lower().split())
        np.testing.assert_allclose(rewards[0, l], want, rtol=1e-6,
                                   err_msg=f"prefix len {l+1}")


def test_meteor_monotone_and_range():
    scorer = R.MeteorReward(ITOS, gamma=0.0, gamma_manager=0.0)
    pred = ids("a man is running")
    r = scorer.raw_rewards(pred, ["a man is running"])
    assert (r[0] >= 0).all() and (r[0] <= 1).all()
    assert r[0, -1] > 0.9  # perfect match
    # stem matching: running vs runs would still partially match via stems
    r2 = scorer.raw_rewards(ids("the dog jumps"), ["a man is running"])
    assert r2[0, -1] < r[0, -1]


def test_worker_delta_gamma0_equals_step_delta():
    scorer = R.CiderReward(ITOS, CORPUS, gamma=0.0, gamma_manager=0.0)
    pred = ids("the dog is running")
    score, rewards = scorer.delta_worker(pred, ["the dog is running"])
    want = np.concatenate([rewards[:, :1], np.diff(rewards, axis=1)], axis=1)
    np.testing.assert_allclose(score, want, rtol=1e-5, atol=1e-7)


def test_manager_sections_forced_at_ref_len():
    scorer = R.CiderReward(ITOS, CORPUS, gamma=0.5, gamma_manager=0.5)
    sections = np.zeros((1, 6), np.int64)
    sections[0, 1] = 1
    out = scorer._manager_sections(["a man is"], sections)
    assert out[0, 3] == 1  # boundary forced at len=3
    assert out[0, 4:].sum() == 0
    assert out[0, 1] == 1  # earlier boundary kept


def test_numpy_segment_twins_match_jax_ops():
    import jax.numpy as jnp

    from bmhrl_tpu.ops import segments as S

    rng = np.random.RandomState(3)
    r = rng.randn(3, 10).astype(np.float32)
    m = (rng.rand(3, 10) < 0.3).astype(np.int32)
    np.testing.assert_allclose(
        R.discounted_return_np(r, 0.7), np.asarray(S.discounted_return(jnp.asarray(r), 0.7)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        R.segment_sum_expand_np(r, m), np.asarray(S.segment_sum_expand(jnp.asarray(r), jnp.asarray(m))),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        R.discounted_segment_return_np(r, m, 0.7),
        np.asarray(S.discounted_segment_return(jnp.asarray(r), jnp.asarray(m), 0.7)),
        rtol=1e-4, atol=1e-5)


def test_make_scorer_dispatch():
    for name, cls in [("CIDER", R.CiderReward), ("BLEU", R.BleuReward),
                      ("METEOR", R.MeteorReward)]:
        s = R.make_scorer(name, ITOS, CORPUS, 0.0, 0.0)
        assert isinstance(s, cls) and s.type == name
