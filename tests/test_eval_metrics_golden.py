"""Numeric golden tests pinning eval/metrics.py to the pycocoevalcap
algorithms the reference evaluator plugs in (ref: evaluation/evaluate.py:
59-64 — Bleu(4), Rouge, Cider; the Java METEOR is covered separately by
tests/test_meteor15_golden.py).

pycocoevalcap itself is not installable in this environment (no egress;
the reference's submodules/pycocoevalcap is an EMPTY directory), so the
pinning is done two independent ways:

1. Hand-derived analytic golden values, with the derivation written out in
   each test, on exactly the edge cases the smoke tests missed: active
   brevity penalty, "closest" ref-length tie-breaking (the tuple-min picks
   the SHORTER ref on a tie), multi-reference clipped counts, CIDEr's
   bigram-count length penalty quirk and log(N)-idf, ROUGE-L's independent
   max-precision/max-recall over references.
2. An independent oracle for BLEU: nltk.translate.bleu_score.corpus_bleu
   implements the same corpus BLEU (clipped counts aggregated over the
   corpus, closest-reference-length brevity penalty with shorter-on-tie)
   in unrelated code; pycocoevalcap differs from it only by its tiny=1e-15
   / small=1e-9 epsilons, so the two must agree to ~1e-6 whenever every
   n-gram order has nonzero matches.
"""
import math
import random

import numpy as np
import pytest

from bmhrl_tpu.eval.metrics import Bleu, Cider, Rouge


# ---------------------------------------------------------------------------
# BLEU vs the nltk corpus_bleu oracle
# ---------------------------------------------------------------------------

def _nltk_corpus_bleu(gts, res, k):
    """BLEU-(k+1) via nltk corpus_bleu (independent implementation of the
    same algorithm pycocoevalcap uses: corpus-aggregated clipped counts +
    closest-ref-length brevity penalty)."""
    from nltk.translate.bleu_score import corpus_bleu

    refs = [[r.split() for r in gts[key]] for key in gts]
    hyps = [res[key][0].split() for key in gts]
    w = tuple([1.0 / (k + 1)] * (k + 1))
    return corpus_bleu(refs, hyps, weights=w)


CORPORA = [
    # multi-reference, partial matches, brevity penalty active on item 1
    {
        "gts": {
            0: ["the cat sat on the mat today",
                "a cat was sitting on the mat"],
            1: ["a man is running very fast down the road"],
            2: ["the dog jumps over the fence", "a dog leaps over a fence"],
        },
        "res": {
            0: ["the cat sat on the mat today"],
            1: ["a man is running fast"],
            2: ["the dog jumps over a fence"],
        },
    },
    # hypothesis longer than every reference (no brevity penalty)
    {
        "gts": {
            0: ["a man sings", "a man sings a song"],
            1: ["children play in the park"],
        },
        "res": {
            0: ["a man sings a song in the park today"],
            1: ["children play in the park happily today friends"],
        },
    },
]


@pytest.mark.parametrize("corpus", CORPORA)
@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_bleu_matches_nltk_corpus_bleu(corpus, k):
    score, _ = Bleu(4).compute_score(corpus["gts"], corpus["res"])
    want = _nltk_corpus_bleu(corpus["gts"], corpus["res"], k)
    # the only difference is pycocoevalcap's tiny/small epsilons
    np.testing.assert_allclose(score[k], want, rtol=1e-6, atol=1e-7)


def test_bleu_matches_nltk_randomized():
    """Fuzz: random corpora over a tiny vocab (guarantees nonzero 4-gram
    overlap often enough); skip draws where some order has zero matches
    (there the epsilon conventions differ by design)."""
    from nltk.translate.bleu_score import corpus_bleu

    rng = random.Random(0)
    vocab = ["a", "b", "c", "d"]
    checked = 0
    for trial in range(30):
        gts, res = {}, {}
        for i in range(rng.randint(2, 5)):
            nrefs = rng.randint(1, 3)
            gts[i] = [" ".join(rng.choice(vocab)
                               for _ in range(rng.randint(5, 12)))
                      for _ in range(nrefs)]
            res[i] = [" ".join(rng.choice(vocab)
                               for _ in range(rng.randint(5, 12)))]
        score, _ = Bleu(4).compute_score(gts, res)
        want = _nltk_corpus_bleu(gts, res, 3)
        if want < 1e-20:  # a zero-match order: both sides emit their own
            continue      # epsilon (nltk ~1e-78, pycocoevalcap tiny/small)
        np.testing.assert_allclose(score[3], want, rtol=1e-5, atol=1e-7)
        checked += 1
    assert checked >= 10  # the fuzz actually exercised full comparisons


def test_bleu_brevity_penalty_golden():
    """Single item, single ref — fully hand-derivable.

    hyp = "a b c d" (len 4), ref = "a b c d e f" (len 6).
    p1 = 4/4, p2 = 3/3, p3 = 2/2, p4 = 1/1 (all hyp n-grams appear in ref).
    ratio = 4/6 < 1 -> BP = exp(1 - 6/4) = exp(-0.5) applied to every order.
    Expected Bleu_k = 1.0 * exp(-0.5) for k=1..4 (up to the 1e-15/1e-9
    epsilons pycocoevalcap folds into each precision).
    """
    score, per_item = Bleu(4).compute_score(
        {0: ["a b c d e f"]}, {0: ["a b c d"]})
    want = math.exp(1.0 - 6.0 / 4.0)
    for k in range(4):
        np.testing.assert_allclose(score[k], want, rtol=1e-7)
        np.testing.assert_allclose(per_item[k][0], want, rtol=1e-7)


def test_bleu_closest_reflen_tie_prefers_shorter():
    """pycocoevalcap's closest-reference length is min((|l-t|, l))[1]: on a
    tie the SHORTER reference wins. hyp len 4; refs of len 3 and 5 tie at
    |l-4| = 1 -> reflen = 3 -> ratio = 4/3 > 1 -> NO brevity penalty.
    (Had the tie resolved to 5, BP = exp(1 - 5/4) would apply.)

    Unigram precision: hyp "a b c d"; clipped against max counts over both
    refs ({a,b,c} from ref1, {a,b,c,d,e} from ref2) -> 4/4 = 1. Expected
    Bleu_1 = 1.0 exactly (modulo epsilons).
    """
    score, _ = Bleu(1).compute_score(
        {0: ["a b c", "a b c d e"]}, {0: ["a b c d"]})
    np.testing.assert_allclose(score[0], 1.0, rtol=1e-7)
    # contrast case: refs 5 and 7, hyp 6 -> tie -> shorter (5) -> no BP;
    # with refs 5 and 6, hyp 6 -> exact (6) -> no BP either; but refs 7
    # and 9, hyp 6 -> closest is 7 -> BP = exp(1 - 7/6)
    score2, _ = Bleu(1).compute_score(
        {0: ["a b c d e f g", "a b c d e f g h i"]}, {0: ["a b c d e f"]})
    np.testing.assert_allclose(score2[0], math.exp(1 - 7.0 / 6.0), rtol=1e-6)


def test_bleu_multi_reference_clipping_golden():
    """Clipped counts take the MAX count per n-gram across references,
    then min(hyp count, max ref count).

    hyp = "the the cat" (the x2, cat x1).
    refs = "the cat sat" (the x1), "the the dog" (the x2).
    unigram correct = min(2, max(1,2)) + min(1, max(1,0)) = 2 + 1 = 3 of 3.
    hyp len 3; ref lens 3,3 -> closest 3 -> no BP. Bleu_1 = 1.0.
    With only the first reference, correct = 1 + 1 = 2 -> Bleu_1 = 2/3.
    """
    s, _ = Bleu(1).compute_score(
        {0: ["the cat sat", "the the dog"]}, {0: ["the the cat"]})
    np.testing.assert_allclose(s[0], 1.0, rtol=1e-7)
    s2, _ = Bleu(1).compute_score({0: ["the cat sat"]}, {0: ["the the cat"]})
    np.testing.assert_allclose(s2[0], 2.0 / 3.0, rtol=1e-7)


# ---------------------------------------------------------------------------
# ROUGE-L hand goldens
# ---------------------------------------------------------------------------

def test_rouge_l_golden_single_ref():
    """hyp = "a b c d e" vs ref = "a c e f": LCS = "a c e" (3).
    P = 3/5, R = 3/4, beta = 1.2:
    F = (1 + b^2) P R / (R + b^2 P) with b^2 = 1.44.
    """
    p, r = 3.0 / 5.0, 3.0 / 4.0
    b2 = 1.2 ** 2
    want = (1 + b2) * p * r / (r + b2 * p)
    s, per = Rouge().compute_score({0: ["a c e f"]}, {0: ["a b c d e"]})
    np.testing.assert_allclose(s, want, rtol=1e-12)
    np.testing.assert_allclose(per[0], want, rtol=1e-12)


def test_rouge_l_max_prec_and_rec_independently():
    """pycocoevalcap takes max precision and max recall over references
    INDEPENDENTLY (not the best per-reference F).

    hyp = "a b c d" (len 4).
    ref1 = "a b" (len 2):        LCS 2 -> P = 2/4, R = 2/2 = 1.
    ref2 = "a b c d e f g h":    LCS 4 -> P = 4/4 = 1, R = 4/8 = 1/2.
    max P = 1 (from ref2), max R = 1 (from ref1) -> F = 1.0, even though
    no single reference gives F = 1.
    """
    s, _ = Rouge().compute_score(
        {0: ["a b", "a b c d e f g h"]}, {0: ["a b c d"]})
    np.testing.assert_allclose(s, 1.0, rtol=1e-12)


def test_rouge_l_corpus_average():
    """Corpus score is the plain mean of per-item F scores."""
    gts = {0: ["a c e f"], 1: ["x y"]}
    res = {0: ["a b c d e"], 1: ["x y"]}
    s, per = Rouge().compute_score(gts, res)
    np.testing.assert_allclose(s, np.mean(per), rtol=1e-12)
    np.testing.assert_allclose(per[1], 1.0, rtol=1e-12)


# ---------------------------------------------------------------------------
# CIDEr hand goldens
# ---------------------------------------------------------------------------

def test_cider_perfect_match_is_exactly_ten():
    """Disjoint-vocabulary corpus: every n-gram of each video's reference
    occurs in exactly one video -> df = 1 -> idf = log(3) for all n-grams.
    hyp == ref -> cosine 1 per order, bigram-length delta 0 -> penalty 1
    -> per-item score = mean([1,1,1,1]) / n_refs * 10 = 10.0 EXACTLY.
    Pins the x10 scale, the log(N) idf normalization and the per-video
    reference averaging in one assert.
    """
    gts = {0: ["a b c d e"], 1: ["f g h i j"], 2: ["k l m n o"]}
    res = {k: [v[0]] for k, v in gts.items()}
    score, per = Cider().compute_score(gts, res)
    np.testing.assert_allclose(score, 10.0, rtol=1e-12)
    np.testing.assert_allclose(per, [10.0] * 3, rtol=1e-12)


def test_cider_prefix_hypothesis_golden():
    """Fully hand-derived: corpus of 3 disjoint single-ref videos (so every
    n-gram has idf = log 3, which cancels in every cosine), video 0 scored
    with the 4/5-length prefix hypothesis.

    ref = "a b c d e", hyp = "a b c d":
      n=1: hyp 4 unigrams all in ref   -> cos = 4 / (sqrt(4) sqrt(5))
      n=2: hyp 3 bigrams all in ref    -> cos = 3 / (sqrt(3) sqrt(4))
      n=3: hyp 2 trigrams all in ref   -> cos = 2 / (sqrt(2) sqrt(3))
      n=4: hyp 1 4-gram in ref         -> cos = 1 / (sqrt(1) sqrt(2))
    length penalty uses BIGRAM counts (the pycocoevalcap quirk: counts2vec
    accumulates `length` at n-index 1): delta = 3 - 4 = -1,
    pen = exp(-1 / (2 * 36)).
    item0 = mean(cos) * pen * 10; items 1,2 are perfect matches = 10.
    """
    gts = {0: ["a b c d e"], 1: ["f g h i j"], 2: ["k l m n o"]}
    res = {0: ["a b c d"], 1: ["f g h i j"], 2: ["k l m n o"]}
    cos = [4 / math.sqrt(4 * 5), 3 / math.sqrt(3 * 4),
           2 / math.sqrt(2 * 3), 1 / math.sqrt(1 * 2)]
    pen = math.exp(-1.0 / (2 * 6.0 ** 2))
    item0 = float(np.mean(cos)) * pen * 10.0
    score, per = Cider().compute_score(gts, res)
    np.testing.assert_allclose(per[0], item0, rtol=1e-12)
    np.testing.assert_allclose(per[1:], [10.0, 10.0], rtol=1e-12)
    np.testing.assert_allclose(score, np.mean([item0, 10.0, 10.0]),
                               rtol=1e-12)


def test_cider_idf_down_weights_common_ngrams():
    """An n-gram present in every video's references has df = N ->
    idf = log(N) - log(N) = 0: a hypothesis made ONLY of such n-grams has
    a zero vector -> cosine contributions 0 -> score exactly 0, even for a
    verbatim reference copy. (This is the idf edge pycocoevalcap inherits:
    all-common content carries no CIDEr signal.)"""
    gts = {0: ["the man runs"], 1: ["the man sleeps"], 2: ["the man eats"]}
    # "the man" appears in all 3 -> unigrams the/man and bigram "the man"
    # have idf 0; hyp uses only those
    score, per = Cider().compute_score(gts, {0: ["the man"],
                                             1: ["the man"],
                                             2: ["the man"]})
    np.testing.assert_allclose(per, [0.0, 0.0, 0.0], atol=1e-12)


def test_cider_multi_reference_averaging():
    """Per-item score sums similarity over references then divides by the
    reference COUNT (not a mean over per-ref cosines with penalty folded
    differently). Two identical references -> same as one: sum doubles,
    divide by 2."""
    gts1 = {0: ["a b c d e"], 1: ["f g h i j"], 2: ["k l m n o"]}
    gts2 = {0: ["a b c d e", "a b c d e"], 1: ["f g h i j"],
            2: ["k l m n o"]}
    res = {0: ["a b c d"], 1: ["f g h i j"], 2: ["k l m n o"]}
    _, per1 = Cider().compute_score(gts1, res)
    _, per2 = Cider().compute_score(gts2, res)
    np.testing.assert_allclose(per1[0], per2[0], rtol=1e-12)


def test_cider_unseen_hyp_ngrams_clip_df_at_one():
    """Hypothesis n-grams absent from every reference get df clipped to 1
    (idf = log N, the max) but contribute 0 to the cosine because the
    reference vector is 0 there — they only inflate the hyp norm. A half-
    matching hypothesis therefore scores strictly between 0 and 10."""
    gts = {0: ["a b c d e"], 1: ["f g h i j"], 2: ["k l m n o"]}
    _, per = Cider().compute_score(gts, {0: ["a b z z z"],
                                         1: ["f g h i j"],
                                         2: ["k l m n o"]})
    assert 0.0 < per[0] < 10.0


# ---------------------------------------------------------------------------
# ANet wrapper averaging (the numbers the evaluator reports)
# ---------------------------------------------------------------------------

def test_anet_wrapper_scores_equal_direct_metric_calls(tmp_path):
    """With every predicted segment exactly matching a GT segment at
    tIoU >= 0.5, the evaluator's per-tIoU Bleu/Rouge/CIDEr must equal the
    reference's aggregation (evaluate.py:239-259): compute_score PER VIDEO
    over that video's matched (PTB-tokenized) caption pairs, then the plain
    mean across videos — pinning that the wrapper's matching/averaging adds
    nothing beyond the scorers themselves."""
    import json

    from bmhrl_tpu.eval.anet_eval import calculate_metrics
    from bmhrl_tpu.eval.ptb_tokenizer import ptb_tokenize_sentence

    gt = {
        "v_1": {"duration": 30.0, "timestamps": [[0, 10], [10, 20]],
                "sentences": ["A man is running very fast",
                              "The man jumps into the sand pit"]},
        "v_2": {"duration": 20.0, "timestamps": [[0, 20]],
                "sentences": ["A dog plays with a red ball"]},
    }
    preds = {
        "v_1": [
            {"sentence": "A man runs fast", "timestamp": [0, 10]},
            {"sentence": "The man jumps into sand", "timestamp": [10, 20]},
        ],
        "v_2": [{"sentence": "A dog plays with a ball",
                 "timestamp": [0, 20]}],
    }
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    submission = {"version": "VERSION 1.0",
                  "external_data": {"used": True, "details": ""},
                  "results": preds}
    metrics = calculate_metrics([str(gt_path)], submission, [0.5], 100)
    got = metrics["Average across tIoUs"]

    def tok(s):
        return " ".join(ptb_tokenize_sentence(s))

    bleu4_v, rouge_v, cider_v = [], [], []
    for vid in gt:
        gts, res = {}, {}
        for i, (seg, ref_sent) in enumerate(zip(gt[vid]["timestamps"],
                                                gt[vid]["sentences"])):
            pred_sent = next(p["sentence"] for p in preds[vid]
                             if p["timestamp"] == list(seg))
            gts[i] = [tok(ref_sent)]
            res[i] = [tok(pred_sent)]
        bleu, _ = Bleu(4).compute_score(gts, res)
        rouge, _ = Rouge().compute_score(gts, res)
        cider, _ = Cider().compute_score(gts, res)
        bleu4_v.append(bleu[3])
        rouge_v.append(rouge)
        cider_v.append(cider)
    np.testing.assert_allclose(got["Bleu_4"], np.mean(bleu4_v), rtol=1e-6)
    np.testing.assert_allclose(got["ROUGE_L"], np.mean(rouge_v), rtol=1e-6)
    np.testing.assert_allclose(got["CIDEr"], np.mean(cider_v), rtol=1e-6)
