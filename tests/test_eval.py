"""Evaluation harness tests: PTB tokenizer, METEOR, corpus metrics, tIoU
evaluator end-to-end on a synthetic submission."""
import json

import numpy as np
import pytest

from bmhrl_tpu.eval.anet_eval import ANETCaptionsEvaluator, calculate_metrics, interval_iou
from bmhrl_tpu.eval.meteor import Meteor, MeteorScorer
from bmhrl_tpu.eval.metrics import Bleu, Cider, Rouge
from bmhrl_tpu.eval.ptb_tokenizer import PTBTokenizer, ptb_tokenize_sentence


def test_ptb_tokenizer_basic():
    assert ptb_tokenize_sentence("A man runs.") == ["a", "man", "runs"]
    assert ptb_tokenize_sentence("Don't stop, now!") == ["do", "n't", "stop", "now"]
    t = PTBTokenizer()
    out = t.tokenize({0: [{"caption": "The dog; jumps (high)."}]})
    assert out[0] == ["the dog jumps high"]


def test_meteor_perfect_and_zero():
    m = MeteorScorer("nltk")
    assert m.sentence_score("a man runs".split(), ["a man runs".split()]) > 0.95
    assert m.sentence_score("xyz".split(), ["a man runs".split()]) == 0.0
    # stem stage: running ~ run
    s = m.sentence_score("the man running".split(), ["the man runs".split()])
    assert s > 0.5


def test_meteor_paraphrase_stage(tmp_path):
    """With a paraphrase table supplied, the meteor15 preset matches phrase
    pairs the word stages cannot (METEOR 1.5 stage 4); without the table the
    score is strictly lower. Both Meteor-jar '|||' and TSV layouts parse."""
    table = tmp_path / "paraphrase-en.txt"
    table.write_text(
        "jumps over ||| leaps across\n"
        "0.35 ||| automobile ||| car\n"          # numeric weight ignored
        "[X] ||| lorry ||| truck ||| Feature=1 ||| 0-0\n"  # PPDB layout
        "sprinting\tdashing quickly\n"           # TSV, 1-to-2 words
        "# comment line\n")
    with_p = MeteorScorer("meteor15", paraphrase_path=str(table))
    without = MeteorScorer("meteor15")

    hyp = "the dog jumps over the fence".split()
    ref = "the dog leaps across the fence".split()
    s_with, s_wo = with_p._single(hyp, ref), without._single(hyp, ref)
    assert s_with > s_wo
    # the paraphrase match is recorded as a span match at stage 3
    spans = with_p.align_spans(hyp, ref)
    assert (2, 2, 2, 2, 3) in spans

    # unequal-length spans (1 hyp word <-> 2 ref words)
    hyp2, ref2 = "a man sprinting".split(), "a man dashing quickly".split()
    assert with_p._single(hyp2, ref2) > without._single(hyp2, ref2)
    # numeric-weight '|||' rows parse into the table
    assert "car" in with_p.paraphrases.matches("automobile")
    # PPDB layout: LHS tag and feature fields are NOT phrases
    assert "truck" in with_p.paraphrases.matches("lorry")
    assert not with_p.paraphrases.matches("[x]")
    # the nltk preset is a parity target: a configured table must not
    # change it (the stage only belongs to meteor15)
    nltk_p = MeteorScorer("nltk", paraphrase_path=str(table))
    assert nltk_p.paraphrases is None
    # no table -> word-stage behavior is unchanged
    assert without.align_spans(hyp, ref) == [
        (i, 1, j, 1, s) for i, j, s in without.align(hyp, ref)]


def test_meteor_vs_nltk():
    """Our nltk preset must track nltk.single_meteor_score closely."""
    import nltk.translate.meteor_score as nms
    from nltk.stem.porter import PorterStemmer

    from bmhrl_tpu.eval.meteor import _get_wordnet

    wn = _get_wordnet()
    if wn is None:
        class _WN:
            def synsets(self, w):
                return []
        wn = _WN()
    ours = MeteorScorer("nltk")
    cases = [
        ("a man is running fast", "a man runs quickly"),
        ("the dog jumps over the fence", "a dog jumped over a fence"),
        ("hello world", "hello world"),
        ("completely different words here", "nothing matches at all"),
    ]
    for hyp, ref in cases:
        want = nms.single_meteor_score(
            ref.split(), hyp.split(), stemmer=PorterStemmer(), wordnet=wn)
        got = ours.sentence_score(hyp.split(), [ref.split()])
        np.testing.assert_allclose(got, want, atol=0.02, err_msg=f"{hyp}|{ref}")


def test_bleu_corpus():
    b = Bleu(4)
    gts = {0: ["the cat is on the mat"], 1: ["a man is running"]}
    res = {0: ["the cat is on the mat"], 1: ["a man is running"]}
    score, _ = b.compute_score(gts, res)
    assert all(s > 0.99 for s in score)
    res2 = {0: ["dog"], 1: ["tree"]}
    score2, _ = b.compute_score(gts, res2)
    assert score2[3] < 0.01


def test_rouge_l():
    r = Rouge()
    s, _ = r.compute_score({0: ["a b c d"]}, {0: ["a b c d"]})
    assert s > 0.99
    s2, _ = r.compute_score({0: ["a b c d"]}, {0: ["x y z"]})
    assert s2 == 0.0


def test_cider_corpus():
    c = Cider()
    gts = {0: ["a man is running"], 1: ["the dog jumps"], 2: ["a woman sings"]}
    res = {0: ["a man is running"], 1: ["the dog jumps"], 2: ["a woman sings"]}
    score, scores = c.compute_score(gts, res)
    assert score > 5.0  # perfect matches score high (x10 scale)


def test_interval_iou():
    assert interval_iou([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)
    assert interval_iou([0, 10], [5, 15]) == pytest.approx(1 / 3, abs=1e-3)
    assert interval_iou([0, 1], [5, 6]) == 0.0


def test_anet_evaluator_end_to_end(tmp_path):
    gt = {
        "v_1": {
            "duration": 30.0,
            "timestamps": [[0, 10], [10, 20]],
            "sentences": ["A man is running fast", "The man jumps into sand"],
        },
        "v_2": {
            "duration": 20.0,
            "timestamps": [[0, 20]],
            "sentences": ["A dog plays with a ball"],
        },
    }
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    submission = {
        "version": "VERSION 1.0",
        "external_data": {"used": True, "details": ""},
        "results": {
            "v_1": [
                {"sentence": "A man is running fast", "timestamp": [0, 10]},
                {"sentence": "The man jumps into sand", "timestamp": [10, 20]},
            ],
            "v_2": [
                {"sentence": "A dog plays with a ball", "timestamp": [0, 20]},
            ],
        },
    }
    metrics = calculate_metrics([str(gt_path)], submission, [0.5], 100)
    avg = metrics["Average across tIoUs"]
    # perfect predictions on GT segments
    assert avg["METEOR"] > 0.8
    assert avg["Bleu_4"] > 0.8
    assert avg["Precision"] == 1.0 and avg["Recall"] == 1.0
    # degraded predictions score lower
    submission["results"]["v_1"][0]["sentence"] = "Something unrelated entirely"
    m2 = calculate_metrics([str(gt_path)], submission, [0.5], 100)
    assert m2["Average across tIoUs"]["METEOR"] < avg["METEOR"]
