"""METEOR 1.5 golden fixtures (VERDICT r2 item 5).

The meteor15 preset is the parity surface for the Java ``meteor-1.5.jar``
the reference evaluator shells out to (ref: evaluation/evaluate.py:17-21 —
the metric that defines the published 10.80). The jar itself is absent
(external data, like its paraphrase-en.gz), so these goldens pin the
DOCUMENTED English parameterization (Denkowski & Lavie 2014, "Meteor
Universal", eqs. 1-5):

  P = sum_m w_stage(m) * w_delta(word) over matched hyp words / weighted |h|
  R = likewise over ref / weighted |r|
  Fmean = P*R / (alpha*P + (1-alpha)*R)
  Pen = gamma * (chunks / avg(m_h, m_r)) ** beta
  score = (1 - Pen) * Fmean

with English defaults alpha=.85, beta=.2, gamma=.6, delta=.75 (content
weight; function words get 1-delta), stage weights exact=1.0, stem=0.6,
synonym=0.8, paraphrase=0.6. Every expected value below is hand-derived
from those formulas with the full arithmetic in the comment — any
regression in stage weighting, function-word discounting, fragmentation,
or the penalty exponent moves these numbers.

The last test drives a paraphrase-table fixture through the evaluator
end-to-end (ANetEvaluator -> Meteor(meteor15, table)).
"""
import numpy as np
import pytest

from bmhrl_tpu.eval.meteor import FUNCTION_WORDS, Meteor, MeteorScorer


@pytest.fixture(scope="module")
def m15():
    return MeteorScorer("meteor15")


def _pen(chunks, m, beta=0.2, gamma=0.6):
    return gamma * (chunks / m) ** beta


def test_identity_content_words(m15):
    # hyp == ref, 4 content words, all exact (stage w=1.0, word w=.75):
    # P = R = 1, Fmean = 1; chunks=1, m=4 -> Pen = .6*(1/4)^.2 = 0.454743
    # score = 1 - Pen = 0.545285
    words = ["children", "playing", "soccer", "outside"]
    assert not any(w in FUNCTION_WORDS for w in words)
    got = m15._single(words, words)
    want = 1.0 - _pen(1, 4)
    assert abs(want - 0.5452850) < 1e-6
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_fragmentation_reordering(m15):
    # All 4 words exact-matched but reordered: alignment (0->2)(1->3)(2->1)
    # (3->0) -> sorted by hyp: chunk breaks after (1->3) and (2->1) ->
    # chunks=3, m=4. P = R = 1 (every word matched at stage weight 1).
    # Pen = .6*(3/4)^.2 = .6*0.944087 = 0.566452; score = 0.433548
    hyp = ["the", "dog", "runs", "fast"]
    ref = ["fast", "runs", "the", "dog"]
    got = m15._single(hyp, ref)
    want = 1.0 - _pen(3, 4)
    assert abs(want - 0.4335478) < 1e-6
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_stem_stage_weight(m15):
    # hyp=[dogs, run] ref=[dog, running]: no exact matches; both pairs
    # stem-match (dog/run) at stage weight 0.6. All content words:
    # p_num = 2 * .6 * .75 = .9 over weighted len 1.5 -> P = R = 0.6
    # Fmean = .36/(.85*.6+.15*.6) = 0.6; chunks=1, m=2,
    # Pen = .6*(1/2)^.2 = .6*0.870551 = 0.522330
    # score = 0.6 * 0.477670 = 0.286602
    got = m15._single(["dogs", "run"], ["dog", "running"])
    want = 0.6 * (1.0 - _pen(1, 2))
    assert abs(want - 0.2866021) < 1e-6
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_precision_recall_function_words(m15):
    # hyp=[a, man, sings] fully inside ref=[a, man, sings, loudly, tonight].
    # 'a' is a function word (w=.25), the rest content (w=.75).
    # p_num = .25+.75+.75 = 1.75 over hyp weighted len 1.75 -> P = 1
    # r_num = 1.75 over ref weighted len .25+4*.75 = 3.25 -> R = 0.538462
    # Fmean = P*R/(.85P+.15R) = .538462/.930769 = 0.578512
    # chunks=1, m_h=m_r=3 -> Pen = .6*(1/3)^.2 = 0.481645
    # score = 0.578512 * 0.518355 = 0.299875
    got = m15._single(["a", "man", "sings"],
                      ["a", "man", "sings", "loudly", "tonight"])
    P, R = 1.0, 1.75 / 3.25
    want = (P * R / (0.85 * P + 0.15 * R)) * (1.0 - _pen(1, 3))
    assert abs(want - 0.2998748) < 1e-6
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_synonym_stage_weight():
    # meteor15 synonym matching runs on SURFACE forms (the jar's synonym
    # module), unlike the nltk preset's stem-space quirk. One synonym
    # match at stage weight 0.8 on content words:
    # P = R = .8*.75/.75 = 0.8; Fmean = .64/.8 = 0.8
    # chunks=1, m=1 -> Pen = .6*1^.2 = .6; score = .8*.4 = 0.32
    from tests.test_meteor_synonyms import FakeWordnet

    sc = MeteorScorer("meteor15")
    sc.wordnet = FakeWordnet()
    got = sc._single(["sprint"], ["run"])
    np.testing.assert_allclose(got, 0.32, rtol=1e-9)


def test_paraphrase_stage_and_avg_match_count(tmp_path):
    # Table: "attacked" <-> "beat up". hyp=[police, attacked, protesters]
    # ref=[police, beat, up, protesters]: police/protesters exact, the
    # phrase pair matches at stage weight 0.6 with span lengths 1 vs 2.
    # p_num = .75 + .6*.75 + .75 = 1.95 over 2.25 -> P = 0.866667
    # r_num = .75 + .6*.75 + .6*.25('up' is function) + .75 = 2.10
    #         over 2.50 -> R = 0.84
    # Fmean = (.866667*.84)/(.85*.866667+.15*.84) = .728/.862667 = 0.843895
    # all three spans contiguous in hyp AND ref -> chunks=1;
    # m_h=3, m_r=4 -> avg 3.5; Pen = .6*(1/3.5)^.2 = 0.466976
    # score = 0.843895 * 0.533022 = 0.449777
    table = tmp_path / "para.txt"
    table.write_text("attacked\tbeat up\n", encoding="utf-8")
    sc = MeteorScorer("meteor15", paraphrase_path=str(table))
    got = sc._single(["police", "attacked", "protesters"],
                     ["police", "beat", "up", "protesters"])
    P, R = 1.95 / 2.25, 2.10 / 2.50
    want = (P * R / (0.85 * P + 0.15 * R)) * (1.0 - _pen(1, 3.5))
    assert abs(want - 0.4497771) < 1e-6
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_paraphrase_table_through_evaluator(tmp_path):
    """End-to-end: the table fixture changes the evaluator's METEOR —
    the paraphrase stage is live through the Meteor wrapper (the object
    eval/anet_eval.py instantiates for the meteor15 preset)."""
    table = tmp_path / "para.txt"
    table.write_text("attacked\tbeat up\nkids\tyoung children\n",
                     encoding="utf-8")
    gts = {
        "v1": ["police beat up protesters near the square"],
        "v2": ["young children playing soccer outside"],
    }
    res = {"v1": ["police attacked protesters near the square"],
           "v2": ["kids playing soccer outside"]}
    base, _ = Meteor("meteor15").compute_score(gts, res)
    with_table, _ = Meteor("meteor15",
                           paraphrase_path=str(table)).compute_score(gts, res)
    assert with_table > base + 0.05, (base, with_table)
    # and the no-table score is itself pinned: each pair aligns every
    # remaining word exactly; the derivation follows the fixtures above
    assert 0.0 < base < with_table <= 1.0


def test_meteor15_penalty_exponent_sanity(m15):
    # beta=0.2 makes the penalty ratio-sensitive but shallow: doubling the
    # chunk ratio from 1/4 to 1/2 raises Pen by (2)^0.2 = 1.148698x
    p1, p2 = _pen(1, 4), _pen(1, 2)
    np.testing.assert_allclose(p2 / p1, 2 ** 0.2, rtol=1e-12)
    np.testing.assert_allclose(
        m15._single(["x1", "x2", "x3", "x4"], ["x1", "x2", "x3", "x4"]),
        1 - p1, rtol=1e-9)
    # fully fragmented single match: Pen = gamma exactly
    np.testing.assert_allclose(_pen(1, 1), 0.6, rtol=1e-12)


def test_nltk_preset_unchanged_by_table(tmp_path):
    """The nltk preset (RL-reward parity target) must ignore a configured
    paraphrase table — the table belongs to the meteor15 parameterization."""
    table = tmp_path / "para.txt"
    table.write_text("attacked\tbeat up\n", encoding="utf-8")
    sc = MeteorScorer("nltk", paraphrase_path=str(table))
    assert sc.paraphrases is None
    hyp = ["police", "attacked", "protesters"]
    ref = ["police", "beat", "up", "protesters"]
    want = MeteorScorer("nltk")._single(hyp, ref)
    np.testing.assert_allclose(sc._single(hyp, ref), want, rtol=1e-12)
