"""Wordnet-synonym stage parity: the native C++ aligner and the Python
scorers must reproduce nltk.translate.meteor_score EXACTLY when a wordnet
is present.

The environment has no wordnet corpus, so these tests inject a mini
wordnet FIXTURE that implements the exact API surface nltk's meteor_score
consumes (`wordnet.synsets(w)` -> synsets with `.lemmas()` -> lemmas with
`.name()`). The comparison target is the REAL nltk scoring code driven by
that fixture — so the tests certify the alignment algebra (scan order,
chunk counting, the asymmetric hyp-side synonym relation), not a
reimplementation of it. Ref: metrics/batched_meteor.py:58-89 (the RL
reward the published METEOR 10.80 was trained with), nltk
_enum_wordnetsyn_match.
"""
import numpy as np
import pytest

from bmhrl_tpu import native


class _Lemma:
    def __init__(self, name):
        self._n = name

    def name(self):
        return self._n


class _Synset:
    def __init__(self, names):
        self._l = [_Lemma(n) for n in names]

    def lemmas(self):
        return self._l


class FakeWordnet:
    """Synset groups chosen to exercise: multi-word groups, '_' lemmas
    (must be skipped), case-sensitive lemma names, a word in two synsets,
    and words that repeat in references (scan-order sensitive)."""

    GROUPS = [
        ["run", "sprint", "dash"],
        ["dog", "canine", "Canis_familiaris"],
        ["fast", "quick", "speedy"],
        ["leap", "jump", "bound"],
        ["bound", "tied"],            # 'bound' in two synsets
        ["happy", "Glad"],            # uppercase lemma: nltk never matches
        ["car", "auto", "motor_car"],
    ]

    def __init__(self):
        self._by_word = {}
        for g in self.GROUPS:
            ss = _Synset(g)
            for w in g:
                if "_" not in w:
                    self._by_word.setdefault(w, []).append(ss)

    def synsets(self, word):
        return self._by_word.get(word, [])


def _syn_lookup(wn):
    def look(word):
        return [
            lemma.name()
            for ss in wn.synsets(word)
            for lemma in ss.lemmas()
            if "_" not in lemma.name() and lemma.name() != word
        ]
    return look


VOCAB = ["run", "sprint", "dash", "dog", "canine", "fast", "quick",
         "speedy", "leap", "jump", "bound", "tied", "happy", "glad",
         "car", "auto", "the", "a", "man", "runs", "Glad"]


@pytest.fixture(scope="module")
def nat_syn():
    if not native.available():
        pytest.skip("no C++ toolchain / build failed")
    return native.MeteorNative(syn_lookup=_syn_lookup(FakeWordnet()))


def _nltk_prefix_scores(hyp, ref, wn):
    from nltk.stem.porter import PorterStemmer
    from nltk.translate.meteor_score import single_meteor_score

    st = PorterStemmer()
    return [single_meteor_score(ref, hyp[: l + 1], stemmer=st, wordnet=wn)
            for l in range(len(hyp))]


def test_native_synonym_stage_vs_real_nltk(nat_syn):
    wn = FakeWordnet()
    cases = [
        # pure synonym matches
        (["sprint", "canine"], ["run", "dog"]),
        # synonym + repeated ref word: chunk count depends on which ref
        # position the synonym takes (nltk: highest available)
        (["dash", "run", "fast"], ["run", "quick", "run"]),
        # exact beats synonym; leftover takes synonym
        (["run", "sprint"], ["run", "run"]),
        # case sensitivity: 'happy'->'Glad' never matches lowercased 'glad'
        (["happy"], ["glad"]),
        # multi-synset word
        (["bound", "leap"], ["tied", "jump"]),
        # mixed exact/stem/synonym
        (["the", "dog", "runs", "fast"], ["the", "canine", "run", "quick"]),
    ]
    out = nat_syn.prefix_rewards([h for h, _ in cases],
                                 [r for _, r in cases])
    for b, (h, r) in enumerate(cases):
        want = _nltk_prefix_scores(h, r, wn)
        np.testing.assert_allclose(
            out[b, : len(h)], want, rtol=1e-5, atol=1e-6,
            err_msg=f"case {b}: hyp={h} ref={r}")


def test_native_synonym_fuzz_vs_real_nltk(nat_syn):
    """Randomized pairs over a synonym-dense vocab with repeats — any
    scan-order or chunk-count divergence from nltk shows up here."""
    wn = FakeWordnet()
    rng = np.random.RandomState(0)
    hyps, refs = [], []
    for _ in range(40):
        hl = rng.randint(1, 12)
        rl = rng.randint(1, 10)
        hyps.append([VOCAB[i] for i in rng.randint(0, len(VOCAB), hl)])
        refs.append([VOCAB[i] for i in rng.randint(0, len(VOCAB), rl)])
    out = nat_syn.prefix_rewards(hyps, refs)
    for b in range(len(hyps)):
        want = _nltk_prefix_scores(hyps[b], refs[b], wn)
        np.testing.assert_allclose(
            out[b, : len(hyps[b])], want, rtol=1e-5, atol=1e-6,
            err_msg=f"fuzz case {b}: hyp={hyps[b]} ref={refs[b]}")


def test_exact_stem_path_fuzz_vs_real_nltk():
    """The no-wordnet aligner (what this environment's RL scoring runs)
    against real nltk with an empty wordnet — including repeated words."""
    if not native.available():
        pytest.skip("native unavailable")
    nat = native.MeteorNative()

    class _Empty:
        def synsets(self, w):
            return []

    rng = np.random.RandomState(1)
    words = ["the", "a", "man", "men", "run", "runs", "running", "dog",
             "dogs", "sat", "sit", "mat", "cat", "fast", "faster"]
    hyps, refs = [], []
    for _ in range(40):
        hyps.append([words[i] for i in rng.randint(0, len(words),
                                                   rng.randint(1, 12))])
        refs.append([words[i] for i in rng.randint(0, len(words),
                                                   rng.randint(1, 10))])
    out = nat.prefix_rewards(hyps, refs)
    for b in range(len(hyps)):
        want = _nltk_prefix_scores(hyps[b], refs[b], _Empty())
        np.testing.assert_allclose(
            out[b, : len(hyps[b])], want, rtol=1e-5, atol=1e-6,
            err_msg=f"fuzz case {b}: hyp={hyps[b]} ref={refs[b]}")


def test_eval_scorer_align_vs_real_nltk():
    """eval.meteor.MeteorScorer (nltk preset) with the fixture wordnet
    injected must score sentences exactly like nltk."""
    from bmhrl_tpu.eval.meteor import MeteorScorer

    wn = FakeWordnet()
    sc = MeteorScorer("nltk")
    sc.wordnet = wn
    rng = np.random.RandomState(2)
    for _ in range(30):
        h = [VOCAB[i] for i in rng.randint(0, len(VOCAB), rng.randint(1, 12))]
        r = [VOCAB[i] for i in rng.randint(0, len(VOCAB), rng.randint(1, 10))]
        got = sc._single([w.lower() for w in h], [w.lower() for w in r])
        want = _nltk_prefix_scores(h, r, wn)[-1]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"hyp={h} ref={r}")


def test_reward_scorer_uses_native_with_wordnet(monkeypatch):
    """MeteorReward with a (fixture) wordnet present must take the native
    path and agree with its own nltk fallback."""
    if not native.available():
        pytest.skip("native unavailable")
    from bmhrl_tpu.train import rewards as R

    monkeypatch.setattr(R, "_get_wordnet", lambda: FakeWordnet())
    itos = ["<unk>", "<blank>", "<s>", "</s>", "sprint", "canine", "the",
            "dog", "run", "fast", "quick"]
    sc = R.MeteorReward(itos, 0.0, 0.0)
    assert sc.native is not None
    assert sc.native._syn_lookup is not None
    pred = np.array([[4, 5, 9], [6, 7, 8]], np.int64)
    trgs = ["run dog", "the canine runs"]
    got = sc.raw_rewards(pred, trgs)
    sc2 = R.MeteorReward(itos, 0.0, 0.0)
    sc2.native = None
    want = sc2.raw_rewards(pred, trgs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got[0, -1] > 0.0  # synonym matches actually fired


def test_load_synonym_table(tmp_path):
    # rows are keyed by Porter stems (see tools/export_wordnet_synonyms.py)
    p = tmp_path / "syn.tsv"
    p.write_text("sprint\trun dash\nhappi\tGlad\nlone\t\n", encoding="utf-8")
    table = native.load_synonym_table(str(p))
    assert table["sprint"] == ["run", "dash"]
    assert table["happi"] == ["Glad"]
    assert table["lone"] == []
    if native.available():
        nat = native.MeteorNative(syn_lookup=table)
        # hyp 'sprint' (stem 'sprint') -> lemma 'run' == stem('run')
        out = nat.prefix_rewards([["sprint"]], [["run"]])
        assert out[0, 0] > 0.0
