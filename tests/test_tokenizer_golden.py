"""Golden tokenizer/vocab parity suite (SURVEY §7 hard-part (a)).

spaCy/torchtext are not installable in this environment, so per-case
expected outputs below are pinned from the spaCy 2.x English rule set
(spacy/lang/en/tokenizer_exceptions.py + punctuation.py): contraction
suffix splits, multi-part exceptions (cannot/gonna/gotta), kept-whole
abbreviations, infix hyphen/slash splits, prefix/suffix punctuation
peeling, numeral handling. The vocab half pins torchtext.vocab.Vocab's
ordering (alphabetical sort, then stable sort by descending frequency,
specials first) on a hand-computed corpus.

ref: captioning_datasets/captioning_dataset.py:20-43 (spaCy tokenizer +
torchtext field/vocab); epoch_loops/captioning_epoch_loops.py:129
(special-token id convention).
"""
import numpy as np
import pytest

from bmhrl_tpu.data.tokenizer import tokenize, tokenize_lower
from bmhrl_tpu.data.vocab import BOS, EOS, PAD, SPECIALS, UNK, Vocab

# (input, expected spaCy-2.x-en token stream) — surface case preserved
GOLDEN = [
    # contractions (exceptions table)
    ("don't stop", ["do", "n't", "stop"]),
    ("Don't", ["Do", "n't"]),
    ("it's the man's dog", ["it", "'s", "the", "man", "'s", "dog"]),
    ("we're they've she'll he'd I'm",
     ["we", "'re", "they", "'ve", "she", "'ll", "he", "'d", "I", "'m"]),
    ("can't won't", ["ca", "n't", "wo", "n't"]),
    # typographic apostrophe
    ("don’t", ["do", "n’t"]),
    # multi-part exceptions
    ("cannot", ["can", "not"]),
    ("gonna gotta", ["gon", "na", "got", "ta"]),
    ("Gonna", ["Gon", "na"]),
    # kept-whole abbreviations
    ("Mr. Smith", ["Mr.", "Smith"]),
    ("Dr. Jones vs. Mrs. Lee", ["Dr.", "Jones", "vs.", "Mrs.", "Lee"]),
    # multi-period abbreviations stay whole
    ("the U.S. team", ["the", "U.S.", "team"]),
    ("e.g. this", ["e.g.", "this"]),
    # hyphen infix: kept as its own token
    ("a well-known high-speed chase",
     ["a", "well", "-", "known", "high", "-", "speed", "chase"]),
    ("state-of-the-art",
     ["state", "-", "of", "-", "the", "-", "art"]),
    # slash infix
    ("audio/video feed", ["audio", "/", "video", "feed"]),
    # sentence punctuation
    ("A man runs.", ["A", "man", "runs", "."]),
    ("wait, stop!", ["wait", ",", "stop", "!"]),
    ("really?!", ["really", "?", "!"]),
    ("wow!!!", ["wow", "!", "!", "!"]),
    # brackets and quotes peel off
    ("(hello)", ["(", "hello", ")"]),
    ('she said "hi."', ["she", "said", '"', "hi", ".", '"']),
    ("[a] {b}", ["[", "a", "]", "{", "b", "}"]),
    # numerals: decimals and thousand separators stay whole
    ("3.5 seconds", ["3.5", "seconds"]),
    ("1,000 people", ["1,000", "people"]),
    # digit-hyphen-digit splits (spaCy math-operator infix)
    ("a 5-10 minute clip", ["a", "5", "-", "10", "minute", "clip"]),
    # ellipsis stays one token
    ("then... nothing", ["then", "...", "nothing"]),
    ("...", ["..."]),
    # colons / semicolons
    ("first: second; third", ["first", ":", "second", ";", "third"]),
    # possessive plural
    ("the dogs' bowls", ["the", "dogs", "'", "bowls"]),
    # empty / whitespace-only
    ("", []),
    ("   ", []),
]


@pytest.mark.parametrize("text,want", GOLDEN, ids=[g[0][:30] for g in GOLDEN])
def test_tokenizer_golden(text, want):
    assert tokenize(text) == want


def test_tokenize_lower_is_tokenize_plus_casefold():
    s = "Mr. Smith DOESN'T run"
    assert tokenize_lower(s) == [t.lower() for t in tokenize(s)]


# ---- vocab ordering: torchtext.vocab.Vocab parity --------------------------

def test_vocab_torchtext_ordering():
    """torchtext sorts counter items alphabetically, then stably by
    descending frequency; specials occupy 0..3 in the reference order."""
    corpus = [
        "a man runs".split(),
        "a man jumps".split(),
        "a dog runs".split(),
        "zebra runs".split(),
    ]
    v = Vocab.build(corpus)
    # freq: a=3, runs=3, man=2, dog=1, jumps=1, zebra=1
    assert v.itos == SPECIALS + ["a", "runs", "man", "dog", "jumps", "zebra"]
    assert (UNK, PAD, BOS, EOS) == (0, 1, 2, 3)
    assert v.stoi["<unk>"] == 0 and v.stoi["</s>"] == 3


def test_vocab_min_freq_and_unk():
    corpus = [["x", "x", "y"]]
    v = Vocab.build(corpus, min_freq=2)
    assert "y" not in v.stoi
    assert v.encode(["x", "y"]) == [v.stoi["x"], UNK]


def test_vocab_specials_in_corpus_not_duplicated():
    v = Vocab.build([["<s>", "word", "</s>"]])
    assert v.itos.count("<s>") == 1 and v.itos.count("</s>") == 1


def test_vocab_on_reference_train_captions():
    """Build the vocab from the reference's real train.csv and check the
    invariants checkpoint interop depends on: specials at 0-3, frequency-
    descending order with alphabetical ties, deterministic rebuild."""
    import csv
    import os

    meta = "/root/reference/data/train.csv"
    if not os.path.exists(meta):
        pytest.skip("reference train.csv unavailable")
    from bmhrl_tpu.data.vocab import build_vocab_from_tsv

    v = build_vocab_from_tsv(meta)
    assert v.itos[:4] == SPECIALS
    # frequency non-increasing beyond the specials
    from collections import Counter

    counts = Counter()
    for toks in v.token_lists:
        counts.update(toks)
    freqs = [counts[w] for w in v.itos[4:]]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))
    # alphabetical within equal-frequency runs
    i = 0
    while i < len(freqs):
        j = i
        while j + 1 < len(freqs) and freqs[j + 1] == freqs[i]:
            j += 1
        run = v.itos[4 + i:4 + j + 1]
        assert run == sorted(run), f"tie run not alphabetical at freq {freqs[i]}"
        i = j + 1
    # deterministic
    v2 = build_vocab_from_tsv(meta)
    assert v2.itos == v.itos
    # the most frequent caption words are what you'd expect of ANet
    assert v.itos[4] in {"a", "the", ".", ","}
