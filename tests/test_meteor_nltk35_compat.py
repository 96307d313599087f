"""NLTK 3.5 <-> 3.10 METEOR semantics audit (VERDICT r3 item 6).

The reference pins nltk==3.5 (ref: req.txt:41) and calls
``single_meteor_score(trg_str, " ".join(hyp_tokens))`` with RAW STRINGS
(ref: metrics/batched_meteor.py:76); this repo's RL reward scorer and its
C++ aligner are fuzz-validated against the INSTALLED nltk 3.10
(tests/test_meteor_synonyms.py), which requires pre-tokenized lists
(the 3.6.6 API change, nltk issue #2655: ``_generate_enums`` raises
TypeError on strings instead of splitting them).

The 3.5 source is not obtainable in this environment (no egress), so the
audit is empirical rather than a literal source diff, in three layers:

1. ENTRY EQUIVALENCE. nltk 3.5's string entry computed
   ``preprocess(s).split()`` with ``preprocess=str.lower``; 3.10 computes
   ``map(preprocess, tokens)`` on a caller-split list. These commute —
   ``s.lower().split() == [w.lower() for w in s.split()]`` for every
   string, because Unicode lowercasing never maps non-whitespace to
   whitespace (property-tested below, incl. the 1->n expansions).

2. DATA-PATH GUARD. 3.5 additionally re-split the JOINED hypothesis
   (``" ".join(tokens).split()``), which differs from the token list iff a
   vocab token is empty or contains whitespace. The guard asserts the real
   vocabulary construction (spaCy-2.x-golden ``tokenize_lower``) can never
   produce such tokens, so join-then-split is the identity on every real
   hypothesis.

3. DEFINITIONAL FIXTURES. Hand-computed Banerjee-Lavie (2005) scores
   (P=m/|h|, R=m/|r|, fmean=PR/(alphaP+(1-alpha)R), frag=chunks/m,
   penalty=gamma*frag^beta, score=fmean*(1-penalty); alpha=.9, beta=3,
   gamma=.5 — the constants both 3.5 and 3.10 document) pinned against the
   installed nltk AND the native C++ aligner. Any nltk release that changed
   the score function itself would fail these version-independent values.

Conclusion (recorded in PARITY.md): on the API surface the reference
exercises — default preprocess/stemmer/wordnet, single reference —
3.5 -> 3.10 changed the entry signature only; no behavioral difference
reaches this repo's scorers.
"""
import numpy as np
import pytest

from bmhrl_tpu import native
from bmhrl_tpu.data.tokenizer import tokenize_lower


# --- 1. entry equivalence: lower-then-split == split-then-lower ------------

ADVERSARIAL_STRINGS = [
    "The CAT sat",
    "  leading and   multiple   spaces\tand\ttabs\nnewlines ",
    "MiXeD CaSe WoRdS",
    "İstanbul DİYARBAKIR",        # dotted capital I: 1->2 codepoint lower
    "STRASSE ẞ",                  # capital sharp s
    "ΣΙΓΜΑ ΤΕΛΟΣ",               # Greek final-sigma context
    "ǅungla Ǉubav",              # titlecase digraphs
    "ab cd  ef",        # NBSP / EM SPACE: non-ASCII split points
    "",
    "   ",
]


@pytest.mark.parametrize("s", ADVERSARIAL_STRINGS)
def test_lower_split_commutes(s):
    """nltk 3.5 string entry (lower the string, then split) produces the
    identical token sequence as 3.10's per-token preprocess on s.split()."""
    assert s.lower().split() == [w.lower() for w in s.split()]


def test_no_codepoint_lowercases_to_whitespace():
    """The property behind test_lower_split_commutes, checked exhaustively
    over the BMP: str.lower of a non-whitespace char never contains
    whitespace (so lowercasing cannot create or destroy split points)."""
    for cp in range(0x10000):
        ch = chr(cp)
        if ch.isspace():
            assert ch.lower() == ch  # whitespace is lower-invariant
        else:
            assert not any(c.isspace() for c in ch.lower()), hex(cp)


# --- 2. data-path guard: join-then-split is the identity on real tokens ----

def test_vocab_tokens_are_join_split_stable():
    """3.5 re-split the joined hypothesis string; equivalence with the 3.10
    token-list call needs every vocab token non-empty and whitespace-free.
    The real tokenizer guarantees it: spaCy-2.x semantics drop whitespace
    tokens and lowercase the rest (data/tokenizer.py)."""
    caps = [
        "A man is  seen running\tdown a track",
        "People are dancing; music plays!",
        "The   dog barks\nloudly",
        "don't stop—keep going (fast)",
    ]
    for cap in caps:
        toks = tokenize_lower(cap)
        assert toks, cap
        for t in toks:
            assert t and not any(c.isspace() for c in t), (cap, t)
        # the 3.5 round-trip is the identity on these tokens
        assert " ".join(toks).lower().split() == [t.lower() for t in toks]


# --- 3. definitional fixtures (version-independent golden values) ----------

# (hyp, ref, hand-computed Banerjee-Lavie score with exact matching only)
DEFINITIONAL = [
    # perfect match: m=3, P=R=1, fmean=1, chunks=1, frag=1/3,
    # penalty=.5*(1/3)^3, score=1-.5/27
    (["the", "cat", "sat"], ["the", "cat", "sat"], 1.0 - 0.5 / 27.0),
    # prefix: m=2, P=1, R=.5, fmean=.5/.95, chunks=1, frag=.5,
    # penalty=.5*.125
    (["the", "cat"], ["the", "cat", "sat", "mat"],
     (0.5 / 0.95) * (1.0 - 0.0625)),
    # full swap: m=2, P=R=1, fmean=1, chunks=2, frag=1, penalty=.5
    (["cat", "the"], ["the", "cat"], 0.5),
    # no overlap
    (["dog"], ["cat"], 0.0),
    # repeated hyp word, single ref slot: m=1 of |h|=2, P=.5, R=1,
    # fmean=.5/(.45+.1), chunks=1, frag=1, penalty=.5
    (["run", "run"], ["run"], (0.5 / 0.55) * 0.5),
]


class _EmptyWordnet:
    def synsets(self, w):
        return []


def _identity_stemmer():
    class _S:
        def stem(self, w):
            return w

    return _S()


@pytest.mark.parametrize("hyp,ref,want", DEFINITIONAL)
def test_installed_nltk_matches_definition(hyp, ref, want):
    from nltk.translate.meteor_score import single_meteor_score

    got = single_meteor_score(ref, hyp, stemmer=_identity_stemmer(),
                              wordnet=_EmptyWordnet())
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_native_aligner_matches_definition():
    if not native.available():
        pytest.skip("no C++ toolchain / build failed")
    nat = native.MeteorNative()
    hyps = [h for h, _, _ in DEFINITIONAL]
    refs = [r for _, r, _ in DEFINITIONAL]
    out = nat.prefix_rewards(hyps, refs)
    for b, (h, r, want) in enumerate(DEFINITIONAL):
        # the identity-stemmer fixtures use words the Porter stemmer maps
        # to themselves, so the native (stemmed) score equals the
        # definitional exact-match score
        np.testing.assert_allclose(out[b, len(h) - 1], want, rtol=1e-6,
                                   atol=1e-9, err_msg=f"{h} vs {r}")


# --- the reference's exact calling convention, end to end -------------------

def test_reference_string_entry_equals_token_entry():
    """Reproduce ref batched_meteor.py:76 exactly — a 3.5-style string call
    simulated as lower+split — and assert it equals the token-list call the
    repo's scorer makes (same nltk, same defaults)."""
    from nltk.translate.meteor_score import single_meteor_score

    trg = "The Cat SAT on   the mat"
    hypo = ["the", "CAT", "sat", "mat"]
    for l in range(len(hypo)):
        partial = " ".join(hypo[: l + 1])
        # 3.5 entry: preprocess(s).split() on both sides
        a = single_meteor_score(trg.lower().split(), partial.lower().split())
        # 3.10 entry on caller-split tokens (what rewards.MeteorReward does)
        b = single_meteor_score(trg.split(), partial.split())
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
