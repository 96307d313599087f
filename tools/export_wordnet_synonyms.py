#!/usr/bin/env python
"""Export wordnet synonym groups to a table file for the native METEOR
aligner (VERDICT r2 item 3: wordnet-present fast path).

With the nltk wordnet corpus installed, RL METEOR scoring needs the
synonym stage (ref: metrics/batched_meteor.py:58-89 scores with
nltk.single_meteor_score, whose third alignment stage is
_enum_wordnetsyn_match). The C++ aligner (native/meteor_align.cpp)
consumes the relation as data: for each word, the lemma names without '_'
across wordnet.synsets(word) — exactly the hypothesis-side set NLTK
builds. This script materializes that mapping once, offline (like the
GloVe download), so training environments never pay the per-prefix nltk
alignment loop.

Format: one ``stem<TAB>lemma lemma ...`` line per word, UTF-8
(bmhrl_tpu.native.load_synonym_table parses it back). Rows are keyed by
the PORTER STEM of each input word and the synsets are queried on that
stem — NLTK's stem stage hands STEMMED leftovers to the synonym stage, so
at scoring time the aligner looks up synonyms of stems, and the wordnet
query (incl. its morphy fallback) must happen on the stem at export time
to reproduce it. Lemma names are kept RAW (no case folding) — NLTK
compares the stemmed reference surface against raw lemma names, so
folding them would create matches NLTK doesn't make.

Usage:
  python tools/export_wordnet_synonyms.py out.tsv            # all lemmas
  python tools/export_wordnet_synonyms.py out.tsv --vocab v  # one word/line

Then: MeteorNative(syn_lookup=load_synonym_table("out.tsv")) — or just
install wordnet and let train/rewards.MeteorReward query it live (the
table file is for environments that strip nltk_data from workers).
"""
import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output table path (.tsv)")
    ap.add_argument("--vocab", default=None,
                    help="optional file with one word per line; default: "
                         "every wordnet lemma name")
    args = ap.parse_args()

    try:
        from nltk.corpus import wordnet

        wordnet.synsets("dog")
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"wordnet corpus unavailable ({e}); run "
              "nltk.download('wordnet') first", file=sys.stderr)
        return 1

    from nltk.stem.porter import PorterStemmer

    if args.vocab:
        with open(args.vocab, encoding="utf-8") as f:
            words = [ln.strip() for ln in f if ln.strip()]
    else:
        # '_'-joined collocations can never match a single token; skip them
        words = sorted(w for w in wordnet.all_lemma_names() if "_" not in w)

    stem = PorterStemmer().stem
    stems = sorted({stem(w.lower()) for w in words})
    n = 0
    with open(args.out, "w", encoding="utf-8") as f:
        for s in stems:
            lemmas = sorted({
                lemma.name()
                for ss in wordnet.synsets(s)
                for lemma in ss.lemmas()
                if "_" not in lemma.name()
            } - {s})
            if lemmas:
                f.write(f"{s}\t{' '.join(lemmas)}\n")
                n += 1
    print(f"wrote {n} synonym rows to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
