// Native METEOR prefix-reward kernel.
//
// Replaces the host-side per-prefix METEOR scoring loop — the hottest host
// work in RL epochs (the reference spends O(B*L^2) Python + NLTK per step,
// ref: metrics/batched_meteor.py:63-89). The Java meteor-1.5.jar the
// reference's evaluator shells out to (SURVEY §2.9) is likewise replaced by
// this + the Python aligner.
//
// Word identity is pre-interned on the Python side: lowercased surface
// forms and stems map to shared int ids (stems come from NLTK's Porter
// stemmer, so parity with the Python scorer is exact by construction).
// This kernel runs the greedy three-stage alignment (exact, stem, wordnet
// synonym), chunk counting, harmonic-F and fragmentation penalty for EVERY
// prefix of every hypothesis.
//
// Matching order parity: NLTK's _match_enums / _enum_wordnetsyn_match scan
// hypothesis words LAST-to-FIRST and give each the HIGHEST still-available
// reference position (nltk/translate/meteor_score.py). The pairing affects
// the chunk count whenever the reference repeats a word, so this kernel
// scans in exactly that order.
//
// The synonym stage consumes a CSR table mapping every interned word id to
// the sorted ids of its wordnet synonym lemmas (built Python-side from
// nltk wordnet when present, or from an exported table file). A hypothesis
// word h matches a free reference word r when r's id is in syn[h] — the
// same asymmetric relation NLTK uses (ref surface in hyp synonym set).
//
// C ABI (ctypes):
//   meteor_prefix_rewards_syn(hyp_ids, hyp_stems, B, L,
//                             ref_ids, ref_stems, ref_offsets /*B+1*/,
//                             syn_ids, syn_offsets /*n_words+1*/, n_words,
//                             alpha, beta, gamma, out /*B*L*/)
//   meteor_prefix_rewards(...)  — legacy exact+stem entry (empty table)
// id -1 marks "no word" (padding).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Scratch {
  std::vector<char> h_free, r_free;
  std::vector<int> m_h, m_r;
};

inline bool in_syns(const int32_t* syn_ids, const int32_t* syn_offsets,
                    int32_t n_words, int32_t h, int32_t r) {
  if (h < 0 || h >= n_words) return false;
  const int32_t* lo = syn_ids + syn_offsets[h];
  const int32_t* hi = syn_ids + syn_offsets[h + 1];
  return std::binary_search(lo, hi, r);
}

float single_meteor(const int32_t* hyp, const int32_t* hyp_st, int hl,
                    const int32_t* ref, const int32_t* ref_st, int rl,
                    const int32_t* syn_ids, const int32_t* syn_offsets,
                    int32_t n_words, float alpha, float beta, float gamma,
                    Scratch& s) {
  if (hl == 0 || rl == 0) return 0.0f;
  s.h_free.assign(hl, 1);
  s.r_free.assign(rl, 1);
  s.m_h.clear();
  s.m_r.clear();
  // stage 0: exact — hyp last-to-first, highest free ref position
  for (int i = hl - 1; i >= 0; --i) {
    for (int j = rl - 1; j >= 0; --j) {
      if (s.r_free[j] && hyp[i] == ref[j]) {
        s.m_h.push_back(i);
        s.m_r.push_back(j);
        s.h_free[i] = 0;
        s.r_free[j] = 0;
        break;
      }
    }
  }
  // stage 1: stem — same scan order on the leftovers
  for (int i = hl - 1; i >= 0; --i) {
    if (!s.h_free[i]) continue;
    for (int j = rl - 1; j >= 0; --j) {
      if (s.r_free[j] && hyp_st[i] == ref_st[j]) {
        s.m_h.push_back(i);
        s.m_r.push_back(j);
        s.h_free[i] = 0;
        s.r_free[j] = 0;
        break;
      }
    }
  }
  // stage 2: wordnet synonym on the STEM ids — NLTK's _enum_stem_match
  // returns the STEMMED leftover enums, so _enum_wordnetsyn_match looks up
  // synsets of the stemmed hypothesis word and compares lemma names against
  // stemmed reference surfaces. The CSR table is therefore keyed by stem id
  // with stem-space values (built Python-side). Self-id need not be in the
  // table: stem-equal pairs are exhausted by stage 1. Scanning j high-to-low
  // over free refs gives the highest available position among all synonyms,
  // matching NLTK's best_j rule.
  if (n_words > 0) {
    for (int i = hl - 1; i >= 0; --i) {
      if (!s.h_free[i]) continue;
      for (int j = rl - 1; j >= 0; --j) {
        if (s.r_free[j] &&
            in_syns(syn_ids, syn_offsets, n_words, hyp_st[i], ref_st[j])) {
          s.m_h.push_back(i);
          s.m_r.push_back(j);
          s.h_free[i] = 0;
          s.r_free[j] = 0;
          break;
        }
      }
    }
  }
  int m = (int)s.m_h.size();
  if (m == 0) return 0.0f;
  // sort matches by hyp index (insertion sort; m is tiny)
  for (int a = 1; a < m; ++a) {
    int hi = s.m_h[a], ri = s.m_r[a];
    int b = a - 1;
    while (b >= 0 && s.m_h[b] > hi) {
      s.m_h[b + 1] = s.m_h[b];
      s.m_r[b + 1] = s.m_r[b];
      --b;
    }
    s.m_h[b + 1] = hi;
    s.m_r[b + 1] = ri;
  }
  int chunks = 1;
  for (int a = 1; a < m; ++a) {
    if (!(s.m_h[a] == s.m_h[a - 1] + 1 && s.m_r[a] == s.m_r[a - 1] + 1))
      ++chunks;
  }
  float P = (float)m / hl;
  float R = (float)m / rl;
  float fmean = P * R / (alpha * P + (1.0f - alpha) * R);
  float frag = (float)chunks / m;
  float penalty = gamma * std::pow(frag, beta);
  return (1.0f - penalty) * fmean;
}

}  // namespace

extern "C" {

void meteor_prefix_rewards_syn(
    const int32_t* hyp_ids, const int32_t* hyp_stems, int32_t B, int32_t L,
    const int32_t* ref_ids, const int32_t* ref_stems,
    const int32_t* ref_offsets, const int32_t* syn_ids,
    const int32_t* syn_offsets, int32_t n_words, float alpha, float beta,
    float gamma, float* out) {
  Scratch s;
  s.h_free.reserve(L);
  s.m_h.reserve(L);
  s.m_r.reserve(L);
  for (int b = 0; b < B; ++b) {
    const int32_t* ref = ref_ids + ref_offsets[b];
    const int32_t* ref_st = ref_stems + ref_offsets[b];
    int rl = ref_offsets[b + 1] - ref_offsets[b];
    s.r_free.reserve(rl);
    const int32_t* hyp = hyp_ids + (size_t)b * L;
    const int32_t* hyp_st = hyp_stems + (size_t)b * L;
    for (int l = 0; l < L; ++l) {
      out[(size_t)b * L + l] =
          single_meteor(hyp, hyp_st, l + 1, ref, ref_st, rl, syn_ids,
                        syn_offsets, n_words, alpha, beta, gamma, s);
    }
  }
}

void meteor_prefix_rewards(const int32_t* hyp_ids, const int32_t* hyp_stems,
                           int32_t B, int32_t L, const int32_t* ref_ids,
                           const int32_t* ref_stems,
                           const int32_t* ref_offsets, float alpha, float beta,
                           float gamma, float* out) {
  meteor_prefix_rewards_syn(hyp_ids, hyp_stems, B, L, ref_ids, ref_stems,
                            ref_offsets, nullptr, nullptr, 0, alpha, beta,
                            gamma, out);
}

}  // extern "C"
