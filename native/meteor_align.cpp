// Native METEOR prefix-reward kernel.
//
// Replaces the host-side per-prefix METEOR scoring loop — the hottest host
// work in RL epochs (the reference spends O(B*L^2) Python + NLTK per step,
// ref: metrics/batched_meteor.py:63-89). The Java meteor-1.5.jar the
// reference's evaluator shells out to (SURVEY §2.9) is likewise replaced by
// this + the Python aligner.
//
// Word identity is pre-interned on the Python side: surface forms and stems
// map to shared int ids (stems come from NLTK's Porter stemmer, so parity
// with the Python scorer is exact by construction). This kernel runs the
// greedy two-stage alignment (exact, then stem), chunk counting, harmonic-F
// and fragmentation penalty for EVERY prefix of every hypothesis.
//
// C ABI (ctypes):
//   meteor_prefix_rewards(hyp_ids, hyp_stems, B, L,
//                         ref_ids, ref_stems, ref_offsets /*B+1*/,
//                         alpha, beta, gamma, out /*B*L*/)
// id -1 marks "no word" (padding).

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

static float single_meteor(const int32_t* hyp, const int32_t* hyp_st, int hl,
                           const int32_t* ref, const int32_t* ref_st, int rl,
                           float alpha, float beta, float gamma,
                           std::vector<char>& h_free, std::vector<char>& r_free,
                           std::vector<int>& m_h, std::vector<int>& m_r) {
  if (hl == 0 || rl == 0) return 0.0f;
  h_free.assign(hl, 1);
  r_free.assign(rl, 1);
  m_h.clear();
  m_r.clear();
  // stage 0: exact (greedy, first free ref)
  for (int i = 0; i < hl; ++i) {
    if (!h_free[i]) continue;
    for (int j = 0; j < rl; ++j) {
      if (r_free[j] && hyp[i] == ref[j]) {
        m_h.push_back(i);
        m_r.push_back(j);
        h_free[i] = 0;
        r_free[j] = 0;
        break;
      }
    }
  }
  // stage 1: stem
  for (int i = 0; i < hl; ++i) {
    if (!h_free[i]) continue;
    for (int j = 0; j < rl; ++j) {
      if (r_free[j] && hyp_st[i] == ref_st[j]) {
        m_h.push_back(i);
        m_r.push_back(j);
        h_free[i] = 0;
        r_free[j] = 0;
        break;
      }
    }
  }
  int m = (int)m_h.size();
  if (m == 0) return 0.0f;
  // sort matches by hyp index (insertion sort; m is tiny)
  for (int a = 1; a < m; ++a) {
    int hi = m_h[a], ri = m_r[a];
    int b = a - 1;
    while (b >= 0 && m_h[b] > hi) {
      m_h[b + 1] = m_h[b];
      m_r[b + 1] = m_r[b];
      --b;
    }
    m_h[b + 1] = hi;
    m_r[b + 1] = ri;
  }
  int chunks = 1;
  for (int a = 1; a < m; ++a) {
    if (!(m_h[a] == m_h[a - 1] + 1 && m_r[a] == m_r[a - 1] + 1)) ++chunks;
  }
  float P = (float)m / hl;
  float R = (float)m / rl;
  float fmean = P * R / (alpha * P + (1.0f - alpha) * R);
  float frag = (float)chunks / m;
  float penalty = gamma * std::pow(frag, beta);
  return (1.0f - penalty) * fmean;
}

void meteor_prefix_rewards(const int32_t* hyp_ids, const int32_t* hyp_stems,
                           int32_t B, int32_t L, const int32_t* ref_ids,
                           const int32_t* ref_stems,
                           const int32_t* ref_offsets, float alpha, float beta,
                           float gamma, float* out) {
  std::vector<char> h_free, r_free;
  std::vector<int> m_h, m_r;
  h_free.reserve(L);
  m_h.reserve(L);
  m_r.reserve(L);
  for (int b = 0; b < B; ++b) {
    const int32_t* ref = ref_ids + ref_offsets[b];
    const int32_t* ref_st = ref_stems + ref_offsets[b];
    int rl = ref_offsets[b + 1] - ref_offsets[b];
    r_free.reserve(rl);
    const int32_t* hyp = hyp_ids + (size_t)b * L;
    const int32_t* hyp_st = hyp_stems + (size_t)b * L;
    for (int l = 0; l < L; ++l) {
      out[(size_t)b * L + l] = single_meteor(
          hyp, hyp_st, l + 1, ref, ref_st, rl, alpha, beta, gamma, h_free,
          r_free, m_h, m_r);
    }
  }
}

}  // extern "C"
