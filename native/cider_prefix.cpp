// Native per-prefix CIDEr reward kernel.
//
// Replaces the host-side Python incremental scorer (train/rewards.py
// _PrefixCider) on the RL critical path: the reward must be computed between
// the on-policy rollout and the update, so its latency adds directly to the
// train step. Implements the reference math exactly (ref: metrics/cider.py
// — ref_len=log(1)=0 negative TF-IDF weights, bigram "length" term,
// gaussian length penalty, df from raw corpus n-gram counts with count>1,
// scoring stops at the eos word with a -0.1 first-token special case and
// trailing values padded with the last score).
//
// Word ids are interned uint16 (vocab + per-call OOV extensions, python
// side guards the 65535 limit). N-gram keys pack k ids into a uint64.
//
// C ABI:
//   void* cider_new(const uint16_t* corpus_tokens,
//                   const int64_t* caption_offsets, int32_t n_captions,
//                   int32_t n);
//   void  cider_free(void* h);
//   void  cider_prefix_rewards(void* h, const uint16_t* hyp, int32_t B,
//                              int32_t L, uint16_t eos_id,
//                              const uint16_t* refs,
//                              const int64_t* ref_offsets, float sigma,
//                              float* out /* B*L */);

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

inline uint64_t pack_key(const uint16_t* w, int k) {
  uint64_t key = (uint64_t)k;
  for (int i = 0; i < k; ++i) key = (key << 16) | (uint64_t)(w[i] + 1);
  return key;
}

struct CiderHandle {
  int n;
  std::unordered_map<uint64_t, float> df_log;  // log(count) for count > 1
};

struct RefVec {
  std::unordered_map<uint64_t, float> vec;  // tf * (-df)
  double norm2[4] = {0, 0, 0, 0};
  double len_terms = 0;  // bigram tf total
};

}  // namespace

extern "C" {

void* cider_new(const uint16_t* corpus_tokens, const int64_t* caption_offsets,
                int32_t n_captions, int32_t n) {
  auto* h = new CiderHandle();
  h->n = n;
  std::unordered_map<uint64_t, int64_t> counts;
  for (int32_t c = 0; c < n_captions; ++c) {
    const uint16_t* cap = corpus_tokens + caption_offsets[c];
    int len = (int)(caption_offsets[c + 1] - caption_offsets[c]);
    for (int k = 1; k <= n; ++k)
      for (int i = 0; i + k <= len; ++i) counts[pack_key(cap + i, k)] += 1;
  }
  h->df_log.reserve(counts.size());
  for (auto& kv : counts)
    if (kv.second > 1) h->df_log.emplace(kv.first, std::log((double)kv.second));
  return h;
}

void cider_free(void* hp) { delete (CiderHandle*)hp; }

static void build_ref(const CiderHandle* h, const uint16_t* ref, int rl,
                      RefVec& rv) {
  rv.vec.clear();
  for (int i = 0; i < 4; ++i) rv.norm2[i] = 0;
  rv.len_terms = 0;
  for (int k = 1; k <= h->n; ++k) {
    std::unordered_map<uint64_t, int> tf;
    for (int i = 0; i + k <= rl; ++i) tf[pack_key(ref + i, k)] += 1;
    for (auto& kv : tf) {
      auto it = h->df_log.find(kv.first);
      float w = it == h->df_log.end() ? 0.0f : -it->second;
      float v = kv.second * w;
      if (v != 0.0f) {
        rv.vec.emplace(kv.first, v);
        rv.norm2[k - 1] += (double)v * v;
      }
      if (k == 2) rv.len_terms += kv.second;
    }
  }
}

void cider_prefix_rewards(void* hp, const uint16_t* hyp, int32_t B, int32_t L,
                          uint16_t eos_id, const uint16_t* refs,
                          const int64_t* ref_offsets, float sigma,
                          float* out) {
  const auto* h = (const CiderHandle*)hp;
  RefVec rv;
  std::unordered_map<uint64_t, int> tf;
  for (int32_t b = 0; b < B; ++b) {
    const uint16_t* ref = refs + ref_offsets[b];
    int rl = (int)(ref_offsets[b + 1] - ref_offsets[b]);
    build_ref(h, ref, rl, rv);
    tf.clear();
    double norm2[4] = {0, 0, 0, 0};
    double dot[4] = {0, 0, 0, 0};
    double len_terms = 0;
    const uint16_t* hy = hyp + (size_t)b * L;
    float* row = out + (size_t)b * L;
    int written = 0;
    float last = 0.0f;
    for (int l = 0; l < L; ++l) {
      if (hy[l] == eos_id) {
        if (written == 0) {
          last = -0.1f;
          row[written++] = last;
        }
        break;
      }
      // incremental update with the n-grams ending at position l
      for (int k = 1; k <= h->n; ++k) {
        if (l - k + 1 < 0) continue;
        uint64_t key = pack_key(hy + l - k + 1, k);
        int tf_old = tf[key];
        int tf_new = tf_old + 1;
        tf[key] = tf_new;
        auto it = h->df_log.find(key);
        float w = it == h->df_log.end() ? 0.0f : -it->second;
        if (w != 0.0f) {
          double v_old = (double)tf_old * w, v_new = (double)tf_new * w;
          norm2[k - 1] += v_new * v_new - v_old * v_old;
          auto rit = rv.vec.find(key);
          if (rit != rv.vec.end()) {
            double r = rit->second;
            double add = std::min(v_new, r) * r;
            double sub = tf_old ? std::min(v_old, r) * r : 0.0;
            dot[k - 1] += add - sub;
          }
        }
        if (k == 2) len_terms += 1;
      }
      // score
      double delta = len_terms - rv.len_terms;
      double pen = std::exp(-(delta * delta) / (2.0 * sigma * sigma));
      double total = 0;
      for (int k = 0; k < h->n; ++k) {
        double nh = std::sqrt(norm2[k]);
        double nr = std::sqrt(rv.norm2[k]);
        double val = (nh != 0.0 && nr != 0.0) ? dot[k] / (nh * nr) : 0.0;
        total += val * pen;
      }
      last = (float)(total / h->n);
      row[written++] = last;
    }
    for (int l = written; l < L; ++l) row[l] = last;
  }
}

}  // extern "C"
