// Host-side CTC prefix beam-search decoder (C++).
//
// The reference implemented its production decoders natively (Cython -> C,
// SURVEY.md C9: "ctc_fast/decoder/*.pyx").  This is the equivalent native
// artifact for the TPU framework: the same exact prefix beam-search
// algorithm as tpu_ctc/decode/beam.py's host reference, compiled, used for
// (a) fast host-side decoding when no accelerator is attached and
// (b) cross-checking the on-device batched decoder (parity tests).
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this toolchain).
// Build: make -C cpp   (produces libctcbeam.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr double kNegInf = -1e30;

inline double lse2(double a, double b) {
  double m = a > b ? a : b;
  if (m <= kNegInf / 2) return kNegInf;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct Entry {
  double pb = kNegInf;   // ends in blank
  double pnb = kNegInf;  // ends in non-blank
};

// LM score: dense table of order 1..3, context slot 0 = BOS.
inline float lm_score(const float* table, int order, int vocab,
                      const std::string& prefix, int c) {
  if (order <= 0 || table == nullptr) return 0.0f;
  int h1 = 0, h2 = 0;  // last, second-to-last (0 = BOS)
  const int n = static_cast<int>(prefix.size());
  if (n >= 1) h1 = static_cast<unsigned char>(prefix[n - 1]);
  if (n >= 2) h2 = static_cast<unsigned char>(prefix[n - 2]);
  switch (order) {
    case 1: return table[c];
    case 2: return table[h1 * vocab + c];
    default: return table[(h2 * vocab + h1) * vocab + c];
  }
}

}  // namespace

extern "C" {

// Decode one utterance.
//   log_probs: [T, A] row-major normalized log posteriors.
//   lm_table:  nullptr or dense [A]^order log-prob table.
//   out_ids:   caller buffer of size max_len.
// Returns 0 on success.
int ctc_beam_search(const float* log_probs, int t_total, int vocab,
                    int beam_width, int blank, const float* lm_table,
                    int lm_order, float lm_alpha, float lm_beta, int max_len,
                    int* out_ids, int* out_len, float* out_score) {
  if (t_total < 0 || vocab <= 0 || beam_width <= 0 || vocab > 256)
    return 1;
  using Beam = std::unordered_map<std::string, Entry>;
  Beam beams;
  beams[std::string()] = Entry{0.0, kNegInf};

  std::vector<std::pair<std::string, Entry>> items;
  for (int t = 0; t < t_total; ++t) {
    const float* lp = log_probs + static_cast<size_t>(t) * vocab;
    Beam next;
    next.reserve(beams.size() * vocab);
    for (const auto& kv : beams) {
      const std::string& prefix = kv.first;
      const double pb = kv.second.pb, pnb = kv.second.pnb;
      const double total = lse2(pb, pnb);
      // stay: blank
      Entry& stay = next[prefix];
      stay.pb = lse2(stay.pb, total + lp[blank]);
      // stay: repeat last char
      if (!prefix.empty()) {
        int lastc = static_cast<unsigned char>(prefix.back());
        stay.pnb = lse2(stay.pnb, pnb + lp[lastc]);
      }
      // extensions
      if (static_cast<int>(prefix.size()) >= max_len) continue;
      for (int c = 0; c < vocab; ++c) {
        if (c == blank) continue;
        double contrib =
            (!prefix.empty() && c == static_cast<unsigned char>(prefix.back())
                 ? pb
                 : total) +
            lp[c];
        contrib += lm_alpha * lm_score(lm_table, lm_order, vocab, prefix, c) +
                   lm_beta;
        Entry& ext = next[prefix + static_cast<char>(c)];
        ext.pnb = lse2(ext.pnb, contrib);
      }
    }
    // prune to beam_width by total probability
    items.assign(next.begin(), next.end());
    const size_t keep =
        std::min(items.size(), static_cast<size_t>(beam_width));
    std::partial_sort(items.begin(), items.begin() + keep, items.end(),
                      [](const auto& a, const auto& b) {
                        return lse2(a.second.pb, a.second.pnb) >
                               lse2(b.second.pb, b.second.pnb);
                      });
    beams.clear();
    for (size_t i = 0; i < keep; ++i)
      beams.emplace(std::move(items[i].first), items[i].second);
  }

  const std::string* best = nullptr;
  double best_score = -1e301;
  for (const auto& kv : beams) {
    double s = lse2(kv.second.pb, kv.second.pnb);
    if (s > best_score) {
      best_score = s;
      best = &kv.first;
    }
  }
  if (best == nullptr) return 2;
  int n = std::min<int>(static_cast<int>(best->size()), max_len);
  for (int i = 0; i < n; ++i)
    out_ids[i] = static_cast<unsigned char>((*best)[i]);
  *out_len = n;
  *out_score = static_cast<float>(best_score);
  return 0;
}

// Batched convenience entry: decodes B utterances sequentially.
int ctc_beam_search_batch(const float* log_probs, const int* lengths,
                          int batch, int t_max, int vocab, int beam_width,
                          int blank, const float* lm_table, int lm_order,
                          float lm_alpha, float lm_beta, int max_len,
                          int* out_ids, int* out_lens, float* out_scores) {
  for (int b = 0; b < batch; ++b) {
    int rc = ctc_beam_search(
        log_probs + static_cast<size_t>(b) * t_max * vocab, lengths[b], vocab,
        beam_width, blank, lm_table, lm_order, lm_alpha, lm_beta, max_len,
        out_ids + static_cast<size_t>(b) * max_len, out_lens + b,
        out_scores + b);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
