// MSM host stream planning: signed-digit recoding + per-window stable
// counting sort, OpenMP-parallel. Native twin of
// zkpoa_tpu/ops/msm_pallas._stream_indices_host / plan_msm — the numpy
// path costs ~12s at N=2^20 (radix argsort + take_along per window),
// which dominated the whole MSM on hardware; this does the same plan in
// tens of milliseconds. Role analog: the index-prep half of rapidsnark's
// CPU MSM (reference scripts/g16_prove.sh:246-252, SURVEY.md §2.5).
//
// Contract (must match the Python mirror bit-for-bit; tested in
// tests/test_native_plan.py):
//   * digits: per window w, e = (scalar >> (c*w)) & (2^c - 1) + carry;
//     e > 2^(c-1) recodes to -(2^c - e) with carry 1; |digit| d in
//     [0, 2^(c-1)]; d == 0 skips; bucket key = d - 1.
//   * top window (w = nw-1): key = (d-1) + top_stride * (i % spread),
//     top_stride = 2^(n_bits - c*(nw-1)), spread = nb / top_stride.
//   * order_y[w][pos] = i + (sign ? n : 0) for pos in stable
//     bucket-sorted order; b_start/b_end [nw][nb] delimit each bucket's
//     run; unwritten positions stay 0 (safe clamped gathers).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint32_t window_word(const uint32_t* s, int n_limbs, int off, int c) {
  const int limb = off >> 4;
  const int sh = off & 15;
  uint32_t w = limb < n_limbs ? (s[limb] >> sh) : 0u;
  if (sh > 0 && limb + 1 < n_limbs) w |= s[limb + 1] << (16 - sh);
  return w & ((1u << c) - 1u);
}

}  // namespace

extern "C" {

// Returns the max bucket occupancy (raw round bound), or -1 on bad args.
// scalars: uint32 [n, n_limbs] 16-bit limbs, little-endian.
// valid: uint8 [n] or nullptr. order_y: int32 [nw, n] (pre-zeroed by the
// caller). b_start/b_end: int32 [nw, nb].
// top_stride_in: the caller's power-of-two top-window alias stride (must
// match MsmPlan.top_stride); <= 0 selects the legacy 2^rem.
// top_block: > 0 selects the balanced-block top-window layout instead
// (digit d -> slots [(d-1)*top_block, d*top_block), alias = i % top_block
// — must match MsmPlan.top_block); top_stride_in is then ignored.
int64_t zkpoa_msm_plan2(const uint32_t* scalars, int64_t n, int n_limbs,
                        int n_bits, int c, int top_stride_in, int top_block,
                        const uint8_t* valid, int32_t* order_y,
                        int32_t* b_start, int32_t* b_end) {
  if (c < 2 || c > 14 || n <= 0) return -1;
  const int nw = (n_bits + c - 1) / c;
  if (c * nw <= n_bits) return -1;  // top window must not carry out
  if (nw > 64) return -1;  // neg_mask is 64-bit (callers fall back)
  const int nb = 1 << (c - 1);
  const int rem = n_bits - c * (nw - 1);
  const int top_stride = top_stride_in > 0 ? top_stride_in : (1 << rem);
  if (top_block <= 0 &&
      (top_stride > (1 << rem) || (top_stride & (top_stride - 1)) != 0))
    return -1;
  const int64_t spread = top_block > 0 ? 1
      : (nb / top_stride > 0 ? nb / top_stride : 1);
  const uint32_t half = 1u << (c - 1);
  const uint32_t full = 1u << c;

  // neg_mask[i] bit w = 1 when window w recoded negative (its carry-out)
  std::vector<uint64_t> neg_mask(static_cast<size_t>(n));
  // An unreduced (>= group order) 254-bit scalar can push the top-window
  // digit past the layout's assumed top_count, driving key past nb and
  // off the end of the histograms / order_y — reject instead of
  // corrupting native heap.
  std::atomic<bool> bad_key{false};
  std::vector<int64_t> hist(static_cast<size_t>(nw) * (nb + 1), 0);

  // pass 1: digits + per-window histograms (thread-local, merged)
#pragma omp parallel
  {
    std::vector<int64_t> lh(static_cast<size_t>(nw) * (nb + 1), 0);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const uint32_t* s = scalars + i * n_limbs;
      const bool ok = valid == nullptr || valid[i] != 0;
      uint32_t carry = 0;
      uint64_t mask = 0;
      for (int w = 0; w < nw; ++w) {
        uint32_t e = window_word(s, n_limbs, c * w, c) + carry;
        const bool neg = e > half;
        const uint32_t d = neg ? full - e : e;
        carry = neg ? 1u : 0u;
        if (neg) mask |= 1ull << w;
        if (ok && d > 0) {
          int64_t key = d - 1;
          if (w == nw - 1) {
            if (top_block > 0) key = key * top_block + (i % top_block);
            else if (spread > 1) key += top_stride * (i % spread);
          }
          if (key < 0 || key >= nb) { bad_key.store(true); continue; }
          ++lh[static_cast<size_t>(w) * (nb + 1) + key];
        }
      }
      neg_mask[i] = mask;
    }
#pragma omp critical
    for (size_t t = 0; t < hist.size(); ++t) hist[t] += lh[t];
  }
  if (bad_key.load()) return -1;

  // prefix sums -> bucket runs; raw round bound = max occupancy
  int64_t occ = 1;
  std::vector<int64_t> start0(static_cast<size_t>(nw) * nb);
  for (int w = 0; w < nw; ++w) {
    int64_t acc = 0;
    for (int b = 0; b < nb; ++b) {
      const int64_t cnt = hist[static_cast<size_t>(w) * (nb + 1) + b];
      start0[static_cast<size_t>(w) * nb + b] = acc;
      b_start[static_cast<size_t>(w) * nb + b] = static_cast<int32_t>(acc);
      b_end[static_cast<size_t>(w) * nb + b] = static_cast<int32_t>(acc + cnt);
      if (cnt > occ) occ = cnt;
      acc += cnt;
    }
  }

  // pass 2: stable fill, parallel over windows (digits re-derived from
  // the window word + the recorded carry/neg bits — O(1) per row)
#pragma omp parallel for schedule(dynamic)
  for (int w = 0; w < nw; ++w) {
    std::vector<int64_t> cur(start0.begin() + static_cast<size_t>(w) * nb,
                             start0.begin() + static_cast<size_t>(w + 1) * nb);
    int32_t* out = order_y + static_cast<size_t>(w) * n;
    for (int64_t i = 0; i < n; ++i) {
      if (valid != nullptr && valid[i] == 0) continue;
      const uint64_t mask = neg_mask[i];
      const uint32_t carry =
          w > 0 ? static_cast<uint32_t>((mask >> (w - 1)) & 1u) : 0u;
      uint32_t e = window_word(scalars + i * n_limbs, n_limbs, c * w, c) + carry;
      const bool neg = (mask >> w) & 1u;
      const uint32_t d = neg ? full - e : e;
      if (d == 0) continue;
      int64_t key = d - 1;
      if (w == nw - 1) {
        if (top_block > 0) key = key * top_block + (i % top_block);
        else if (spread > 1) key += top_stride * (i % spread);
      }
      if (key < 0 || key >= nb) continue;  // pass 1 already returned -1
      const int64_t pos = cur[key]++;
      out[pos] = static_cast<int32_t>(i + ((neg && d > 0) ? n : 0));
    }
  }
  return occ;
}

// Legacy entry (stride = 2^rem) kept for ABI compatibility.
int64_t zkpoa_msm_plan(const uint32_t* scalars, int64_t n, int n_limbs,
                       int n_bits, int c, const uint8_t* valid,
                       int32_t* order_y, int32_t* b_start, int32_t* b_end) {
  return zkpoa_msm_plan2(scalars, n, n_limbs, n_bits, c, 0, 0, valid,
                         order_y, b_start, b_end);
}

}  // extern "C"
