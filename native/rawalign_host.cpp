// Native host runtime for rawalign-tpu.
//
// The device (TPU) owns the mapping compute path; this library owns the
// host-side sequential hot loops that feed it:
//   * plain-mode sketching for the index build (the adjacent-similar
//     suppression + rolling pack are sequential over a whole genome's
//     expected signal, reference: src/rsketch.c:223-274);
//   * minimizer-mode sketching (reference: src/rsketch.c:146-221);
//   * event-detector peak finding for the host/golden path
//     (reference: src/revent.c:77-138).
//
// All functions are re-implementations matching the semantics of this
// repo's Python golden model (rawalign_tpu/golden/), which is itself
// oracle-tested; they are exposed via ctypes (see rawalign_tpu/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

namespace {

constexpr float kLastSigDiff = 0.3f;
constexpr float kMaskSignal = 3.402823466e+32F;

inline uint64_t hash_masked(uint64_t key, uint64_t mask) {
  key = (~key + (key << 21)) & mask;
  key = key ^ (key >> 24);
  key = (key + (key << 3) + (key << 8)) & mask;
  key = key ^ (key >> 14);
  key = (key + (key << 2) + (key << 4)) & mask;
  key = key ^ (key >> 28);
  key = (key + (key << 31)) & mask;
  return key;
}

inline uint32_t quantize(float v, int q, int lq) {
  uint32_t bits;
  std::memcpy(&bits, &v, sizeof(bits));
  const uint32_t mask_lq = (1u << lq) - 1u;
  return ((bits >> 30) << lq) | ((bits >> (32 - q)) & mask_lq);
}

}  // namespace

extern "C" {

// Plain-mode sketch: emits one seed per kept event once e events are
// packed. Outputs hash (32-bit) and event index arrays; returns the seed
// count. Output buffers must hold at least n entries.
int64_t ra_sketch_reg(const float* values, int64_t n, int e, int q, int lq,
                      uint32_t* out_hash, int64_t* out_pos) {
  const int quant_bit = lq + 2;
  const int nbits = quant_bit * e;
  const uint64_t mask_events =
      nbits >= 64 ? ~0ULL : ((1ULL << nbits) - 1ULL);
  const uint64_t mask32 = 0xFFFFFFFFULL;
  uint64_t acc = 0;
  int64_t last = 0;
  int kept = 0;
  int64_t out = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float v = values[i];
    if ((i > 0 && std::fabs(v - values[last]) < kLastSigDiff) ||
        v == kMaskSignal)
      continue;
    last = i;
    acc = ((acc << quant_bit) | quantize(v, q, lq)) & mask_events;
    if (++kept < e) continue;
    out_hash[out] = (uint32_t)hash_masked(acc, mask32);
    out_pos[out] = i;
    ++out;
  }
  return out;
}

// Minimizer-mode sketch (w-window minimum over packed-hash seeds, with
// duplicate-minimum emission), matching golden sketch_min. Position
// reported is the OLDEST event of the e-window. Output buffers must hold
// at least n entries.
int64_t ra_sketch_min(const float* values, int64_t n, int w, int e, int q,
                      int lq, uint32_t* out_hash, int64_t* out_pos) {
  const int quant_bit = lq + 2;
  const int nbits = quant_bit * e;
  const uint64_t mask_events =
      nbits >= 64 ? ~0ULL : ((1ULL << nbits) - 1ULL);
  const uint64_t mask32 = 0xFFFFFFFFULL;
  const uint64_t kInvalid = ~0ULL;

  // buf entries: (hash, pos); sig_buf mirrors the reference's e-slot ring
  uint64_t* buf_h = new uint64_t[w];
  int64_t* buf_p = new int64_t[w];
  for (int j = 0; j < w; ++j) {
    buf_h[j] = kInvalid;
    buf_p[j] = -1;
  }
  uint64_t* sig_h = new uint64_t[e]();
  int64_t* sig_p = new int64_t[e]();

  uint64_t acc = 0;
  int64_t last = 0;
  int64_t l = 0;
  int buf_pos = 0, min_pos = 0, sig_pos = 0;
  bool sig_full = false;
  uint64_t min_h = kInvalid;
  int64_t min_p = -1;
  int64_t out = 0;

  auto emit = [&](uint64_t h, int64_t p) {
    out_hash[out] = (uint32_t)(h);
    out_pos[out] = p;
    ++out;
  };

  for (int64_t i = 0; i < n; ++i) {
    const float v = values[i];
    if (i > 0 && std::fabs(v - values[last]) < kLastSigDiff) continue;
    ++l;
    last = i;
    acc = ((acc << quant_bit) | quantize(v, q, lq)) & mask_events;

    sig_p[sig_pos] = i;
    if (++sig_pos == e) {
      sig_full = true;
      sig_pos = 0;
    }
    sig_h[sig_pos] = hash_masked(acc, mask32);

    if (!sig_full) continue;

    const uint64_t info_h = sig_h[sig_pos];
    const int64_t info_p = sig_p[sig_pos];
    buf_h[buf_pos] = info_h;
    buf_p[buf_pos] = info_p;
    if (l == w + e - 1 && min_h != kInvalid) {
      for (int j = buf_pos + 1; j < w; ++j)
        if (min_h == buf_h[j] && buf_p[j] != min_p) emit(buf_h[j], buf_p[j]);
      for (int j = 0; j < buf_pos; ++j)
        if (min_h == buf_h[j] && buf_p[j] != min_p) emit(buf_h[j], buf_p[j]);
    }
    if (info_h <= min_h) {
      if (l >= w + e && min_h != kInvalid) emit(min_h, min_p);
      min_h = info_h;
      min_p = info_p;
      min_pos = buf_pos;
    } else if (buf_pos == min_pos) {
      if (l >= w + e - 1 && min_h != kInvalid) emit(min_h, min_p);
      min_h = kInvalid;
      for (int j = buf_pos + 1; j < w; ++j)
        if (min_h >= buf_h[j]) { min_h = buf_h[j]; min_p = buf_p[j]; min_pos = j; }
      for (int j = 0; j <= buf_pos; ++j)
        if (min_h >= buf_h[j]) { min_h = buf_h[j]; min_p = buf_p[j]; min_pos = j; }
      if (l >= w + e - 1 && min_h != kInvalid) {
        for (int j = buf_pos + 1; j < w; ++j)
          if (min_h == buf_h[j] && min_p != buf_p[j]) emit(buf_h[j], buf_p[j]);
        for (int j = 0; j <= buf_pos; ++j)
          if (min_h == buf_h[j] && min_p != buf_p[j]) emit(buf_h[j], buf_p[j]);
      }
    }
    if (++buf_pos == w) buf_pos = 0;
  }
  if (min_h != kInvalid) emit(min_h, min_p);

  delete[] buf_h;
  delete[] buf_p;
  delete[] sig_h;
  delete[] sig_p;
  return out;
}

// Dual-detector peak finding over precomputed t-statistics. Returns the
// number of peaks written to out_peaks (buffer size >= n).
int64_t ra_gen_peaks(const float* t1, const float* t2, int64_t n,
                     float threshold1, float threshold2, int w1, int w2,
                     float peak_height, uint32_t* out_peaks) {
  const float kFltMax = std::numeric_limits<float>::max();
  const float* sig[2] = {t1, t2};
  const float thr[2] = {threshold1, threshold2};
  const int win[2] = {w1, w2};
  int64_t masked_to[2] = {0, 0};
  int64_t peak_pos[2] = {-1, -1};
  float peak_value[2] = {kFltMax, kFltMax};
  bool valid_peak[2] = {false, false};
  int64_t out = 0;

  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 2; ++k) {
      if (masked_to[k] >= i) continue;
      const float cv = sig[k][i];
      if (peak_pos[k] == -1) {
        if (cv < peak_value[k]) {
          peak_value[k] = cv;
        } else if (cv - peak_value[k] > peak_height) {
          peak_value[k] = cv;
          peak_pos[k] = i;
        }
      } else {
        if (cv > peak_value[k]) {
          peak_value[k] = cv;
          peak_pos[k] = i;
        }
        if (k == 0 && peak_value[0] > thr[0]) {
          masked_to[1] = peak_pos[0] + win[0];
          peak_pos[1] = -1;
          peak_value[1] = kFltMax;
          valid_peak[1] = false;
        }
        if (peak_value[k] - cv > peak_height && peak_value[k] > thr[k])
          valid_peak[k] = true;
        if (valid_peak[k] && (i - peak_pos[k]) > win[k] / 2) {
          out_peaks[out++] = (uint32_t)peak_pos[k];
          peak_pos[k] = -1;
          peak_value[k] = cv;
          valid_peak[k] = false;
        }
      }
    }
  }
  return out;
}

}  // extern "C"
