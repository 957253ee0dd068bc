// Native transport quantisers for track_analyser_tpu.
//
// The serving host is frequently a single vCPU; the numpy pad+quantise
// path costs several full passes over 16.8 MB per track (allocate, pad,
// block-max, scale, clip, cast). These fused kernels do the whole job in
// two tight passes and write straight into caller-owned buffers, and the
// GIL is released for the duration of the ctypes call, so quantisation
// overlaps the upload streams.
//
// Semantics mirror parallel/batch.py exactly:
//   int8:  per-block scale = max|x| (f32); out = nearest-int
//          (rounded clip(x * (127/scale), -127, 127)); empty/padded ->
//          scale from zeros = 0 -> inv uses 1.0, values 0.
//   int16: out = trunc(clip(x * 32768, -32768, 32767)).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline int8_t quantise_one_i8(float x, float inv) {
  float v = x * inv;
  if (v > 127.0f) v = 127.0f;
  if (v < -127.0f) v = -127.0f;
  // round-to-nearest-even (matches numpy rint): at 8 bits, truncation's
  // toward-zero bias costs ~0.1-0.3 dB of signal energy
  return static_cast<int8_t>(nearbyintf(v));
}

}  // namespace

extern "C" {

// Quantise one channel-major float32 signal into blockwise-scaled int8.
//
// in:        (n_ch_in, n_in) interleaved by channel (row-major)
// n_ch_in:   1 (duplicated into both output rows) or 2
// n_bucket:  padded output length (multiple of block)
// out_vals:  (2, n_bucket) int8
// out_scales:(2, n_bucket/block) float32
void ta_quantise_i8(const float* in, int64_t n_ch_in, int64_t n_in,
                    int64_t n_bucket, int64_t block, int8_t* out_vals,
                    float* out_scales) {
  const int64_t n_blocks = n_bucket / block;
  for (int64_t ch = 0; ch < 2; ++ch) {
    const float* src = in + (n_ch_in == 2 ? ch * n_in : 0);
    int8_t* vals = out_vals + ch * n_bucket;
    float* scales = out_scales + ch * n_blocks;
    for (int64_t b = 0; b < n_blocks; ++b) {
      const int64_t start = b * block;
      const int64_t valid = n_in > start ? (n_in - start < block ? n_in - start : block) : 0;
      float peak = 0.0f;
      for (int64_t i = 0; i < valid; ++i) {
        float a = std::fabs(src[start + i]);
        if (a > peak) peak = a;
      }
      scales[b] = peak;
      const float inv = 127.0f / (peak > 0.0f ? peak : 1.0f);
      int64_t i = 0;
      for (; i < valid; ++i) vals[start + i] = quantise_one_i8(src[start + i], inv);
      if (valid < block) std::memset(vals + start + valid, 0, block - valid);
    }
  }
}

// Quantise a mono float32 signal into zero-padded int16.
void ta_quantise_i16(const float* in, int64_t n_in, int64_t n_bucket,
                     int16_t* out) {
  for (int64_t i = 0; i < n_in; ++i) {
    float v = in[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(v);
  }
  if (n_bucket > n_in)
    std::memset(out + n_in, 0, (n_bucket - n_in) * sizeof(int16_t));
}

// Stereo variant of ta_quantise_i16: (n_ch_in, n_in) -> (2, n_bucket).
void ta_quantise_i16_stereo(const float* in, int64_t n_ch_in, int64_t n_in,
                            int64_t n_bucket, int16_t* out) {
  for (int64_t ch = 0; ch < 2; ++ch) {
    const float* src = in + (n_ch_in == 2 ? ch * n_in : 0);
    ta_quantise_i16(src, n_in, n_bucket, out + ch * n_bucket);
  }
}

}  // extern "C"
