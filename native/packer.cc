// Host-side data-packing kernels for the llmmil_tpu input pipeline.
//
// The reference's CPU hot path (SURVEY §3.1: DICOM/NIfTI read + crop/pad +
// HU normalise per sample, dataset.py:252-363) runs as several full-volume
// numpy passes; these fused single-pass C++ kernels keep the 160×512×512
// volume in cache-sized strips and do clamp+scale+crop+pad in one sweep.
// Exposed with a C ABI for ctypes (no pybind11 in this image).
//
// Build: python native/build.py  (emits libllmmil_packer.so next to this
// file; llmmil_tpu.data.native loads it when present, numpy fallback
// otherwise).

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Fused HU-normalise + centre-crop/pad:
//   in  : (C, H, W) float32 raw voxels
//   out : (C_, H_, H_) float32 in [0, 1)
// Applies rescale slope/intercept, clamps to [-1024, 1000], optional
// MONOCHROME1 inversion (2^bits - v), maps to [0,1), then crops depth from
// the front / centre-pads, centre-crops/pads in-plane — exactly
// dataset.py:301-339 + 544-580 in one pass over the output.
void hu_normalize_crop(const float* in, int64_t C, int64_t H, int64_t W,
                       float slope, float intercept, int mono1, int bits,
                       int64_t C_, int64_t H_, float* out) {
  const float lo = -1024.0f, hi = 1000.0f;
  const float denom = 1.0f / (hi - lo);
  const float inv_base = mono1 ? static_cast<float>(1 << bits) : 0.0f;

  // source offsets implied by crop/pad rules
  const int64_t dC = C >= C_ ? 0 : (C_ - C) / 2;       // out depth offset
  const int64_t dH = H >= H_ ? (H - H_) / 2 : 0;       // in row offset
  const int64_t oH = H >= H_ ? 0 : (H_ - H) / 2;       // out row offset
  const int64_t dW = dH, oW = oH;                      // square in-plane

  std::memset(out, 0, sizeof(float) * C_ * H_ * H_);
  const int64_t copyC = std::min(C, C_);
  const int64_t copyH = std::min(H, H_);
  const int64_t copyW = std::min(W, H_);
  for (int64_t c = 0; c < copyC; ++c) {
    const float* slab = in + c * H * W;
    float* oslab = out + (c + dC) * H_ * H_;
    for (int64_t y = 0; y < copyH; ++y) {
      const float* row = slab + (y + dH) * W + dW;
      float* orow = oslab + (y + oH) * H_ + oW;
      for (int64_t x = 0; x < copyW; ++x) {
        float v = row[x] * slope + intercept;
        v = std::min(std::max(v, lo), hi);
        if (mono1) v = inv_base - v;
        orow[x] = (v + 1024.0f) * denom;
      }
    }
  }
}

// Bag packing: copy (n, d) float32 features into a zero-padded
// (target, d) buffer + uint8 validity mask (bags.py pad_bag).
void pack_bag(const float* feat, int64_t n, int64_t d, int64_t target,
              float* out, uint8_t* mask) {
  const int64_t keep = std::min(n, target);
  std::memcpy(out, feat, sizeof(float) * keep * d);
  if (target > keep)
    std::memset(out + keep * d, 0, sizeof(float) * (target - keep) * d);
  std::memset(mask, 1, keep);
  if (target > keep) std::memset(mask + keep, 0, target - keep);
}

// Gather selected instance rows (instance-dropout): indices must be sorted
// ascending (dataset.py:374-381 keeps sorted random subsets).
void gather_rows(const float* feat, int64_t n, int64_t d,
                 const int64_t* idx, int64_t k, float* out) {
  for (int64_t i = 0; i < k; ++i)
    std::memcpy(out + i * d, feat + idx[i] * d, sizeof(float) * d);
}

}  // extern "C"
