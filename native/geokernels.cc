// Host-side geo kernels for the jspsr_tpu runtime.
//
// The TPU does the model math; these are the hot *host* loops of the data /
// eval path (reference equivalents: utils/utils.py:802-967 mosaic,
// utils/utils.py:1501-1553 mirror padding, data/data_utils.py:289-312
// elevation scaling). Compiled to a shared library and bound via ctypes
// (jspsr_tpu/utils/native.py); every entry point has a numpy fallback and an
// equality test.
//
// Build: scripts/build_native.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Feathered mosaic merge of n_x*n_x square tiles (row-major), channel-last.
// tiles: (n, k, k, c) contiguous float32; out: (full, full, c) zeroed.
// stride = (full - k) / (n_x - 1); overlap = k - stride.
void merge_tiles_f32(const float* tiles, float* out, int64_t n_x, int64_t k,
                     int64_t c, int64_t full) {
  const int64_t stride = (n_x > 1) ? (full - k) / (n_x - 1) : 0;
  const int64_t overlap = k - stride;
  // 1D ramp: linspace(1,0,overlap+2)[1:-1]
  float* ramp = new float[overlap > 0 ? overlap : 1];
  for (int64_t i = 0; i < overlap; ++i)
    ramp[i] = 1.0f - (float)(i + 1) / (float)(overlap + 1);

  for (int64_t t = 0; t < n_x * n_x; ++t) {
    const int64_t row = t / n_x, col = t % n_x;
    const float* tile = tiles + t * k * k * c;
    const int64_t y0 = stride * row, x0 = stride * col;
    for (int64_t y = 0; y < k; ++y) {
      float wy = 1.0f;
      if (row > 0 && y < overlap) wy = ramp[overlap - 1 - y];
      if (row < n_x - 1 && y >= k - overlap) wy = ramp[y - (k - overlap)];
      float* orow = out + ((y0 + y) * full + x0) * c;
      const float* trow = tile + y * k * c;
      for (int64_t x = 0; x < k; ++x) {
        float wx = 1.0f;
        if (col > 0 && x < overlap) wx = ramp[overlap - 1 - x];
        if (col < n_x - 1 && x >= k - overlap) wx = ramp[x - (k - overlap)];
        const float wgt = wy * wx;
        for (int64_t ch = 0; ch < c; ++ch)
          orow[x * c + ch] += wgt * trow[x * c + ch];
      }
    }
  }
  delete[] ramp;
}

// Mirror (reflect, no edge repeat) padding: in (h, w, c) -> out (h+2p, w+2p, c).
void mirror_pad_f32(const float* in, float* out, int64_t h, int64_t w,
                    int64_t c, int64_t p) {
  const int64_t W = w + 2 * p;
  for (int64_t y = 0; y < h + 2 * p; ++y) {
    int64_t sy = y - p;
    if (sy < 0) sy = -sy;
    if (sy >= h) sy = 2 * h - 2 - sy;
    for (int64_t x = 0; x < W; ++x) {
      int64_t sx = x - p;
      if (sx < 0) sx = -sx;
      if (sx >= w) sx = 2 * w - 2 - sx;
      std::memcpy(out + (y * W + x) * c, in + (sy * w + sx) * c,
                  sizeof(float) * c);
    }
  }
}

// Elevation scaling (reference scale_data): minmax or log-minmax with
// optional relative base. In-place over n float32 values.
void scale_elevation_f32(float* data, int64_t n, float elev_min,
                         float elev_max, int use_log, float base) {
  if (use_log) {
    const float denom = 1.0f / std::log(elev_max - elev_min);
    for (int64_t i = 0; i < n; ++i)
      data[i] = std::log(data[i] - base - elev_min) * denom + 1e-8f;
  } else {
    const float denom = 1.0f / (elev_max - elev_min);
    for (int64_t i = 0; i < n; ++i)
      data[i] = (data[i] - base - elev_min) * denom;
  }
}

// Inverse elevation scaling (reference descale_data).
void descale_elevation_f32(float* data, int64_t n, float elev_min,
                           float elev_max, int use_log) {
  if (use_log) {
    const float lg = std::log(elev_max - elev_min);
    for (int64_t i = 0; i < n; ++i)
      data[i] = std::exp(data[i] * lg) + elev_min;
  } else {
    const float range = elev_max - elev_min;
    for (int64_t i = 0; i < n; ++i) data[i] = data[i] * range + elev_min;
  }
}

}  // extern "C"
