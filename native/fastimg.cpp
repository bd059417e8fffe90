// Native host-side image ops for the data pipeline.
//
// The torch reference leans on torchvision/PIL for per-sample transforms;
// the TPU build's loader is torch-free, so the hot per-pixel host work
// (uint8 -> normalized float32 NHWC, depth validity masks, nearest-neighbor
// depth resize) lives here as a small OpenMP-parallel C++ core, bound via
// ctypes (no pybind11 in the image).
//
// Build: see native/build.sh (g++ -O3 -march=native -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// uint8 HWC -> float32 in [-1, 1] (ImgNorm: (x/255 - 0.5) / 0.5)
void imgnorm_u8_f32(const uint8_t* src, float* dst, int64_t n) {
    const float scale = 2.0f / 255.0f;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = src[i] * scale - 1.0f;
    }
}

// float32 [-1,1] -> float32 [0,1] (rgb() display un-normalization)
void unnorm_f32(const float* src, float* dst, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        float v = src[i] * 0.5f + 0.5f;
        dst[i] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
    }
}

// validity mask: depth > 0 and finite
void depth_valid_mask(const float* depth, uint8_t* mask, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        float d = depth[i];
        mask[i] = (d > 0.0f && std::isfinite(d)) ? 1 : 0;
    }
}

// nearest-neighbor resize for depth maps (matches cv2.INTER_NEAREST:
// src index = floor(dst * scale))
void resize_nearest_f32(const float* src, int64_t sh, int64_t sw,
                        float* dst, int64_t dh, int64_t dw) {
    const double fy = (double)sh / (double)dh;
    const double fx = (double)sw / (double)dw;
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < dh; ++y) {
        int64_t sy = (int64_t)(y * fy);
        if (sy >= sh) sy = sh - 1;
        const float* srow = src + sy * sw;
        float* drow = dst + y * dw;
        for (int64_t x = 0; x < dw; ++x) {
            int64_t sx = (int64_t)(x * fx);
            if (sx >= sw) sx = sw - 1;
            drow[x] = srow[sx];
        }
    }
}

// batched uint8 HWC -> normalized float32, many images at once
// (the collation hot loop of the training data loader)
void imgnorm_batch_u8_f32(const uint8_t* const* srcs, float* dst,
                          int64_t n_imgs, int64_t img_elems) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t b = 0; b < n_imgs; ++b) {
        const uint8_t* src = srcs[b];
        float* out = dst + b * img_elems;
        const float scale = 2.0f / 255.0f;
        for (int64_t i = 0; i < img_elems; ++i) {
            out[i] = src[i] * scale - 1.0f;
        }
    }
}

}  // extern "C"
