// tptnative: native presentation + validation kernels for toypathtracer_tpu.
//
// TPU-native framework's host-side runtime component, mirroring the
// reference's native presentation layer: the sRGB conversion its blit
// shaders perform per present (reference: Cpp/Windows/PixelShader.hlsl:1-15)
// and the C# CLI's exact-curve TGA encode (reference: Cs/Program.cs:34-59).
// The device renders linear radiance; everything after the device->host
// copy (tone transfer, 8-bit quantization, vertical flip, golden-image
// metrics) is plain CPU work on megabytes of pixels -- a natural native
// kernel, called from Python via ctypes (toypathtracer_tpu/io.py).
//
// Plain C ABI; no dependencies. Build: native/build.sh (g++ -O3 -shared).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Linear [0,1] -> sRGB, exact piecewise curve (Cs/Program.cs:40-47).
static inline float srgb_exact(float x) {
    if (x <= 0.0f) return 0.0f;
    if (x >= 1.0f) return 1.0f;
    if (x <= 0.0031308f) return x * 12.92f;
    return 1.055f * powf(x, 1.0f / 2.4f) - 0.055f;
}

// Cheap sqrt approximation (Emscripten/main.cpp:69-71).
static inline float srgb_cheap(float x) {
    if (x <= 0.0f) return 0.0f;
    if (x >= 1.0f) return 1.0f;
    return sqrtf(x);
}

// img: (h, w, 3) float32 with row 0 at the BOTTOM (reference backbuffer
// layout, Test.cpp:278-297). out: (h, w, 3) uint8 top-down (flip), RGB.
// cheap != 0 selects the sqrt curve. Returns 0 on success.
int tpt_srgb_encode(const float* img, int h, int w, uint8_t* out,
                    int cheap) {
    if (!img || !out || h <= 0 || w <= 0) return 1;
    for (int y = 0; y < h; ++y) {
        const float* src = img + (size_t)(h - 1 - y) * w * 3;
        uint8_t* dst = out + (size_t)y * w * 3;
        for (int i = 0; i < w * 3; ++i) {
            float s = cheap ? srgb_cheap(src[i]) : srgb_exact(src[i]);
            float v = s * 255.0f + 0.5f;
            if (v < 0.0f) v = 0.0f;
            if (v > 255.0f) v = 255.0f;
            dst[i] = (uint8_t)v;
        }
    }
    return 0;
}

// Same, but BGR bottom-up -- the exact TGA payload byte order the
// reference CLI writes (Cs/Program.cs:49-59).
int tpt_srgb_encode_tga(const float* img, int h, int w, uint8_t* out,
                        int cheap) {
    if (!img || !out || h <= 0 || w <= 0) return 1;
    for (int y = 0; y < h; ++y) {
        const float* src = img + (size_t)y * w * 3;
        uint8_t* dst = out + (size_t)y * w * 3;
        for (int x = 0; x < w; ++x) {
            for (int c = 0; c < 3; ++c) {
                float s = cheap ? srgb_cheap(src[x * 3 + c])
                                : srgb_exact(src[x * 3 + c]);
                float v = s * 255.0f + 0.5f;
                if (v < 0.0f) v = 0.0f;
                if (v > 255.0f) v = 255.0f;
                dst[x * 3 + (2 - c)] = (uint8_t)v;  // RGB -> BGR
            }
        }
    }
    return 0;
}

// Golden-image metrics over two (n,) float32 buffers:
// out[0]=max abs diff, out[1]=mean abs diff, out[2]=RMSE,
// out[3]=count of elements with |diff| > tol.
int tpt_image_metrics(const float* a, const float* b, int64_t n,
                      float tol, double* out) {
    if (!a || !b || !out || n <= 0) return 1;
    double max_abs = 0.0, sum_abs = 0.0, sum_sq = 0.0;
    int64_t over = 0;
    for (int64_t i = 0; i < n; ++i) {
        double d = (double)a[i] - (double)b[i];
        double ad = d < 0 ? -d : d;
        if (ad > max_abs) max_abs = ad;
        sum_abs += ad;
        sum_sq += d * d;
        if (ad > tol) ++over;
    }
    out[0] = max_abs;
    out[1] = sum_abs / (double)n;
    out[2] = sqrt(sum_sq / (double)n);
    out[3] = (double)over;
    return 0;
}

// Progressive accumulation on host pixels (the reference's blend,
// Test.cpp:272-276, 293-295): accum = accum*fac + frame*(1-fac), with
// the Metal NaN guard (!isfinite(prev) -> 0). Used by host-side replay /
// validation tooling; the device path does this on-chip.
int tpt_progressive_blend(float* accum, const float* frame, int64_t n,
                          float fac) {
    if (!accum || !frame || n <= 0) return 1;
    const float inv = 1.0f - fac;
    for (int64_t i = 0; i < n; ++i) {
        float prev = accum[i];
        if (!std::isfinite(prev)) prev = 0.0f;
        accum[i] = prev * fac + frame[i] * inv;
    }
    return 0;
}

int tpt_version() { return 1; }

}  // extern "C"
