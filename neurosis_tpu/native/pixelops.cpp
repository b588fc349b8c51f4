// Native host-side pixel ops for the data loader hot path.
//
// The reference rides torch's C++ DataLoader/pillow stack for decode/augment
// (dataset/imagefolder/aspect.py worker processes); the equivalent here is a
// small C++ core the Python pipeline calls through ctypes:
//
//   - u8hwc_to_f32_norm: fused uint8 -> float32 [-1, 1] conversion
//     (eliminates the intermediate float64/float32 temporaries numpy creates
//     for `arr / 255 * 2 - 1` and runs multi-threaded).
//   - crop_norm_into: fused crop + normalize, writing straight into one slot
//     of a preallocated [B, H, W, C] float32 batch buffer — the collate path
//     becomes one pass over the source bytes with zero per-image temporaries.
//   - resize_bilinear_u8: separable triangle-filter (antialiased bilinear)
//     resize on uint8 HWC, the PIL.Image.BILINEAR equivalent for the
//     bucket-fit downscale.
//
// Build: g++ -O3 -shared -fPIC -fopenmp (see native/__init__.py); the Python
// wrappers fall back to numpy/PIL when the shared library is unavailable.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// dst[i] = src[i] * (2/255) - 1
void u8hwc_to_f32_norm(const uint8_t* src, float* dst, int64_t n) {
    const float scale = 2.0f / 255.0f;
#pragma omp parallel for schedule(static) if (n > (1 << 16))
    for (int64_t i = 0; i < n; i++) {
        dst[i] = (float)src[i] * scale - 1.0f;
    }
}

// Crop [top:top+oh, left:left+ow] from an (h, w, c) uint8 image and write the
// normalized float32 pixels into dst (contiguous oh*ow*c floats — typically a
// batch-buffer slot).
void crop_norm_into(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                    int64_t top, int64_t left, int64_t oh, int64_t ow,
                    float* dst) {
    (void)h;
    const float scale = 2.0f / 255.0f;
#pragma omp parallel for schedule(static) if (oh * ow * c > (1 << 16))
    for (int64_t y = 0; y < oh; y++) {
        const uint8_t* row = src + ((top + y) * w + left) * c;
        float* out = dst + y * ow * c;
        for (int64_t i = 0; i < ow * c; i++) {
            out[i] = (float)row[i] * scale - 1.0f;
        }
    }
}

namespace {

// Triangle (linear) filter taps for one output position, with the support
// widened by the scale factor when downsampling (antialiasing) — the same
// scheme PIL uses for Image.BILINEAR.
struct Taps {
    int64_t first;
    std::vector<float> weights;
};

static void build_taps(int64_t in_size, int64_t out_size, std::vector<Taps>& taps) {
    const double scale = (double)in_size / (double)out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 1.0 * filterscale;  // triangle filter support = 1
    taps.resize(out_size);
    for (int64_t xx = 0; xx < out_size; xx++) {
        const double center = (xx + 0.5) * scale;
        int64_t lo = (int64_t)(center - support + 0.5);
        int64_t hi = (int64_t)(center + support + 0.5);
        lo = std::max<int64_t>(lo, 0);
        hi = std::min<int64_t>(hi, in_size);
        Taps& t = taps[xx];
        t.first = lo;
        t.weights.resize(hi - lo);
        double total = 0.0;
        for (int64_t x = lo; x < hi; x++) {
            double d = ((double)x - center + 0.5) / filterscale;
            double wgt = d < 0 ? 1.0 + d : 1.0 - d;  // triangle
            if (wgt < 0) wgt = 0;
            t.weights[x - lo] = (float)wgt;
            total += wgt;
        }
        if (total > 0) {
            for (auto& wv : t.weights) wv = (float)(wv / total);
        }
    }
}

}  // namespace

// Antialiased bilinear resize, uint8 HWC -> uint8 HWC (separable: horizontal
// into a float scratch, then vertical with rounding).
void resize_bilinear_u8(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                        uint8_t* dst, int64_t oh, int64_t ow) {
    std::vector<Taps> xtaps, ytaps;
    build_taps(w, ow, xtaps);
    build_taps(h, oh, ytaps);

    // horizontal pass: (h, w, c) -> (h, ow, c) float
    std::vector<float> mid((size_t)(h * ow * c));
#pragma omp parallel for schedule(static) if (h * ow * c > (1 << 16))
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* row = src + y * w * c;
        float* out = mid.data() + y * ow * c;
        for (int64_t xx = 0; xx < ow; xx++) {
            const Taps& t = xtaps[xx];
            for (int64_t ch = 0; ch < c; ch++) {
                float acc = 0.0f;
                for (size_t k = 0; k < t.weights.size(); k++) {
                    acc += t.weights[k] * (float)row[(t.first + (int64_t)k) * c + ch];
                }
                out[xx * c + ch] = acc;
            }
        }
    }

    // vertical pass: (h, ow, c) -> (oh, ow, c) uint8
#pragma omp parallel for schedule(static) if (oh * ow * c > (1 << 16))
    for (int64_t yy = 0; yy < oh; yy++) {
        const Taps& t = ytaps[yy];
        uint8_t* out = dst + yy * ow * c;
        for (int64_t i = 0; i < ow * c; i++) {
            float acc = 0.0f;
            for (size_t k = 0; k < t.weights.size(); k++) {
                acc += t.weights[k] * mid[(t.first + (int64_t)k) * ow * c + i];
            }
            int v = (int)(acc + 0.5f);
            out[i] = (uint8_t)std::min(std::max(v, 0), 255);
        }
    }
}

int pixelops_num_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
