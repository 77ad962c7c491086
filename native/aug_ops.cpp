// Native host-side augmentation kernels for the input pipeline.
//
// The reference does all augmentation in Python/PIL inside DataLoader worker
// processes.  Here the hot inner loops (class-capped random crop search,
// color jitter, label downsampling) run in C++ with OpenMP, callable from
// the threaded loader via ctypes — threads release the GIL inside these
// calls, so one process can feed a TPU slice without mp.spawn.
//
// Build: native/build.sh  (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// torch-legacy 'nearest' label downsample: out[i,j] = in[floor(i*h/oh), floor(j*w/ow)]
void label_nearest_downsample(const int32_t* in, int h, int w,
                              int oh, int ow, int32_t* out) {
    #pragma omp parallel for schedule(static)
    for (int i = 0; i < oh; ++i) {
        const int si = (int)((int64_t)i * h / oh);
        const int32_t* row = in + (int64_t)si * w;
        int32_t* orow = out + (int64_t)i * ow;
        for (int j = 0; j < ow; ++j) {
            orow[j] = row[(int)((int64_t)j * w / ow)];
        }
    }
}

// xorshift64* PRNG (deterministic given seed)
static inline uint64_t xs64(uint64_t* s) {
    uint64_t x = *s;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    *s = x;
    return x * 0x2545F4914F6CDD1DULL;
}

// Class-ratio-capped random crop search (ref transforms.py:49-108 semantics):
// up to `patience` random (i, j) draws; accept when >1 non-ignore class is
// present and the dominant one covers < max_ratio.  Returns the final (i, j)
// (last draw when no accept) in out_ij and 1/0 accept flag.
int random_crop_class_cap(const int32_t* lbl, int h, int w,
                          int ch, int cw, int num_classes, int ignore_cls,
                          float max_ratio, int patience, uint64_t seed,
                          int32_t* out_ij) {
    uint64_t state = seed ^ 0x9E3779B97F4A7C15ULL;
    if (state == 0) state = 1;
    int i = 0, j = 0, accepted = 0;
    const int max_i = h - ch > 0 ? h - ch : 0;
    const int max_j = w - cw > 0 ? w - cw : 0;
    int* hist = new int[num_classes + 1];
    for (int attempt = 0; attempt < patience; ++attempt) {
        i = max_i ? (int)(xs64(&state) % (uint64_t)(max_i + 1)) : 0;
        j = max_j ? (int)(xs64(&state) % (uint64_t)(max_j + 1)) : 0;
        std::memset(hist, 0, sizeof(int) * (num_classes + 1));
        for (int r = 0; r < ch; ++r) {
            const int32_t* row = lbl + (int64_t)(i + r) * w + j;
            for (int c = 0; c < cw; ++c) {
                int v = row[c];
                if (v >= 0 && v <= num_classes) hist[v]++;
            }
        }
        int total = 0, maxc = 0, present = 0;
        for (int c = 0; c <= num_classes; ++c) {
            if (c == ignore_cls) continue;
            total += hist[c];
            if (hist[c] > 0) present++;
            if (hist[c] > maxc) maxc = hist[c];
        }
        if (present > 1 && total > 0 &&
            (float)maxc / (float)total < max_ratio) {
            accepted = 1;
            break;
        }
    }
    delete[] hist;
    out_ij[0] = i;
    out_ij[1] = j;
    return accepted;
}

// Color jitter on uint8 RGB (HWC), PIL-enhancer math:
//   brightness: x*f ; contrast: blend(mean_L, x, f) with L = luma mean;
//   saturation: blend(gray(x), x, f) ; hue: HSV hue rotation.
// `order` is a permutation of {0,1,2,3} selecting op order like torchvision.
void color_jitter(uint8_t* img, int h, int w,
                  float brightness, float contrast, float saturation,
                  float hue_shift, const int32_t* order) {
    const int64_t n = (int64_t)h * w;
    for (int oi = 0; oi < 4; ++oi) {
        int op = order[oi];
        if (op == 0) {  // brightness
            #pragma omp parallel for schedule(static)
            for (int64_t p = 0; p < n * 3; ++p) {
                float v = img[p] * brightness;
                img[p] = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
            }
        } else if (op == 1) {  // contrast around mean luma
            double mean = 0.0;
            #pragma omp parallel for reduction(+:mean) schedule(static)
            for (int64_t p = 0; p < n; ++p) {
                mean += (299 * img[3*p] + 587 * img[3*p+1] + 114 * img[3*p+2]) / 1000.0;
            }
            float m = (float)(mean / n + 0.5f);
            m = std::floor(m);  // PIL uses the rounded mean gray level
            #pragma omp parallel for schedule(static)
            for (int64_t p = 0; p < n * 3; ++p) {
                float v = m + contrast * (img[p] - m);
                img[p] = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
            }
        } else if (op == 2) {  // saturation
            #pragma omp parallel for schedule(static)
            for (int64_t p = 0; p < n; ++p) {
                float l = (299 * img[3*p] + 587 * img[3*p+1] + 114 * img[3*p+2]) / 1000.0f;
                l = std::floor(l + 0.5f);
                for (int c = 0; c < 3; ++c) {
                    float v = l + saturation * (img[3*p+c] - l);
                    img[3*p+c] = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
                }
            }
        } else {  // hue rotation in HSV (PIL 0-255 hue wheel)
            int shift = (int)(hue_shift * 255.0f);
            if (shift == 0) continue;
            #pragma omp parallel for schedule(static)
            for (int64_t p = 0; p < n; ++p) {
                float r = img[3*p] / 255.f, g = img[3*p+1] / 255.f,
                      b = img[3*p+2] / 255.f;
                float mx = std::max(r, std::max(g, b));
                float mn = std::min(r, std::min(g, b));
                float d = mx - mn;
                float hh = 0.f;
                if (d > 0) {
                    if (mx == r) hh = std::fmod((g - b) / d, 6.f);
                    else if (mx == g) hh = (b - r) / d + 2.f;
                    else hh = (r - g) / d + 4.f;
                    hh /= 6.f;
                    if (hh < 0) hh += 1.f;
                }
                float s = mx > 0 ? d / mx : 0.f;
                hh = std::fmod(hh + shift / 255.f + 1.f, 1.f);
                float c_ = mx * s;
                float x_ = c_ * (1 - std::fabs(std::fmod(hh * 6.f, 2.f) - 1));
                float m_ = mx - c_;
                float rr, gg, bb;
                int seg = (int)(hh * 6.f) % 6;
                switch (seg) {
                    case 0: rr = c_; gg = x_; bb = 0; break;
                    case 1: rr = x_; gg = c_; bb = 0; break;
                    case 2: rr = 0; gg = c_; bb = x_; break;
                    case 3: rr = 0; gg = x_; bb = c_; break;
                    case 4: rr = x_; gg = 0; bb = c_; break;
                    default: rr = c_; gg = 0; bb = x_; break;
                }
                img[3*p]   = (uint8_t)std::min(255.f, (rr + m_) * 255.f + 0.5f);
                img[3*p+1] = (uint8_t)std::min(255.f, (gg + m_) * 255.f + 0.5f);
                img[3*p+2] = (uint8_t)std::min(255.f, (bb + m_) * 255.f + 0.5f);
            }
        }
    }
}

// uint8 HWC -> float32 HWC, scaled to [0,1] and ImageNet-normalised in one
// pass (fuses ToFloat + Normalize; the loader's biggest pure-numpy cost).
void to_float_normalize(const uint8_t* in, int64_t n_pixels,
                        const float* mean, const float* std_, float* out) {
    #pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n_pixels; ++p) {
        for (int c = 0; c < 3; ++c) {
            out[3*p+c] = (in[3*p+c] * (1.0f / 255.0f) - mean[c]) / std_[c];
        }
    }
}

}  // extern "C"
