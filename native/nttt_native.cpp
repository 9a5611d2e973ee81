// libnttt — native host-side runtime for no_time_to_train_tpu.
//
// Replaces the reference's native host components (pycocotools' C mask API and
// the cv2 resize path) with a self-contained C++ library exposed over ctypes:
//   * COCO run-length encoding / decoding (column-major, delta-compressed
//     string format) — the exact wire format of the COCO mask API;
//   * RLE mask IoU with crowd semantics (COCOeval segm hot loop);
//   * bilinear upsample of half-precision-free float mask logits to the
//     original image size with >0 binarization (the per-image finalize step,
//     reference Sam2MatchingBaseline_noAMG.py:657-663).
//
// Build: make -C native   (produces libnttt.so; loaded by
// no_time_to_train_tpu/utils/native.py, with pure-numpy fallbacks when absent).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------- RLE encode
// mask: H*W uint8 row-major. Writes the compressed COCO string into `out`
// (caller allocates >= 8*H*W + 16 bytes); returns string length.
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, char* out) {
    // build F-order runs
    std::vector<int64_t> cnts;
    cnts.reserve(h * w / 4 + 2);
    uint8_t prev = 0;
    int64_t run = 0;
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = mask[y * w + x] != 0;
            if (v == prev) {
                ++run;
            } else {
                cnts.push_back(run);
                prev = v;
                run = 1;
            }
        }
    }
    cnts.push_back(run);
    // to string (maskApi rleToString: 6-bit chunks, 0x20 continuation,
    // counts[i>2] delta vs counts[i-2])
    int64_t p = 0;
    for (size_t i = 0; i < cnts.size(); ++i) {
        int64_t x = cnts[i];
        if (i > 2) x -= cnts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            out[p++] = static_cast<char>(c + 48);
        }
    }
    return p;
}

// --------------------------------------------------------------- RLE decode
// Decodes the compressed string into an H*W row-major uint8 mask.
// Returns 0 on success.
int32_t rle_decode(const char* s, int64_t slen, int64_t h, int64_t w,
                   uint8_t* mask) {
    std::vector<int64_t> cnts;
    cnts.reserve(slen);
    int64_t i = 0;
    while (i < slen) {
        int64_t x = 0;
        int64_t k = 0;
        bool more = true;
        int64_t c = 0;
        while (more) {
            c = static_cast<int64_t>(s[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            ++i;
            ++k;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (cnts.size() > 2) x += cnts[cnts.size() - 2];
        cnts.push_back(x);
    }
    std::memset(mask, 0, h * w);
    int64_t pos = 0;
    uint8_t val = 0;
    for (int64_t cnt : cnts) {
        if (val) {
            for (int64_t j = pos; j < pos + cnt && j < h * w; ++j) {
                int64_t x = j / h, y = j % h;  // F-order
                mask[y * w + x] = 1;
            }
        }
        pos += cnt;
        val ^= 1;
    }
    return pos == h * w ? 0 : 1;
}

// ------------------------------------------------------------ RLE area
int64_t rle_area_from_counts(const char* s, int64_t slen) {
    std::vector<int64_t> cnts;
    int64_t i = 0;
    while (i < slen) {
        int64_t x = 0, k = 0;
        bool more = true;
        while (more) {
            int64_t c = static_cast<int64_t>(s[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            ++i; ++k;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (cnts.size() > 2) x += cnts[cnts.size() - 2];
        cnts.push_back(x);
    }
    int64_t area = 0;
    for (size_t j = 1; j < cnts.size(); j += 2) area += cnts[j];
    return area;
}

// --------------------------------------------------------------- mask IoU
// dt: Nd masks, gt: Ng masks (each H*W row-major uint8); iscrowd: Ng flags.
// out: Nd*Ng doubles.
void mask_iou(const uint8_t* dt, int64_t nd, const uint8_t* gt, int64_t ng,
              const uint8_t* iscrowd, int64_t hw, double* out) {
    std::vector<int64_t> da(nd), ga(ng);
    for (int64_t i = 0; i < nd; ++i) {
        int64_t a = 0;
        const uint8_t* m = dt + i * hw;
        for (int64_t p = 0; p < hw; ++p) a += m[p];
        da[i] = a;
    }
    for (int64_t j = 0; j < ng; ++j) {
        int64_t a = 0;
        const uint8_t* m = gt + j * hw;
        for (int64_t p = 0; p < hw; ++p) a += m[p];
        ga[j] = a;
    }
    for (int64_t i = 0; i < nd; ++i) {
        const uint8_t* mi = dt + i * hw;
        for (int64_t j = 0; j < ng; ++j) {
            const uint8_t* mj = gt + j * hw;
            int64_t inter = 0;
            for (int64_t p = 0; p < hw; ++p) inter += mi[p] & mj[p];
            double uni = iscrowd[j] ? static_cast<double>(da[i])
                                    : static_cast<double>(da[i] + ga[j] - inter);
            out[i * ng + j] = uni > 0 ? inter / uni : 0.0;
        }
    }
}

// ---------------------------------------------- bilinear upsample + binarize
// logits: N x (in_h*in_w) float32 row-major; out: N x (out_h*out_w) uint8.
// align_corners=False half-pixel centers; matches torch/cv2 INTER_LINEAR.
void upsample_binarize(const float* logits, int64_t n, int64_t in_h,
                       int64_t in_w, int64_t out_h, int64_t out_w,
                       float threshold, uint8_t* out) {
    std::vector<int32_t> y0(out_h), y1(out_h), x0(out_w), x1(out_w);
    std::vector<float> fy(out_h), fx(out_w);
    const double sh = static_cast<double>(in_h) / out_h;
    const double sw = static_cast<double>(in_w) / out_w;
    for (int64_t i = 0; i < out_h; ++i) {
        double src = (i + 0.5) * sh - 0.5;
        src = std::max(0.0, std::min(src, static_cast<double>(in_h - 1)));
        y0[i] = static_cast<int32_t>(src);
        y1[i] = std::min<int64_t>(y0[i] + 1, in_h - 1);
        fy[i] = static_cast<float>(src - y0[i]);
    }
    for (int64_t j = 0; j < out_w; ++j) {
        double src = (j + 0.5) * sw - 0.5;
        src = std::max(0.0, std::min(src, static_cast<double>(in_w - 1)));
        x0[j] = static_cast<int32_t>(src);
        x1[j] = std::min<int64_t>(x0[j] + 1, in_w - 1);
        fx[j] = static_cast<float>(src - x0[j]);
    }
    for (int64_t m = 0; m < n; ++m) {
        const float* src = logits + m * in_h * in_w;
        uint8_t* dst = out + m * out_h * out_w;
        for (int64_t i = 0; i < out_h; ++i) {
            const float* r0 = src + static_cast<int64_t>(y0[i]) * in_w;
            const float* r1 = src + static_cast<int64_t>(y1[i]) * in_w;
            const float wy = fy[i];
            for (int64_t j = 0; j < out_w; ++j) {
                const float t0 = r0[x0[j]] * (1.f - fx[j]) + r0[x1[j]] * fx[j];
                const float t1 = r1[x0[j]] * (1.f - fx[j]) + r1[x1[j]] * fx[j];
                dst[i * out_w + j] = (t0 * (1.f - wy) + t1 * wy) > threshold;
            }
        }
    }
}

}  // extern "C"
