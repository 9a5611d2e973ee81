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

// --------------------------- fused finalize: upsample + binarize + RLE + box
// One mask: bilinear-upsample `logits` [in_h*in_w] f32 to out_h x out_w
// (half-pixel centers, same arithmetic as upsample_binarize above), binarize
// at `threshold`, and emit the COCO RLE string DIRECTLY from the
// column-major traversal (F-order == RLE scan order), tracking the XYXY box
// of set pixels along the way. The full-resolution mask is never
// materialized: the working set is one horizontally-interpolated source
// column (in_h floats, L1-resident), which is what makes this ~an order of
// magnitude faster than upsample -> nonzero-box -> strided F-order encode.
// str_out: caller-allocated (>= 8*out_h*out_w + 16). box_out: int32[4] XYXY
// (zeros when empty). npix_out: set-pixel count. Returns string length.
int64_t finalize_mask(const float* logits, int64_t in_h, int64_t in_w,
                      int64_t out_h, int64_t out_w, float threshold,
                      char* str_out, int32_t* box_out, int64_t* npix_out) {
    std::vector<int32_t> y0(out_h), y1(out_h);
    std::vector<float> fy(out_h);
    const double sh = static_cast<double>(in_h) / out_h;
    const double sw = static_cast<double>(in_w) / out_w;
    for (int64_t i = 0; i < out_h; ++i) {
        double src = (i + 0.5) * sh - 0.5;
        src = std::max(0.0, std::min(src, static_cast<double>(in_h - 1)));
        y0[i] = static_cast<int32_t>(src);
        y1[i] = std::min<int64_t>(y0[i] + 1, in_h - 1);
        fy[i] = static_cast<float>(src - y0[i]);
    }
    // transpose the source once (blocked): the per-output-column horizontal
    // interpolation then reads two CONTIGUOUS source columns instead of two
    // in_w-strided gathers (a cache line per element)
    std::vector<float> tsrc(in_h * in_w);
    constexpr int64_t BT = 32;
    for (int64_t rb = 0; rb < in_h; rb += BT)
        for (int64_t cb = 0; cb < in_w; cb += BT) {
            const int64_t re = std::min(rb + BT, in_h);
            const int64_t ce = std::min(cb + BT, in_w);
            for (int64_t r = rb; r < re; ++r)
                for (int64_t c = cb; c < ce; ++c)
                    tsrc[c * in_h + r] = logits[r * in_w + c];
        }
    // Blocked column processing: BW output columns at a time so the
    // vertical interpolation + binarize runs VECTORIZED across the block
    // (the per-row y0/y1/fy are shared by every column), then each column's
    // run-length scan word-skips through the byte block (masks are blobby:
    // runs are long, so 8 pixels/iteration is the common case).
    constexpr int64_t BW = 32;
    std::vector<float> colblk(in_h * BW);
    std::vector<float> colblkT(BW * in_h);
    std::vector<uint8_t> vblk(out_h * BW);   // [out_h][BW] binarized
    std::vector<uint8_t> tv(BW * out_h);     // [BW][out_h] transposed
    std::vector<int64_t> cnts;
    cnts.reserve(out_h);
    uint8_t prev = 0;
    int64_t run = 0, npix = 0;
    int32_t minx = -1, maxx = -1, miny = static_cast<int32_t>(out_h),
            maxy = -1;
    int64_t x0b[BW], x1b[BW];
    float fxb[BW];
    for (int64_t jb = 0; jb < out_w; jb += BW) {
        const int64_t bw = std::min(BW, out_w - jb);
        for (int64_t jj = 0; jj < bw; ++jj) {
            double srcx = (jb + jj + 0.5) * sw - 0.5;
            srcx = std::max(0.0,
                            std::min(srcx, static_cast<double>(in_w - 1)));
            x0b[jj] = static_cast<int64_t>(srcx);
            x1b[jj] = std::min(x0b[jj] + 1, in_w - 1);
            fxb[jj] = static_cast<float>(srcx - x0b[jj]);
        }
        // horizontal, two sub-steps so BOTH vectorize: (a) per output
        // column, interpolate the two CONTIGUOUS source columns into a
        // column-major scratch (contiguous loads + stores, SIMD), then
        // (b) a small blocked 32KB transpose into the row-major layout the
        // vertical pass consumes (the two passes want opposite layouts;
        // the transpose is ~5 us, the gathers it replaces were ~10x that)
        for (int64_t jj = 0; jj < bw; ++jj) {
            const float* c0 = tsrc.data() + x0b[jj] * in_h;
            const float* c1 = tsrc.data() + x1b[jj] * in_h;
            const float fx = fxb[jj];
            float* dst = colblkT.data() + jj * in_h;
            for (int64_t r = 0; r < in_h; ++r)
                dst[r] = c0[r] * (1.f - fx) + c1[r] * fx;
        }
        for (int64_t rb = 0; rb < in_h; rb += BT)
            for (int64_t jj = 0; jj < bw; ++jj) {
                const int64_t re = std::min(rb + BT, in_h);
                const float* srcc = colblkT.data() + jj * in_h;
                for (int64_t r = rb; r < re; ++r)
                    colblk[r * BW + jj] = srcc[r];
            }
        // vertical + binarize: vectorizes across the BW lanes
        for (int64_t i = 0; i < out_h; ++i) {
            const float* r0 = colblk.data() + y0[i] * BW;
            const float* r1 = colblk.data() + y1[i] * BW;
            const float wy = fy[i];
            uint8_t* vp = vblk.data() + i * BW;
            for (int64_t jj = 0; jj < BW; ++jj)
                vp[jj] = (r0[jj] * (1.f - wy) + r1[jj] * wy) > threshold;
        }
        // box rows: OR each row across the block's valid lanes
        for (int64_t i = 0; i < out_h; ++i) {
            const uint8_t* vp = vblk.data() + i * BW;
            uint8_t any = 0;
            for (int64_t jj = 0; jj < bw; ++jj) any |= vp[jj];
            if (any) {
                if (static_cast<int32_t>(i) < miny)
                    miny = static_cast<int32_t>(i);
                if (static_cast<int32_t>(i) > maxy)
                    maxy = static_cast<int32_t>(i);
            }
        }
        // byte-transpose so each column scans contiguously
        for (int64_t i = 0; i < out_h; ++i)
            for (int64_t jj = 0; jj < bw; ++jj)
                tv[jj * out_h + i] = vblk[i * BW + jj];
        // per-column RLE (word-skipping equal runs) + box columns
        for (int64_t jj = 0; jj < bw; ++jj) {
            const uint8_t* col = tv.data() + jj * out_h;
            uint64_t col_or = 0;
            int64_t i = 0;
            for (; i + 8 <= out_h; i += 8) {
                uint64_t v;
                std::memcpy(&v, col + i, 8);
                col_or |= v;
            }
            for (; i < out_h; ++i) col_or |= col[i];
            if (col_or) {
                if (minx < 0) minx = static_cast<int32_t>(jb + jj);
                maxx = static_cast<int32_t>(jb + jj);
            }
            i = 0;
            while (i < out_h) {
                const uint64_t word = prev ? 0x0101010101010101ull : 0ull;
                while (i + 8 <= out_h) {
                    uint64_t v;
                    std::memcpy(&v, col + i, 8);
                    if (v != word) break;
                    i += 8;
                    run += 8;
                }
                if (i >= out_h) break;
                const uint8_t v = col[i];
                if (v == prev) {
                    ++run;
                } else {
                    cnts.push_back(run);
                    prev = v;
                    run = 1;
                }
                ++i;
            }
        }
    }
    cnts.push_back(run);
    for (size_t k = 1; k < cnts.size(); k += 2) npix += cnts[k];
    if (npix > 0) {
        box_out[0] = minx; box_out[1] = miny;
        box_out[2] = maxx; box_out[3] = maxy;
    } else {
        box_out[0] = box_out[1] = box_out[2] = box_out[3] = 0;
    }
    *npix_out = npix;
    // counts -> compressed string (maskApi rleToString; see rle_encode)
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
            str_out[p++] = static_cast<char>(c + 48);
        }
    }
    return p;
}

}  // extern "C"
