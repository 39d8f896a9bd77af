// Fast PNG decoder for the data loader.
//
// Native replacement for the pure-python PNG reader in io/tum.py: the
// reference's front-end is C++ (cv_bridge/OpenCV image decode,
// feature_extraction_service_node.cpp:101-149); here the host-side image
// decode is the ingest bottleneck feeding the TPU, so it is native too.
// Supports non-interlaced 8/16-bit grayscale, RGB(A), gray+alpha, and
// palette-less images — everything the TUM RGB-D dataset uses. Output is
// float32 (luminance for color, raw values for gray; 16-bit values kept
// as 0..65535).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

namespace {

inline uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline uint8_t paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return (uint8_t)a;
    if (pb <= pc) return (uint8_t)b;
    return (uint8_t)c;
}

}  // namespace

extern "C" {

// Parse header only: returns 0 on success and fills w/h.
int png_probe(const uint8_t* data, long len, int* w, int* h) {
    static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    if (len < 33 || memcmp(data, magic, 8) != 0) return -1;
    if (memcmp(data + 12, "IHDR", 4) != 0) return -2;
    *w = (int)be32(data + 16);
    *h = (int)be32(data + 20);
    return 0;
}

// Decode into caller-allocated float buffer of size w*h.
// Returns 0 ok; negative error codes otherwise.
int png_decode_gray_f32(const uint8_t* data, long len, float* out, int out_cap) {
    int w, h;
    if (png_probe(data, len, &w, &h) != 0) return -1;
    if ((long)w * h > out_cap) return -3;

    int bit_depth = data[24];
    int color_type = data[25];
    int interlace = data[28];
    if (interlace) return -4;
    int channels;
    switch (color_type) {
        case 0: channels = 1; break;
        case 2: channels = 3; break;
        case 4: channels = 2; break;
        case 6: channels = 4; break;
        default: return -5;
    }
    if (bit_depth != 8 && bit_depth != 16) return -6;

    // Collect IDAT.
    std::vector<uint8_t> idat;
    idat.reserve(len);
    long pos = 8;
    while (pos + 12 <= len) {
        uint32_t clen = be32(data + pos);
        const uint8_t* ctype = data + pos + 4;
        if (memcmp(ctype, "IDAT", 4) == 0) {
            idat.insert(idat.end(), data + pos + 8, data + pos + 8 + clen);
        } else if (memcmp(ctype, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + clen;
    }

    const int bpp = channels * (bit_depth / 8);
    const long stride = (long)w * bpp;
    std::vector<uint8_t> raw((stride + 1) * (size_t)h);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return -7;

    std::vector<uint8_t> prev(stride, 0), cur(stride);
    const float lw[3] = {0.299f, 0.587f, 0.114f};
    for (int row = 0; row < h; row++) {
        const uint8_t* src = raw.data() + (size_t)row * (stride + 1);
        uint8_t ft = src[0];
        memcpy(cur.data(), src + 1, stride);
        switch (ft) {
            case 0: break;
            case 1:
                for (long i = bpp; i < stride; i++) cur[i] += cur[i - bpp];
                break;
            case 2:
                for (long i = 0; i < stride; i++) cur[i] += prev[i];
                break;
            case 3:
                for (long i = 0; i < stride; i++) {
                    int left = i >= bpp ? cur[i - bpp] : 0;
                    cur[i] += (uint8_t)((left + prev[i]) >> 1);
                }
                break;
            case 4:
                for (long i = 0; i < stride; i++) {
                    int left = i >= bpp ? cur[i - bpp] : 0;
                    int ul = i >= bpp ? prev[i - bpp] : 0;
                    cur[i] += paeth(left, prev[i], ul);
                }
                break;
            default:
                return -8;
        }
        float* dst = out + (long)row * w;
        if (bit_depth == 16) {
            for (int x = 0; x < w; x++) {
                const uint8_t* px = cur.data() + (long)x * bpp;
                if (channels >= 3) {
                    float v = 0;
                    for (int c = 0; c < 3; c++)
                        v += lw[c] * (float)((px[2 * c] << 8) | px[2 * c + 1]);
                    dst[x] = v;
                } else {
                    dst[x] = (float)((px[0] << 8) | px[1]);
                }
            }
        } else {
            for (int x = 0; x < w; x++) {
                const uint8_t* px = cur.data() + (long)x * bpp;
                if (channels >= 3) {
                    dst[x] = lw[0] * px[0] + lw[1] * px[1] + lw[2] * px[2];
                } else {
                    dst[x] = (float)px[0];
                }
            }
        }
        std::swap(prev, cur);
    }
    return 0;
}

}  // extern "C"
