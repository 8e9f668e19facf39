// sdfio — native image codec for chaq_sdfgen_tpu (C ABI, ctypes-bound).
//
// TPU-native counterpart of the reference's vendored stb_image /
// stb_image_write layer (reference .gitmodules:1-3, openmp/sdfgen.c:17-20):
// the host-side runtime component stays native C++ while the compute path
// is JAX/Pallas. Implements the formats the reference emits natively:
// PNG (via zlib), BMP, TGA, and baseline JPEG encode with the -q quality
// knob (openmp/sdfgen.c:327-333 writes JPG via stbi_write_jpg(quality));
// decode covers PNG/BMP/TGA/PNM and converts to the same 2-channel
// gray+alpha buffer stbi_load(..., 2) produces, including stb's integer
// luminance ((r*77 + g*150 + 29*b) >> 8). JPEG decode and exotic PNG
// variants return "unsupported" and the Python layer falls back to PIL.
//
// All entry points return 0 on success, negative on failure; buffers are
// allocated with malloc and released by sdfio_free.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

void sdfio_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// helpers
// ---------------------------------------------------------------------------

static inline uint8_t stb_luminance(uint8_t r, uint8_t g, uint8_t b) {
    return (uint8_t)(((unsigned)r * 77u + (unsigned)g * 150u + 29u * (unsigned)b) >> 8);
}

static uint32_t rd_be32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | p[3];
}

static void wr_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back((uint8_t)(x >> 24));
    v.push_back((uint8_t)(x >> 16));
    v.push_back((uint8_t)(x >> 8));
    v.push_back((uint8_t)x);
}

static uint16_t rd_le16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
static uint32_t rd_le32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}

// ---------------------------------------------------------------------------
// PNG decode (8-bit depth; color types 0 gray, 2 RGB, 3 palette, 4 GA, 6 RGBA;
// no interlace). Output: gray+alpha interleaved, h*w*2 bytes.
// ---------------------------------------------------------------------------

static int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

int sdfio_decode_png(const uint8_t* data, size_t len, uint8_t** out, int* w, int* h) {
    if (len < 8 || memcmp(data, "\x89PNG\r\n\x1a\n", 8) != 0) return -1;
    size_t pos = 8;
    uint32_t width = 0, height = 0;
    int bit_depth = 0, color_type = -1, interlace = 0;
    std::vector<uint8_t> idat;
    std::vector<uint8_t> palette;      // rgb triples
    std::vector<uint8_t> trns;         // per-palette-entry alpha
    bool seen_ihdr = false, seen_iend = false;

    while (pos + 8 <= len && !seen_iend) {
        uint32_t clen = rd_be32(data + pos);
        const uint8_t* ctype = data + pos + 4;
        if (pos + 12 + (size_t)clen > len) return -2;
        const uint8_t* cdata = data + pos + 8;
        if (!memcmp(ctype, "IHDR", 4)) {
            if (clen < 13) return -3;
            width = rd_be32(cdata);
            height = rd_be32(cdata + 4);
            bit_depth = cdata[8];
            color_type = cdata[9];
            interlace = cdata[12];
            seen_ihdr = true;
        } else if (!memcmp(ctype, "PLTE", 4)) {
            palette.assign(cdata, cdata + clen);
        } else if (!memcmp(ctype, "tRNS", 4)) {
            trns.assign(cdata, cdata + clen);
        } else if (!memcmp(ctype, "IDAT", 4)) {
            idat.insert(idat.end(), cdata, cdata + clen);
        } else if (!memcmp(ctype, "IEND", 4)) {
            seen_iend = true;
        }
        pos += 12 + clen;
    }
    if (!seen_ihdr || width == 0 || height == 0) return -3;
    if (bit_depth != 8 || interlace != 0) return -10;  // unsupported -> PIL
    int ch;
    switch (color_type) {
        case 0: ch = 1; break;
        case 2: ch = 3; break;
        case 3: ch = 1; break;  // palette index
        case 4: ch = 2; break;
        case 6: ch = 4; break;
        default: return -10;
    }
    if (color_type == 3 && palette.empty()) return -3;

    size_t stride = (size_t)width * ch;
    std::vector<uint8_t> raw((stride + 1) * height);
    uLongf raw_len = (uLongf)raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), (uLong)idat.size()) != Z_OK ||
        raw_len != raw.size())
        return -4;

    std::vector<uint8_t> img(stride * height);
    for (uint32_t y = 0; y < height; ++y) {
        const uint8_t* src = raw.data() + y * (stride + 1);
        uint8_t filter = src[0];
        const uint8_t* cur_in = src + 1;
        uint8_t* cur = img.data() + y * stride;
        const uint8_t* up = y ? img.data() + (y - 1) * stride : nullptr;
        for (size_t x = 0; x < stride; ++x) {
            int a = x >= (size_t)ch ? cur[x - ch] : 0;
            int b = up ? up[x] : 0;
            int c = (up && x >= (size_t)ch) ? up[x - ch] : 0;
            int v = cur_in[x];
            switch (filter) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return -5;
            }
            cur[x] = (uint8_t)v;
        }
    }

    uint8_t* res = (uint8_t*)malloc((size_t)width * height * 2);
    if (!res) return -6;
    for (size_t i = 0; i < (size_t)width * height; ++i) {
        const uint8_t* p = img.data() + i * ch;
        uint8_t gray, alpha = 255;
        switch (color_type) {
            case 0: gray = p[0]; break;
            case 2: gray = stb_luminance(p[0], p[1], p[2]); break;
            case 3: {
                unsigned idx = p[0];
                if ((size_t)idx * 3 + 2 >= palette.size()) { free(res); return -7; }
                gray = stb_luminance(palette[idx * 3], palette[idx * 3 + 1], palette[idx * 3 + 2]);
                if (idx < trns.size()) alpha = trns[idx];
                break;
            }
            case 4: gray = p[0]; alpha = p[1]; break;
            default: gray = stb_luminance(p[0], p[1], p[2]); alpha = p[3]; break;
        }
        res[i * 2] = gray;
        res[i * 2 + 1] = alpha;
    }
    *out = res;
    *w = (int)width;
    *h = (int)height;
    return 0;
}

// ---------------------------------------------------------------------------
// PNG encode: 8-bit grayscale, filter 0, one IDAT.
// ---------------------------------------------------------------------------

static void png_chunk(std::vector<uint8_t>& out, const char* type, const uint8_t* data, size_t len) {
    wr_be32(out, (uint32_t)len);
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    out.insert(out.end(), data, data + len);
    uint32_t crc = (uint32_t)crc32(0, out.data() + start, (uInt)(len + 4));
    wr_be32(out, crc);
}

int sdfio_encode_png(const uint8_t* gray, int w, int h, uint8_t** out, size_t* out_len) {
    if (w <= 0 || h <= 0) return -1;
    std::vector<uint8_t> raw((size_t)(w + 1) * h);
    for (int y = 0; y < h; ++y) {
        raw[(size_t)y * (w + 1)] = 0;  // filter: none
        memcpy(raw.data() + (size_t)y * (w + 1) + 1, gray + (size_t)y * w, w);
    }
    uLongf comp_cap = compressBound((uLong)raw.size());
    std::vector<uint8_t> comp(comp_cap);
    if (compress2(comp.data(), &comp_cap, raw.data(), (uLong)raw.size(), 9) != Z_OK) return -2;

    std::vector<uint8_t> png;
    const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    png.insert(png.end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = (uint8_t)(w >> 24); ihdr[1] = (uint8_t)(w >> 16); ihdr[2] = (uint8_t)(w >> 8); ihdr[3] = (uint8_t)w;
    ihdr[4] = (uint8_t)(h >> 24); ihdr[5] = (uint8_t)(h >> 16); ihdr[6] = (uint8_t)(h >> 8); ihdr[7] = (uint8_t)h;
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 0;   // grayscale
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    png_chunk(png, "IHDR", ihdr, 13);
    png_chunk(png, "IDAT", comp.data(), comp_cap);
    png_chunk(png, "IEND", nullptr, 0);

    uint8_t* res = (uint8_t*)malloc(png.size());
    if (!res) return -3;
    memcpy(res, png.data(), png.size());
    *out = res;
    *out_len = png.size();
    return 0;
}

// ---------------------------------------------------------------------------
// BMP: decode 8bpp-palette / 24bpp / 32bpp uncompressed; encode 24bpp (the
// layout stbi_write_bmp produces for 1-channel input).
// ---------------------------------------------------------------------------

int sdfio_decode_bmp(const uint8_t* data, size_t len, uint8_t** out, int* w, int* h) {
    if (len < 54 || data[0] != 'B' || data[1] != 'M') return -1;
    uint32_t off = rd_le32(data + 10);
    uint32_t hdr_size = rd_le32(data + 14);
    if (hdr_size < 40) return -10;
    int32_t width = (int32_t)rd_le32(data + 18);
    int32_t height_raw = (int32_t)rd_le32(data + 22);
    uint16_t bpp = rd_le16(data + 28);
    uint32_t compression = rd_le32(data + 30);
    if (width <= 0 || height_raw == 0 || compression != 0) return -10;
    int flip = height_raw > 0;
    int height = height_raw > 0 ? height_raw : -height_raw;
    const uint8_t* pal = data + 14 + hdr_size;
    int nch = bpp / 8;
    if (bpp != 8 && bpp != 24 && bpp != 32) return -10;
    size_t row_bytes = (((size_t)width * bpp + 31) / 32) * 4;
    if (off + row_bytes * height > len) return -2;

    uint8_t* res = (uint8_t*)malloc((size_t)width * height * 2);
    if (!res) return -3;
    for (int y = 0; y < height; ++y) {
        int sy = flip ? height - 1 - y : y;
        const uint8_t* row = data + off + row_bytes * (size_t)sy;
        for (int x = 0; x < width; ++x) {
            uint8_t gray, alpha = 255;
            if (bpp == 8) {
                unsigned idx = row[x];
                const uint8_t* pe = pal + idx * 4;  // BGRA palette entries
                gray = stb_luminance(pe[2], pe[1], pe[0]);
            } else {
                const uint8_t* p = row + (size_t)x * nch;  // BGR(A)
                gray = stb_luminance(p[2], p[1], p[0]);
                if (bpp == 32) alpha = p[3];
            }
            res[((size_t)y * width + x) * 2] = gray;
            res[((size_t)y * width + x) * 2 + 1] = alpha;
        }
    }
    *out = res;
    *w = width;
    *h = height;
    return 0;
}

int sdfio_encode_bmp(const uint8_t* gray, int w, int h, uint8_t** out, size_t* out_len) {
    if (w <= 0 || h <= 0) return -1;
    size_t row_bytes = (((size_t)w * 24 + 31) / 32) * 4;
    size_t total = 54 + row_bytes * h;
    uint8_t* res = (uint8_t*)calloc(total, 1);
    if (!res) return -3;
    res[0] = 'B'; res[1] = 'M';
    auto le32 = [&](size_t at, uint32_t v) {
        res[at] = (uint8_t)v; res[at + 1] = (uint8_t)(v >> 8);
        res[at + 2] = (uint8_t)(v >> 16); res[at + 3] = (uint8_t)(v >> 24);
    };
    le32(2, (uint32_t)total);
    le32(10, 54);
    le32(14, 40);
    le32(18, (uint32_t)w);
    le32(22, (uint32_t)h);
    res[26] = 1;           // planes
    res[28] = 24;          // bpp
    for (int y = 0; y < h; ++y) {
        uint8_t* row = res + 54 + row_bytes * (size_t)(h - 1 - y);
        for (int x = 0; x < w; ++x) {
            uint8_t v = gray[(size_t)y * w + x];
            row[x * 3] = v; row[x * 3 + 1] = v; row[x * 3 + 2] = v;
        }
    }
    *out = res;
    *out_len = total;
    return 0;
}

// ---------------------------------------------------------------------------
// TGA: decode type 2 (truecolor) / type 3 (grayscale), bottom- or top-origin,
// uncompressed; encode type 3 grayscale top-origin.
// ---------------------------------------------------------------------------

int sdfio_decode_tga(const uint8_t* data, size_t len, uint8_t** out, int* w, int* h) {
    if (len < 18) return -1;
    uint8_t id_len = data[0], cmap_type = data[1], img_type = data[2];
    if (cmap_type != 0) return -10;
    if (img_type != 2 && img_type != 3) return -10;
    int width = rd_le16(data + 12), height = rd_le16(data + 14);
    int bpp = data[16];
    int top_origin = (data[17] >> 5) & 1;
    if (width <= 0 || height <= 0) return -1;
    int nch;
    if (img_type == 3 && bpp == 8) nch = 1;
    else if (img_type == 2 && bpp == 24) nch = 3;
    else if (img_type == 2 && bpp == 32) nch = 4;
    else return -10;
    size_t need = 18 + (size_t)id_len + (size_t)width * height * nch;
    if (len < need) return -2;
    const uint8_t* px = data + 18 + id_len;

    uint8_t* res = (uint8_t*)malloc((size_t)width * height * 2);
    if (!res) return -3;
    for (int y = 0; y < height; ++y) {
        int sy = top_origin ? y : height - 1 - y;
        for (int x = 0; x < width; ++x) {
            const uint8_t* p = px + ((size_t)sy * width + x) * nch;  // BGR(A)
            uint8_t gray, alpha = 255;
            if (nch == 1) gray = p[0];
            else {
                gray = stb_luminance(p[2], p[1], p[0]);
                if (nch == 4) alpha = p[3];
            }
            res[((size_t)y * width + x) * 2] = gray;
            res[((size_t)y * width + x) * 2 + 1] = alpha;
        }
    }
    *out = res;
    *w = width;
    *h = height;
    return 0;
}

int sdfio_encode_tga(const uint8_t* gray, int w, int h, uint8_t** out, size_t* out_len) {
    if (w <= 0 || h <= 0) return -1;
    size_t total = 18 + (size_t)w * h;
    uint8_t* res = (uint8_t*)calloc(total, 1);
    if (!res) return -3;
    res[2] = 3;                       // grayscale, uncompressed
    res[12] = (uint8_t)w; res[13] = (uint8_t)(w >> 8);
    res[14] = (uint8_t)h; res[15] = (uint8_t)(h >> 8);
    res[16] = 8;                      // bpp
    res[17] = 0x20;                   // top-left origin
    memcpy(res + 18, gray, (size_t)w * h);
    *out = res;
    *out_len = total;
    return 0;
}

// ---------------------------------------------------------------------------
// PNM decode: P2/P5 (PGM ascii/raw) and P3/P6 (PPM), maxval <= 255.
// stb_image reads PNM (openmp/sdfgen.c inherits it via stbi_load).
// ---------------------------------------------------------------------------

static int pnm_token(const uint8_t* d, size_t len, size_t* pos, long* out) {
    // skip whitespace and '#' comments, then parse a decimal integer
    while (*pos < len) {
        uint8_t c = d[*pos];
        if (c == '#') {
            while (*pos < len && d[*pos] != '\n') ++*pos;
        } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
            ++*pos;
        } else {
            break;
        }
    }
    if (*pos >= len || d[*pos] < '0' || d[*pos] > '9') return -1;
    long v = 0;
    while (*pos < len && d[*pos] >= '0' && d[*pos] <= '9') {
        v = v * 10 + (d[*pos] - '0');
        if (v > 1 << 30) return -1;
        ++*pos;
    }
    *out = v;
    return 0;
}

int sdfio_decode_pnm(const uint8_t* data, size_t len, uint8_t** out, int* w, int* h) {
    if (len < 2 || data[0] != 'P') return -1;
    int kind = data[1];
    if (kind != '2' && kind != '3' && kind != '5' && kind != '6') return -10;
    int nch = (kind == '3' || kind == '6') ? 3 : 1;
    int raw = (kind == '5' || kind == '6');
    size_t pos = 2;
    long width, height, maxval;
    if (pnm_token(data, len, &pos, &width) || pnm_token(data, len, &pos, &height) ||
        pnm_token(data, len, &pos, &maxval))
        return -2;
    if (width <= 0 || height <= 0 || maxval <= 0 || maxval > 255) return -10;
    size_t n = (size_t)width * height;
    std::vector<uint8_t> px(n * nch);
    if (raw) {
        ++pos;  // single whitespace byte after maxval
        if (pos + n * nch > len) return -2;
        memcpy(px.data(), data + pos, n * nch);
    } else {
        for (size_t i = 0; i < n * (size_t)nch; ++i) {
            long v;
            if (pnm_token(data, len, &pos, &v) || v > maxval) return -2;
            px[i] = (uint8_t)v;
        }
    }
    uint8_t* res = (uint8_t*)malloc(n * 2);
    if (!res) return -3;
    for (size_t i = 0; i < n; ++i) {
        uint8_t g = nch == 1 ? px[i]
                             : stb_luminance(px[i * 3], px[i * 3 + 1], px[i * 3 + 2]);
        if (maxval != 255) g = (uint8_t)((unsigned)g * 255u / (unsigned)maxval);
        res[i * 2] = g;
        res[i * 2 + 1] = 255;
    }
    *out = res;
    *w = (int)width;
    *h = (int)height;
    return 0;
}

// ---------------------------------------------------------------------------
// Baseline JPEG encode: 8-bit grayscale, quality 1..100 via the IJG
// scaling the reference's stbi_write_jpg uses (openmp/sdfgen.c:327-333).
// Annex-K luminance quantization + Huffman tables, plain float FDCT.
// ---------------------------------------------------------------------------

static const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

static const uint8_t kQBase[64] = {  // Annex K table K.1, natural order
    16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,  58,  60,  55,
    14, 13, 16, 24, 40,  57,  69,  56,  14, 17, 22, 29, 51,  87,  80,  62,
    18, 22, 37, 56, 68,  109, 103, 77,  24, 35, 55, 64, 81,  104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};

static const uint8_t kDcBits[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
static const uint8_t kDcVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
static const uint8_t kAcBits[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d};
static const uint8_t kAcVals[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

struct HuffCode {
    uint16_t code[256];
    uint8_t len[256];
};

static void build_huff(const uint8_t bits[17], const uint8_t* vals, int nvals, HuffCode* hc) {
    memset(hc->len, 0, sizeof(hc->len));
    uint16_t code = 0;
    int k = 0;
    for (int l = 1; l <= 16; ++l) {
        for (int i = 0; i < bits[l] && k < nvals; ++i, ++k) {
            hc->code[vals[k]] = code++;
            hc->len[vals[k]] = (uint8_t)l;
        }
        code <<= 1;
    }
}

struct BitWriter {
    std::vector<uint8_t>& out;
    uint32_t acc = 0;
    int nbits = 0;
    explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}
    void put(uint32_t code, int len) {
        acc = (acc << len) | (code & ((1u << len) - 1));
        nbits += len;
        while (nbits >= 8) {
            uint8_t b = (uint8_t)(acc >> (nbits - 8));
            out.push_back(b);
            if (b == 0xff) out.push_back(0x00);  // byte stuffing
            nbits -= 8;
        }
    }
    void flush() {
        if (nbits > 0) put(0x7f, 8 - nbits);  // pad with 1s
    }
};

static int bit_size(int v) {
    int a = v < 0 ? -v : v, n = 0;
    while (a) {
        a >>= 1;
        ++n;
    }
    return n;
}

struct DctTab {
    float cs[8][8];
    DctTab() {
        for (int u = 0; u < 8; ++u)
            for (int x = 0; x < 8; ++x)
                cs[u][x] = (float)(cos((2 * x + 1) * u * 3.14159265358979323846 / 16.0) *
                                   (u == 0 ? 0.353553390593273762 : 0.5));  // C(u)/2
    }
};

static void fdct8x8(float blk[64]) {
    // separable direct DCT-II with JPEG normalization: rows then columns
    static const DctTab tab;  // magic static: thread-safe init
    const auto& cs = tab.cs;
    float tmp[64];
    for (int y = 0; y < 8; ++y)
        for (int u = 0; u < 8; ++u) {
            float s = 0;
            for (int x = 0; x < 8; ++x) s += blk[y * 8 + x] * cs[u][x];
            tmp[y * 8 + u] = s;
        }
    for (int u = 0; u < 8; ++u)
        for (int v = 0; v < 8; ++v) {
            float s = 0;
            for (int y = 0; y < 8; ++y) s += tmp[y * 8 + u] * cs[v][y];
            blk[v * 8 + u] = s;
        }
}

static void wr_marker(std::vector<uint8_t>& o, uint8_t m, const uint8_t* d, size_t len) {
    o.push_back(0xff);
    o.push_back(m);
    o.push_back((uint8_t)((len + 2) >> 8));
    o.push_back((uint8_t)(len + 2));
    o.insert(o.end(), d, d + len);
}

int sdfio_encode_jpg(const uint8_t* gray, int w, int h, int quality, uint8_t** out,
                     size_t* out_len) {
    if (w <= 0 || h <= 0) return -1;
    if (quality < 1) quality = 1;
    if (quality > 100) quality = 100;
    int scale = quality < 50 ? 5000 / quality : 200 - quality * 2;  // IJG/stb
    uint8_t qtab[64];
    for (int i = 0; i < 64; ++i) {
        int q = (kQBase[i] * scale + 50) / 100;
        qtab[i] = (uint8_t)(q < 1 ? 1 : (q > 255 ? 255 : q));
    }

    HuffCode dc, ac;
    build_huff(kDcBits, kDcVals, 12, &dc);
    build_huff(kAcBits, kAcVals, 162, &ac);

    std::vector<uint8_t> o;
    o.push_back(0xff);
    o.push_back(0xd8);  // SOI
    static const uint8_t jfif[] = {'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0};
    wr_marker(o, 0xe0, jfif, sizeof(jfif));
    uint8_t dqt[65];
    dqt[0] = 0;  // 8-bit, table 0
    for (int i = 0; i < 64; ++i) dqt[1 + i] = qtab[kZigzag[i]];  // zigzag order
    wr_marker(o, 0xdb, dqt, 65);
    uint8_t sof[] = {8, (uint8_t)(h >> 8), (uint8_t)h, (uint8_t)(w >> 8), (uint8_t)w,
                     1, 1, 0x11, 0};
    wr_marker(o, 0xc0, sof, sizeof(sof));
    {
        std::vector<uint8_t> dht;
        dht.push_back(0x00);  // DC table 0
        dht.insert(dht.end(), kDcBits + 1, kDcBits + 17);
        dht.insert(dht.end(), kDcVals, kDcVals + 12);
        dht.push_back(0x10);  // AC table 0
        dht.insert(dht.end(), kAcBits + 1, kAcBits + 17);
        dht.insert(dht.end(), kAcVals, kAcVals + 162);
        wr_marker(o, 0xc4, dht.data(), dht.size());
    }
    static const uint8_t sos[] = {1, 1, 0x00, 0, 63, 0};
    wr_marker(o, 0xda, sos, sizeof(sos));

    BitWriter bw(o);
    int prev_dc = 0;
    for (int by = 0; by < h; by += 8) {
        for (int bx = 0; bx < w; bx += 8) {
            float blk[64];
            for (int y = 0; y < 8; ++y) {
                int sy = by + y < h ? by + y : h - 1;  // edge replication
                for (int x = 0; x < 8; ++x) {
                    int sx = bx + x < w ? bx + x : w - 1;
                    blk[y * 8 + x] = (float)gray[(size_t)sy * w + sx] - 128.0f;
                }
            }
            fdct8x8(blk);
            int q[64];
            for (int i = 0; i < 64; ++i) {
                float v = blk[kZigzag[i]] / (float)qtab[kZigzag[i]];
                q[i] = (int)(v < 0 ? v - 0.5f : v + 0.5f);
            }
            // DC
            int diff = q[0] - prev_dc;
            prev_dc = q[0];
            int sz = bit_size(diff);
            bw.put(dc.code[sz], dc.len[sz]);
            if (sz) bw.put((uint32_t)(diff < 0 ? diff + (1 << sz) - 1 : diff), sz);
            // AC: run-length of zeros, ZRL for 16, EOB
            int last = 63;
            while (last > 0 && q[last] == 0) --last;
            int run = 0;
            for (int i = 1; i <= last; ++i) {
                if (q[i] == 0) {
                    ++run;
                    continue;
                }
                while (run >= 16) {
                    bw.put(ac.code[0xf0], ac.len[0xf0]);
                    run -= 16;
                }
                int s = bit_size(q[i]);
                int sym = (run << 4) | s;
                bw.put(ac.code[sym], ac.len[sym]);
                bw.put((uint32_t)(q[i] < 0 ? q[i] + (1 << s) - 1 : q[i]), s);
                run = 0;
            }
            if (last < 63) bw.put(ac.code[0x00], ac.len[0x00]);  // EOB
        }
    }
    bw.flush();
    o.push_back(0xff);
    o.push_back(0xd9);  // EOI

    uint8_t* res = (uint8_t*)malloc(o.size());
    if (!res) return -3;
    memcpy(res, o.data(), o.size());
    *out = res;
    *out_len = o.size();
    return 0;
}

}  // extern "C"
