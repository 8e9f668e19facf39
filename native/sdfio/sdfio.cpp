// sdfio — native image codec for chaq_sdfgen_tpu (C ABI, ctypes-bound).
//
// TPU-native counterpart of the reference's vendored stb_image /
// stb_image_write layer (reference .gitmodules:1-3, openmp/sdfgen.c:17-20):
// the host-side runtime component stays native C++ while the compute path
// is JAX/Pallas. Implements the formats the reference emits natively:
// PNG (via zlib), BMP, TGA; decode converts to the same 2-channel
// gray+alpha buffer stbi_load(..., 2) produces, including stb's integer
// luminance ((r*77 + g*150 + 29*b) >> 8). JPEG and exotic PNG variants
// return "unsupported" and the Python layer falls back to PIL.
//
// All entry points return 0 on success, negative on failure; buffers are
// allocated with malloc and released by sdfio_free.

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

}  // extern "C"
