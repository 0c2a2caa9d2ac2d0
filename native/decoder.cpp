// cvad_tpu native host-decode core.
//
// TPU-native replacement for the reference's per-frame cv2.imread/PIL decode
// hot loop (the input bottleneck: causal_anomaly_detection.py:91-92,
// minicausal_vad_complete3.py:199-207, avenue_training_script_bbox.py:397-411).
// Decodes the real dataset formats — TIFF (UCSD Ped2 ships .tif frames,
// minicausal_vad_complete3.py:141-143; uncompressed/LZW/PackBits, both
// endians, hand-rolled reader), JPEG (Avenue frames,
// avenue_training_script_bbox.py:391; via libjpeg), PNG (via libpng) — plus
// PGM(P5)/PPM(P6)/BMP(24/8-bit uncompressed), then bilinear-resizes with
// half-pixel centers (cv2.INTER_LINEAR semantics), normalizes to [0,1]
// float32 HWC, and assembles whole clips with a thread pool — one C call per
// clip instead of T Python round-trips.
//
// Build: `make -C native` -> libcvaddecode.so, loaded via ctypes
// (cvad_tpu/data/native_decoder.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#if __has_include(<jpeglib.h>)
#define CVAD_HAVE_JPEG 1
#include <jpeglib.h>
#endif
#if __has_include(<png.h>)
#define CVAD_HAVE_PNG 1
#include <png.h>
#endif

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) { std::fclose(f); return false; }
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

// ---- PNM (P5 grayscale / P6 rgb, 8-bit maxval) -----------------------------

bool skip_pnm_ws(const std::vector<uint8_t>& b, size_t& i) {
  while (i < b.size()) {
    if (b[i] == '#') { while (i < b.size() && b[i] != '\n') ++i; }
    else if (std::isspace(b[i])) ++i;
    else return true;
  }
  return false;
}

long pnm_int(const std::vector<uint8_t>& b, size_t& i) {
  if (!skip_pnm_ws(b, i)) return -1;
  long v = 0; bool any = false;
  while (i < b.size() && std::isdigit(b[i])) { v = v * 10 + (b[i] - '0'); ++i; any = true; }
  return any ? v : -1;
}

bool decode_pnm(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 2 || buf[0] != 'P') return false;
  int type = buf[1] - '0';
  if (type != 5 && type != 6) return false;
  size_t i = 2;
  long w = pnm_int(buf, i), h = pnm_int(buf, i), maxval = pnm_int(buf, i);
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return false;
  ++i;  // single whitespace after maxval
  int c = (type == 5) ? 1 : 3;
  size_t need = static_cast<size_t>(w) * h * c;
  if (buf.size() < i + need) return false;
  img.h = static_cast<int>(h); img.w = static_cast<int>(w); img.c = c;
  img.data.assign(buf.begin() + i, buf.begin() + i + need);
  return true;
}

// ---- BMP (BITMAPINFOHEADER, 8-bit palette or 24/32-bit, uncompressed) ------

uint32_t le32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t le16(const uint8_t* p) { return p[0] | (p[1] << 8); }

bool decode_bmp(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 54 || buf[0] != 'B' || buf[1] != 'M') return false;
  uint32_t data_off = le32(&buf[10]);
  uint32_t hdr = le32(&buf[14]);
  if (hdr < 40) return false;
  int32_t w = static_cast<int32_t>(le32(&buf[18]));
  int32_t h = static_cast<int32_t>(le32(&buf[22]));
  uint16_t bpp = le16(&buf[28]);
  uint32_t comp = le32(&buf[30]);
  if (comp != 0 || w <= 0 || h == 0) return false;
  bool flip = h > 0;
  int ah = std::abs(h);
  const uint8_t* pal = buf.data() + 14 + hdr;

  if (bpp == 8) {
    img.h = ah; img.w = w; img.c = 1;
    img.data.resize(static_cast<size_t>(ah) * w);
    size_t stride = (w + 3) & ~3u;
    for (int y = 0; y < ah; ++y) {
      const uint8_t* row = buf.data() + data_off + static_cast<size_t>(flip ? ah - 1 - y : y) * stride;
      if (row + w > buf.data() + buf.size()) return false;
      for (int x = 0; x < w; ++x) {
        const uint8_t* e = pal + 4 * row[x];  // BGRA palette entry -> gray
        img.data[static_cast<size_t>(y) * w + x] =
            static_cast<uint8_t>((e[0] + e[1] + e[2]) / 3);
      }
    }
    return true;
  }
  if (bpp == 24 || bpp == 32) {
    int sc = bpp / 8;
    img.h = ah; img.w = w; img.c = 3;
    img.data.resize(static_cast<size_t>(ah) * w * 3);
    size_t stride = (static_cast<size_t>(w) * sc + 3) & ~3u;
    for (int y = 0; y < ah; ++y) {
      const uint8_t* row = buf.data() + data_off + static_cast<size_t>(flip ? ah - 1 - y : y) * stride;
      if (row + static_cast<size_t>(w) * sc > buf.data() + buf.size()) return false;
      for (int x = 0; x < w; ++x) {
        uint8_t* d = &img.data[(static_cast<size_t>(y) * w + x) * 3];
        d[0] = row[x * sc + 2]; d[1] = row[x * sc + 1]; d[2] = row[x * sc + 0];
      }
    }
    return true;
  }
  return false;
}

// ---- TIFF (hand-rolled: no system tiffio.h) --------------------------------
//
// Baseline 8-bit grayscale/RGB, strip-organized, compressions: 1 (none),
// 5 (LZW, MSB-first codes with early change, optional horizontal predictor),
// 32773 (PackBits).  Covers what UCSD Ped2's .tif frames and PIL's TIFF
// writer produce.

struct TiffReader {
  const uint8_t* p;
  size_t n;
  bool big;  // big-endian ("MM")

  uint16_t u16(size_t off) const {
    if (off + 2 > n) return 0;
    return big ? (p[off] << 8) | p[off + 1] : p[off] | (p[off + 1] << 8);
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > n) return 0;
    return big ? (uint32_t(p[off]) << 24) | (p[off + 1] << 16) | (p[off + 2] << 8) | p[off + 3]
               : p[off] | (p[off + 1] << 8) | (p[off + 2] << 16) | (uint32_t(p[off + 3]) << 24);
  }
};

// One IFD entry's value as a vector of uint32 (SHORT or LONG arrays).
bool tiff_values(const TiffReader& t, size_t entry, std::vector<uint32_t>& out) {
  uint16_t type = t.u16(entry + 2);
  uint32_t count = t.u32(entry + 4);
  size_t esize = (type == 3) ? 2 : (type == 4) ? 4 : 0;
  if (esize == 0 || count == 0 || count > (1u << 24)) return false;
  size_t off = (esize * count <= 4) ? entry + 8 : t.u32(entry + 8);
  if (off + esize * count > t.n) return false;
  out.resize(count);
  for (uint32_t i = 0; i < count; ++i)
    out[i] = (esize == 2) ? t.u16(off + 2 * i) : t.u32(off + 4 * i);
  return true;
}

bool lzw_decode(const uint8_t* src, size_t n, std::vector<uint8_t>& dst,
                size_t expect) {
  // TIFF-variant LZW: MSB-first bit order, Clear=256, EOI=257, early change.
  struct Entry { int prev; uint8_t byte; int len; };
  std::vector<Entry> table(4096);
  auto reset = [&]() {
    for (int i = 0; i < 256; ++i) table[i] = {-1, static_cast<uint8_t>(i), 1};
  };
  reset();
  int next_code = 258, bits = 9;
  size_t bitpos = 0;
  int prev = -1;
  dst.clear();
  dst.reserve(expect);
  std::vector<uint8_t> scratch;
  auto emit = [&](int code) {
    scratch.clear();
    for (int c = code; c >= 0; c = table[c].prev) scratch.push_back(table[c].byte);
    dst.insert(dst.end(), scratch.rbegin(), scratch.rend());
  };
  auto first_byte = [&](int code) {
    while (table[code].prev >= 0) code = table[code].prev;
    return table[code].byte;
  };
  while (bitpos + bits <= n * 8 && dst.size() < expect) {
    // 32-bit window read (MSB-first): the code's bits live in at most 3 bytes
    size_t byte = bitpos >> 3;
    uint32_t window = uint32_t(src[byte]) << 24;
    if (byte + 1 < n) window |= uint32_t(src[byte + 1]) << 16;
    if (byte + 2 < n) window |= uint32_t(src[byte + 2]) << 8;
    uint32_t code = (window >> (32 - bits - (bitpos & 7))) & ((1u << bits) - 1);
    bitpos += bits;
    if (code == 257) break;  // EOI
    if (code == 256) {       // Clear
      reset();
      next_code = 258;
      bits = 9;
      prev = -1;
      continue;
    }
    if (prev < 0) {
      if (code > 255) return false;
      emit(code);
      prev = static_cast<int>(code);
    } else {
      if (static_cast<int>(code) < next_code) {
        emit(code);
        table[next_code] = {prev, first_byte(code),
                            table[prev].len + 1};
      } else if (static_cast<int>(code) == next_code) {
        // KwKwK case: emit prev + first byte of prev
        table[next_code] = {prev, first_byte(prev), table[prev].len + 1};
        emit(next_code);
      } else {
        return false;
      }
      ++next_code;
      prev = static_cast<int>(code);
    }
    // early change: widen one code BEFORE the table is actually full
    if (next_code == (1 << bits) - 1 && bits < 12) ++bits;
  }
  return dst.size() >= expect;
}

bool packbits_decode(const uint8_t* src, size_t n, std::vector<uint8_t>& dst,
                     size_t expect) {
  dst.clear();
  dst.reserve(expect);
  size_t i = 0;
  while (i < n && dst.size() < expect) {
    int8_t h = static_cast<int8_t>(src[i++]);
    if (h >= 0) {
      size_t cnt = static_cast<size_t>(h) + 1;
      if (i + cnt > n) return false;
      dst.insert(dst.end(), src + i, src + i + cnt);
      i += cnt;
    } else if (h != -128) {
      if (i >= n) return false;
      dst.insert(dst.end(), static_cast<size_t>(1 - h), src[i++]);
    }
  }
  return dst.size() >= expect;
}

bool decode_tiff(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 8) return false;
  bool big;
  if (buf[0] == 'I' && buf[1] == 'I') big = false;
  else if (buf[0] == 'M' && buf[1] == 'M') big = true;
  else return false;
  TiffReader t{buf.data(), buf.size(), big};
  if (t.u16(2) != 42) return false;
  size_t ifd = t.u32(4);
  if (ifd + 2 > t.n) return false;
  uint16_t nent = t.u16(ifd);

  uint32_t w = 0, h = 0, comp = 1, spp = 1, rows_per_strip = 0xFFFFFFFF;
  uint32_t predictor = 1, photometric = 1, planar = 1;
  std::vector<uint32_t> bits, strip_offs, strip_counts;
  for (uint16_t e = 0; e < nent; ++e) {
    size_t entry = ifd + 2 + 12 * size_t(e);
    uint16_t tag = t.u16(entry);
    std::vector<uint32_t> v;
    switch (tag) {
      case 256: if (tiff_values(t, entry, v)) w = v[0]; break;
      case 257: if (tiff_values(t, entry, v)) h = v[0]; break;
      case 258: tiff_values(t, entry, bits); break;
      case 259: if (tiff_values(t, entry, v)) comp = v[0]; break;
      case 262: if (tiff_values(t, entry, v)) photometric = v[0]; break;
      case 273: tiff_values(t, entry, strip_offs); break;
      case 277: if (tiff_values(t, entry, v)) spp = v[0]; break;
      case 278: if (tiff_values(t, entry, v)) rows_per_strip = v[0]; break;
      case 279: tiff_values(t, entry, strip_counts); break;
      case 284: if (tiff_values(t, entry, v)) planar = v[0]; break;
      case 317: if (tiff_values(t, entry, v)) predictor = v[0]; break;
      default: break;
    }
  }
  if (w == 0 || h == 0 || strip_offs.empty()) return false;
  if (planar != 1) return false;           // chunky only
  if (spp != 1 && spp != 3 && spp != 4) return false;
  for (uint32_t b : bits) if (b != 8) return false;  // 8-bit samples only
  if (comp != 1 && comp != 5 && comp != 32773) return false;
  if (strip_counts.size() < strip_offs.size()) {
    if (comp != 1 || strip_offs.size() != 1) return false;
    strip_counts.assign(1, w * h * spp);   // tolerate missing byte counts
  }

  size_t row_bytes = size_t(w) * spp;
  std::vector<uint8_t> raster;
  raster.reserve(size_t(h) * row_bytes);
  uint32_t rps = std::min<uint32_t>(rows_per_strip, h);
  for (size_t s = 0; s < strip_offs.size(); ++s) {
    uint32_t rows = std::min<uint32_t>(rps, h - uint32_t(s) * rps);
    size_t expect = size_t(rows) * row_bytes;
    size_t off = strip_offs[s], cnt = strip_counts[s];
    if (off + cnt > buf.size()) return false;
    std::vector<uint8_t> strip;
    if (comp == 1) {
      if (cnt < expect) return false;
      strip.assign(buf.begin() + off, buf.begin() + off + expect);
    } else if (comp == 5) {
      if (!lzw_decode(buf.data() + off, cnt, strip, expect)) return false;
    } else {
      if (!packbits_decode(buf.data() + off, cnt, strip, expect)) return false;
    }
    strip.resize(expect);
    if (predictor == 2) {  // horizontal differencing
      for (uint32_t r = 0; r < rows; ++r) {
        uint8_t* row = strip.data() + size_t(r) * row_bytes;
        for (size_t x = spp; x < row_bytes; ++x) row[x] += row[x - spp];
      }
    }
    raster.insert(raster.end(), strip.begin(), strip.end());
  }
  if (raster.size() < size_t(h) * row_bytes) return false;

  int out_c = (spp == 1) ? 1 : 3;
  img.h = int(h); img.w = int(w); img.c = out_c;
  if (int(spp) == out_c && photometric != 0) {
    img.data = std::move(raster);
    img.data.resize(size_t(h) * row_bytes);
  } else {
    img.data.resize(size_t(h) * w * out_c);
    for (size_t i = 0; i < size_t(h) * w; ++i) {
      const uint8_t* srcp = &raster[i * spp];
      uint8_t* d = &img.data[i * out_c];
      for (int ch = 0; ch < out_c; ++ch) {
        uint8_t v = srcp[ch < int(spp) ? ch : 0];
        d[ch] = (photometric == 0) ? uint8_t(255 - v) : v;  // WhiteIsZero
      }
    }
  }
  return true;
}

// ---- JPEG (libjpeg) ---------------------------------------------------------

#ifdef CVAD_HAVE_JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 3 || buf[0] != 0xFF || buf[1] != 0xD8) return false;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf.data()),
               static_cast<unsigned long>(buf.size()));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = (cinfo.num_components == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.h = cinfo.output_height;
  img.w = cinfo.output_width;
  img.c = cinfo.output_components;
  img.data.resize(size_t(img.h) * img.w * img.c);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = img.data.data() + size_t(cinfo.output_scanline) * img.w * img.c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}
#endif

// ---- PNG (libpng) -----------------------------------------------------------

#ifdef CVAD_HAVE_PNG
struct PngSrc {
  const uint8_t* p;
  size_t n, pos;
};

void png_read_cb(png_structp png, png_bytep out, png_size_t count) {
  auto* s = static_cast<PngSrc*>(png_get_io_ptr(png));
  if (s->pos + count > s->n) png_error(png, "eof");
  std::memcpy(out, s->p + s->pos, count);
  s->pos += count;
}

bool decode_png(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 8 || png_sig_cmp(buf.data(), 0, 8) != 0) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngSrc src{buf.data(), buf.size(), 0};
  png_set_read_fn(png, &src, png_read_cb);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_packing(png);
  int ctype = png_get_color_type(png, info);
  if (ctype == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ctype == PNG_COLOR_TYPE_GRAY && png_get_bit_depth(png, info) < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  img.h = png_get_image_height(png, info);
  img.w = png_get_image_width(png, info);
  img.c = png_get_channels(png, info);
  if (img.c != 1 && img.c != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  img.data.resize(size_t(img.h) * img.w * img.c);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.data.data() + size_t(y) * img.w * img.c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}
#endif

bool decode_any(const char* path, Image& img) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  if (decode_pnm(buf, img)) return true;
  if (decode_tiff(buf, img)) return true;
#ifdef CVAD_HAVE_JPEG
  if (decode_jpeg(buf, img)) return true;
#endif
#ifdef CVAD_HAVE_PNG
  if (decode_png(buf, img)) return true;
#endif
  return decode_bmp(buf, img);
}

// ---- resize + normalize ----------------------------------------------------

void resize_normalize(const Image& img, float* out, int oh, int ow, int oc) {
  // precompute x interpolation (shared across rows)
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  for (int x = 0; x < ow; ++x) {
    float sx = (x + 0.5f) * img.w / ow - 0.5f;
    int xi = static_cast<int>(std::floor(sx));
    x0[x] = std::clamp(xi, 0, img.w - 1);
    x1[x] = std::clamp(xi + 1, 0, img.w - 1);
    wx[x] = std::clamp(sx - xi, 0.0f, 1.0f);
  }
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < oh; ++y) {
    float sy = (y + 0.5f) * img.h / oh - 0.5f;
    int yi = static_cast<int>(std::floor(sy));
    int y0 = std::clamp(yi, 0, img.h - 1);
    int y1 = std::clamp(yi + 1, 0, img.h - 1);
    float fy = std::clamp(sy - yi, 0.0f, 1.0f);
    const uint8_t* r0 = &img.data[static_cast<size_t>(y0) * img.w * img.c];
    const uint8_t* r1 = &img.data[static_cast<size_t>(y1) * img.w * img.c];
    float* orow = out + static_cast<size_t>(y) * ow * oc;
    for (int x = 0; x < ow; ++x) {
      float fx = wx[x];
      for (int ch = 0; ch < oc; ++ch) {
        // channel mapping: replicate gray->rgb, average rgb->gray
        float tl, tr, bl, br;
        if (img.c == oc || (img.c == 1)) {
          int sc = (img.c == 1) ? 0 : ch;
          tl = r0[x0[x] * img.c + sc]; tr = r0[x1[x] * img.c + sc];
          bl = r1[x0[x] * img.c + sc]; br = r1[x1[x] * img.c + sc];
        } else {  // rgb -> gray
          auto g = [&](const uint8_t* r, int xx) {
            const uint8_t* p = r + xx * img.c;
            return (p[0] + p[1] + p[2]) / 3.0f;
          };
          tl = g(r0, x0[x]); tr = g(r0, x1[x]);
          bl = g(r1, x0[x]); br = g(r1, x1[x]);
        }
        float top = tl + (tr - tl) * fx;
        float bot = bl + (br - bl) * fx;
        orow[x * oc + ch] = (top + (bot - top) * fy) * inv255;
      }
    }
  }
}

}  // namespace

extern "C" {

// Bitmask of optional codecs compiled in: 1 = JPEG, 2 = PNG (TIFF/PNM/BMP are
// always available).  Lets the Python dispatch gate match the binary.
int cvad_codecs(void) {
  int m = 0;
#ifdef CVAD_HAVE_JPEG
  m |= 1;
#endif
#ifdef CVAD_HAVE_PNG
  m |= 2;
#endif
  return m;
}

// Decode one frame into out (oh*ow*oc float32, [0,1]).  Returns 0 on success.
int cvad_decode_frame(const char* path, float* out, int oh, int ow, int oc) {
  Image img;
  if (!decode_any(path, img)) return 1;
  resize_normalize(img, out, oh, ow, oc);
  return 0;
}

// Probe image dimensions without full decode. Returns 0 on success.
int cvad_probe(const char* path, int* h, int* w, int* c) {
  Image img;
  if (!decode_any(path, img)) return 1;
  *h = img.h; *w = img.w; *c = img.c;
  return 0;
}

// Decode a whole clip (n frame paths) into out (n*oh*ow*oc), parallelized
// over frames.  Failed frames are zero-filled (the reference's decode
// fallback).  Returns the number of failed frames.
int cvad_decode_clip(const char** paths, int n, float* out, int oh, int ow,
                     int oc, int nthreads) {
  std::atomic<int> failures{0};
  size_t frame_elems = static_cast<size_t>(oh) * ow * oc;
  int workers = std::max(1, std::min(nthreads, n));
  std::atomic<int> next{0};
  auto work = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* dst = out + frame_elems * i;
      if (cvad_decode_frame(paths[i], dst, oh, ow, oc) != 0) {
        std::memset(dst, 0, frame_elems * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };
  if (workers == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < workers; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

}  // extern "C"
