// cvad_tpu native host-decode core.
//
// TPU-native replacement for the reference's per-frame cv2.imread/PIL decode
// hot loop (the input bottleneck: causal_anomaly_detection.py:91-92,
// minicausal_vad_complete3.py:199-207, avenue_training_script_bbox.py:397-411).
// Decodes PGM(P5)/PPM(P6)/BMP(24/8-bit uncompressed) frames, bilinear-resizes
// with half-pixel centers (cv2.INTER_LINEAR semantics), normalizes to [0,1]
// float32 HWC, and assembles whole clips with a thread pool — one C call per
// clip instead of T Python round-trips.
//
// Build: `make -C native` -> libcvaddecode.so, loaded via ctypes
// (cvad_tpu/data/native_decoder.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

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

bool decode_any(const char* path, Image& img) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  if (decode_pnm(buf, img)) return true;
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
