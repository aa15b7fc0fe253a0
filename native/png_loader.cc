// Native grayscale PNG decoder for the EuRoC replay path.
//
// The reference receives images via ROS/cv_bridge (rosbag replay); our
// dataset loader decodes EuRoC's 8-bit grayscale PNGs directly.  Python's
// pure-Python fallback (vins_tpu/io/png.py) is ~20x slower per frame, which
// matters at 20 Hz x multiple parallel sequence replays — so the hot decode
// loop (zlib inflate + per-scanline unfiltering + gray conversion) lives
// here.  Exposed via a C ABI consumed with ctypes (no pybind11 in this
// environment).
//
// Supports color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA) at bit
// depth 8, and bit depth 16 for gray (downshifted) — everything EuRoC and
// common robotics datasets emit.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
};

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline uint8_t paeth(int a, int b, int c) {
  int pp = a + b - c;
  int pa = std::abs(pp - a), pb = std::abs(pp - b), pc = std::abs(pp - c);
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

struct PngInfo {
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0;
  std::vector<uint8_t> idat;
  bool valid = false;
};

bool parse(const uint8_t* buf, size_t len, PngInfo* info) {
  if (len < 8 || memcmp(buf, kSig, 8) != 0) return false;
  Reader r{buf, len, 8};
  while (r.ok && r.off + 8 <= len) {
    uint32_t chunk_len = r.u32();
    if (r.off + 4 > len) return false;
    char type[5] = {0};
    memcpy(type, buf + r.off, 4);
    r.off += 4;
    if (r.off + chunk_len + 4 > len) return false;
    if (strcmp(type, "IHDR") == 0) {
      if (chunk_len < 13) return false;
      Reader h{buf, len, r.off};
      info->w = h.u32();
      info->h = h.u32();
      info->bit_depth = buf[r.off + 8];
      info->color_type = buf[r.off + 9];
      int interlace = buf[r.off + 12];
      if (interlace != 0) return false;  // Adam7 not needed for datasets
    } else if (strcmp(type, "IDAT") == 0) {
      info->idat.insert(info->idat.end(), buf + r.off, buf + r.off + chunk_len);
    } else if (strcmp(type, "IEND") == 0) {
      break;
    }
    r.off += chunk_len + 4;  // skip data + CRC
  }
  info->valid = info->w > 0 && info->h > 0 && !info->idat.empty();
  return info->valid;
}

int channels_of(int color_type) {
  switch (color_type) {
    case 0: return 1;
    case 2: return 3;
    case 4: return 2;
    case 6: return 4;
    default: return 0;
  }
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = uInt(in.size());
  zs.next_out = out->data();
  zs.avail_out = uInt(out->size());
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0);
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = fopen(path, "rb");
  if (!f) return buf;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize(size_t(sz));
  if (fread(buf.data(), 1, size_t(sz), f) != size_t(sz)) buf.clear();
  fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills *w, *h.
int vins_png_size(const char* path, int* w, int* h) {
  std::vector<uint8_t> buf = read_file(path);
  PngInfo info;
  if (buf.empty() || !parse(buf.data(), buf.size(), &info)) return -1;
  *w = int(info.w);
  *h = int(info.h);
  return 0;
}

// Decodes into caller-allocated out[w*h] (uint8 grayscale).  Returns 0 on
// success, negative error codes otherwise.
int vins_png_decode_gray(const char* path, uint8_t* out, int w, int h) {
  std::vector<uint8_t> buf = read_file(path);
  PngInfo info;
  if (buf.empty() || !parse(buf.data(), buf.size(), &info)) return -1;
  if (int(info.w) != w || int(info.h) != h) return -2;
  int ch = channels_of(info.color_type);
  if (ch == 0) return -3;
  if (info.bit_depth != 8 && !(info.bit_depth == 16 && ch == 1)) return -4;

  int bytes_per_px = ch * info.bit_depth / 8;
  size_t stride = size_t(w) * bytes_per_px;
  std::vector<uint8_t> raw((stride + 1) * size_t(h));
  if (!inflate_all(info.idat, &raw)) return -5;

  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = row[0];
    const uint8_t* src = row + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bytes_per_px) ? cur[x - bytes_per_px] : 0;
      int b = prev[x];
      int c = x >= size_t(bytes_per_px) ? prev[x - bytes_per_px] : 0;
      uint8_t v = src[x];
      switch (filter) {
        case 0: cur[x] = v; break;
        case 1: cur[x] = uint8_t(v + a); break;
        case 2: cur[x] = uint8_t(v + b); break;
        case 3: cur[x] = uint8_t(v + ((a + b) >> 1)); break;
        case 4: cur[x] = uint8_t(v + paeth(a, b, c)); break;
        default: return -6;
      }
    }
    uint8_t* dst = out + size_t(y) * w;
    if (ch == 1 && info.bit_depth == 8) {
      memcpy(dst, cur.data(), size_t(w));
    } else if (ch == 1 && info.bit_depth == 16) {
      for (int x = 0; x < w; ++x) dst[x] = cur[2 * x];  // high byte
    } else if (ch == 2) {
      for (int x = 0; x < w; ++x) dst[x] = cur[2 * x];
    } else {  // RGB / RGBA → BT.601 luma
      for (int x = 0; x < w; ++x) {
        const uint8_t* px = cur.data() + size_t(x) * bytes_per_px;
        dst[x] = uint8_t((299 * px[0] + 587 * px[1] + 114 * px[2]) / 1000);
      }
    }
    prev.swap(cur);
  }
  return 0;
}

}  // extern "C"
