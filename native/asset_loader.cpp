// Native asset loader for tiny_renderer_tpu.
//
// The reference renderer's asset path is native code (the Rust `image` crate
// for TGA with RLE, `obj-rs` for OBJ; reference Cargo.toml:8-10, used at
// src/app.rs:94-131).  This is the TPU framework's native equivalent: a tiny
// dependency-free C++ TGA decoder exposed over a C ABI for ctypes.
//
// Output contract (must match tiny_renderer_tpu/assets/tga.py exactly, which
// itself matches image::open(..).into_rgb8()):
//   * (H, W, 3) RGB u8, rows top-to-bottom (bottom-left-origin files flipped)
//   * 24bpp BGR->RGB, 32bpp BGRA->RGB (alpha dropped), 8bpp gray replicated.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct TgaHeader {
  uint8_t id_len;
  uint8_t cmap_type;
  uint8_t img_type;
  uint16_t cmap_first;
  uint16_t cmap_len;
  uint8_t cmap_bpp;
  uint16_t x0, y0;
  uint16_t width, height;
  uint8_t bpp;
  uint8_t desc;
};

bool read_header(const uint8_t* p, size_t n, TgaHeader* h) {
  if (n < 18) return false;
  h->id_len = p[0];
  h->cmap_type = p[1];
  h->img_type = p[2];
  h->cmap_first = static_cast<uint16_t>(p[3] | (p[4] << 8));
  h->cmap_len = static_cast<uint16_t>(p[5] | (p[6] << 8));
  h->cmap_bpp = p[7];
  h->x0 = static_cast<uint16_t>(p[8] | (p[9] << 8));
  h->y0 = static_cast<uint16_t>(p[10] | (p[11] << 8));
  h->width = static_cast<uint16_t>(p[12] | (p[13] << 8));
  h->height = static_cast<uint16_t>(p[14] | (p[15] << 8));
  h->bpp = p[16];
  h->desc = p[17];
  return true;
}

// Expand one raw pixel (bytes_pp bytes) to RGB.
inline void expand_pixel(const uint8_t* src, int bytes_pp, int bpp, uint8_t* dst) {
  switch (bpp) {
    case 8:
      dst[0] = dst[1] = dst[2] = src[0];
      break;
    case 24:
    case 32:  // BGR(A)
      dst[0] = src[2];
      dst[1] = src[1];
      dst[2] = src[0];
      break;
    case 15:
    case 16: {
      uint16_t v = static_cast<uint16_t>(src[0] | (src[1] << 8));
      uint8_t r = (v >> 10) & 0x1F, g = (v >> 5) & 0x1F, b = v & 0x1F;
      dst[0] = static_cast<uint8_t>((r * 255 + 15) / 31);
      dst[1] = static_cast<uint8_t>((g * 255 + 15) / 31);
      dst[2] = static_cast<uint8_t>((b * 255 + 15) / 31);
      break;
    }
    default:
      dst[0] = dst[1] = dst[2] = 0;
  }
  (void)bytes_pp;
}

}  // namespace

extern "C" {

// Returns 0 on success.  *out_buf is malloc'd (h*w*3 bytes); free with trt_free.
int trt_decode_tga(const char* path, int32_t* out_h, int32_t* out_w, void** out_buf) {
  *out_buf = nullptr;
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 18) {
    std::fclose(f);
    return 2;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return 3;
  }
  std::fclose(f);

  TgaHeader h;
  if (!read_header(buf.data(), buf.size(), &h)) return 2;
  size_t pos = 18 + h.id_len;

  // Colormap (supported for completeness; asset files don't use one).
  std::vector<uint8_t> cmap_rgb;
  if (h.cmap_type == 1) {
    int centry = (h.cmap_bpp + 7) / 8;
    size_t cbytes = static_cast<size_t>(h.cmap_len) * centry;
    if (pos + cbytes > buf.size()) return 4;
    cmap_rgb.resize(static_cast<size_t>(h.cmap_len) * 3);
    for (int i = 0; i < h.cmap_len; ++i) {
      expand_pixel(buf.data() + pos + static_cast<size_t>(i) * centry, centry, h.cmap_bpp,
                   cmap_rgb.data() + static_cast<size_t>(i) * 3);
    }
    pos += cbytes;
  }

  const size_t npix = static_cast<size_t>(h.width) * h.height;
  const int bytes_pp = (h.bpp + 7) / 8;
  const bool rle = h.img_type == 9 || h.img_type == 10 || h.img_type == 11;
  const bool mapped = h.img_type == 1 || h.img_type == 9;
  if (h.img_type == 0 || h.img_type > 11 || (h.img_type > 3 && !rle)) return 5;

  std::vector<uint8_t> raw(npix * bytes_pp);
  if (rle) {
    size_t written = 0;
    const size_t total = npix * bytes_pp;
    while (written < total) {
      if (pos >= buf.size()) return 6;
      uint8_t packet = buf[pos++];
      int count = (packet & 0x7F) + 1;
      if (packet & 0x80) {
        if (pos + bytes_pp > buf.size()) return 6;
        for (int c = 0; c < count && written + bytes_pp <= total; ++c) {
          std::memcpy(raw.data() + written, buf.data() + pos, bytes_pp);
          written += bytes_pp;
        }
        pos += bytes_pp;
      } else {
        size_t n = static_cast<size_t>(count) * bytes_pp;
        if (pos + n > buf.size() || written + n > total) return 6;
        std::memcpy(raw.data() + written, buf.data() + pos, n);
        pos += n;
        written += n;
      }
    }
  } else {
    size_t n = npix * bytes_pp;
    if (pos + n > buf.size()) return 6;
    std::memcpy(raw.data(), buf.data() + pos, n);
  }

  uint8_t* rgb = static_cast<uint8_t*>(std::malloc(npix * 3));
  if (!rgb) return 7;
  if (mapped) {
    for (size_t i = 0; i < npix; ++i) {
      int idx = raw[i * bytes_pp] - h.cmap_first;
      if (idx < 0 || idx >= h.cmap_len) idx = 0;
      std::memcpy(rgb + i * 3, cmap_rgb.data() + static_cast<size_t>(idx) * 3, 3);
    }
  } else {
    for (size_t i = 0; i < npix; ++i) {
      expand_pixel(raw.data() + i * bytes_pp, bytes_pp, h.bpp, rgb + i * 3);
    }
  }

  // Normalize to top-left origin to match image::open / tga.py.
  const bool bottom_origin = (h.desc & 0x20) == 0;
  const bool right_to_left = (h.desc & 0x10) != 0;
  if (bottom_origin || right_to_left) {
    uint8_t* fixed = static_cast<uint8_t*>(std::malloc(npix * 3));
    if (!fixed) {
      std::free(rgb);
      return 7;
    }
    for (int y = 0; y < h.height; ++y) {
      int sy = bottom_origin ? (h.height - 1 - y) : y;
      for (int x = 0; x < h.width; ++x) {
        int sx = right_to_left ? (h.width - 1 - x) : x;
        std::memcpy(fixed + (static_cast<size_t>(y) * h.width + x) * 3,
                    rgb + (static_cast<size_t>(sy) * h.width + sx) * 3, 3);
      }
    }
    std::free(rgb);
    rgb = fixed;
  }

  *out_h = h.height;
  *out_w = h.width;
  *out_buf = rgb;
  return 0;
}

void trt_free(void* p) { std::free(p); }

}  // extern "C"
