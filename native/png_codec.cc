// PNG decoder for the dataset contract: 8-bit gray/RGB rgb_index frames
// and 16-bit gray dep_index depth maps (reference loads them with
// cv::imread, src/GraphicEnd.cpp:271-276). First-party implementation on
// zlib inflate: chunk walk -> IDAT inflate -> per-row unfilter ->
// sample layout (u8, or u16 host-endian for depth). No interlace
// support (the contract never produces Adam7 files).

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct Header {
  uint32_t w = 0, h = 0;
  uint8_t bitdepth = 0, colortype = 0, interlace = 0;
  int channels = 0;
};

int channels_for(uint8_t colortype) {
  switch (colortype) {
    case 0: return 1;  // gray
    case 2: return 3;  // rgb
    case 4: return 2;  // gray+alpha
    case 6: return 4;  // rgba
    default: return 0; // palette unsupported
  }
}

bool parse(const uint8_t* data, size_t n, Header* hdr,
           std::vector<uint8_t>* idat) {
  if (n < 8 || std::memcmp(data, kSig, 8) != 0) return false;
  size_t off = 8;
  bool have_ihdr = false;
  while (off + 12 <= n) {
    uint32_t len = be32(data + off);
    const uint8_t* type = data + off + 4;
    const uint8_t* body = data + off + 8;
    if (off + 12 + len > n) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return false;
      hdr->w = be32(body);
      hdr->h = be32(body + 4);
      hdr->bitdepth = body[8];
      hdr->colortype = body[9];
      hdr->interlace = body[12];
      hdr->channels = channels_for(hdr->colortype);
      have_ihdr = true;
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat->insert(idat->end(), body, body + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  return have_ihdr && !idat->empty() && hdr->channels > 0 &&
         hdr->interlace == 0 &&
         (hdr->bitdepth == 8 || hdr->bitdepth == 16);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

}  // namespace

extern "C" {

// Returns 0 on success. channels/bitdepth let the caller size buffers.
int slam3d_png_info(const uint8_t* data, int64_t n, uint32_t* w, uint32_t* h,
                    uint32_t* channels, uint32_t* bitdepth) {
  Header hdr;
  std::vector<uint8_t> idat;
  if (!parse(data, size_t(n), &hdr, &idat)) return -1;
  *w = hdr.w;
  *h = hdr.h;
  *channels = uint32_t(hdr.channels);
  *bitdepth = hdr.bitdepth;
  return 0;
}

// out: row-major samples. 8-bit -> u8; 16-bit -> u16 host-endian.
// If to_gray != 0 and the image is RGB(A), output is one u8 channel
// using the BT.601 weights cv::imread(IMREAD_GRAYSCALE) applies.
int slam3d_png_decode(const uint8_t* data, int64_t n, uint8_t* out,
                      int to_gray) {
  Header hdr;
  std::vector<uint8_t> idat;
  if (!parse(data, size_t(n), &hdr, &idat)) return -1;

  const int bytes_per_sample = hdr.bitdepth / 8;
  const size_t bpp = size_t(hdr.channels) * bytes_per_sample;
  const size_t stride = size_t(hdr.w) * bpp;
  std::vector<uint8_t> raw(size_t(hdr.h) * (stride + 1));

  uLongf raw_len = uLongf(raw.size());
  if (uncompress(raw.data(), &raw_len, idat.data(), uLong(idat.size())) !=
          Z_OK ||
      raw_len != raw.size()) {
    return -2;
  }

  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (uint32_t y = 0; y < hdr.h; ++y) {
    const uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = row[0];
    const uint8_t* src = row + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? cur[x - bpp] : 0;
      int b = prev[x];
      int c = x >= bpp ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -3;
      }
      cur[x] = uint8_t(v);
    }

    if (to_gray && hdr.channels >= 3 && hdr.bitdepth == 8) {
      uint8_t* dst = out + size_t(y) * hdr.w;
      for (uint32_t x = 0; x < hdr.w; ++x) {
        const uint8_t* px = cur.data() + size_t(x) * hdr.channels;
        // cv::cvtColor BGR2GRAY coefficients on RGB order
        uint32_t g = 299u * px[0] + 587u * px[1] + 114u * px[2];
        dst[x] = uint8_t((g + 500) / 1000);
      }
    } else if (hdr.bitdepth == 16) {
      // big-endian file samples -> host-endian u16
      uint16_t* dst =
          reinterpret_cast<uint16_t*>(out) + size_t(y) * hdr.w * hdr.channels;
      for (size_t s = 0; s < size_t(hdr.w) * hdr.channels; ++s) {
        dst[s] = uint16_t((cur[2 * s] << 8) | cur[2 * s + 1]);
      }
    } else {
      std::memcpy(out + size_t(y) * stride, cur.data(), stride);
    }
    std::swap(prev, cur);
  }
  return 0;
}

}  // extern "C"
