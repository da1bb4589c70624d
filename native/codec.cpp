// Native RLE codec for 4-bit frame images.
//
// Implements the same opcode format as the reference's nic codec
// (documented in remap_tpu/spec/nic.py):
//   0x80|n          literal run, n < 64, packed nibble pairs follow
//   0xC0|hi, lo     literal run, n = hi<<8|lo
//   ((n-3)<<4)|c    repeat color c, 3 <= n <= 6
//   0x40|(b<<4)|c   repeat color c, length in b little-endian bytes
//
// Exposed as a tiny C ABI for ctypes.  Built via native/Makefile.

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// Returns the number of bytes written to out (caller sizes out generously:
// worst case is ceil(n/2) literal bytes plus one opcode per 16383 pixels).
size_t rle_compress(const uint8_t* src, size_t n, uint8_t* out) {
  if (n == 0) return 0;

  size_t w = 0;               // write cursor
  std::vector<uint8_t> lit;   // pending literal nibble buffer
  lit.reserve(256);

  auto flush_literals = [&](size_t count) {
    // 0xC0 carries a 14-bit length; split longer literal runs at even
    // pixel counts (keeps nibble-byte alignment).  The reference
    // corrupts the opcode beyond 16383 (nic.hpp:25); the split is the
    // strictly-correct extension, byte-identical on inputs the
    // reference survives (mirrors remap_tpu/spec/nic.py).
    size_t start = 0;
    while (count > 16383) {
      out[w++] = static_cast<uint8_t>(0xC0 | (16382 >> 8));
      out[w++] = static_cast<uint8_t>(16382 & 0xFF);
      for (size_t k = 0; k < 8191; ++k) out[w++] = lit[start + k];
      start += 8191;
      count -= 16382;
    }
    if (count < 64) {
      out[w++] = static_cast<uint8_t>(0x80 | count);
    } else {
      out[w++] = static_cast<uint8_t>(0xC0 | (count >> 8));
      out[w++] = static_cast<uint8_t>(count & 0xFF);
    }
    for (size_t k = start; k < lit.size(); ++k) out[w++] = lit[k];
    lit.clear();
  };

  auto emit_repeat = [&](size_t len, uint8_t color) {
    // 16-bit repeat length: split longer runs, leaving a >= 4 tail so
    // the final opcode stays valid.  The reference's uint16 rep_len
    // wraps at 65536 and crashes on the next pixel (nic.hpp:57).
    while (len > 65535) {
      out[w++] = static_cast<uint8_t>(0x40 | (2 << 4) | color);
      out[w++] = static_cast<uint8_t>(65532 & 0xFF);
      out[w++] = static_cast<uint8_t>(65532 >> 8);
      len -= 65532;
    }
    if (len <= 6) {
      out[w++] = static_cast<uint8_t>(((len - 3) << 4) | color);
    } else {
      const int bytes = len > 255 ? 2 : 1;
      out[w++] = static_cast<uint8_t>(0x40 | (bytes << 4) | color);
      out[w++] = static_cast<uint8_t>(len & 0xFF);
      if (bytes == 2) out[w++] = static_cast<uint8_t>(len >> 8);
    }
  };

  size_t seq = 1, rep = 1;
  uint8_t cur = src[0];
  lit.push_back(static_cast<uint8_t>(cur << 4));

  for (size_t i = 1; i < n; ++i) {
    const uint8_t px = src[i];
    ++seq;
    if (px == cur) {
      ++rep;
      if (rep < 3) {
        if ((seq & 1) == 0) lit.back() |= px;
        else lit.push_back(static_cast<uint8_t>(px << 4));
      } else if (rep == 3) {
        lit.pop_back();
        if ((seq & 1) == 0 && !lit.empty()) lit.back() &= 0xF0;
        if (!lit.empty()) flush_literals(seq - 3);
        seq = 3;
      }
    } else {
      if (rep > 2) {
        emit_repeat(rep, cur);
        seq = 1;
        lit.push_back(static_cast<uint8_t>(px << 4));
      } else if ((seq & 1) == 0) {
        lit.back() |= px;
      } else {
        lit.push_back(static_cast<uint8_t>(px << 4));
      }
      rep = 1;
      cur = px;
    }
  }

  if (rep > 2) emit_repeat(rep, cur);
  else if (!lit.empty()) flush_literals(seq);
  return w;
}

// Strict decode: returns the number of pixels written, or SIZE_MAX if
// the stream is malformed — an opcode needing bytes beyond the source
// (truncated pack) or a run writing past cap (corrupt lengths).  The
// reference's decoder has neither check (nic.hpp:107-166 trusts the
// stream); real dumps may be damaged, so the production path must not
// overread or overwrite on untrusted bytes.
size_t rle_decompress(const uint8_t* src, size_t n, uint8_t* out,
                      size_t cap) {
  const size_t kBad = static_cast<size_t>(-1);
  size_t r = 0, w = 0;
  while (r < n) {
    const uint8_t op = src[r++];
    switch (op & 0xC0) {
      case 0x00: {
        size_t count = (op >> 4) + 3;
        if (count > cap - w) return kBad;
        const uint8_t color = op & 0x0F;
        while (count--) out[w++] = color;
        break;
      }
      case 0x40: {
        const size_t bytes = (op >> 4) & 3;
        if (bytes > n - r) return kBad;
        size_t len = 0;
        for (size_t b = 0; b < bytes; ++b) len |= size_t(src[r++]) << (8 * b);
        if (len > cap - w) return kBad;
        const uint8_t color = op & 0x0F;
        while (len--) out[w++] = color;
        break;
      }
      default: {
        size_t pixels;
        if ((op & 0xC0) == 0x80) {
          pixels = op & 0x3F;
        } else {
          if (r >= n) return kBad;
          pixels = (size_t(op & 0x3F) << 8) | src[r++];
        }
        const size_t bytes = (pixels >> 1) + (pixels & 1);
        if (bytes > n - r) return kBad;
        if (pixels > cap - w) return kBad;
        size_t emitted = 0;
        for (size_t b = 0; b < bytes; ++b) {
          const uint8_t pair = src[r++];
          out[w++] = pair >> 4;
          if (++emitted < pixels) { out[w++] = pair & 0x0F; ++emitted; }
        }
        break;
      }
    }
  }
  return w;
}

// Batch nibble packing: [n] byte pixels -> [ceil(n/2)] packed (2 px/byte).
void pack_nibbles(const uint8_t* src, size_t n, uint8_t* out) {
  size_t i = 0, w = 0;
  for (; i + 1 < n; i += 2) out[w++] = uint8_t(src[i] << 4) | src[i + 1];
  if (i < n) out[w++] = uint8_t(src[i] << 4);
}

void unpack_nibbles(const uint8_t* src, size_t n_pixels, uint8_t* out) {
  for (size_t i = 0; i < n_pixels; ++i) {
    const uint8_t b = src[i >> 1];
    out[i] = (i & 1) ? (b & 0x0F) : (b >> 4);
  }
}

}  // extern "C"
