// Native batch frame feed: read raw 1-byte-per-pixel frame dumps, crop
// to the action window, and pack two pixels per byte — the host side of
// the ingest path (the reference's counterpart is the file_feed in
// main.cpp:16-52 + nil::read_raw, nil.hpp:13-32).
//
// Packing matches remap_tpu.pipeline.state.pack_nibbles_batch exactly:
// out[x/2] = (px[even] << 4) | px[odd], an odd trailing column packs as
// (px << 4).  Unreadable or short files yield blank (zero) frames — the
// reference's quirk (nil.hpp:20-22).
//
// Frames are read and packed by a small thread pool (file IO releases
// the GIL under ctypes, so Python-side compute overlaps).

#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void read_one(const char* path, int width, int height, int left, int top,
              int cw, int ch, uint8_t* out, std::vector<uint8_t>& buf) {
    const size_t need = static_cast<size_t>(width) * height;
    const int row_bytes = (cw + 1) / 2;
    bool ok = false;
    buf.resize(need);
    if (FILE* f = std::fopen(path, "rb")) {
        ok = std::fread(buf.data(), 1, need, f) == need;
        std::fclose(f);
    }
    if (!ok) {
        std::memset(out, 0, static_cast<size_t>(row_bytes) * ch);
        return;
    }
    for (int y = 0; y < ch; ++y) {
        const uint8_t* row = buf.data() +
            static_cast<size_t>(top + y) * width + left;
        uint8_t* orow = out + static_cast<size_t>(y) * row_bytes;
        // mask to the 4-bit contract: an out-of-range byte in a damaged
        // dump must not corrupt its neighbor through the nibble packing
        // (mirrors RawDirectoryFeed.read; identity on valid dumps)
        int x = 0;
        for (; x + 1 < cw; x += 2) {
            orow[x / 2] = static_cast<uint8_t>(((row[x] & 0x0F) << 4) |
                                               (row[x + 1] & 0x0F));
        }
        if (x < cw) {
            orow[x / 2] = static_cast<uint8_t>((row[x] & 0x0F) << 4);
        }
    }
}

}  // namespace

extern "C" {

// paths: count NUL-terminated strings, each padded to path_stride bytes.
// out: [count, ch, (cw+1)/2] uint8, row-major.
int feed_read_packed_batch(const char* paths, size_t path_stride, int count,
                           int width, int height, int left, int top,
                           int cw, int ch, uint8_t* out) {
    if (left < 0 || top < 0 || left + cw > width || top + ch > height ||
        cw <= 0 || ch <= 0 || count <= 0) {
        return -1;
    }
    const size_t frame_bytes =
        static_cast<size_t>((cw + 1) / 2) * ch;
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = static_cast<int>(hw ? (hw < 8 ? hw : 8) : 4);
    if (n_threads > count) n_threads = count;

    std::vector<std::thread> workers;
    workers.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
        workers.emplace_back([&, t]() {
            std::vector<uint8_t> buf;
            for (int i = t; i < count; i += n_threads) {
                read_one(paths + static_cast<size_t>(i) * path_stride,
                         width, height, left, top, cw, ch,
                         out + static_cast<size_t>(i) * frame_bytes, buf);
            }
        });
    }
    for (auto& w : workers) w.join();
    return 0;
}

}  // extern "C"
