// Differential-test driver around the reference implementation.
//
// Compiled AGAINST THE READ-ONLY REFERENCE CHECKOUT (headers included via
// -I <ref>/src; nothing is copied into this repository) to cross-check the
// NumPy executable specification (remap_tpu/spec/) on real compiled C++.
// Scope = the reference's scalar paths: the nic RLE codec, cte/ctr contour
// extraction, and fgm fragment blit/blend (the AVX2 kernels — kpe, arf,
// aws, fde — have no scalar twins and are covered by the spec suite
// instead).
//
// Protocol: little-endian binary on stdin/stdout, one subcommand per run:
//   nic W H   stdin: W*H palette codes
//             stdout: u32 clen, clen compressed bytes, W*H decompressed
//   cte W H P stdin: W*H codes, then (if P) W*H predicate bytes
//             stdout: u32 n, per contour {u32 id,color,area,l,t,r,b},
//                     then n recovered masks of W*H bytes (0/1)
//   fgm W H N stdin: N frames of {i32 x, i32 y, W*H codes}
//             stdout: i32 zero_x, zero_y, u32 dw, dh,
//                     dh*dw*16 u16 dots, dh*dw blend codes, dh*dw mask

#include "cte.hpp"
#include "fgm.hpp"
#include "kpm.hpp"
#include "kpr.hpp"
#include "nic.hpp"

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

template<typename Ty>
Ty rd() {
  Ty v{};
  if (std::fread(&v, sizeof(Ty), 1, stdin) != 1) {
    std::exit(2);
  }
  return v;
}

template<typename Ty>
void wr(Ty v) {
  std::fwrite(&v, sizeof(Ty), 1, stdout);
}

std::vector<std::uint8_t> rd_bytes(std::size_t n) {
  std::vector<std::uint8_t> buf(n);
  if (std::fread(buf.data(), 1, n, stdin) != n) {
    std::exit(2);
  }
  return buf;
}

sid::nat::dimg_t to_image(std::vector<std::uint8_t> const& raw,
                          std::size_t w,
                          std::size_t h) {
  sid::nat::dimg_t img{mrl::dimensions_t{w, h}};
  for (std::size_t i = 0; i < raw.size(); ++i) {
    img[i] = cpl::nat_cc{static_cast<std::uint8_t>(raw[i] & 0xF)};
  }
  return img;
}

int run_nic(std::size_t w, std::size_t h) {
  auto img = to_image(rd_bytes(w * h), w, h);
  auto packed = nic::compress(img);
  wr<std::uint32_t>(static_cast<std::uint32_t>(packed.size()));
  std::fwrite(packed.data(), 1, packed.size(), stdout);
  auto back = nic::decompress(packed, mrl::dimensions_t{w, h});
  for (std::size_t i = 0; i < w * h; ++i) {
    wr<std::uint8_t>(value(back[i]));
  }
  return 0;
}

int run_cte(std::size_t w, std::size_t h, bool use_pred) {
  auto img = to_image(rd_bytes(w * h), w, h);
  std::vector<std::uint8_t> pred;
  if (use_pred) {
    pred = rd_bytes(w * h);
  }

  cte::extractor<cpl::nat_cc> ext{mrl::dimensions_t{w, h}};
  auto contours = use_pred
      ? ext.extract(img,
                    [&](auto, std::size_t idx) { return pred[idx] != 0; })
      : ext.extract(img);

  wr<std::uint32_t>(static_cast<std::uint32_t>(contours.size()));
  for (auto const& c : contours) {
    wr<std::uint32_t>(c.id());
    wr<std::uint32_t>(value(c.color()));
    wr<std::uint32_t>(c.area());
    auto const& e = c.enclosure();
    wr<std::uint32_t>(static_cast<std::uint32_t>(e.left_));
    wr<std::uint32_t>(static_cast<std::uint32_t>(e.top_));
    wr<std::uint32_t>(static_cast<std::uint32_t>(e.right_));
    wr<std::uint32_t>(static_cast<std::uint32_t>(e.bottom_));
  }
  std::vector<cpl::nat_cc> mask(w * h);
  for (auto const& c : contours) {
    std::fill(mask.begin(), mask.end(), cpl::nat_cc{0});
    c.recover(mask.data(), cpl::nat_cc{1});
    for (auto px : mask) {
      wr<std::uint8_t>(value(px));
    }
  }
  return 0;
}

int run_fgm(std::size_t w, std::size_t h, std::size_t n) {
  fgm::fragment frag{mrl::dimensions_t{w, h}};
  for (std::size_t i = 0; i < n; ++i) {
    auto x = rd<std::int32_t>();
    auto y = rd<std::int32_t>();
    auto img = to_image(rd_bytes(w * h), w, h);
    frag.blit(fgm::point_t{x, y}, img, fgm::packed_data{}, i);
  }
  wr<std::int32_t>(frag.zero().x_);
  wr<std::int32_t>(frag.zero().y_);
  auto const& dots = frag.dots();
  wr<std::uint32_t>(static_cast<std::uint32_t>(dots.width()));
  wr<std::uint32_t>(static_cast<std::uint32_t>(dots.height()));
  for (std::size_t i = 0; i < dots.width() * dots.height(); ++i) {
    for (auto v : dots[i]) {
      wr<std::uint16_t>(v);
    }
  }
  auto blend = frag.blend();
  for (std::size_t i = 0; i < dots.width() * dots.height(); ++i) {
    wr<std::uint8_t>(value(blend.image_[i]));
  }
  for (std::size_t i = 0; i < dots.width() * dots.height(); ++i) {
    wr<std::uint8_t>(value(blend.mask_[i]));
  }
  return 0;
}

struct match_cfg {
  // frc.hpp:31-34's production configuration
  static constexpr std::size_t weight_switch{10};
  static constexpr std::size_t region_votes{3};

  using allocator_type = std::allocator<char>;

  [[nodiscard]] allocator_type get_allocator() const noexcept {
    return {};
  }
};

int run_kpm(std::size_t n_prev, std::size_t n_curr) {
  using grid_t = kpr::grid<4, 2, std::allocator<char>>;  // frc.hpp:22-26

  auto read_grid = [](grid_t& g, std::size_t n) {
    for (std::size_t i = 0; i < n; ++i) {
      auto region = rd<std::uint32_t>();
      kpr::code key{};
      if (std::fread(key.data(), 1, kpr::code_length, stdin) !=
          kpr::code_length) {
        std::exit(2);
      }
      auto x = rd<std::uint32_t>();
      auto y = rd<std::uint32_t>();
      g[region].add(key, mrl::point_t{x, y});
    }
  };

  grid_t prev{}, curr{};
  read_grid(prev, n_prev);
  read_grid(curr, n_curr);

  auto off = kpm::match(match_cfg{}, prev, curr);
  wr<std::uint8_t>(off ? 1 : 0);
  wr<std::int32_t>(off ? off->x_ : 0);
  wr<std::int32_t>(off ? off->y_ : 0);
  return 0;
}

int run_fgs(std::size_t n_prev, std::size_t n_curr) {
  // the splice-stage cellular matcher (kpm.hpp:371-393): two 1x1-grid
  // keypoint stores + blend masks, cell size 15x15 (fgs.hpp:119-121)
  using region_t = kpr::region<std::allocator<char>>;

  auto read_mask = []() {
    auto w = rd<std::uint32_t>();
    auto h = rd<std::uint32_t>();
    sid::mon::dimg_t mask{mrl::dimensions_t{w, h}};
    auto raw = rd_bytes(static_cast<std::size_t>(w) * h);
    for (std::size_t i = 0; i < raw.size(); ++i) {
      mask[i] = cpl::mon_bv{static_cast<std::uint8_t>(raw[i] != 0)};
    }
    return mask;
  };

  auto read_region = [](region_t& reg, std::size_t n) {
    for (std::size_t i = 0; i < n; ++i) {
      kpr::code key{};
      if (std::fread(key.data(), 1, kpr::code_length, stdin) !=
          kpr::code_length) {
        std::exit(2);
      }
      auto x = rd<std::uint32_t>();
      auto y = rd<std::uint32_t>();
      reg.add(key, mrl::point_t{x, y});
    }
  };

  auto pmask = read_mask();
  auto cmask = read_mask();
  region_t prev{}, curr{};
  read_region(prev, n_prev);
  read_region(curr, n_curr);

  auto vote = kpm::match(prev, pmask, curr, cmask,
                         kpm::cell_size_t{15, 15});
  wr<std::uint8_t>(vote ? 1 : 0);
  wr<std::int32_t>(vote ? vote->offset_.x_ : 0);
  wr<std::int32_t>(vote ? vote->offset_.y_ : 0);
  wr<std::uint32_t>(vote ? static_cast<std::uint32_t>(vote->count_) : 0);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s {nic|cte|fgm} W H [N|P]\n", argv[0]);
    return 1;
  }
  std::string cmd{argv[1]};
  std::size_t w = std::stoul(argv[2]);
  std::size_t h = std::stoul(argv[3]);
  std::size_t extra = argc > 4 ? std::stoul(argv[4]) : 0;

  if (cmd == "nic") {
    return run_nic(w, h);
  }
  if (cmd == "cte") {
    return run_cte(w, h, extra != 0);
  }
  if (cmd == "fgm") {
    return run_fgm(w, h, extra);
  }
  if (cmd == "kpm") {
    return run_kpm(w, h);  // (w, h) reused as (n_prev, n_curr)
  }
  if (cmd == "fgs") {
    return run_fgs(w, h);  // (w, h) reused as (n_prev, n_curr)
  }
  std::fprintf(stderr, "unknown subcommand %s\n", cmd.c_str());
  return 1;
}
