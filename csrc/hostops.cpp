// Native host pixel ops (ctypes-loaded, like ffpipe.cpp).
//
// The hot host-side stage of the serving path is the overlay composite:
// palette[mask] alpha-blended over the luma plane.  NumPy does it at
// ~50 ms/frame at 540x960 AND holds the GIL, so composite work starves
// the dispatch/fetch threads (bench.py measured a 4-thread numpy pool
// running 5x slower than serial).  This C++ version is exact (same floor
// semantics as the numpy int path), multithreaded, and releases the GIL
// for its whole duration by construction (pure C ABI via ctypes).
//
// Reference analog: the per-pixel BGR->Color32 map the reference performs
// on the GUI path (infur/src/app.rs:132-144) — host pixel work is native
// there too (Rust); here it's C++.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <utility>
#include <vector>

namespace {

// floor(n / 255) for possibly-negative n (match numpy's // semantics)
inline int32_t floordiv255(int32_t n) {
  return n >= 0 ? n / 255 : -((-n + 254) / 255);
}

struct BlendArgs {
  const uint8_t* mask;     // (frames, h, w) class ids
  const uint8_t* conf;     // (frames, ch, cw) alpha; ch/cw may be h/2, w/2
  const uint8_t* base;     // (frames, h, w) luma
  const uint8_t* palette;  // (pal_len, 3) RGB
  int pal_len;
  uint8_t* out;            // (frames, h, w, 3) RGB
  int frames, h, w, ch, cw;
};

void blend_rows(const BlendArgs& a, int f, int y0, int y1) {
  const int sy = a.h / a.ch;  // conf subsampling (1 or 2, integer ratio)
  const int sx = a.w / a.cw;
  const uint8_t* m = a.mask + (size_t)f * a.h * a.w;
  const uint8_t* c = a.conf + (size_t)f * a.ch * a.cw;
  const uint8_t* b = a.base + (size_t)f * a.h * a.w;
  uint8_t* o = a.out + (size_t)f * a.h * a.w * 3;
  for (int y = y0; y < y1; ++y) {
    const uint8_t* crow = c + (size_t)(y / sy) * a.cw;
    for (int x = 0; x < a.w; ++x) {
      const size_t i = (size_t)y * a.w + x;
      const uint8_t* rgb = a.palette + (m[i] % a.pal_len) * 3;
      const int32_t alpha = crow[x / sx];
      const int32_t bb = b[i];
      uint8_t* op = o + i * 3;
      for (int k = 0; k < 3; ++k) {
        op[k] = (uint8_t)(bb + floordiv255(((int32_t)rgb[k] - bb) * alpha));
      }
    }
  }
}

}  // namespace

// 6-bit mask unpack: 3 packed bytes -> 4 class ids (bench.py's confq6
// wire format — lossless for <= 64 classes).  GIL-free like hop_blend so
// the composite worker never stalls the dispatch threads on numpy bit ops.
extern "C" int hop_unpack6(const uint8_t* packed, uint8_t* out,
                           int64_t n_quads) {
  if (!packed || !out || n_quads < 0) return -1;
  for (int64_t q = 0; q < n_quads; ++q) {
    const uint8_t b0 = packed[q * 3], b1 = packed[q * 3 + 1],
                  b2 = packed[q * 3 + 2];
    uint8_t* o = out + q * 4;
    o[0] = b0 & 63;
    o[1] = (uint8_t)((b0 >> 6) | ((b1 & 15) << 2));
    o[2] = (uint8_t)((b1 >> 4) | ((b2 & 3) << 4));
    o[3] = b2 >> 2;
  }
  return 0;
}

extern "C" int hop_blend(const uint8_t* mask, const uint8_t* conf,
                         const uint8_t* base, const uint8_t* palette,
                         int pal_len, uint8_t* out, int frames, int h, int w,
                         int ch, int cw, int n_threads) {
  if (!mask || !conf || !base || !palette || !out || pal_len <= 0 ||
      frames <= 0 || h <= 0 || w <= 0 || ch <= 0 || cw <= 0 || h % ch ||
      w % cw) {
    return -1;
  }
  BlendArgs a{mask, conf, base, palette, pal_len, out, frames, h, w, ch, cw};
  int hwc = (int)std::thread::hardware_concurrency();
  int T = std::max(1, std::min(n_threads > 0 ? n_threads : hwc, frames * 4));
  if (T == 1) {
    for (int f = 0; f < frames; ++f) blend_rows(a, f, 0, h);
    return 0;
  }
  // split (frame, row-band) work items across T workers
  std::vector<std::thread> ts;
  ts.reserve(T);
  const int bands_per_frame = std::max(1, T / frames);
  const int band_h = (h + bands_per_frame - 1) / bands_per_frame;
  std::vector<std::pair<int, std::pair<int, int>>> items;
  for (int f = 0; f < frames; ++f)
    for (int y0 = 0; y0 < h; y0 += band_h)
      items.push_back({f, {y0, std::min(h, y0 + band_h)}});
  std::atomic<size_t> next{0};
  for (int t = 0; t < T; ++t) {
    ts.emplace_back([&] {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= items.size()) break;
        blend_rows(a, items[i].first, items[i].second.first,
                   items[i].second.second);
      }
    });
  }
  for (auto& th : ts) th.join();
  return 0;
}

// 3-channel blend for the app's low-wire (rle) display path: palette
// alpha-blended over a COLOR base frame, emitting display-ready RGBA.
// base is BGR (the pipeline's pixel currency); out is RGBA with a=255.
// Same floor semantics as hop_blend; conf may be subsampled (quarter-res).
namespace {

struct Blend3Args {
  const uint8_t* mask;     // (frames, h, w) class ids
  const uint8_t* conf;     // (frames, ch, cw) alpha
  const uint8_t* base;     // (frames, h, w, 3) BGR
  const uint8_t* palette;  // (pal_len, 3) RGB
  int pal_len;
  uint8_t* out;            // (frames, h, w, 4) RGBA
  int frames, h, w, ch, cw;
};

void blend3_rows(const Blend3Args& a, int f, int y0, int y1) {
  const int sy = a.h / a.ch;
  const int sx = a.w / a.cw;
  const uint8_t* m = a.mask + (size_t)f * a.h * a.w;
  const uint8_t* c = a.conf + (size_t)f * a.ch * a.cw;
  const uint8_t* b = a.base + (size_t)f * a.h * a.w * 3;
  uint8_t* o = a.out + (size_t)f * a.h * a.w * 4;
  for (int y = y0; y < y1; ++y) {
    const uint8_t* crow = c + (size_t)(y / sy) * a.cw;
    for (int x = 0; x < a.w; ++x) {
      const size_t i = (size_t)y * a.w + x;
      const uint8_t* rgb = a.palette + (m[i] % a.pal_len) * 3;
      const uint8_t* bp = b + i * 3;  // BGR
      const int32_t alpha = crow[x / sx];
      uint8_t* op = o + i * 4;
      for (int k = 0; k < 3; ++k) {
        const int32_t bb = bp[2 - k];  // BGR -> RGB
        op[k] = (uint8_t)(bb + floordiv255(((int32_t)rgb[k] - bb) * alpha));
      }
      op[3] = 255;
    }
  }
}

}  // namespace

extern "C" int hop_blend3(const uint8_t* mask, const uint8_t* conf,
                          const uint8_t* base, const uint8_t* palette,
                          int pal_len, uint8_t* out, int frames, int h,
                          int w, int ch, int cw, int n_threads) {
  if (!mask || !conf || !base || !palette || !out || pal_len <= 0 ||
      frames <= 0 || h <= 0 || w <= 0 || ch <= 0 || cw <= 0 || h % ch ||
      w % cw) {
    return -1;
  }
  Blend3Args a{mask, conf, base, palette, pal_len, out, frames, h, w, ch, cw};
  int hwc = (int)std::thread::hardware_concurrency();
  int T = std::max(1, std::min(n_threads > 0 ? n_threads : hwc, frames * 4));
  if (T == 1) {
    for (int f = 0; f < frames; ++f) blend3_rows(a, f, 0, h);
    return 0;
  }
  std::vector<std::thread> ts;
  ts.reserve(T);
  const int bands_per_frame = std::max(1, T / frames);
  const int band_h = (h + bands_per_frame - 1) / bands_per_frame;
  std::vector<std::pair<int, std::pair<int, int>>> items;
  for (int f = 0; f < frames; ++f)
    for (int y0 = 0; y0 < h; y0 += band_h)
      items.push_back({f, {y0, std::min(h, y0 + band_h)}});
  std::atomic<size_t> next{0};
  for (int t = 0; t < T; ++t) {
    ts.emplace_back([&] {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= items.size()) break;
        blend3_rows(a, items[i].first, items[i].second.first,
                    items[i].second.second);
      }
    });
  }
  for (auto& th : ts) th.join();
  return 0;
}
