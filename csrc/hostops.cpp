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
#include <cstring>
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

// Host Scale stage, native: nearest resize of a flat I420 frame.
// Bit-exact twin of ops/yuv.py scale_i420 (the reference's resize is
// native too — fast_image_resize, infur/src/processing.rs:278): index
// math in double, ((t + 0.5) * p) / t truncated then clamped.
namespace {

void nn_plane(const uint8_t* src, int ph, int pw, uint8_t* dst, int th,
              int tw) {
  std::vector<int> xs(tw);
  for (int x = 0; x < tw; ++x) {
    int v = (int)(((x + 0.5) * pw) / tw);
    xs[x] = v < pw - 1 ? v : pw - 1;
  }
  for (int y = 0; y < th; ++y) {
    int sy = (int)(((y + 0.5) * ph) / th);
    if (sy > ph - 1) sy = ph - 1;
    const uint8_t* row = src + (size_t)sy * pw;
    uint8_t* out = dst + (size_t)y * tw;
    for (int x = 0; x < tw; ++x) out[x] = row[xs[x]];
  }
}

}  // namespace

extern "C" int hop_scale_i420(const uint8_t* src, uint8_t* dst, int h,
                              int w, int oh, int ow) {
  if (!src || !dst || h <= 0 || w <= 0 || oh <= 0 || ow <= 0 || h % 2 ||
      w % 2 || oh % 2 || ow % 2) {
    return -1;
  }
  const size_t sy = (size_t)w * h, sq = sy / 4;
  const size_t dy = (size_t)ow * oh, dq = dy / 4;
  nn_plane(src, h, w, dst, oh, ow);
  nn_plane(src + sy, h / 2, w / 2, dst + dy, oh / 2, ow / 2);
  nn_plane(src + sy + sq, h / 2, w / 2, dst + dy + dq, oh / 2, ow / 2);
  return 0;
}

// Dirty-chunk delta encode, native: twin of ops/framedelta.py
// encode_delta's per-frame loop (memcmp per chunk + gather), parallel
// over the B-1 delta frames.  Returns 0 ok, 1 when any frame exceeds
// cap (caller ships dense), -1 bad args.  Pad slots: idx 0 + the
// frame's own chunk-0 bytes (identical values on duplicate indices).
extern "C" int hop_delta_encode(const uint8_t* frames, int b,
                                int64_t n_chunks, int chunk, int cap,
                                uint16_t* idx, uint8_t* data,
                                int n_threads) {
  if (!frames || !idx || !data || b < 2 || n_chunks <= 0 ||
      n_chunks > 65536 || chunk <= 0 || cap <= 0) {
    return -1;
  }
  const size_t fbytes = (size_t)n_chunks * chunk;
  std::atomic<int> overflow{0};
  int hwc = (int)std::thread::hardware_concurrency();
  int T = std::max(1, std::min(n_threads > 0 ? n_threads : hwc, b - 1));
  auto worker = [&](int j0, int j1) {
    for (int j = j0; j < j1 && !overflow.load(std::memory_order_relaxed);
         ++j) {
      const uint8_t* prev = frames + (size_t)j * fbytes;
      const uint8_t* cur = prev + fbytes;
      uint16_t* oi = idx + (size_t)j * cap;
      uint8_t* od = data + (size_t)j * cap * chunk;
      int n = 0;
      for (int64_t c = 0; c < n_chunks; ++c) {
        if (memcmp(prev + c * chunk, cur + c * chunk, chunk) != 0) {
          if (n == cap) {
            overflow.store(1, std::memory_order_relaxed);
            return;
          }
          oi[n] = (uint16_t)c;
          memcpy(od + (size_t)n * chunk, cur + c * chunk, chunk);
          ++n;
        }
      }
      for (; n < cap; ++n) {
        oi[n] = 0;
        memcpy(od + (size_t)n * chunk, cur, chunk);
      }
    }
  };
  if (T == 1) {
    worker(0, b - 1);
  } else {
    std::vector<std::thread> ts;
    const int per = (b - 1 + T - 1) / T;
    for (int t = 0; t < T; ++t) {
      int j0 = t * per, j1 = std::min(b - 1, j0 + per);
      if (j0 < j1) ts.emplace_back(worker, j0, j1);
    }
    for (auto& th : ts) th.join();
  }
  return overflow.load() ? 1 : 0;
}
