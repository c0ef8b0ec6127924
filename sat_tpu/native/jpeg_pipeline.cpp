// Native host-side image pipeline: threaded JPEG decode + PIL-matching
// bilinear resample + square crop, exposed as a C API consumed via ctypes.
//
// This is the TPU-native replacement for the reference's implicit native data
// layer (PIL/PIL-SIMD JPEG decode inside torch DataLoader worker *processes*,
// reference: util.py:41 pil_loader + train.py:244-249 num_workers).  Torch
// forks processes to escape the GIL; here one process keeps a C++ thread pool
// that decodes a whole batch in parallel (the ctypes call releases the GIL),
// so decoded uint8 batches land in a single contiguous buffer ready for one
// host->device transfer -- no pickling, no page-cache double copies.
//
// Two throughput tricks the Python path cannot reach:
//  * libjpeg IDCT scaling (scale_num/8): images are decoded directly at
//    ~target resolution (COCO 640px -> 224px reads 8x fewer IDCT outputs).
//  * decode -> resample -> crop fused per image on one thread: the crop
//    window is resolved BEFORE resampling, so only rows inside the window
//    are resampled (vertical pass skips the rest).
//
// Resampling matches PIL's convolution-based BILINEAR (triangle filter with
// support scaled by the downscale factor, horizontal-then-vertical separable
// passes) so the native path is a drop-in for dataset.decode_resized: same
// antialiasing, tolerance-tested against PIL in tests/test_native_decode.py.

#include <array>
#include <atomic>
#include <cmath>
#include <unordered_map>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// libjpeg error handling: longjmp out instead of exit().
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ---------------------------------------------------------------------------
// PIL-style separable triangle-filter resampling (uint8 RGB).
// For output pixel i: center = (i + 0.5) * scale (+ window offset);
// support = 1.0 * max(scale, 1); weights = tri((j + 0.5 - center) / fscale),
// normalized.  Matches Pillow's ImagingResampleHorizontal coefficients.
// ---------------------------------------------------------------------------
struct Coeffs {
  std::vector<int> xmin;      // first source index per output pixel
  std::vector<int> xsize;     // number of taps per output pixel
  std::vector<float> w;       // taps, stride = max_taps
  int max_taps = 0;
};

Coeffs make_coeffs(int in_size, int out_size, float win_lo, float win_hi) {
  Coeffs c;
  const float scale = (win_hi - win_lo) / out_size;
  const float fscale = scale < 1.0f ? 1.0f : scale;
  const float support = 1.0f * fscale;  // triangle filter support = 1
  c.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.xsize.resize(out_size);
  c.w.assign(static_cast<size_t>(out_size) * c.max_taps, 0.0f);
  for (int i = 0; i < out_size; ++i) {
    const float center = win_lo + (i + 0.5f) * scale;
    int lo = static_cast<int>(center - support + 0.5f);
    if (lo < 0) lo = 0;
    int hi = static_cast<int>(center + support + 0.5f);
    if (hi > in_size) hi = in_size;
    float total = 0.0f;
    float* row = &c.w[static_cast<size_t>(i) * c.max_taps];
    for (int j = lo; j < hi; ++j) {
      float x = std::fabs((j - center + 0.5f) / fscale);
      float v = x < 1.0f ? 1.0f - x : 0.0f;
      row[j - lo] = v;
      total += v;
    }
    if (total > 0.0f)
      for (int j = 0; j < hi - lo; ++j) row[j] /= total;
    c.xmin[i] = lo;
    c.xsize[i] = hi - lo;
  }
  return c;
}

inline uint8_t clamp_u8(float v) {
  int r = static_cast<int>(v + 0.5f);
  return static_cast<uint8_t>(r < 0 ? 0 : (r > 255 ? 255 : r));
}

// Horizontal pass: (h, in_w, 3) uint8 -> (h, out_w, 3) float.
void resample_h(const uint8_t* src, int h, int in_w, const Coeffs& c,
                int out_w, float* dst) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * in_w * 3;
    float* drow = dst + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const float* w = &c.w[static_cast<size_t>(x) * c.max_taps];
      const int lo = c.xmin[x], n = c.xsize[x];
      float r = 0, g = 0, b = 0;
      for (int j = 0; j < n; ++j) {
        const uint8_t* p = srow + static_cast<size_t>(lo + j) * 3;
        r += w[j] * p[0];
        g += w[j] * p[1];
        b += w[j] * p[2];
      }
      drow[x * 3 + 0] = r;
      drow[x * 3 + 1] = g;
      drow[x * 3 + 2] = b;
    }
  }
}

// Vertical pass over the float intermediate -> uint8 rows [row_lo, row_hi).
void resample_v(const float* src, int w, const Coeffs& c, int row_lo,
                int row_hi, uint8_t* dst) {
  for (int y = row_lo; y < row_hi; ++y) {
    const float* cw = &c.w[static_cast<size_t>(y) * c.max_taps];
    const int lo = c.xmin[y], n = c.xsize[y];
    uint8_t* drow = dst + static_cast<size_t>(y - row_lo) * w * 3;
    for (int x = 0; x < w * 3; ++x) {
      float acc = 0;
      for (int j = 0; j < n; ++j)
        acc += cw[j] * src[(static_cast<size_t>(lo) + j) * w * 3 + x];
      drow[x] = clamp_u8(acc);
    }
  }
}

// ---------------------------------------------------------------------------
// Decode one JPEG file to uint8 RGB. Picks IDCT scale M/8 (M in 1..8) so the
// decoded shorter side stays >= min_side (when fast_dct), like PIL draft().
// Returns true on success; *w/*h are the decoded dims.
// ---------------------------------------------------------------------------
bool decode_jpeg(const char* path, int min_side, bool fast_dct,
                 std::vector<uint8_t>& pixels, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (fast_dct && min_side > 0) {
    const int src_min =
        static_cast<int>(cinfo.image_width < cinfo.image_height
                             ? cinfo.image_width
                             : cinfo.image_height);
    int m = 8;
    // smallest M/8 with floor(src_min * M / 8) still >= min_side
    while (m > 1 && (src_min * (m - 1)) / 8 >= min_side) --m;
    cinfo.scale_num = static_cast<unsigned>(m);
    cinfo.scale_denom = 8;
    cinfo.dct_method = JDCT_ISLOW;  // keep quality; scaling gives the speed
  }
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  const int ncomp = cinfo.output_components;  // 3 after JCS_RGB
  pixels.resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<uint8_t> line(static_cast<size_t>(*w) * ncomp);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowptr = &pixels[static_cast<size_t>(cinfo.output_scanline) * *w * 3];
    if (ncomp == 3) {
      jpeg_read_scanlines(&cinfo, &rowptr, 1);
    } else {  // grayscale safety net
      uint8_t* lp = line.data();
      jpeg_read_scanlines(&cinfo, &lp, 1);
      for (int x = 0; x < *w; ++x)
        rowptr[x * 3] = rowptr[x * 3 + 1] = rowptr[x * 3 + 2] = line[x];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Decode one PNG to uint8 RGB via the libpng 1.6 simplified API (alpha is
// composited onto black like PIL's .convert("RGB") on RGBA).
bool decode_png(const char* path, std::vector<uint8_t>& pixels, int* w,
                int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  pixels.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, pixels.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// Sniff the container from magic bytes and decode to uint8 RGB.
bool decode_image(const char* path, int min_side, bool fast_dct,
                  std::vector<uint8_t>& pixels, int* w, int* h) {
  unsigned char magic[8] = {0};
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  size_t got = std::fread(magic, 1, sizeof(magic), f);
  std::fclose(f);
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF)
    return decode_jpeg(path, min_side, fast_dct, pixels, w, h);
  if (got >= 8 && !std::memcmp(magic, "\x89PNG\r\n\x1a\n", 8))
    return decode_png(path, pixels, w, h);
  return false;
}

// Aspect-preserving resize dims: shorter side -> size (dataset.decode_resized).
// Python's round() is banker's (half-to-even); nearbyint under the default
// FE_TONEAREST mode matches it, keeping native and PIL paths dim-identical
// on exact-.5 products (e.g. 501x448 @224: round(250.5) = 250, not 251).
void resized_dims(int w, int h, int size, int* nw, int* nh) {
  const double scale = static_cast<double>(size) / (w < h ? w : h);
  *nw = static_cast<int>(std::nearbyint(w * scale));
  *nh = static_cast<int>(std::nearbyint(h * scale));
  if (*nw < size) *nw = size;
  if (*nh < size) *nh = size;
}

// Decode + resize(shorter->size) + square crop at fractional offset -> out.
bool decode_resize_crop(const char* path, int size, float off_x, float off_y,
                        bool fast_dct, uint8_t* out) {
  std::vector<uint8_t> pix;
  int w = 0, h = 0;
  if (!decode_image(path, size, fast_dct, pix, &w, &h)) return false;
  int nw = 0, nh = 0;
  resized_dims(w, h, size, &nw, &nh);
  // Offset contract: off < 0 means center crop ((n-size)//2, matching
  // square_crop's default); otherwise off in [0,1) maps uniformly onto the
  // inclusive range {0..n-size} like rng.integers(0, n-size+1).
  auto crop_pos = [](float off, int span) {
    if (off < 0.0f) return span / 2;
    int p = static_cast<int>(off * (span + 1));
    return p > span ? span : p;
  };
  const int left = crop_pos(off_x, nw - size);
  const int top = crop_pos(off_y, nh - size);
  // Horizontal pass over all rows (vertical taps need them) but only the
  // cropped columns: the window [left, left+size) of the virtual nw-wide
  // resized image maps straight to source space, so coefficients for the
  // crop are identical to a full resize restricted to those columns.
  const float sx = static_cast<float>(w) / nw;
  const Coeffs chw = make_coeffs(w, size, left * sx, (left + size) * sx);
  std::vector<float> mid(static_cast<size_t>(h) * size * 3);
  resample_h(pix.data(), h, w, chw, size, mid.data());
  const float sy = static_cast<float>(h) / nh;
  const Coeffs cv = make_coeffs(h, nh, 0.0f, static_cast<float>(h));
  resample_v(mid.data(), size, cv, top, top + size, out);
  return true;
}

// ---------------------------------------------------------------------------
// Thread pool with a parallel-for batch primitive.
// ---------------------------------------------------------------------------
struct Pool {
  std::vector<std::thread> threads;
  std::mutex run_m;  // serializes concurrent run() callers (shared_pool is
                     // process-wide and Python prefetch threads can overlap)
  std::mutex m;
  std::condition_variable cv_work, cv_done;
  std::function<void(int)> job;
  int n_items = 0;
  std::atomic<int> next{0};
  std::atomic<int> remaining{0};
  uint64_t generation = 0;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      threads.emplace_back([this] { worker(); });
  }

  void worker() {
    uint64_t seen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(m);
        cv_work.wait(lk, [&] { return stop || generation != seen; });
        if (stop) return;
        seen = generation;
      }
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n_items) break;
        job(i);
        if (remaining.fetch_sub(1) == 1) {
          std::lock_guard<std::mutex> lk(m);
          cv_done.notify_all();
        }
      }
    }
  }

  void run(int n, std::function<void(int)> fn) {
    if (n <= 0) return;
    std::lock_guard<std::mutex> run_lk(run_m);
    {
      std::lock_guard<std::mutex> lk(m);
      job = std::move(fn);
      n_items = n;
      next.store(0);
      remaining.store(n);
      ++generation;
      cv_work.notify_all();
    }
    std::unique_lock<std::mutex> lk(m);
    cv_done.wait(lk, [&] { return remaining.load() == 0; });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(m);
      stop = true;
      cv_work.notify_all();
    }
    for (auto& t : threads) t.join();
  }
};

}  // namespace

extern "C" {

void* satn_pool_create(int n_threads) {
  if (n_threads < 1) n_threads = 1;
  return new Pool(n_threads);
}

void satn_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Decode batch: paths[i] -> out + i*size*size*3 (uint8 RGB square crops).
// offs: 2n floats in [0,1] (x, y crop offsets; 0.5 = center crop).
// ok[i]: 1 on success, 0 on failure (caller falls back per-image).
void satn_decode_batch(void* pool, const char** paths, int n, int size,
                       const float* offs, int fast_dct, unsigned char* out,
                       unsigned char* ok) {
  const size_t stride = static_cast<size_t>(size) * size * 3;
  static_cast<Pool*>(pool)->run(n, [&](int i) {
    ok[i] = decode_resize_crop(paths[i], size, offs[2 * i], offs[2 * i + 1],
                               fast_dct != 0, out + i * stride)
                ? 1
                : 0;
  });
}

// Decode + resize shorter side -> size, full aspect kept (for the RAM cache
// path, dataset.decode_resized).  Writes (nh, nw, 3) uint8 into out if it
// fits in cap bytes and returns nh*nw*3; returns -(needed) if cap is too
// small (caller re-calls with a bigger buffer); returns 0 on decode failure.
long satn_decode_resized(const char* path, int size, int fast_dct,
                         unsigned char* out, long cap, int* out_w,
                         int* out_h) {
  std::vector<uint8_t> pix;
  int w = 0, h = 0;
  if (!decode_image(path, size, fast_dct != 0, pix, &w, &h)) return 0;
  int nw = 0, nh = 0;
  resized_dims(w, h, size, &nw, &nh);
  const long needed = static_cast<long>(nw) * nh * 3;
  if (needed > cap) return -needed;
  const Coeffs chh = make_coeffs(w, nw, 0.0f, static_cast<float>(w));
  std::vector<float> mid(static_cast<size_t>(h) * nw * 3);
  resample_h(pix.data(), h, w, chh, nw, mid.data());
  const Coeffs cv = make_coeffs(h, nh, 0.0f, static_cast<float>(h));
  resample_v(mid.data(), nw, cv, 0, nh, out);
  *out_w = nw;
  *out_h = nh;
  return needed;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Corpus BLEU/GLEU statistics (exact mirror of evalx/metrics._corpus_stats):
// per-order clipped-precision sums + GLEU best-reference match/total sums.
// Validation is host-scoring-bound once device decode is fast; this moves the
// n-gram counting onto the C++ thread pool. Counts are integers, so results
// are bit-identical to the Python path (which stays as fallback + oracle).
// ---------------------------------------------------------------------------

namespace {

constexpr int kMaxN = 4;

struct Gram {
  int32_t t[kMaxN];
  int8_t n;
  bool operator==(const Gram& o) const {
    if (n != o.n) return false;
    for (int i = 0; i < n; ++i)
      if (t[i] != o.t[i]) return false;
    return true;
  }
};

struct GramHash {
  size_t operator()(const Gram& g) const {
    uint64_t h = 1469598103934665603ull ^ static_cast<uint64_t>(g.n);
    for (int i = 0; i < g.n; ++i) {
      h ^= static_cast<uint64_t>(static_cast<uint32_t>(g.t[i]));
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h ^ (h >> 32));
  }
};

using GramCount = std::unordered_map<Gram, int, GramHash>;

void count_ngrams(const int32_t* seq, int len, int n, GramCount& out) {
  for (int i = 0; i + n <= len; ++i) {
    Gram g;
    g.n = static_cast<int8_t>(n);
    for (int j = 0; j < n; ++j) g.t[j] = seq[i + j];
    ++out[g];
  }
}

struct SentenceStats {
  long num[kMaxN + 1] = {0};
  long den[kMaxN + 1] = {0};
  long hyp_len = 0, ref_len = 0;
  long gleu_match = 0, gleu_all = 0;
};

}  // namespace

extern "C" {

// hyps: (B, HT) int32 padded; hyp_lens: (B,). refs: (B, R, T) int32; ref token
// runs are refs[b][r][0:ref_lens[b][r]] (caller pre-strips <START>/<END>).
// out: 12 longs — num[1..4], den[1..4], hyp_len_total, ref_len_total,
// gleu_match, gleu_all.
void satn_corpus_stats(void* pool, const int32_t* hyps, const int32_t* hyp_lens,
                       int b, int ht, const int32_t* refs,
                       const int32_t* ref_lens, int r, int t, long* out) {
  std::vector<SentenceStats> stats(b);
  auto work = [&](int i) {
    SentenceStats& s = stats[i];
    const int32_t* hyp = hyps + static_cast<size_t>(i) * ht;
    const int hlen = hyp_lens[i];
    s.hyp_len = hlen;
    // closest reference length, ties toward the shorter (nltk rule)
    int best_diff = 1 << 30, best_len = 0;
    for (int j = 0; j < r; ++j) {
      const int rl = ref_lens[static_cast<size_t>(i) * r + j];
      const int diff = rl > hlen ? rl - hlen : hlen - rl;
      if (diff < best_diff || (diff == best_diff && rl < best_len)) {
        best_diff = diff;
        best_len = rl;
      }
    }
    s.ref_len = best_len;

    GramCount hyp_c[kMaxN];
    for (int n = 1; n <= kMaxN; ++n)
      count_ngrams(hyp, hlen, n, hyp_c[n - 1]);
    std::vector<std::array<GramCount, kMaxN>> ref_c(r);
    for (int j = 0; j < r; ++j) {
      const int32_t* ref = refs + (static_cast<size_t>(i) * r + j) * t;
      const int rl = ref_lens[static_cast<size_t>(i) * r + j];
      for (int n = 1; n <= kMaxN; ++n)
        count_ngrams(ref, rl, n, ref_c[j][n - 1]);
    }
    // BLEU clipped precision per order
    for (int n = 1; n <= kMaxN; ++n) {
      long clipped = 0, total = 0;
      for (const auto& kv : hyp_c[n - 1]) {
        int max_ref = 0;
        for (int j = 0; j < r; ++j) {
          auto it = ref_c[j][n - 1].find(kv.first);
          if (it != ref_c[j][n - 1].end() && it->second > max_ref)
            max_ref = it->second;
        }
        clipped += kv.second < max_ref ? kv.second : max_ref;
        total += kv.second;
      }
      s.num[n] = clipped;
      s.den[n] = total < 1 ? 1 : total;  // nltk's denominator clamp
    }
    // GLEU: best reference by tp/n_all ratio
    long tpfp = 0;
    for (int n = 0; n < kMaxN; ++n)
      for (const auto& kv : hyp_c[n]) tpfp += kv.second;
    long best_tp = 0, best_all = 0;
    bool have = false;
    for (int j = 0; j < r; ++j) {
      long tpfn = 0, tp = 0;
      for (int n = 0; n < kMaxN; ++n) {
        for (const auto& kv : ref_c[j][n]) {
          tpfn += kv.second;
          auto it = hyp_c[n].find(kv.first);
          if (it != hyp_c[n].end())
            tp += kv.second < it->second ? kv.second : it->second;
        }
      }
      const long n_all = tpfp > tpfn ? tpfp : tpfn;
      if (n_all > 0 &&
          (!have || tp * best_all > best_tp * n_all)) {  // tp/all strictly >
        best_tp = tp;
        best_all = n_all;
        have = true;
      }
    }
    if (have) {
      s.gleu_match = best_tp;
      s.gleu_all = best_all;
    }
  };
  if (pool) {
    static_cast<Pool*>(pool)->run(b, work);
  } else {
    for (int i = 0; i < b; ++i) work(i);
  }
  // layout: num[1..4] den[1..4] hyp_len ref_len gleu_match gleu_all
  for (int i = 0; i < 12; ++i) out[i] = 0;
  for (const SentenceStats& s : stats) {
    for (int n = 1; n <= kMaxN; ++n) {
      out[n - 1] += s.num[n];
      out[4 + n - 1] += s.den[n];
    }
    out[8] += s.hyp_len;
    out[9] += s.ref_len;
    out[10] += s.gleu_match;
    out[11] += s.gleu_all;
  }
}

}  // extern "C"
