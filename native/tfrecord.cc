// lbt-tpu native TFRecord input pipeline.
//
// Streams ImageNet-class training data straight from TFRecord shards —
// the standard at-scale storage format the reference's orphaned
// torchvision module never reached (reference data.py:58-93 scoped
// ImageNet ingestion; this is its production-shaped equivalent):
//
//   TFRecord framing (length + masked CRC32C) -> minimal tf.Example
//   protobuf walk (image/encoded bytes, image/class/label int64) ->
//   libjpeg decode -> RandomResizedCrop+flip (train) / shorter-side
//   resize + center crop (eval) -> normalized float32 NHWC batches,
//
// all in C++ worker threads (OpenMP) behind a double-buffered producer,
// so decode/augment overlaps device compute without the Python GIL.
//
// Determinism: shard order, the shuffle buffer's eviction choices and
// every sample's crop/flip derive from splitmix64 counters keyed by
// (seed, epoch, position) — a given (seed, epoch) replays exactly.
//
// C ABI only (consumed via ctypes from lbt_tpu/data/tfrecord.py).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// counter-based RNG (identical to native/loader.cc)
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

static inline uint64_t key3(uint64_t a, uint64_t b, uint64_t c) {
  return splitmix64(splitmix64(splitmix64(a) ^ b) ^ c);
}

// stateless uniform stream: draw i of key k
static inline double uniform01(uint64_t k, uint64_t i) {
  return (double)(splitmix64(k ^ (i * 0x9e3779b97f4a7c15ull)) >> 11) *
         (1.0 / 9007199254740992.0);  // 53-bit mantissa
}

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), table-based, with the TFRecord mask
// ---------------------------------------------------------------------------

struct Crc32cTable {
  uint32_t t[256];
  Crc32cTable() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? (0x82f63b78u ^ (c >> 1)) : (c >> 1);
      t[i] = c;
    }
  }
};
static const Crc32cTable kCrc;

static uint32_t crc32c(const uint8_t* p, size_t n) {
  uint32_t c = 0xffffffffu;
  for (size_t i = 0; i < n; ++i) c = kCrc.t[(c ^ p[i]) & 0xff] ^ (c >> 8);
  return c ^ 0xffffffffu;
}

// TFRecord "masked" CRC (the delta encoding from the TFRecord spec)
static inline uint32_t mask_crc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------------
// minimal protobuf wire-format walk for tf.Example
// ---------------------------------------------------------------------------
//
// Example  { Features features = 1; }
// Features { repeated FeatureEntry feature = 1; }   (the map<> encoding)
// FeatureEntry { string key = 1; Feature value = 2; }
// Feature  { BytesList bytes_list = 1; FloatList float_list = 2;
//            Int64List int64_list = 3; }
// BytesList{ repeated bytes value = 1; }
// Int64List{ repeated int64 value = 1; }            (packed or not)

struct Slice {
  const uint8_t* p = nullptr;
  size_t n = 0;
};

static bool read_varint(const uint8_t*& p, const uint8_t* end,
                        uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t b = *p++;
    v |= (uint64_t)(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *out = v;
      return true;
    }
    shift += 7;
  }
  return false;
}

static bool skip_field(const uint8_t*& p, const uint8_t* end, int wire) {
  uint64_t v;
  switch (wire) {
    case 0:
      return read_varint(p, end, &v);
    case 1:
      if ((size_t)(end - p) < 8) return false;
      p += 8;
      return true;
    case 2:
      if (!read_varint(p, end, &v) || (uint64_t)(end - p) < v) return false;
      p += v;
      return true;
    case 5:
      if ((size_t)(end - p) < 4) return false;
      p += 4;
      return true;
    default:
      return false;  // groups unsupported
  }
}

// find submessage field `field` (wire 2) inside [p, p+n)
static bool find_len_field(Slice in, int field, Slice* out,
                           size_t skip_matches = 0) {
  const uint8_t* p = in.p;
  const uint8_t* end = in.p + in.n;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return false;
    int f = (int)(tag >> 3), wire = (int)(tag & 7);
    if (f == field && wire == 2) {
      uint64_t len;
      if (!read_varint(p, end, &len) || (uint64_t)(end - p) < len)
        return false;
      if (skip_matches == 0) {
        out->p = p;
        out->n = (size_t)len;
        return true;
      }
      --skip_matches;
      p += len;
    } else if (!skip_field(p, end, wire)) {
      return false;
    }
  }
  return false;
}

// Parsed per-record fields of interest.
struct ExampleFields {
  Slice image;      // bytes of image/encoded (or raw)
  int64_t label = -1;
  int64_t height = -1, width = -1;  // for raw images
};

static bool parse_feature_int64(Slice feat, int64_t* out) {
  Slice i64;
  if (!find_len_field(feat, 3, &i64)) return false;  // Int64List
  const uint8_t* p = i64.p;
  const uint8_t* end = i64.p + i64.n;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return false;
    int f = (int)(tag >> 3), wire = (int)(tag & 7);
    if (f == 1 && wire == 0) {  // unpacked varint
      uint64_t v;
      if (!read_varint(p, end, &v)) return false;
      *out = (int64_t)v;
      return true;
    }
    if (f == 1 && wire == 2) {  // packed
      uint64_t len;
      if (!read_varint(p, end, &len) || (uint64_t)(end - p) < len)
        return false;
      const uint8_t* q = p;
      uint64_t v;
      if (!read_varint(q, p + len, &v)) return false;
      *out = (int64_t)v;
      return true;
    }
    if (!skip_field(p, end, wire)) return false;
  }
  return false;
}

static bool parse_example(Slice ex, const std::string& image_key,
                          const std::string& label_key,
                          ExampleFields* out) {
  Slice features;
  if (!find_len_field(ex, 1, &features)) return false;
  const uint8_t* p = features.p;
  const uint8_t* end = features.p + features.n;
  bool have_image = false, have_label = false;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return false;
    int f = (int)(tag >> 3), wire = (int)(tag & 7);
    if (f != 1 || wire != 2) {
      if (!skip_field(p, end, wire)) return false;
      continue;
    }
    uint64_t len;
    if (!read_varint(p, end, &len) || (uint64_t)(end - p) < len)
      return false;
    Slice entry{p, (size_t)len};
    p += len;
    Slice key;
    if (!find_len_field(entry, 1, &key)) continue;
    std::string k((const char*)key.p, key.n);
    Slice feat;
    if (!find_len_field(entry, 2, &feat)) continue;
    if (k == image_key) {
      Slice bl, bytes;
      if (find_len_field(feat, 1, &bl) && find_len_field(bl, 1, &bytes)) {
        out->image = bytes;
        have_image = true;
      }
    } else if (k == label_key) {
      have_label = parse_feature_int64(feat, &out->label);
    } else if (k == "image/height") {
      parse_feature_int64(feat, &out->height);
    } else if (k == "image/width") {
      parse_feature_int64(feat, &out->width);
    }
  }
  return have_image && have_label;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) -> RGB uint8
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

// returns empty on failure
static bool decode_jpeg(const uint8_t* data, size_t n,
                        std::vector<uint8_t>* rgb, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  rgb->resize((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// crop + bilinear resize + flip + normalize, writing float32 HWC
// ---------------------------------------------------------------------------

// torchvision RandomResizedCrop box sampler (10 tries, center fallback) —
// mirrors lbt_tpu/data/imagefolder.py::_random_resized_crop_box.
static void rrc_box(uint64_t k, int w, int h, double scale_lo,
                    double scale_hi, int* x0, int* y0, int* cw, int* ch) {
  const double ratio_lo = 3.0 / 4.0, ratio_hi = 4.0 / 3.0;
  const double area = (double)w * h;
  for (int t = 0; t < 10; ++t) {
    double target =
        area * (scale_lo + (scale_hi - scale_lo) * uniform01(k, 4 * t));
    double ar =
        std::exp(std::log(ratio_lo) +
                 (std::log(ratio_hi) - std::log(ratio_lo)) *
                     uniform01(k, 4 * t + 1));
    int tw = (int)std::lround(std::sqrt(target * ar));
    int th = (int)std::lround(std::sqrt(target / ar));
    if (tw > 0 && tw <= w && th > 0 && th <= h) {
      *x0 = (int)(uniform01(k, 4 * t + 2) * (w - tw + 1));
      *y0 = (int)(uniform01(k, 4 * t + 3) * (h - th + 1));
      if (*x0 > w - tw) *x0 = w - tw;
      if (*y0 > h - th) *y0 = h - th;
      *cw = tw;
      *ch = th;
      return;
    }
  }
  double in_ratio = (double)w / h;
  if (in_ratio < ratio_lo) {
    *cw = w;
    *ch = (int)std::lround(w / ratio_lo);
  } else if (in_ratio > ratio_hi) {
    *cw = (int)std::lround(h * ratio_hi);
    *ch = h;
  } else {
    *cw = w;
    *ch = h;
  }
  *x0 = (w - *cw) / 2;
  *y0 = (h - *ch) / 2;
}

// bilinear sample of the box [bx, bx+bw) x [by, by+bh) resized to s x s,
// half-pixel-center convention; optional horizontal flip; /127.5-1.
static void resize_box(const uint8_t* src, int sw, int sh, double bx,
                       double by, double bw, double bh, int s, bool flip,
                       float* out) {
  const double fx = bw / s, fy = bh / s;
  for (int y = 0; y < s; ++y) {
    double syf = by + (y + 0.5) * fy - 0.5;
    int y0 = (int)std::floor(syf);
    double wy = syf - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y0 > sh - 1) y0 = sh - 1;
    if (y1 < 0) y1 = 0;
    if (y1 > sh - 1) y1 = sh - 1;
    for (int x = 0; x < s; ++x) {
      double sxf = bx + (x + 0.5) * fx - 0.5;
      int x0 = (int)std::floor(sxf);
      double wx = sxf - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x0 > sw - 1) x0 = sw - 1;
      if (x1 < 0) x1 = 0;
      if (x1 > sw - 1) x1 = sw - 1;
      int ox = flip ? (s - 1 - x) : x;
      float* o = out + ((size_t)y * s + ox) * 3;
      const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * 3;
      const uint8_t* p01 = src + ((size_t)y0 * sw + x1) * 3;
      const uint8_t* p10 = src + ((size_t)y1 * sw + x0) * 3;
      const uint8_t* p11 = src + ((size_t)y1 * sw + x1) * 3;
      for (int c = 0; c < 3; ++c) {
        double v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                   wy * ((1 - wx) * p10[c] + wx * p11[c]);
        o[c] = (float)(v / 127.5 - 1.0);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// the pipeline
// ---------------------------------------------------------------------------

struct Record {
  std::vector<uint8_t> data;
};

struct TfrPipeline {
  std::vector<std::string> paths;
  int batch = 0, size = 224;
  bool train = true;
  uint64_t seed = 0;
  int n_threads = 0;
  int shuffle_buf = 1024;
  bool check_crc = true;
  std::string image_key = "image/encoded";
  std::string label_key = "image/class/label";

  // per-epoch reader state
  int epoch = 0;
  size_t file_idx = 0;
  std::ifstream in;
  std::vector<int> file_order;
  std::vector<Record> buffer;  // shuffle buffer
  uint64_t draw_counter = 0;
  std::atomic<long> skipped{0};  // malformed/undecodable records

  // double-buffered producer (same protocol as native/loader.cc)
  std::vector<float> buf_x[2];
  std::vector<int32_t> buf_y[2];
  int buf_count[2] = {0, 0};
  int produce_slot = 0, consume_slot = 0;
  int ready[2] = {0, 0};
  bool stop = false;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread producer;

  size_t sample_elems() const { return (size_t)size * size * 3; }

  bool open_next_file() {
    while (file_idx < file_order.size()) {
      in.close();
      in.clear();
      in.open(paths[file_order[file_idx]], std::ios::binary);
      ++file_idx;
      if (in.good()) return true;
    }
    return false;
  }

  // next framed record from the shard stream; false at end of epoch data
  bool next_record(Record* rec) {
    for (;;) {
      if (!in.is_open() || in.peek() == EOF) {
        if (!open_next_file()) return false;
        continue;
      }
      uint8_t hdr[12];
      in.read((char*)hdr, 12);
      if (in.gcount() != 12) continue;  // truncated shard: next file
      uint64_t len;
      std::memcpy(&len, hdr, 8);  // little-endian host assumed (x86/ARM)
      uint32_t len_crc;
      std::memcpy(&len_crc, hdr + 8, 4);
      if (check_crc && mask_crc(crc32c(hdr, 8)) != len_crc) {
        ++skipped;
        continue;  // resync: skip to next file
      }
      if (len > (1ull << 31)) {
        ++skipped;
        continue;
      }
      rec->data.resize((size_t)len);
      in.read((char*)rec->data.data(), (std::streamsize)len);
      uint8_t tail[4];
      in.read((char*)tail, 4);
      if (in.gcount() != 4) continue;
      if (check_crc) {
        uint32_t data_crc;
        std::memcpy(&data_crc, tail, 4);
        if (mask_crc(crc32c(rec->data.data(), rec->data.size())) !=
            data_crc) {
          ++skipped;
          continue;
        }
      }
      return true;
    }
  }

  // next record after shuffle-buffer mixing; false when epoch exhausted
  bool next_shuffled(Record* rec) {
    if (!train || shuffle_buf <= 1) return next_record(rec);
    // fill
    while ((int)buffer.size() < shuffle_buf) {
      Record r;
      if (!next_record(&r)) break;
      buffer.push_back(std::move(r));
    }
    if (buffer.empty()) return false;
    uint64_t k = key3(seed ^ 0x7f7eull, (uint64_t)epoch, draw_counter++);
    size_t j = (size_t)(k % buffer.size());
    *rec = std::move(buffer[j]);
    Record r;
    if (next_record(&r)) {
      buffer[j] = std::move(r);
    } else {
      buffer[j] = std::move(buffer.back());
      buffer.pop_back();
    }
    return true;
  }

  // decode+transform one example into out; false if malformed
  bool materialize(const Record& rec, uint64_t k, float* out_x,
                   int32_t* out_y) {
    ExampleFields f;
    if (!parse_example({rec.data.data(), rec.data.size()}, image_key,
                       label_key, &f))
      return false;
    std::vector<uint8_t> rgb;
    int w, h;
    const uint8_t* px;
    if (f.image.n >= 2 && f.image.p[0] == 0xFF && f.image.p[1] == 0xD8) {
      if (!decode_jpeg(f.image.p, f.image.n, &rgb, &w, &h)) return false;
      px = rgb.data();
    } else if (f.height > 0 && f.width > 0 &&
               f.image.n == (size_t)f.height * f.width * 3) {
      // raw uint8 HWC with explicit image/height, image/width features
      w = (int)f.width;
      h = (int)f.height;
      px = f.image.p;
    } else {
      return false;
    }
    if (train) {
      int x0, y0, cw, ch;
      rrc_box(k, w, h, 0.08, 1.0, &x0, &y0, &cw, &ch);
      bool flip = uniform01(k ^ 0xf11bull, 0) < 0.5;
      resize_box(px, w, h, x0, y0, cw, ch, size, flip, out_x);
    } else {
      int short_side = size * 256 / 224;
      double sc = (double)short_side / (w < h ? w : h);
      double rw = w * sc, rh = h * sc;
      // center crop of size `size` in resized coords -> source box
      double bx = ((rw - size) / 2.0) / sc;
      double by = ((rh - size) / 2.0) / sc;
      resize_box(px, w, h, bx, by, size / sc, size / sc, size, false,
                 out_x);
    }
    *out_y = (int32_t)f.label;
    return true;
  }

  // fill one batch; returns sample count (0 = epoch exhausted)
  int fill(int slot) {
    std::vector<Record> recs;
    recs.reserve(batch);
    Record r;
    while ((int)recs.size() < batch && next_shuffled(&r))
      recs.push_back(std::move(r));
    if (recs.empty()) return 0;
    if (train && (int)recs.size() < batch) return 0;  // drop remainder
    float* out_x = buf_x[slot].data();
    int32_t* out_y = buf_y[slot].data();
    std::vector<uint8_t> ok(recs.size(), 0);
#pragma omp parallel for schedule(dynamic) num_threads(n_threads)
    for (int i = 0; i < (int)recs.size(); ++i) {
      uint64_t k = key3(seed ^ 0x3f21ull, (uint64_t)epoch,
                        draw_counter + (uint64_t)i);
      ok[i] = materialize(recs[i], k, out_x + (size_t)i * sample_elems(),
                          out_y + i)
                  ? 1
                  : 0;
    }
    // compact out malformed records (rare; keeps batch contiguous)
    int cnt = 0;
    for (int i = 0; i < (int)recs.size(); ++i) {
      if (!ok[i]) {
        ++skipped;
        continue;
      }
      if (cnt != i) {
        std::memcpy(out_x + (size_t)cnt * sample_elems(),
                    out_x + (size_t)i * sample_elems(),
                    sizeof(float) * sample_elems());
        out_y[cnt] = out_y[i];
      }
      ++cnt;
    }
    draw_counter += recs.size();
    return cnt;
  }

  void producer_loop() {
    for (;;) {
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return stop || ready[produce_slot] == 0; });
      if (stop) return;
      int slot = produce_slot;
      lk.unlock();
      int cnt = fill(slot);
      lk.lock();
      buf_count[slot] = cnt;
      ready[slot] = 1;
      produce_slot ^= 1;
      cv_full.notify_all();
      if (cnt == 0) return;
    }
  }

  void start_epoch(int ep) {
    join_producer();
    epoch = ep;
    file_idx = 0;
    in.close();
    in.clear();
    buffer.clear();
    draw_counter = 0;
    file_order.resize(paths.size());
    for (size_t i = 0; i < paths.size(); ++i) file_order[i] = (int)i;
    if (train) {
      for (size_t i = paths.size(); i > 1; --i) {
        uint64_t r = key3(seed, (uint64_t)ep ^ 0xf11e5ull, (uint64_t)i);
        std::swap(file_order[i - 1], file_order[r % i]);
      }
    }
    ready[0] = ready[1] = 0;
    produce_slot = consume_slot = 0;
    stop = false;
    producer = std::thread([this] { producer_loop(); });
  }

  int next(float* out_x, int32_t* out_y) {
    std::unique_lock<std::mutex> lk(mu);
    cv_full.wait(lk, [&] { return ready[consume_slot] == 1; });
    int slot = consume_slot;
    int cnt = buf_count[slot];
    if (cnt > 0) {
      std::memcpy(out_x, buf_x[slot].data(),
                  sizeof(float) * (size_t)cnt * sample_elems());
      std::memcpy(out_y, buf_y[slot].data(), sizeof(int32_t) * cnt);
    }
    ready[slot] = 0;
    consume_slot ^= 1;
    cv_empty.notify_all();
    return cnt;
  }

  void join_producer() {
    if (producer.joinable()) {
      {
        std::lock_guard<std::mutex> lk(mu);
        stop = true;
        cv_empty.notify_all();
      }
      producer.join();
      stop = false;
    }
  }

  ~TfrPipeline() { join_producer(); }
};

}  // namespace

extern "C" {

void* lbt_tfr_create(const char** paths, int n_paths, int batch, int size,
                     int train, uint64_t seed, int n_threads,
                     int shuffle_buf, const char* image_key,
                     const char* label_key, int check_crc) {
  auto* P = new TfrPipeline();
  for (int i = 0; i < n_paths; ++i) P->paths.emplace_back(paths[i]);
  P->batch = batch;
  P->size = size;
  P->train = train != 0;
  P->seed = seed;
  P->n_threads = n_threads > 0 ? n_threads
                               : (int)std::thread::hardware_concurrency();
  P->shuffle_buf = shuffle_buf;
  P->check_crc = check_crc != 0;
  if (image_key && *image_key) P->image_key = image_key;
  if (label_key && *label_key) P->label_key = label_key;
  for (int s = 0; s < 2; ++s) {
    P->buf_x[s].resize((size_t)batch * P->sample_elems());
    P->buf_y[s].resize(batch);
  }
  return P;
}

void lbt_tfr_start_epoch(void* p, int epoch) {
  static_cast<TfrPipeline*>(p)->start_epoch(epoch);
}

int lbt_tfr_next(void* p, float* out_x, int32_t* out_y) {
  return static_cast<TfrPipeline*>(p)->next(out_x, out_y);
}

long lbt_tfr_skipped(void* p) {
  return static_cast<TfrPipeline*>(p)->skipped.load();
}

void lbt_tfr_destroy(void* p) { delete static_cast<TfrPipeline*>(p); }

// count records across shards (framing walk only, no parse/decode)
long lbt_tfr_count(const char** paths, int n_paths, int check_crc) {
  long total = 0;
  for (int i = 0; i < n_paths; ++i) {
    std::ifstream in(paths[i], std::ios::binary);
    for (;;) {
      uint8_t hdr[12];
      in.read((char*)hdr, 12);
      if (in.gcount() != 12) break;
      uint64_t len;
      std::memcpy(&len, hdr, 8);
      if (check_crc) {
        uint32_t len_crc;
        std::memcpy(&len_crc, hdr + 8, 4);
        if (mask_crc(crc32c(hdr, 8)) != len_crc) break;
      }
      if (len > (1ull << 31)) break;
      in.seekg((std::streamoff)len + 4, std::ios::cur);
      if (!in.good()) break;
      ++total;
    }
  }
  return total;
}

}  // extern "C"
