// lbt-tpu native data loader.
//
// Host-side input pipeline in C++: per-epoch shuffle plus the reference's
// CIFAR augmentation (random horizontal flip, zero-pad by P, random crop
// back; reference trainer.py:24-28), assembled into batch buffers by an
// OpenMP-parallel producer thread that stays one batch ahead of the
// consumer.  Replaces the host numpy path so augmentation overlaps device
// compute without touching the Python GIL.
//
// Determinism: every sample's augmentation is keyed by
// splitmix64(seed, epoch, global_index) — two loaders with the same seed
// produce identical streams.
//
// C ABI only (consumed via ctypes from lbt_tpu/data/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, high-quality, counter-based.
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

static inline uint64_t key3(uint64_t a, uint64_t b, uint64_t c) {
  return splitmix64(splitmix64(splitmix64(a) ^ b) ^ c);
}

struct Loader {
  const float* images;   // [n, h, w, c] (borrowed; caller keeps alive)
  const int32_t* labels; // [n]
  int n, h, w, c, batch, pad;
  bool flip;
  uint64_t seed;
  int n_threads;

  std::vector<int32_t> order;
  int epoch = 0;
  int cursor = 0;  // next sample index within the epoch

  // double-buffered producer
  std::vector<float> buf_x[2];
  std::vector<int32_t> buf_y[2];
  int buf_count[2] = {0, 0};
  int produce_slot = 0, consume_slot = 0;
  int ready[2] = {0, 0};  // 0 empty, 1 full
  bool stop = false;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread producer;

  size_t sample_elems() const { return (size_t)h * w * c; }

  void shuffle(int ep) {
    for (int i = 0; i < n; ++i) order[i] = i;
    // Fisher-Yates with counter-based RNG
    for (int i = n - 1; i > 0; --i) {
      uint64_t r = key3(seed, (uint64_t)ep ^ 0x5affe11ull, (uint64_t)i);
      int j = (int)(r % (uint64_t)(i + 1));
      std::swap(order[i], order[j]);
    }
  }

  void augment_one(int src_idx, uint64_t k, float* out) const {
    const float* src = images + (size_t)src_idx * sample_elems();
    const int P = pad;
    bool do_flip = flip && ((k & 1ull) != 0);
    int oh = 0, ow = 0;
    if (P > 0) {
      oh = (int)((k >> 1) % (uint64_t)(2 * P + 1));
      ow = (int)((k >> 9) % (uint64_t)(2 * P + 1));
    }
    // output pixel (y, x) reads padded image at (y + oh - ?, ...):
    // padded has the original at offset P; crop starts at (oh, ow) so
    // out(y, x) = padded(y + oh, x + ow) = src(y + oh - P, x + ow - P).
    for (int y = 0; y < h; ++y) {
      int sy = y + oh - P;
      if (sy < 0 || sy >= h) {
        std::memset(out + (size_t)y * w * c, 0, sizeof(float) * w * c);
        continue;
      }
      for (int x = 0; x < w; ++x) {
        int sx = x + ow - P;
        float* o = out + ((size_t)y * w + x) * c;
        if (sx < 0 || sx >= w) {
          std::memset(o, 0, sizeof(float) * c);
          continue;
        }
        int rx = do_flip ? (w - 1 - sx) : sx;
        const float* s = src + ((size_t)sy * w + rx) * c;
        std::memcpy(o, s, sizeof(float) * c);
      }
    }
  }

  // fill one batch; returns number of samples (0 = epoch exhausted)
  int fill(int slot) {
    int remaining = n - cursor;
    int count = remaining < batch ? 0 : batch;  // drop remainder
    if (count == 0) return 0;
    int start = cursor;
    cursor += count;
    float* out_x = buf_x[slot].data();
    int32_t* out_y = buf_y[slot].data();
#pragma omp parallel for schedule(static) num_threads(n_threads)
    for (int i = 0; i < count; ++i) {
      int src = order[start + i];
      uint64_t k = key3(seed ^ 0xa06u, (uint64_t)epoch,
                        (uint64_t)(start + i));
      augment_one(src, k, out_x + (size_t)i * sample_elems());
      out_y[i] = labels[src];
    }
    return count;
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
      if (cnt == 0) return;  // epoch done; restart thread next epoch
    }
  }

  void start_epoch(int ep) {
    join_producer();
    epoch = ep;
    cursor = 0;
    ready[0] = ready[1] = 0;
    produce_slot = consume_slot = 0;
    stop = false;
    shuffle(ep);
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

  ~Loader() { join_producer(); }
};

}  // namespace

extern "C" {

void* lbt_loader_create(const float* images, const int32_t* labels,
                        int n, int h, int w, int c, int batch, int pad,
                        int flip, uint64_t seed, int n_threads) {
  auto* L = new Loader();
  L->images = images;
  L->labels = labels;
  L->n = n; L->h = h; L->w = w; L->c = c;
  L->batch = batch; L->pad = pad; L->flip = flip != 0;
  L->seed = seed;
  L->n_threads = n_threads > 0 ? n_threads
                               : (int)std::thread::hardware_concurrency();
  L->order.resize(n);
  for (int s = 0; s < 2; ++s) {
    L->buf_x[s].resize((size_t)batch * L->sample_elems());
    L->buf_y[s].resize(batch);
  }
  return L;
}

void lbt_loader_start_epoch(void* p, int epoch) {
  static_cast<Loader*>(p)->start_epoch(epoch);
}

int lbt_loader_next(void* p, float* out_x, int32_t* out_y) {
  return static_cast<Loader*>(p)->next(out_x, out_y);
}

void lbt_loader_destroy(void* p) { delete static_cast<Loader*>(p); }

}  // extern "C"
