// Threaded batch sampler / prefetcher for training data.
//
// Native replacement for the role of torch's DataLoader + on-GPU collate in
// the reference (nerf/provider.py:398-459): the host side of the input
// pipeline. Images stay as one big uint8 [V, P, C] buffer (owned by Python,
// typically a np.memmap); worker threads sample (view, pixel) pairs, gather
// and normalize pixels to float32, and park finished batches in a bounded
// ring so the accelerator never waits on the host.
//
// C ABI for ctypes (focnerf_tpu/data/native_loader.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct Batch {
  int32_t view;
  std::vector<int32_t> inds;     // [n]
  std::vector<float> pixels;     // [n, c]
};

struct Loader {
  const uint8_t* images = nullptr;  // [views, pixels, channels]
  int64_t views = 0, pixels = 0, channels = 0;
  int batch_rays = 0;
  uint64_t rng_state = 0x9E3779B97F4A7C15ull;

  std::queue<Batch> ready;
  size_t capacity = 4;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  uint64_t next_rand() {
    // splitmix64 — deterministic, seedable
    uint64_t z = (rng_state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
};

void worker_loop(Loader* L, uint64_t seed) {
  uint64_t state = seed;
  auto rnd = [&state]() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  const float inv255 = 1.0f / 255.0f;
  while (!L->stop.load()) {
    Batch b;
    b.view = (int32_t)(rnd() % (uint64_t)L->views);
    b.inds.resize(L->batch_rays);
    b.pixels.resize((size_t)L->batch_rays * L->channels);
    const uint8_t* img = L->images + (int64_t)b.view * L->pixels * L->channels;
    for (int i = 0; i < L->batch_rays; ++i) {
      int64_t p = (int64_t)(rnd() % (uint64_t)L->pixels);
      b.inds[i] = (int32_t)p;
      const uint8_t* src = img + p * L->channels;
      float* dst = b.pixels.data() + (size_t)i * L->channels;
      for (int c = 0; c < L->channels; ++c) dst[c] = src[c] * inv255;
    }
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_full.wait(lk, [L] { return L->ready.size() < L->capacity || L->stop.load(); });
    if (L->stop.load()) return;
    L->ready.push(std::move(b));
    L->cv_empty.notify_one();
  }
}

}  // namespace

extern "C" {

void* loader_create(const uint8_t* images, int64_t views, int64_t pixels,
                    int64_t channels, int batch_rays, int n_threads,
                    int queue_capacity, uint64_t seed) {
  auto* L = new Loader();
  L->images = images;
  L->views = views;
  L->pixels = pixels;
  L->channels = channels;
  L->batch_rays = batch_rays;
  L->capacity = queue_capacity > 0 ? (size_t)queue_capacity : 4;
  L->rng_state = seed ? seed : 0x9E3779B97F4A7C15ull;
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back(worker_loop, L, L->next_rand());
  return L;
}

// Blocks until a batch is ready. Writes view index, ray indices [batch_rays]
// and float pixels [batch_rays * channels] into caller-owned buffers.
void loader_next(void* handle, int32_t* view_out, int32_t* inds_out,
                 float* pixels_out) {
  auto* L = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_empty.wait(lk, [L] { return !L->ready.empty(); });
    b = std::move(L->ready.front());
    L->ready.pop();
    L->cv_full.notify_one();
  }
  *view_out = b.view;
  std::memcpy(inds_out, b.inds.data(), b.inds.size() * sizeof(int32_t));
  std::memcpy(pixels_out, b.pixels.data(), b.pixels.size() * sizeof(float));
}

void loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_full.notify_all();
  L->cv_empty.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
