// sampio — native baseband sample transport runtime.
//
// TPU-native analogue of the reference's baseband gateway + radio layer
// (include/srsran/gateways/baseband/, lib/radio/zmq + file-based flows):
// a lock-free SPSC timestamped ring buffer for multi-channel cf32 samples
// (the rx->tx timeline between the sample source and the slot conductor),
// plus a simple cf32 file reader/writer for record/replay.  Exposed as a
// C ABI consumed from Python via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsampio.so sampio.cpp

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>

extern "C" {

// ---------------------------------------------------------------- ring

// Timestamped multi-channel sample block ring. Single producer, single
// consumer, wait-free. Samples are interleaved per block:
// [channels][count] cf32.
struct sampio_ring {
  uint64_t capacity;        // samples per channel (power of two)
  uint64_t mask;
  uint32_t nof_channels;
  alignas(64) std::atomic<uint64_t> write_pos;  // absolute sample index
  alignas(64) std::atomic<uint64_t> read_pos;
  uint64_t base_timestamp;  // timestamp of absolute sample 0
  float*   data;            // [channels][capacity] complex interleaved (2 floats)
};

static uint64_t next_pow2(uint64_t v) {
  uint64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

void* sampio_ring_create(uint64_t capacity, uint32_t nof_channels) {
  auto* r = new (std::nothrow) sampio_ring();
  if (!r) return nullptr;
  r->capacity = next_pow2(capacity);
  r->mask = r->capacity - 1;
  r->nof_channels = nof_channels;
  r->write_pos.store(0, std::memory_order_relaxed);
  r->read_pos.store(0, std::memory_order_relaxed);
  r->base_timestamp = 0;
  r->data = static_cast<float*>(
      std::aligned_alloc(64, sizeof(float) * 2 * r->capacity * nof_channels));
  if (!r->data) { delete r; return nullptr; }
  return r;
}

void sampio_ring_destroy(void* h) {
  auto* r = static_cast<sampio_ring*>(h);
  if (!r) return;
  std::free(r->data);
  delete r;
}

uint64_t sampio_ring_capacity(void* h) {
  return static_cast<sampio_ring*>(h)->capacity;
}

// Samples available to read / space available to write (per channel).
uint64_t sampio_ring_readable(void* h) {
  auto* r = static_cast<sampio_ring*>(h);
  return r->write_pos.load(std::memory_order_acquire) -
         r->read_pos.load(std::memory_order_relaxed);
}

uint64_t sampio_ring_writable(void* h) {
  auto* r = static_cast<sampio_ring*>(h);
  return r->capacity - (r->write_pos.load(std::memory_order_relaxed) -
                        r->read_pos.load(std::memory_order_acquire));
}

// Write `count` samples per channel from `src` ([channels][count] cf32
// interleaved floats). Returns samples written (0 if insufficient space —
// all-or-nothing, a block never tears).
uint64_t sampio_ring_write(void* h, const float* src, uint64_t count) {
  auto* r = static_cast<sampio_ring*>(h);
  if (sampio_ring_writable(h) < count) return 0;
  uint64_t w = r->write_pos.load(std::memory_order_relaxed);
  for (uint32_t c = 0; c < r->nof_channels; ++c) {
    const float* s = src + 2 * c * count;
    float* base = r->data + 2 * c * r->capacity;
    uint64_t idx = w & r->mask;
    uint64_t first = (idx + count <= r->capacity) ? count : (r->capacity - idx);
    std::memcpy(base + 2 * idx, s, 2 * first * sizeof(float));
    if (first < count)
      std::memcpy(base, s + 2 * first, 2 * (count - first) * sizeof(float));
  }
  r->write_pos.store(w + count, std::memory_order_release);
  return count;
}

// Read `count` samples per channel into `dst`; returns the absolute sample
// index (timestamp) of the first sample read via *timestamp. All-or-nothing.
uint64_t sampio_ring_read(void* h, float* dst, uint64_t count,
                          uint64_t* timestamp) {
  auto* r = static_cast<sampio_ring*>(h);
  if (sampio_ring_readable(h) < count) return 0;
  uint64_t rd = r->read_pos.load(std::memory_order_relaxed);
  for (uint32_t c = 0; c < r->nof_channels; ++c) {
    float* d = dst + 2 * c * count;
    const float* base = r->data + 2 * c * r->capacity;
    uint64_t idx = rd & r->mask;
    uint64_t first = (idx + count <= r->capacity) ? count : (r->capacity - idx);
    std::memcpy(d, base + 2 * idx, 2 * first * sizeof(float));
    if (first < count)
      std::memcpy(d + 2 * first, base, 2 * (count - first) * sizeof(float));
  }
  if (timestamp) *timestamp = r->base_timestamp + rd;
  r->read_pos.store(rd + count, std::memory_order_release);
  return count;
}

// ---------------------------------------------------------------- file IO

// cf32 file with a tiny header: magic, channels, sample_rate.
struct sampio_file {
  FILE*    f;
  uint32_t nof_channels;
  double   sample_rate;
};

static const uint32_t SAMPIO_MAGIC = 0x53494f31;  // "SIO1"

void* sampio_file_open_write(const char* path, uint32_t nof_channels,
                             double sample_rate) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  std::fwrite(&SAMPIO_MAGIC, 4, 1, f);
  std::fwrite(&nof_channels, 4, 1, f);
  std::fwrite(&sample_rate, 8, 1, f);
  auto* s = new sampio_file{f, nof_channels, sample_rate};
  return s;
}

void* sampio_file_open_read(const char* path, uint32_t* nof_channels,
                            double* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic = 0, ch = 0;
  double sr = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != SAMPIO_MAGIC ||
      std::fread(&ch, 4, 1, f) != 1 || std::fread(&sr, 8, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  if (nof_channels) *nof_channels = ch;
  if (sample_rate) *sample_rate = sr;
  auto* s = new sampio_file{f, ch, sr};
  return s;
}

uint64_t sampio_file_write(void* h, const float* src, uint64_t count) {
  auto* s = static_cast<sampio_file*>(h);
  return std::fwrite(src, 2 * sizeof(float) * s->nof_channels, count, s->f);
}

uint64_t sampio_file_read(void* h, float* dst, uint64_t count) {
  auto* s = static_cast<sampio_file*>(h);
  return std::fread(dst, 2 * sizeof(float) * s->nof_channels, count, s->f);
}

void sampio_file_close(void* h) {
  auto* s = static_cast<sampio_file*>(h);
  if (!s) return;
  std::fclose(s->f);
  delete s;
}

}  // extern "C"
