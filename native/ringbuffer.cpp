// Lock-free SPSC ring buffer — the native transport of the streaming
// runtime, equivalent to the reference's atomic_queue::AtomicQueueB2 SPSC
// queues (include/audio_platforms.h:211-217) used between the real-time
// callback and worker threads (AsyncWavWriter, AsyncLogger, MetaQueue).
//
// Single-producer / single-consumer, wait-free push/pop of float frames.
// Exposed through a C ABI for ctypes; the Python streaming engine uses it to
// hand blocks to a host audio callback without locks.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct RingBuffer {
  float* data;
  uint64_t capacity;  // in floats, power of two
  alignas(64) std::atomic<uint64_t> head{0};  // write index (producer)
  alignas(64) std::atomic<uint64_t> tail{0};  // read index (consumer)
  std::atomic<uint64_t> dropped{0};
};

inline uint64_t next_pow2(uint64_t v) {
  uint64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

RingBuffer* ringbuffer_create(uint64_t min_capacity_floats) {
  auto* rb = new RingBuffer();
  rb->capacity = next_pow2(min_capacity_floats);
  rb->data = new (std::nothrow) float[rb->capacity];
  if (!rb->data) { delete rb; return nullptr; }
  return rb;
}

void ringbuffer_destroy(RingBuffer* rb) {
  if (!rb) return;
  delete[] rb->data;
  delete rb;
}

uint64_t ringbuffer_capacity(const RingBuffer* rb) { return rb->capacity; }

uint64_t ringbuffer_size(const RingBuffer* rb) {
  return rb->head.load(std::memory_order_acquire) -
         rb->tail.load(std::memory_order_acquire);
}

uint64_t ringbuffer_dropped(const RingBuffer* rb) {
  return rb->dropped.load(std::memory_order_relaxed);
}

// Producer: push n floats; returns number actually written (drops the rest,
// counting them — the reference's dropped-frame accounting, SURVEY §5.3).
uint64_t ringbuffer_push(RingBuffer* rb, const float* src, uint64_t n) {
  uint64_t head = rb->head.load(std::memory_order_relaxed);
  uint64_t tail = rb->tail.load(std::memory_order_acquire);
  uint64_t free_space = rb->capacity - (head - tail);
  uint64_t to_write = n < free_space ? n : free_space;
  uint64_t mask = rb->capacity - 1;
  for (uint64_t i = 0; i < to_write; ++i)
    rb->data[(head + i) & mask] = src[i];
  rb->head.store(head + to_write, std::memory_order_release);
  if (to_write < n)
    rb->dropped.fetch_add(n - to_write, std::memory_order_relaxed);
  return to_write;
}

// Consumer: pop up to n floats; returns the number read.
uint64_t ringbuffer_pop(RingBuffer* rb, float* dst, uint64_t n) {
  uint64_t tail = rb->tail.load(std::memory_order_relaxed);
  uint64_t head = rb->head.load(std::memory_order_acquire);
  uint64_t avail = head - tail;
  uint64_t to_read = n < avail ? n : avail;
  uint64_t mask = rb->capacity - 1;
  for (uint64_t i = 0; i < to_read; ++i)
    dst[i] = rb->data[(tail + i) & mask];
  rb->tail.store(tail + to_read, std::memory_order_release);
  return to_read;
}

}  // extern "C"
