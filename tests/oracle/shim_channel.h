// cpp.algorithms surface for include/request.h + include/channel.h
// (the L3 engine's request queues and equal-gain crossfade writers).
// Nothing here copies reference logic — these are the absent utility
// primitives the reference imports from its sibling repo.
#pragma once

#include <cstdint>
#include <deque>
#include <utility>

namespace imajuscule {

// pointer low-bit tagging helper (TaggedBuffer, request.h:129-146)
template <int NBits>
inline uintptr_t removeLowBits(uintptr_t v) {
  return v & ~((uintptr_t(1) << NBits) - uintptr_t(1));
}

struct NonCopyable {
  NonCopyable() = default;
  NonCopyable(const NonCopyable&) = delete;
  NonCopyable& operator=(const NonCopyable&) = delete;
  NonCopyable(NonCopyable&&) = default;
  NonCopyable& operator=(NonCopyable&&) = default;
};

// request queues (channel.h:72-86). The reference's fifo is a ring buffer;
// a deque gives the same emplace/front/pop/reset surface.
template <typename T>
struct fifo {
  template <typename... Args>
  void emplace(Args&&... a) {
    q.emplace_back(std::forward<Args>(a)...);
  }
  void cancel_emplace() { q.pop_back(); }
  T& front() { return q.front(); }
  T const& front() const { return q.front(); }
  void pop() { q.pop_front(); }
  bool empty() const { return q.empty(); }
  std::size_t size() const { return q.size(); }
  void reset() { q.clear(); }

 private:
  std::deque<T> q;
};

template <typename T>
struct fifo1 : fifo<T> {};  // MaxQueueSize::One — capacity enforced by use

}  // namespace imajuscule

namespace imajuscule::audio {
// request.h's Sounds-cache constructor is never instantiated by the oracle
// (we build Requests from explicit soundBuffers); the declaration satisfies
// the non-instantiated member signature.
template <Atomicity A>
class Sounds;
}  // namespace imajuscule::audio
