// Supplements the shims so /root/reference/include/gen.crtp.h (the
// ImplCRTP polyphony core) and gen.sine.h compile and RUN as a test
// oracle: the voice pool container, and the driver-side clock/jitter
// globals it declares. Original shim code; nothing copied.
#pragma once

#include "shim_audioelement.h"

namespace imajuscule {

// cpp.algorithms LocalPairArray<A, B, N>: parallel arrays iterated via
// firsts()/seconds(), with corresponding() mapping an element of one array
// to its partner in the other (usage: gen.crtp.h:233,401,421,547-551).
template <typename A, typename B, int N>
struct LocalPairArray {
  std::array<A, N> as{};
  std::array<B, N> bs{};

  A& corresponding(B& b) { return as[static_cast<std::size_t>(&b - bs.data())]; }
  B& corresponding(A& a) { return bs[static_cast<std::size_t>(&a - as.data())]; }
  A const& corresponding(B const& b) const {
    return as[static_cast<std::size_t>(&b - bs.data())];
  }
  B const& corresponding(A const& a) const {
    return bs[static_cast<std::size_t>(&a - as.data())];
  }
};

template <typename A, typename B, int N>
std::array<A, N>& firsts(LocalPairArray<A, B, N>& p) {
  return p.as;
}
template <typename A, typename B, int N>
std::array<A, N> const& firsts(LocalPairArray<A, B, N> const& p) {
  return p.as;
}
template <typename A, typename B, int N>
std::array<B, N>& seconds(LocalPairArray<A, B, N>& p) {
  return p.bs;
}
template <typename A, typename B, int N>
std::array<B, N> const& seconds(LocalPairArray<A, B, N> const& p) {
  return p.bs;
}

// wrap-around distance on unsigned values (audio_platform_pa.cpp:101 usage)
inline uint64_t cyclic_unsigned_dist(uint64_t a, uint64_t b) {
  uint64_t const d = a - b;
  return std::min(d, uint64_t(0) - d);
}

// parse-only declarations for gen.crtp.h's Wrapper (never instantiated by
// the oracle): the L3 engine types live in out.h/simple_audio_context.h,
// which depend on the absent lockfree containers
enum class ReverbType { Realtime_Synchronous };
enum class WithLock { Yes, No };

namespace audio {
enum class AudioOutPolicy { Slave, MasterGlobalLock, MasterLockFree };
template <int nOuts, AudioOutPolicy P>
struct SimpleAudioOutContext;
// defined in shim_rtresynth.h (no-op lock impl); get() is only
// instantiated by users of the real SimpleAudioOutContext
template <AudioOutPolicy P>
struct AudioLockPolicyImpl;
template <AudioOutPolicy P>
struct GlobalAudioLock {
  static AudioLockPolicyImpl<P>& get() {
    static AudioLockPolicyImpl<P> lock_impl;
    return lock_impl;
  }
};
}  // namespace audio

}  // namespace imajuscule
