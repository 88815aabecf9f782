// Minimal cpp.algorithms surface needed to compile the reference's
// self-contained leaf headers (midi.h, loudness.h, scales.h,
// sound.functions.h, rt.resynth.lib.autotune.cpp) as a TEST ORACLE.
//
// The reference does not compile standalone (SURVEY.md preamble: it depends
// on the absent sibling repo cpp.algorithms). This shim supplies only the
// tiny utilities those leaf headers pull from the sibling (Assert, LG,
// sprout constexpr math, to_underlying, NumTraits, DurationNanos) so the
// REFERENCE CODE ITSELF — included read-only from /root/reference, never
// copied — can be executed to produce golden values for the Python
// implementations. Everything in this file is original shim code.
//
// sprout (github.com/bolero-MURAKAMI/Sprout) provides constexpr math in the
// reference; gcc folds __builtin_* math in constant expressions, which is
// all the reference needs (loudness.h builds its equal-loudness tables at
// compile time through sprout::pow/log).
#pragma once

#include <algorithm>
#include <array>
#include <cassert>
#include <cmath>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <functional>
#include <cctype>
#include <cstring>
#include <iostream>
#include <iterator>
#include <limits>
#include <numeric>
#include <string>
#include <unordered_map>
#include <optional>
#include <tuple>
#include <type_traits>
#include <utility>
#include <variant>
#include <vector>

#define Assert assert
#define LG(...) \
  do {          \
  } while (0)

// folly::Function: the reference only uses call, move, and the
// heapAllocatedMemory() no-alloc guard (periodicfft.cpp:35-43)
namespace folly {
template <typename Sig>
struct Function;
template <typename R, typename... A>
struct Function<R(A...)> {
  std::function<R(A...)> f;
  Function() = default;
  template <typename F>
  Function(F&& fn) : f(std::forward<F>(fn)) {}
  R operator()(A... a) const { return f(a...); }
  std::size_t heapAllocatedMemory() const { return 0; }
};
}  // namespace folly

// profiling timers: no-ops for the oracle (durations stay unset)
namespace imajuscule::profiling {
struct CpuDuration {
  long long count() const { return 0; }
};
struct ThreadCPUTimer {
  explicit ThreadCPUTimer(std::optional<CpuDuration>&) {}
};
}  // namespace imajuscule::profiling

namespace sprout {
constexpr float pow(float a, float b) { return __builtin_powf(a, b); }
constexpr double pow(double a, double b) { return __builtin_pow(a, b); }
constexpr float log(float a) { return __builtin_logf(a); }
constexpr double log(double a) { return __builtin_log(a); }
constexpr float log2(float a) { return __builtin_log2f(a); }
constexpr double log2(double a) { return __builtin_log2(a); }
}  // namespace sprout

namespace imajuscule {

template <typename E>
constexpr auto to_underlying(E e) {
  return static_cast<std::underlying_type_t<E>>(e);
}

template <typename T>
struct NumTraits {
  static constexpr T zero() { return static_cast<T>(0); }
  static constexpr T half() { return static_cast<T>(0.5); }
  static constexpr T one() { return static_cast<T>(1); }
  static constexpr T one_and_half() { return static_cast<T>(1.5); }
  static constexpr T two() { return static_cast<T>(2); }
  static constexpr T three() { return static_cast<T>(3); }
};

// vector helpers used by rt.resynth.lib.algo.cpp. merge_sort_step merges two
// adjacent sorted ranges into `work` (the caller swaps work back); the
// reference's call site (algo.cpp:350-360) documents exactly this contract
// via its surrounding invariants (strictly sorted result).
template <typename It, typename Key, typename V>
void merge_sort_step(It b1, It e1, It b2, It e2, Key key, V& work) {
  work.clear();
  std::merge(b1, e1, b2, e2, std::back_inserter(work),
             [&key](auto const& a, auto const& b) { return key(a) < key(b); });
}

template <typename V>
void reserve_no_shrink(V& v, std::size_t n) {
  if (v.capacity() < n) v.reserve(n);
}

template <typename To, typename From>
constexpr To safe_cast(From f) {
  return static_cast<To>(f);
}

// parse.music.cpp surface: case-insensitive begins-with returning the
// matched prefix length (0 = no match) — "allow user to write re or RE"
// is the documented intent (parse.music.cpp:147), and uppercase solfege
// must both match and set `loud` (parse.music.cpp:135-137)
inline std::size_t ibegins_with(std::string const& str, char const* prefix) {
  std::size_t n = std::strlen(prefix);
  if (str.size() < n) return 0;
  for (std::size_t i = 0; i < n; ++i)
    if (std::tolower(static_cast<unsigned char>(str[i])) !=
        std::tolower(static_cast<unsigned char>(prefix[i])))
      return 0;
  return n;
}

template <typename T>
using StackVector = std::vector<T>;

namespace a64 {
template <typename T>
struct Alloc;
template <typename T>
using vector = std::vector<T>;
}  // namespace a64
namespace fft {
struct Fastest;
}  // namespace fft
#ifndef IMJ_SHIM_FUNCTIONAL_FFT
// Parse-only declarations for the sibling repo's FFT surface: periodicfft
// .cpp's FftOperation/SqMagFftOperation templates mention these names, but
// without shim_vocoder.h nothing instantiates them, so declarations
// suffice — nothing is defined or linked. (shim_vocoder.h defines
// IMJ_SHIM_FUNCTIONAL_FFT and supplies working definitions instead.)
namespace fft {
template <typename Tag, typename T, template <typename> typename A>
struct RealFBins_;
template <typename Tag, typename T>
struct Algo_;
template <typename Tag, typename T>
struct Contexts_;
template <typename Tag, typename C>
std::size_t capacity_for_unwrap_frequencies_sqmag(C&, int);
}  // namespace fft
template <typename T>
struct FrequenciesSqMag;
template <typename T, typename V>
void half_rectangular_window(int, V&);
template <typename T, typename V>
void half_gaussian_window(int, int, V&);
template <typename Tag, typename... A>
void findFrequenciesSqMag(A&&...);
int get_fft_length_for(int, int);
#endif  // IMJ_SHIM_FUNCTIONAL_FFT

namespace audio {
struct TimeNanos;
struct DurationNanos {
  constexpr explicit DurationNanos(uint64_t t = 0) : nanos(t) {}
  // the reference assigns TimeNanos values into DurationNanos slots
  // (gen.crtp.h:559), so the real type must interconvert
  constexpr DurationNanos(TimeNanos t);
  constexpr uint64_t get() const { return nanos; }
  friend constexpr bool operator<(DurationNanos a, DurationNanos b) {
    return a.get() < b.get();
  }
  uint64_t nanos;
};

// monotonic audio-clock time (the reference's audio_platforms.h:55-98
// semantics, re-implemented for the oracle)
struct TimeNanos {
  constexpr explicit TimeNanos(uint64_t t = 0) : nanos(t) {}
  // the reference constructs TimestampAndSource (TimeNanos slot) from
  // DurationNanos delays (gen.crtp.h:515,521)
  constexpr TimeNanos(DurationNanos d);
  constexpr uint64_t get() const { return nanos; }
  constexpr TimeNanos& operator+=(DurationNanos d) {
    nanos += d.get();
    return *this;
  }
  friend constexpr bool operator<(TimeNanos a, TimeNanos b) {
    return a.get() < b.get();
  }
  friend constexpr bool operator>=(TimeNanos a, TimeNanos b) {
    return a.get() >= b.get();
  }
  friend constexpr bool operator==(TimeNanos a, TimeNanos b) {
    return a.get() == b.get();
  }
  uint64_t nanos;
};
constexpr DurationNanos::DurationNanos(TimeNanos t) : nanos(t.get()) {}
constexpr TimeNanos::TimeNanos(DurationNanos d) : nanos(d.get()) {}
constexpr TimeNanos operator+(TimeNanos a, DurationNanos b) {
  return TimeNanos{a.get() + b.get()};
}
constexpr DurationNanos operator-(TimeNanos a, TimeNanos b) {
  return DurationNanos{a.get() - b.get()};
}
constexpr DurationNanos operator+(DurationNanos a, DurationNanos b) {
  return DurationNanos{a.get() + b.get()};
}

// spectral peak as produced by the sibling repo's findFrequenciesSqMag
template <typename T>
struct FreqMag {
  T freq;
  T mag_db;
};

// dB -> linear amplitude functor (10^(db/20)), as consumed by
// frequencies_to_pitches (algo.cpp:25)
template <typename T>
struct DbToMag {
  T operator()(T db) const { return std::pow(T(10), db / T(20)); }
};

#ifndef IMJ_SHIM_USE_REAL_EVENTS_H
// events.h:39 (when the real events.h is not included; PlayedNote stores
// it opaquely)
struct NoteId {
  int64_t noteid;
  bool operator==(NoteId const& o) const { return noteid == o.noteid; }
  bool operator!=(NoteId const& o) const { return noteid != o.noteid; }
};
#endif
}  // namespace audio

}  // namespace imajuscule
