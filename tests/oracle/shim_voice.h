// Supplements the shims so /root/reference/include/gen.voice.h (the voice
// param/program system: 36 named params, Limits<> normalization, the 27
// factory programs, and setupAudioElement's param->SoundEngine wiring)
// compiles and RUNS as a test oracle. Original shim code; nothing copied.
//
// Recovered cpp.algorithms surface (true source unavailable — documented
// shared assumptions, docs/FIDELITY.md):
//  - do_normalize_*/do_denormalize_* (used via pernamespace.implparams.h's
//    Normalizer/Denormalizer): the linear map between a param's natural
//    range [m, M] and the normalized [0, 1] program storage, in float32.
//  - NormalizedParamLimits (gen.voice.h:244-251 etc.): m=0, M=1. Must be
//    the FLOAT (address-based) flavor: params such as
//    LOUDNESS_COMPENSATION_AMOUNT define BOTH Limits<> (normalized) and
//    NoLimits<> and are read through valueof<> — with integral limits the
//    two Valuator overloads (pernamespace.implparams.h:41-53) would both
//    be viable and the call ambiguous, so the real library's normalized
//    limits cannot have been integral.
//  - xfade_freq_traversal(): declared at soundengine.h:13; the reference's
//    own definition (soundengine.cpp:26-43) enumerates FreqXfade
//    No/NonTrivial/All = 0/1/2, mirrored here.
#pragma once

#include "shim_audioelement.h"

namespace imajuscule::audio {

template <int m, int M>
inline float do_normalize_i(float v) {
  return (v - static_cast<float>(m)) / static_cast<float>(M - m);
}
template <int m, int M>
inline float do_denormalize_i(float v) {
  return static_cast<float>(m) + v * static_cast<float>(M - m);
}
template <float const* m, float const* M>
inline float do_normalize_f(float v) {
  return (v - *m) / (*M - *m);
}
template <float const* m, float const* M>
inline float do_denormalize_f(float v) {
  return *m + v * (*M - *m);
}

struct NormalizedParamLimits {
  static const float m;
  static const float M;
};
inline const float NormalizedParamLimits::m = 0.f;
inline const float NormalizedParamLimits::M = 1.f;

inline enumTraversal const& xfade_freq_traversal() {
  static enumTraversal t(0u, 3u, [](int) -> char const* { return "x"; });
  return t;
}

// out.h:146-152 (depends on the absent lockfree headers): only the
// MasterLockFree policy is atomic. The voice oracle instantiates none of
// the engine contexts; this exists so gen.voice.h:1101's default template
// argument parses.
template <AudioOutPolicy p>
constexpr Atomicity getAtomicity() {
  return p == AudioOutPolicy::MasterLockFree ? Atomicity::Yes
                                             : Atomicity::No;
}

}  // namespace imajuscule::audio

namespace imajuscule {
// the cpp.algorithms logging facade used by SoundEngine/gen.voice.h
// (soundengine.h:505,948) — a no-op sink for the oracle
struct Logger {
  template <typename... A>
  static void err(A...) {}
};
}  // namespace imajuscule
