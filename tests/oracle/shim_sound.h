// Stubs so /root/reference/source/sound.cpp compiles for the SCORE oracle
// (to_request -> Sounds cache -> soundBuffer SINE/SILENCE generation).
//
// - ScopedLog / StringPlot are cpp.algorithms logging/plotting utilities;
//   they only feed logs.
// - The noise generators (white/atom/pink/grey) are stubbed instead of
//   including the real noise.h: the grey-noise path would instantiate the
//   absent FFT-convolution machinery, and the white-noise table is
//   deliberately DRIVER-INJECTED elsewhere in oracle.cpp (so the carrier's
//   noise lane is deterministic). The score oracle only ever requests
//   SINE/SILENCE soundIds, so these stubs never run.
#pragma once

namespace imajuscule {

struct ScopedLog {
  ScopedLog(const char*, const char*) {}
};

struct StringPlot {
  StringPlot(int, int) {}
  template <typename V>
  void draw(V const&) {}
  void log() {}
};

}  // namespace imajuscule

static inline float white_gaussian_noise(float = 0.f) { return 0.f; }
static inline float white_atom_noise(float = 0.f) { return 0.f; }

namespace imajuscule {

struct GaussianPinkNoiseAlgo {
  GaussianPinkNoiseAlgo(int) {}
  void step() {}
  float get() { return 0.f; }
};

enum class NoiseType { Pink, White };

template <typename T>
struct StubGreyNoiseAlgo {
  T step() { return T(0); }
};

template <typename T>
auto make_loudness_adapted_noise(int, NoiseType, unsigned int, unsigned int)
    -> StubGreyNoiseAlgo<T> {
  return {};
}

}  // namespace imajuscule
