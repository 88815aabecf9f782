// Exact WIND control walks (host hot loop; C ABI consumed via ctypes).
//
// The reference's wind controls iterate noise tables through
//   Ctrl< WindFreqIter< SlowIter< AbsIter<noise> > > >
// (include/audioelement.h:2823-3030): SlowIter emits an eased interpolation
// between consecutive table reads over n_slow_steps sub-steps; WindFreqIter
// advances ascending walks SCALE_UP=3 sub-steps per sample (stopping early
// at a major-step boundary) and descending walks 1 — the characteristic
// fast-gust / slow-decay asymmetry. The short-term wobble iterator
// (ShortTermNoiseAdderCtrl, include/soundengine.h:107-173) is a plain
// SlowIter whose rate is retuned EVERY SAMPLE to 1 + int(rate/inc_long[t]),
// with SlowIter's integer adapt-on-rate-change rule
// (audioelement.h:2863-2880) — an int-truncating per-sample recurrence that
// cannot be vectorized, hence this native loop. Pinned against the
// reference's compiled iterators by tests/test_reference_oracle.py.
//
// Arithmetic is float32 like the reference's.

#include <cmath>
#include <cstdint>

namespace {

constexpr float kPi = 3.14159265358979323846f;

// easing curves matching cpp_audio_tpu/utils/interp.py (Itp codes)
float ease_in(int kind, float x) {
  switch (kind) {
    case 2:  return x * x;                                   // QUAD
    case 5:  return x * x * x;                               // CUBIC
    case 8:  return x * x * x * x;                           // QUART
    case 11: return x * x * x * x * x;                       // QUINT
    case 14: return 1.f - std::cos(x * (kPi / 2.f));         // SINE
    case 17: return x <= 0.f ? 0.f : std::exp2(10.f * (x - 1.f));  // EXPO
    case 20: return 1.f - std::sqrt(std::fmax(0.f, 1.f - x * x));  // CIRC
    default: return x;
  }
}

float ease_out(int kind, float x) {
  float const y = x - 1.f;
  switch (kind) {
    case 3:  return x * (2.f - x);
    case 6:  return y * y * y + 1.f;
    case 9:  return 1.f - y * y * y * y;
    case 12: return y * y * y * y * y + 1.f;
    case 15: return std::sin(x * (kPi / 2.f));
    case 18: return x >= 1.f ? 1.f : 1.f - std::exp2(-10.f * x);
    case 21: return std::sqrt(std::fmax(0.f, 1.f - y * y));
    default: return x;
  }
}

float ease(int kind, float x) {
  x = std::fmin(1.f, std::fmax(0.f, x));
  if (kind <= 1) return x;  // LINEAR / PROPORTIONAL_VALUE_DERIVATIVE
  switch ((kind - 2) % 3) {
    case 0: return ease_in(kind, x);
    case 1: return ease_out(kind, x);
    default:  // INOUT: kind-2 = in variant, kind-1 = out variant
      return x < 0.5f ? 0.5f * ease_in(kind - 2, 2.f * x)
                      : 0.5f + 0.5f * ease_out(kind - 1, 2.f * x - 1.f);
  }
}

// the shared SlowIter state machine (audioelement.h:2850-2930)
struct Slow {
  const float* table;
  int m;
  bool use_abs;
  int pos = 0;
  int32_t n_steps = -1;
  int32_t slow_it = 0;
  float prev = 0.f;

  float read() const {
    float v = table[pos];
    return use_abs ? std::fabs(v) : v;
  }
  void major() {
    slow_it = 0;
    prev = read();
    pos = (pos + 1) % m;
  }
  void init(int start) {
    pos = ((start % m) + m) % m;
    major();
  }
  void set_n_slow_steps(int32_t n) {
    if (n == n_steps) return;
    if (slow_it) {
      float const ratio = (slow_it + .5f) / static_cast<float>(n_steps);
      slow_it = static_cast<int32_t>(ratio * static_cast<float>(n));
      if (slow_it == n) major();
    }
    n_steps = n;
  }
  bool increment() {
    ++slow_it;
    if (slow_it < n_steps) return false;
    major();
    return true;
  }
  float value(int itp_kind) const {
    float const x = static_cast<float>(slow_it) / static_cast<float>(n_steps);
    return prev + (read() - prev) * ease(itp_kind, x);
  }
  bool diminishing() const { return prev > read(); }
};

}  // namespace

extern "C" {

// Ctrl<WindFreqIter<SlowIter<AbsIter<noise>>>> values, one per sample.
void wind_long_walk(const float* table, int m, int start_pos,
                    int32_t n_slow_steps, int itp_kind, long long n_out,
                    float* out) {
  Slow it{table, m, /*use_abs=*/true};
  it.n_steps = n_slow_steps;
  it.init(start_pos);
  for (long long k = 0; k < n_out; ++k) {
    int const n = it.diminishing() ? 1 : 3;  // WindFreqIter SCALE_UP
    for (int i = 0; i < n; ++i)
      if (it.increment()) break;
    out[k] = it.value(itp_kind);
  }
}

// Like wind_long_walk, but starting from an EXPLICIT (pos, prev) state with
// slow_it = 0 and no initial advance. This is the reference's real
// spec-start state: playNextSpec runs forgetPastSignals (position draw ->
// prev = value there, advance) and THEN set_sample_rate, whose
// BufferIter::set_sample_rate re-draws a fresh position (sound.h:185-190)
// without touching prev — the first segment eases from `prev0` toward the
// table value at `pos`.
void wind_long_walk_from(const float* table, int m, int pos, float prev0,
                         int32_t n_slow_steps, int itp_kind, long long n_out,
                         float* out) {
  Slow it{table, m, /*use_abs=*/true};
  it.n_steps = n_slow_steps;
  it.pos = ((pos % m) + m) % m;
  it.prev = prev0;
  it.slow_it = 0;
  for (long long k = 0; k < n_out; ++k) {
    int const n = it.diminishing() ? 1 : 3;
    for (int i = 0; i < n; ++i)
      if (it.increment()) break;
    out[k] = it.value(itp_kind);
  }
}

// ShortTermNoiseAdderCtrl's wobble values: SlowIter (signed, LINEAR) whose
// rate is retuned per sample from the long-term increment.
void wind_short_walk(const float* table, int m, int start_pos, float rate,
                     const float* inc_long, long long n_out, float* out) {
  Slow it{table, m, /*use_abs=*/false};
  it.init(start_pos);
  for (long long k = 0; k < n_out; ++k) {
    // float->int32 overflow is UB in the reference; clamp for absurd ratios
    float const r = rate / inc_long[k];
    int32_t const n =
        r >= 2147483520.f ? 2147483646 : static_cast<int32_t>(r);
    it.set_n_slow_steps(1 + n);
    it.increment();
    out[k] = it.value(0);
  }
}

// wind_short_walk from an explicit (pos, prev) state (see
// wind_long_walk_from).
void wind_short_walk_from(const float* table, int m, int pos, float prev0,
                          float rate, const float* inc_long, long long n_out,
                          float* out) {
  Slow it{table, m, /*use_abs=*/false};
  it.pos = ((pos % m) + m) % m;
  it.prev = prev0;
  it.slow_it = 0;
  for (long long k = 0; k < n_out; ++k) {
    float const r = rate / inc_long[k];
    int32_t const n =
        r >= 2147483520.f ? 2147483646 : static_cast<int32_t>(r);
    it.set_n_slow_steps(1 + n);
    it.increment();
    out[k] = it.value(0);
  }
}

}  // extern "C"
