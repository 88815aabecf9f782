// Supplements shim.h with the cpp.algorithms surface that
// /root/reference/include/audioelement.h imports, so its envelope / ramp /
// oscillator machinery can compile and run as a test oracle. Everything here
// is original shim code. Of these, only `itp` carries semantics the oracle
// relies on (the easing curves — implemented to match utils/interp.py, so
// envelope STRUCTURE comparisons are meaningful independent of curve
// formulas); the Filter/fft declarations are parse-only stubs for templates
// the oracle never instantiates.
#pragma once

#include <cfloat>
#include <complex>
#include <cstdio>
#include <map>
#include <memory>
#include <random>

#include "shim.h"

#define FLOAT_EPSILON FLT_EPSILON

#define likely(x) (x)
#define unlikely(x) (x)

namespace imajuscule {

template <typename T>
using Optional = std::optional<T>;

template <typename T>
T get_value(Optional<T> const& o) {
  return *o;
}

template <typename T>
constexpr T clamp_ret(T v, T lo, T hi) {
  return std::min(hi, std::max(lo, v));
}

template <typename T>
void hash_combine(std::size_t& h, T const& v) {
  h ^= std::hash<T>{}(v) + 0x9e3779b9 + (h << 6) + (h >> 2);
}

enum class Atomicity { Yes, No };

template <Atomicity A, typename T>
struct maybeAtomic;
template <typename T>
struct maybeAtomic<Atomicity::No, T> {
  using type = T;
  static void write(type& v, T val, std::memory_order) { v = val; }
  static T read(type const& v, std::memory_order) { return v; }
  static bool compareExchangeStrong(type& v, T expected, T desired,
                                    std::memory_order) {
    if (v == expected) {
      v = desired;
      return true;
    }
    return false;
  }
};
template <typename T>
struct maybeAtomic<Atomicity::Yes, T> {
  using type = std::atomic<T>;
  static void write(type& v, T val, std::memory_order o) { v.store(val, o); }
  static T read(type const& v, std::memory_order o) { return v.load(o); }
  static bool compareExchangeStrong(type& v, T expected, T desired,
                                    std::memory_order o) {
    return v.compare_exchange_strong(expected, desired, o);
  }
};

template <typename T>
struct range {
  range() = default;
  range(T m, T M) : min_(m), max_(M) {}
  T min_ = std::numeric_limits<T>::max();
  T max_ = std::numeric_limits<T>::lowest();
  T getAt(T ratio) const { return min_ + ratio * (max_ - min_); }
  T getMin() const { return min_; }
  T getMax() const { return max_; }
  T delta() const { return max_ - min_; }
  bool empty() const { return min_ > max_; }
  void extend(T v) {
    min_ = std::min(min_, v);
    max_ = std::max(max_, v);
  }
};

constexpr int cache_line_n_bytes = 64;

// the sibling repo's complex<T> — std::complex with a one-arg unit polar
template <typename T>
using complex = std::complex<T>;
template <typename T>
inline complex<T> polar(T theta) {
  return std::polar(T(1), theta);
}

// v^N by squaring (compensation (1+w^2)^ORDER, audioelement.h:2131,2244+).
// N must be >= 0: the canonical by-squaring recursion diverges for negative
// N, which is WHY VariableOrder below must be 0, not a negative sentinel —
// BandPassAlgo_::setCompensation instantiates expt<ORDER> with
// ORDER = VariableOrder for the wind band filters (audioelement.h:2131), so
// a negative VariableOrder could not have compiled in the reference. With
// VariableOrder = 0 the wind band-pass compensation is expt<0> = 1 (none).
template <int N, typename T>
constexpr T expt(T v) {
  static_assert(N >= 0, "see VariableOrder note above");
  if constexpr (N == 0)
    return T(1);
  else if constexpr (N % 2)
    return v * expt<(N > 0 ? N - 1 : 0)>(v);
  else {
    T h = expt<N / 2>(v);
    return h * h;
  }
}

// minimum of Getter<AE>::value() over the pack (audioelement.h:1757-1760)
template <template <typename> typename Getter, typename... AEs>
constexpr float minValue() {
  return std::min({Getter<AEs>::value()...});
}

// parse-only stubs for the FFT-convolution loudness filter
// (never instantiated by the oracle)
struct Latency {
  int n{};
};
struct FFTConvolutionCRTPSetupParam {
  int fft_length;
};
template <typename T, template <typename> typename A, typename Tag>
struct AlgoFFTConvolutionCRTP;
template <typename A>
struct AlgoFFTConvolutionIntermediate;
template <typename A>
struct SelfContainedXYConvolution;

namespace audio::loudness {
template <typename T>
std::vector<T> getLoudnessCompensationFIRCoefficients(int sample_rate,
                                                      unsigned fft_length,
                                                      unsigned num_taps);
}  // namespace audio::loudness

enum class SEEDED { Yes, No };
// diagnostic: when enabled (rtjob sets it after pre-printing the draw
// streams), every engine draw prints "RD <stream> <index>" so the Python
// side can see exactly which consumer used which draw
inline bool& mersenne_trace() {
  static bool b = false;
  return b;
}
template <SEEDED S>
struct TracedMt19937 : std::mt19937 {
  using std::mt19937::mt19937;
  result_type operator()() {
    result_type v = std::mt19937::operator()();
    if (mersenne_trace()) {
      static unsigned long long count = 0;
      std::printf("RD %d %llu\n", static_cast<int>(S), count++);
    }
    return v;
  }
};
template <SEEDED S>
inline TracedMt19937<S>& mersenne() {
  static TracedMt19937<S> engine{std::mt19937::default_seed};
  return engine;
}

namespace audio::audioelement {
// phase (rad/pi) + gain of one harmonic (recovered from usage at
// audioelement.h:401-446 and main.tune.cpp:1996-2001)
struct harmonicProperties_t {
  float phase;
  float volume;
};
}  // namespace audio::audioelement

template <int N, typename... Ts>
using NthTypeOf = std::tuple_element_t<N, std::tuple<Ts...>>;

enum class FilterType { LOW_PASS, HIGH_PASS };
// FUNCTIONAL one-pole cascade using this repo's RECOVERED coefficient law
// (alpha = 1 - exp(-pi*inc), ops/filters.py — the true cpp.algorithms law is
// unavailable, docs/FIDELITY.md "what cannot be oracled"). This makes the
// wrappers AROUND the filter oracle-able (VolumeAdjusted's period-tracked
// volume smoothing, audioelement.h:1159-1216) while the law itself stays a
// shared assumption. SoundEngine spec-generation paths never step it, so
// pre-existing oracles are unaffected.
template <typename T, int NDims, FilterType K, int ORDER>
struct Filter {
  static constexpr int n_stages = ORDER > 0 ? ORDER : 1;
  Filter() : state(static_cast<std::size_t>(n_stages), T(0)) {}
  void set_sample_rate(int) {}
  void forgetPastSignals() {
    for (auto& s : state) s = T(0);
  }
  void initWithAngleIncrement(T inc) {
    alpha = T(1) - std::exp(-T(M_PI) * std::abs(inc));
  }
  void initWithFreq(int sample_rate, T freq) {
    initWithAngleIncrement(T(2) * freq / sample_rate);
  }
  // runtime order for ORDER == VariableOrder (FilterAlgo::setFiltersOrder
  // forwards here, audioelement.h:2066-2068)
  void setOrder(int n) { state.assign(static_cast<std::size_t>(n), T(0)); }
  void setFiltersOrder(int n) { setOrder(n); }
  void feed(T const* v) {
    T x = *v;
    for (auto& s : state) {
      s += alpha * (x - s);
      x = (K == FilterType::LOW_PASS) ? s : x - s;
    }
    last = x;
  }
  void setInitialValue(T v) {
    for (auto& s : state) s = v;
    last = v;
  }
  T const* filtered() const { return &last; }
  std::vector<T> state;
  T alpha{};
  T last{};
};

// FilterAlgo's internal precision trait (audioelement.h:2013); the shim
// keeps the element's own FPT
template <int ORDER, typename FPT>
struct InternalFilterFPTFromOrder {
  using type = FPT;
};
template <FilterType K>
double get_inv_square_filter_magnitude(double);

// cpp.algorithms enumTraversal (recovered from usage: constructed with a
// [begin, end) value range + a value->name lambda returning "?" for holes,
// soundengine.cpp:4-43; consumers call realValues() to enumerate valid
// values in order and valToRealValueIndex(val, idx) for the inverse map,
// gen.voice.h:503-507,927-931,1009-1013).
struct enumTraversal {
  enumTraversal() = default;
  template <typename F>
  enumTraversal(unsigned int begin, unsigned int end, F namer) {
    for (unsigned int v = begin; v < end; ++v) {
      char const* n = namer(static_cast<int>(v));
      if (n && std::string(n) != "?") values_.push_back(static_cast<int>(v));
    }
  }
  std::vector<int> const& realValues() const { return values_; }
  bool valToRealValueIndex(int val, int& idx) const {
    for (std::size_t i = 0; i < values_.size(); ++i) {
      if (values_[i] == val) {
        idx = static_cast<int>(i);
        return true;
      }
    }
    return false;
  }

 private:
  std::vector<int> values_;
};

// easing library (the reference's itp:: from cpp.algorithms). Curve
// formulas mirror cpp_audio_tpu/utils/interp.py exactly, so the oracle
// pins the reference's envelope/ramp STRUCTURE around shared curves.
namespace itp {

enum interpolation {
  LINEAR = 0,
  PROPORTIONAL_VALUE_DERIVATIVE,
  EASE_IN_QUAD,
  EASE_OUT_QUAD,
  EASE_INOUT_QUAD,
  EASE_IN_CUBIC,
  EASE_OUT_CUBIC,
  EASE_INOUT_CUBIC,
  EASE_IN_QUART,
  EASE_OUT_QUART,
  EASE_INOUT_QUART,
  EASE_IN_QUINT,
  EASE_OUT_QUINT,
  EASE_INOUT_QUINT,
  EASE_IN_SINE,
  EASE_OUT_SINE,
  EASE_INOUT_SINE,
  EASE_IN_EXPO,
  EASE_OUT_EXPO,
  EASE_INOUT_EXPO,
  EASE_IN_CIRC,
  EASE_OUT_CIRC,
  EASE_INOUT_CIRC,
};

template <typename T>
T ease_in(interpolation kind, T x) {
  switch (kind) {
    case EASE_IN_QUAD:
      return x * x;
    case EASE_IN_CUBIC:
      return x * x * x;
    case EASE_IN_QUART:
      return x * x * x * x;
    case EASE_IN_QUINT:
      return x * x * x * x * x;
    case EASE_IN_SINE:
      return 1 - std::cos(x * (T(M_PI) / 2));
    case EASE_IN_EXPO:
      return x <= 0 ? T(0) : std::exp2(10 * (x - 1));
    case EASE_IN_CIRC:
      return 1 - std::sqrt(std::max(T(0), 1 - x * x));
    default:
      return x;
  }
}

template <typename T>
T ease_out(interpolation kind, T x) {
  switch (kind) {
    case EASE_OUT_QUAD:
      return x * (2 - x);
    case EASE_OUT_CUBIC:
      return (x - 1) * (x - 1) * (x - 1) + 1;
    case EASE_OUT_QUART:
      return 1 - (x - 1) * (x - 1) * (x - 1) * (x - 1);
    case EASE_OUT_QUINT:
      return (x - 1) * (x - 1) * (x - 1) * (x - 1) * (x - 1) + 1;
    case EASE_OUT_SINE:
      return std::sin(x * (T(M_PI) / 2));
    case EASE_OUT_EXPO:
      return x >= 1 ? T(1) : 1 - std::exp2(-10 * x);
    case EASE_OUT_CIRC:
      return std::sqrt(std::max(T(0), 1 - (x - 1) * (x - 1)));
    default:
      return x;
  }
}

template <typename T>
T ease(interpolation kind, T x) {
  x = std::min(T(1), std::max(T(0), x));
  switch (kind) {
    case LINEAR:
    case PROPORTIONAL_VALUE_DERIVATIVE:
      return x;
    case EASE_INOUT_QUAD:
    case EASE_INOUT_CUBIC:
    case EASE_INOUT_QUART:
    case EASE_INOUT_QUINT:
    case EASE_INOUT_SINE:
    case EASE_INOUT_EXPO:
    case EASE_INOUT_CIRC: {
      auto in = static_cast<interpolation>(kind - 2);
      auto out = static_cast<interpolation>(kind - 1);
      return x < T(0.5) ? T(0.5) * ease_in(in, 2 * x)
                        : T(0.5) + T(0.5) * ease_out(out, 2 * x - 1);
    }
    default:
      return kind >= EASE_IN_QUAD && ((kind - EASE_IN_QUAD) % 3 == 0)
                 ? ease_in(kind, x)
                 : ease_out(kind, x);
  }
}

// Penner-style: value at time t of a curve from `from` over `toMinusFrom`,
// duration `d`
template <typename T>
T interpolate(interpolation kind, T t, T from, T toMinusFrom, T d) {
  return from + toMinusFrom * ease(kind, d == 0 ? T(1) : t / d);
}

}  // namespace itp

template <typename T = float>
struct NormalizedInterpolation {
  itp::interpolation kind = itp::LINEAR;
  NormalizedInterpolation() = default;
  NormalizedInterpolation(itp::interpolation i) : kind(i) {}
  void setInterpolation(itp::interpolation i) { kind = i; }
  T get_unfiltered_value(T t, T d, T from, T to) const {
    return itp::interpolate(kind, t, from, to - from, d);
  }
};

namespace itp {
// whether an int is a valid interpolation enum value (used by
// SoundEngine::set_itp fallbacks, soundengine.h:841-853)
constexpr bool intIsReal(int i) { return i >= LINEAR && i <= EASE_INOUT_CIRC; }

// itp::interpolation_traversal() (used by gen.voice.h:503,536-538,890,
// 1009-1013 to map interpolation enum <-> program param index). The true
// cpp.algorithms ordering is unavailable; this shim enumerates the shim's
// own sequential enum (identity index<->value), the same recovered
// assumption utils/interp.py's Itp numbering rests on (docs/FIDELITY.md).
inline enumTraversal const& interpolation_traversal() {
  static enumTraversal t(static_cast<unsigned int>(LINEAR),
                         static_cast<unsigned int>(EASE_INOUT_CIRC) + 1u,
                         [](int) -> char const* { return "itp"; });
  return t;
}
}  // namespace itp

// ---- cpp.algorithms surface for soundengine.h ----

// cpp.algorithms tuple for_each (FreqCtrl_ iterates its ctrl tuple)
template <typename Tuple, typename F>
void for_each(Tuple& t, F&& f) {
  std::apply([&f](auto&... e) { (f(e), ...); }, t);
}

template <typename Tuple, typename F>
void for_each_i(Tuple& t, F&& f) {
  int i = 0;
  std::apply([&](auto&... e) { (f(i++, e), ...); }, t);
}
// pairwise iteration over two same-shape tuples (UnityGainMix::
// synchronizeAngles, audioelement.h:1963-1967)
template <typename TA, typename TB, typename F, std::size_t... I>
void for_each_zip_impl(TA& a, TB& b, F&& f, std::index_sequence<I...>) {
  (f(std::get<I>(a), std::get<I>(b)), ...);
}
template <typename TA, typename TB, typename F>
void for_each_zip(TA& a, TB& b, F&& f) {
  for_each_zip_impl(
      a, b, std::forward<F>(f),
      std::make_index_sequence<std::tuple_size_v<std::remove_const_t<
          std::remove_reference_t<TA>>>>{});
}

constexpr bool is_odd(unsigned int v) { return (v & 1u) != 0; }
constexpr bool is_odd(int v) { return (v & 1) != 0; }

constexpr unsigned relevantBits(unsigned v) {
  unsigned b = 0;
  while (v) {
    ++b;
    v >>= 1;
  }
  return b;
}
constexpr unsigned pow2(unsigned n) { return 1u << n; }

// runtime-order IIR marker. 0, NOT negative: expt<VariableOrder> is
// instantiated by the wind band compensation (see expt above), so the
// reference's sentinel must satisfy expt — order-0 is the only sensible
// non-colliding value, and it makes variable-order band compensation 1.
constexpr int VariableOrder = 0;

enum class ExecuteLambdas { Yes, No };

enum class MarkovMove { ENTER_NODE, LEAVE_NODE };

// Markov chain with enter/leave node lambdas, mirroring
// cpp_audio_tpu/utils/markov.py (the recovered cpp.algorithms semantics:
// step_normalized always moves among outgoing edges with normalized
// weights; step treats each probability as an absolute chance and may
// stay put). SoundEngine's node lambdas and graph shapes are reference
// code; this chain is the shared substrate both sides run on.
struct MarkovNode {
  std::function<void(MarkovMove, MarkovNode&, MarkovNode&)> f;
  std::vector<std::pair<MarkovNode*, float>> transitions;
};

struct MarkovChain {
  std::vector<std::unique_ptr<MarkovNode>> nodes;
  MarkovNode* current = nullptr;

  // returns a pointer: the reference's create_* functions bind the result
  // with `auto` and pass it to def_markov_transition (soundengine.h:568-592),
  // so the handle must have reference semantics
  template <typename F>
  MarkovNode* emplace(F&& fn) {
    nodes.push_back(std::make_unique<MarkovNode>());
    nodes.back()->f = std::forward<F>(fn);
    return nodes.back().get();
  }

  void initialize(int i) { current = nodes[static_cast<size_t>(i)].get(); }

  void moveTo(MarkovNode* dest, bool exec) {
    if (exec) {
      current->f(MarkovMove::LEAVE_NODE, *current, *dest);
      dest->f(MarkovMove::ENTER_NODE, *dest, *current);
    }
    current = dest;
  }

  template <ExecuteLambdas E>
  void step_normalized(float r) {
    auto const& tr = current->transitions;
    if (tr.empty()) return;
    float total = 0.f;
    for (auto const& t : tr) total += t.second;
    float const x = r * total;
    float acc = 0.f;
    for (auto const& t : tr) {
      acc += t.second;
      if (x <= acc) {
        moveTo(t.first, E == ExecuteLambdas::Yes);
        return;
      }
    }
    moveTo(tr.back().first, E == ExecuteLambdas::Yes);
  }

  template <ExecuteLambdas E>
  void step(float r) {
    float acc = 0.f;
    for (auto const& t : current->transitions) {
      acc += t.second;
      if (r <= acc) {
        moveTo(t.first, E == ExecuteLambdas::Yes);
        return;
      }
    }
  }
};

inline void def_markov_transition(MarkovNode* a, MarkovNode* b, float p) {
  a->transitions.push_back({b, p});
}

}  // namespace imajuscule
