// Supplements the shims so the reference's ASSEMBLED RtResynth
// (source/rt.resynth.lib.cpp — the offline duplex constructor loop, the
// analysis step ordering, synthesize_sounds -> 127-voice synth -> stepper ->
// post chain) compiles *from /root/reference* and RUNS as a test oracle.
// Original shim code; nothing copied. The shimmed surface is:
//
//  - atomic_queue::AtomicQueueB2 (third-party SPSC queue): mutex+deque with
//    the same try_push/try_pop/was_size/capacity API. The oracle is
//    single-threaded per queue end, so lock-freedom is irrelevant; bounded
//    capacity is preserved because MetaQueue's drop bookkeeping
//    (rt.resynth.lib.metaqueue.cpp:17-38) depends on push failure.
//  - lockfree::scmp::fifo + static_vector (cpp.algorithms): deque/vector
//    with tryEnqueue/dequeueAll and tryInsert/forEach. forEach removes
//    entries whose functor returns false — the unregistration contract
//    Vocoder::finalize blocks on (rt.resynth.lib.vocoder.cpp:823-830).
//  - The no-op lock stack (AudioLockPolicyImpl/LockIf/ThreadType) for
//    AudioOutPolicy::MasterLockFree, where the reference relies on atomics,
//    not locks (out.h:146-152); single-threaded here.
//  - AudioPost/postProcessFunc: reconstruction of out.h:219-250 (declare
//    block size, run the post chain over the double buffer).
//  - Limiter<double>: the repo's RECOVERED law (ops/limiter.py — the true
//    cpp.algorithms implementation is in the unavailable sibling repo):
//    instant-attack exponential-release peak follower across channels,
//    gain = min(1, ceiling/peak). Oracle runs prefer Postprocessing::None
//    so this recovered law is not in the pinned path.
//  - cyclic<float>: ring buffer where cycleEnd() is the next write slot =
//    oldest element, so *cycleEnd() then feed() delays by size() samples
//    (usage: the output-feedback delay, rt.resynth.lib.cpp:1636-1648).
//  - Inert Context/AudioInput/FullDuplexContext for AudioPlatform::PortAudio
//    (audio_platforms.h declarations): Mode::Offline never opens streams
//    (rt.resynth.lib.cpp:1347-1349), these only need to compile; Init
//    returns false so any accidental realtime-path use fails loudly.
//  - nlohmann::json: a minimal JSON value (objects, bool/number/string)
//    sufficient for Params/Preset/RtResynthOfflineJobConfig round trips
//    (rt.resynth.lib.params.cpp). Parses the byte-compatible preset files
//    analysis/presets_json.py writes.
//  - WAVReader: memory-backed (driver-registered named buffers), same API
//    as the cpp.algorithms reader used by RtResynthOfflineJob.
#pragma once

#include <bitset>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <fstream>
#include <functional>
#include <map>
#include <mutex>
#include <optional>
#include <sstream>
#include <stdexcept>
#include <string>
#include <thread>
#include <unordered_map>
#include <variant>
#include <vector>

// ---------------------------------------------------------------------------
// atomic_queue::AtomicQueueB2 (the reference's third-party SPSC queue)
// ---------------------------------------------------------------------------
namespace atomic_queue {

template <typename T, typename A, bool MAXIMIZE_THROUGHPUT, bool TOTAL_ORDER,
          bool SPSC>
struct AtomicQueueB2 {
  using value_type = T;

  explicit AtomicQueueB2(std::size_t cap) : cap_(cap ? cap : 1) {}

  template <typename U>
  bool try_push(U&& v) {
    std::lock_guard<std::mutex> g(m_);
    if (q_.size() >= cap_) return false;
    q_.emplace_back(std::forward<U>(v));
    return true;
  }

  bool try_pop(T& v) {
    std::lock_guard<std::mutex> g(m_);
    if (q_.empty()) return false;
    v = std::move(q_.front());
    q_.pop_front();
    return true;
  }

  unsigned was_size() const {
    std::lock_guard<std::mutex> g(m_);
    return static_cast<unsigned>(q_.size());
  }

  std::size_t capacity() const { return cap_; }

 private:
  mutable std::mutex m_;
  std::deque<T> q_;
  std::size_t cap_;
};

}  // namespace atomic_queue

namespace imajuscule {

namespace audio {
// audio_platforms.h:5-20 enums + template declarations (that header also
// defines TimeNanos/DurationNanos which shim.h already supplies, so the
// needed declarations are mirrored here instead of including it)
enum class AudioPlatform { PortAudio, AudioUnits };
enum class Features { JustOut, InAndOut };
enum class TimeSource { MIDI, Monotonic };
}  // namespace audio

// ---------------------------------------------------------------------------
// cpp.algorithms lockfree::scmp::fifo — single-consumer multi-producer fifo
// (usage: oneshot queues, simple_audio_context.h:122 + pubsub rt_listeners
// synchronization). tryEnqueue always succeeds here (unbounded deque): the
// reference treats enqueue failure as a fatal error / retry loop, so a
// never-full shim preserves the success path semantics.
// ---------------------------------------------------------------------------
namespace lockfree::scmp {

template <typename T>
struct fifo {
  explicit fifo(int /*capacity*/) {}

  template <typename F>
  bool tryEnqueue(F&& f) {
    std::lock_guard<std::mutex> g(m_);
    q_.emplace_back(std::forward<F>(f));
    return true;
  }

  template <typename V>
  void dequeueAll(V&& visit) {
    std::deque<T> cur;
    {
      std::lock_guard<std::mutex> g(m_);
      cur.swap(q_);
    }
    for (auto& f : cur) visit(f);
  }

 private:
  std::mutex m_;
  std::deque<T> q_;
};

}  // namespace lockfree::scmp

// ---------------------------------------------------------------------------
// cpp.algorithms static_vector<Synchronization, T> (usage:
// simple_audio_context.h:126 'computes'): bounded insert; forEach calls the
// functor on each element and REMOVES elements for which it returns false
// (the compute-unregistration contract, rt.resynth.lib.vocoder.cpp:823-830
// "block until the registered compute function returned false (to be
// removed from the context queue)").
// ---------------------------------------------------------------------------
enum class Synchronization { SingleThread };

template <Synchronization S, typename T>
struct static_vector {
  explicit static_vector(int cap) : cap_(static_cast<std::size_t>(cap)) {
    v_.reserve(cap_);
  }

  bool tryInsert(T&& x) {
    if (v_.size() >= cap_) return false;
    v_.emplace_back(std::move(x));
    return true;
  }

  template <typename F>
  void forEach(F&& f) {
    for (std::size_t i = 0; i < v_.size();) {
      if (f(v_[i])) {
        ++i;
      } else {
        v_.erase(v_.begin() + static_cast<std::ptrdiff_t>(i));
      }
    }
  }

 private:
  std::vector<T> v_;
  std::size_t cap_;
};

// cpp.algorithms CArray: fixed-extent view over interleaved frame samples
// (usage: limiter.feedOneFrame(CArray<nAudioOut,double>{buf + i*nAudioOut}),
// out.h:614-617, rt.resynth.lib.cpp:1254-1257)
template <int N, typename T>
struct CArray {
  explicit CArray(T* p) : p_(p) {}
  T& operator[](int i) { return p_[i]; }
  T const& operator[](int i) const { return p_[i]; }
  static constexpr int size() { return N; }

 private:
  T* p_;
};

// cpp.algorithms cyclic<T>: ring buffer; cycleEnd() points at the next
// write position == the OLDEST element, so reading *cycleEnd() then
// feed(v) implements a delay of exactly size() samples. RECOVERED from the
// output-delay usage (rt.resynth.lib.cpp:1636-1648: resize-to-sz zeroes,
// value = *cycleEnd(), feed(input)); matches the repo's model
// (analysis/resynth.resynthesize_feedback).
template <typename T>
struct cyclic {
  void resize(int n) {
    buf_.assign(static_cast<std::size_t>(n), T{});
    idx_ = 0;
  }
  std::size_t size() const { return buf_.size(); }
  T const* cycleEnd() const { return &buf_[idx_]; }
  void feed(T v) {
    buf_[idx_] = v;
    if (++idx_ >= buf_.size()) idx_ = 0;
  }

 private:
  std::vector<T> buf_;
  std::size_t idx_ = 0;
};

namespace audio {

// ---------------------------------------------------------------------------
// Lock stack (cpp.algorithms): with AudioOutPolicy::MasterLockFree the
// reference synchronizes via atomics and queues, not locks (out.h:146-152);
// the oracle runs the NRT producer and RT consumer in one thread, so all
// locks are no-ops. shouldNRTThreadUseOneshotsQueue must be TRUE for
// MasterLockFree so enqueueOneShot DEFERS functors to the next step()
// (simple_audio_context.h:44-57) — the scheduling the realtime engine has,
// which the offline loop inherits.
// ---------------------------------------------------------------------------
enum class ThreadType { RealTime, NonRealTime };

template <AudioOutPolicy P>
struct AudioLockPolicyImpl {
  static constexpr bool useLock = false;
  int lock() { return 0; }
};

template <bool UseLock, ThreadType T>
struct LockIf {
  template <typename L>
  explicit LockIf(L&&) {}
};

template <AudioOutPolicy p>
constexpr bool shouldNRTThreadUseOneshotsQueue() {
  return p == AudioOutPolicy::MasterLockFree;
}

// ---------------------------------------------------------------------------
// AudioPost + postProcessFunc: reconstruction of out.h:219-250 (the post
// chain SimpleAudioOutContext::step runs after the computes).
// ---------------------------------------------------------------------------
using postProcessFunc = std::function<void(double*,  // buffer
                                           int,      // frames in buffer
                                           int)>;    // frames per callback

struct AudioPost {
  void set_post_processors(std::vector<postProcessFunc>&& v) {
    post_process = std::move(v);
  }
  void declareBlockSize(int sz) { block_size = sz; }
  void postprocess(double* buffer, int nFrames) const {
    for (auto const& f : post_process) {
      f(buffer, nFrames, block_size ? *block_size : nFrames);
    }
  }

 private:
  std::optional<int> block_size;
  std::vector<postProcessFunc> post_process;
};

// ---------------------------------------------------------------------------
// Limiter<T> — the repo's RECOVERED law (ops/limiter.py; the true
// cpp.algorithms implementation is unavailable): instant-attack peak
// follower with exponential release (50 ms at 44.1 kHz), cross-channel
// peak, gain = min(1, 1/peak). Used only when Postprocessing::Limit; the
// pinned oracle runs use Postprocessing::None.
// ---------------------------------------------------------------------------
template <typename T>
struct Limiter {
  template <typename Arr>
  void feedOneFrame(Arr& a) {
    T mx = 0;
    for (int i = 0; i < a.size(); ++i) {
      T const v = a[i] < 0 ? -a[i] : a[i];
      if (v > mx) mx = v;
    }
    peak_ = std::max(mx, release_ * peak_);
    T const g = std::min(T(1), T(1) / std::max(peak_, T(1e-12)));
    for (int i = 0; i < a.size(); ++i) a[i] *= g;
  }
  float getTargetCompressionLevel() const { return 1.f; }

 private:
  T peak_ = 0;
  T release_ = static_cast<T>(0.9995465347131038);  // exp(-1/(0.05*44100))
};

// ---------------------------------------------------------------------------
// Inert platform contexts (audio_platforms.h declares the templates; the
// PortAudio definitions live in audio_platform_pa.h, unused by
// Mode::Offline which never opens streams, rt.resynth.lib.cpp:1347-1349).
// Init/doInit return false so an accidental realtime-path use throws in
// RtResynth::init rather than silently pretending a device exists.
// ---------------------------------------------------------------------------
using PlayF = std::function<void(SAMPLE*, int, TimeNanos const)>;
using RecordF = std::function<void(const SAMPLE*, int)>;

template <AudioPlatform A, Features F, TimeSource Time>
struct Context {
  bool doInit(double /*minLatency*/, int /*sample_rate*/, int /*nOuts*/,
              PlayF /*f*/) {
    return false;
  }
  bool Initialized() const { return false; }
  int getSampleRate() const { return 0; }
  double getOutputLatencySeconds() const { return 0.; }
  double getStreamCpuLoad() const { return -1.; }
  void doTearDown() {}
};

template <AudioPlatform A>
struct AudioInput {
  bool Init(RecordF /*f*/, int /*sample_rate*/, double /*minLatency*/) {
    return false;
  }
  bool Initialized() const { return false; }
  bool Teardown() { return true; }
  int getSampleRate() const { return 0; }
  double getInputLatencySeconds() const { return 0.; }
  double getStreamCpuLoad() const { return -1.; }
};

template <AudioPlatform A, TimeSource Time>
struct FullDuplexContext {
  bool Init(int /*sample_rate*/, double /*minInLatency*/, int /*nIns*/,
            RecordF /*in_f*/, double /*minOutLatency*/, int /*nOuts*/,
            PlayF /*out_f*/) {
    return false;
  }
  bool Initialized() const { return false; }
  void Teardown() {}
  int getSampleRate() const { return 0; }
  double getStreamCpuLoad() const { return -1.; }
};

}  // namespace audio

// ---------------------------------------------------------------------------
// cpp.algorithms spectral peak extraction — the repo's RECOVERED law
// (ops/stft._peaks / extract_local_max_freqs_mags; the true implementation
// is in the unavailable sibling repo, a caveat docs/FIDELITY.md carries):
// local maxima of the dB spectrum (strictly above the previous bin, >= the
// next, edge sentinels -600 dB), refined by QIFFT — parabola through
// (prev, db, next), delta clipped to +-0.5 bin — with
// mag_db = db - 0.25*(prev-next)*delta. Usage: rt.resynth.lib.cpp:1592.
// ---------------------------------------------------------------------------
template <typename T>
struct SqMagToDb {
  T operator()(T sq) const { return T(10) * std::log10(sq); }
};

template <typename T, typename ToDb>
void extractLocalMaxFreqsMags(double const signal_sample_rate,
                              FrequenciesSqMag<T> const& fsm, ToDb to_db,
                              std::vector<audio::FreqMag<T>>& out) {
  out.clear();
  auto const& sq = fsm.frequencies_sqmag;
  int const n = static_cast<int>(sq.size());
  double const bin_hz = signal_sample_rate / fsm.get_fft_length();
  T constexpr eps = T(1e-30);
  auto db_at = [&](int i) -> T {
    if (i < 0 || i >= n) return T(-600);
    return to_db(std::max(sq[static_cast<std::size_t>(i)], eps));
  };
  for (int i = 0; i < n; ++i) {
    T const db = db_at(i);
    T const prev = db_at(i - 1);
    T const nxt = db_at(i + 1);
    if (!(db > prev && db >= nxt && sq[static_cast<std::size_t>(i)] > eps))
      continue;
    T const denom = prev - 2 * db + nxt;
    T delta = std::abs(denom) > T(1e-12) ? T(0.5) * (prev - nxt) / denom
                                         : T(0);
    delta = std::min(T(0.5), std::max(T(-0.5), delta));
    out.push_back(audio::FreqMag<T>{
        (T(i) + delta) * static_cast<T>(bin_hz),
        db - T(0.25) * (prev - nxt) * delta});
  }
}

}  // namespace imajuscule

// ---------------------------------------------------------------------------
// Minimal nlohmann::json lookalike for rt.resynth.lib.params.cpp: objects
// with bool/int/uint64/double/string leaves, at(), get<map>, implicit
// conversion via ADL from_json, stream parse/print. Parses the
// byte-compatible preset JSON analysis/presets_json.py emits (sorted keys,
// nlohmann-style setw(2) indentation).
// ---------------------------------------------------------------------------
namespace nlohmann {

class json;

namespace detail {
template <typename T, typename = void>
struct has_from_json : std::false_type {};
template <typename T>
struct has_from_json<
    T, std::void_t<decltype(from_json(std::declval<json const&>(),
                                      std::declval<T&>()))>>
    : std::true_type {};
template <typename T, typename = void>
struct has_to_json : std::false_type {};
template <typename T>
struct has_to_json<T, std::void_t<decltype(to_json(std::declval<json&>(),
                                                   std::declval<T const&>()))>>
    : std::true_type {};
}  // namespace detail

class json {
 public:
  using object_t = std::map<std::string, json>;

  json() : v_(nullptr) {}
  json(std::nullptr_t) : v_(nullptr) {}
  json(bool b) : v_(b) {}
  json(int i) : v_(static_cast<int64_t>(i)) {}
  json(int64_t i) : v_(i) {}
  json(uint64_t u) : v_(u) {}
  json(double d) : v_(d) {}
  json(float f) : v_(static_cast<double>(f)) {}
  json(const char* s) : v_(std::string(s)) {}
  json(std::string s) : v_(std::move(s)) {}

  // json{ {"k", v}, ... } object construction (params.cpp:190-198)
  json(std::initializer_list<std::pair<const char*, json>> init) {
    object_t o;
    for (auto const& kv : init) o[kv.first] = kv.second;
    v_ = std::move(o);
  }

  template <typename T>
  json(std::unordered_map<std::string, T> const& m) {
    object_t o;
    for (auto const& kv : m) o[kv.first] = json(kv.second);
    v_ = std::move(o);
  }

  // to_json ADL bridge (Params<T>/Preset/RtResynthOfflineJobConfig)
  template <typename T,
            typename std::enable_if_t<detail::has_to_json<T>::value, int> = 0>
  json(T const& t) {
    to_json(*this, t);
  }

  json const& at(std::string const& key) const {
    auto const* o = std::get_if<object_t>(&v_);
    if (!o) throw std::runtime_error("json: not an object");
    auto it = o->find(key);
    if (it == o->end()) throw std::runtime_error("json: key '" + key + "'");
    return it->second;
  }

  template <typename T>
  T get() const {
    T t{};
    assign_to(t);
    return t;
  }

  // implicit conversion restricted to an allowlist so assignments like
  // `std::string = json` don't become ambiguous over string's many
  // operator= overloads
  template <typename T>
  struct conv_target : detail::has_from_json<T> {};
  template <typename T>
  struct conv_target<std::unordered_map<std::string, T>> : std::true_type {};

  template <typename T,
            typename std::enable_if_t<
                conv_target<T>::value || std::is_same_v<T, std::string> ||
                    std::is_same_v<T, bool> || std::is_same_v<T, int32_t> ||
                    std::is_same_v<T, int64_t> || std::is_same_v<T, uint64_t> ||
                    std::is_same_v<T, float> || std::is_same_v<T, double>,
                int> = 0>
  operator T() const {
    return get<T>();
  }

  bool is_object() const { return std::holds_alternative<object_t>(v_); }

  // ---- scalar extraction
  void assign_to(bool& out) const {
    if (auto const* b = std::get_if<bool>(&v_)) out = *b;
    else out = num<int64_t>() != 0;
  }
  void assign_to(int32_t& out) const { out = static_cast<int32_t>(num<int64_t>()); }
  void assign_to(int64_t& out) const { out = num<int64_t>(); }
  void assign_to(uint64_t& out) const { out = num<uint64_t>(); }
  void assign_to(float& out) const { out = static_cast<float>(num<double>()); }
  void assign_to(double& out) const { out = num<double>(); }
  void assign_to(std::string& out) const {
    auto const* s = std::get_if<std::string>(&v_);
    if (!s) throw std::runtime_error("json: not a string");
    out = *s;
  }
  template <typename T>
  void assign_to(std::unordered_map<std::string, T>& out) const {
    auto const* o = std::get_if<object_t>(&v_);
    if (!o) throw std::runtime_error("json: not an object");
    out.clear();
    for (auto const& kv : *o) out[kv.first] = kv.second.get<T>();
  }
  template <typename T,
            typename std::enable_if_t<detail::has_from_json<T>::value, int> = 0>
  void assign_to(T& out) const {
    from_json(*this, out);
  }

  // ---- printing (nlohmann style: sorted keys via std::map, setw indent)
  friend std::ostream& operator<<(std::ostream& os, json const& j) {
    long const w = os.width();
    os.width(0);
    j.print(os, static_cast<int>(w), 0);
    return os;
  }

  friend std::istream& operator>>(std::istream& is, json& j) {
    std::string text((std::istreambuf_iterator<char>(is)),
                     std::istreambuf_iterator<char>());
    std::size_t pos = 0;
    j = parse_value(text, pos);
    return is;
  }

 private:
  std::variant<std::nullptr_t, bool, int64_t, uint64_t, double, std::string,
               object_t>
      v_;

  template <typename N>
  N num() const {
    if (auto const* i = std::get_if<int64_t>(&v_)) return static_cast<N>(*i);
    if (auto const* u = std::get_if<uint64_t>(&v_)) return static_cast<N>(*u);
    if (auto const* d = std::get_if<double>(&v_)) return static_cast<N>(*d);
    if (auto const* b = std::get_if<bool>(&v_)) return static_cast<N>(*b);
    throw std::runtime_error("json: not a number");
  }

  void print(std::ostream& os, int indent, int depth) const {
    std::string const pad(static_cast<std::size_t>(indent * (depth + 1)), ' ');
    std::string const padc(static_cast<std::size_t>(indent * depth), ' ');
    if (auto const* o = std::get_if<object_t>(&v_)) {
      if (o->empty()) {
        os << (indent > 0 ? "{}" : "{}");
        return;
      }
      os << "{";
      bool first = true;
      for (auto const& kv : *o) {
        if (!first) os << ",";
        first = false;
        if (indent > 0) os << "\n" << pad;
        os << '"' << kv.first << "\":" << (indent > 0 ? " " : "");
        kv.second.print(os, indent, depth + 1);
      }
      if (indent > 0) os << "\n" << padc;
      os << "}";
    } else if (auto const* b = std::get_if<bool>(&v_)) {
      os << (*b ? "true" : "false");
    } else if (auto const* i = std::get_if<int64_t>(&v_)) {
      os << *i;
    } else if (auto const* u = std::get_if<uint64_t>(&v_)) {
      os << *u;
    } else if (auto const* d = std::get_if<double>(&v_)) {
      std::ostringstream tmp;
      tmp.precision(17);
      tmp << *d;
      std::string s = tmp.str();
      if (s.find_first_of(".eE") == std::string::npos) s += ".0";
      os << s;
    } else if (auto const* s = std::get_if<std::string>(&v_)) {
      os << '"' << *s << '"';
    } else {
      os << "null";
    }
  }

  static void skip_ws(std::string const& t, std::size_t& p) {
    while (p < t.size() && (t[p] == ' ' || t[p] == '\t' || t[p] == '\n' ||
                            t[p] == '\r'))
      ++p;
  }

  static std::string parse_string(std::string const& t, std::size_t& p) {
    if (t[p] != '"') throw std::runtime_error("json parse: expected string");
    ++p;
    std::string out;
    while (p < t.size() && t[p] != '"') {
      if (t[p] == '\\' && p + 1 < t.size()) {
        ++p;
        switch (t[p]) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          default: out += t[p];
        }
      } else {
        out += t[p];
      }
      ++p;
    }
    if (p >= t.size()) throw std::runtime_error("json parse: bad string");
    ++p;
    return out;
  }

  static json parse_value(std::string const& t, std::size_t& p) {
    skip_ws(t, p);
    if (p >= t.size()) throw std::runtime_error("json parse: eof");
    char const c = t[p];
    if (c == '{') {
      ++p;
      object_t o;
      skip_ws(t, p);
      if (p < t.size() && t[p] == '}') {
        ++p;
      } else {
        while (true) {
          skip_ws(t, p);
          std::string key = parse_string(t, p);
          skip_ws(t, p);
          if (p >= t.size() || t[p] != ':')
            throw std::runtime_error("json parse: expected :");
          ++p;
          o[key] = parse_value(t, p);
          skip_ws(t, p);
          if (p < t.size() && t[p] == ',') {
            ++p;
            continue;
          }
          if (p < t.size() && t[p] == '}') {
            ++p;
            break;
          }
          throw std::runtime_error("json parse: expected , or }");
        }
      }
      json j;
      j.v_ = std::move(o);
      return j;
    }
    if (c == '"') {
      return json(parse_string(t, p));
    }
    if (!t.compare(p, 4, "true")) {
      p += 4;
      return json(true);
    }
    if (!t.compare(p, 5, "false")) {
      p += 5;
      return json(false);
    }
    if (!t.compare(p, 4, "null")) {
      p += 4;
      return json();
    }
    // number
    std::size_t start = p;
    if (t[p] == '-' || t[p] == '+') ++p;
    bool is_float = false;
    while (p < t.size() &&
           (std::isdigit(static_cast<unsigned char>(t[p])) || t[p] == '.' ||
            t[p] == 'e' || t[p] == 'E' || t[p] == '-' || t[p] == '+')) {
      if (t[p] == '.' || t[p] == 'e' || t[p] == 'E') is_float = true;
      ++p;
    }
    std::string const numstr = t.substr(start, p - start);
    if (is_float) return json(std::stod(numstr));
    if (numstr.size() && numstr[0] == '-')
      return json(static_cast<int64_t>(std::stoll(numstr)));
    return json(static_cast<uint64_t>(std::stoull(numstr)));
  }
};

}  // namespace nlohmann
