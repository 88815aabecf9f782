// Reference-code test oracle.
//
// Compiles the reference's self-contained leaf headers *from /root/reference*
// (read-only; nothing is copied into this repo) behind tests/oracle/shim.h,
// and dumps golden values as text for tests/test_reference_oracle.py to
// compare against the Python implementations (utils/midi.py,
// utils/loudness.py, utils/scales.py, utils/convert.py, ops/oscillators.py,
// analysis/autotune.py).
//
// This closes the round-1 fidelity gap: previously all parity tests compared
// the repo's implementations against each other, which cannot catch a shared
// misreading of the reference. Here the reference's own arithmetic runs.
//
// Output format: one datum per line, "<key> <args...> <value...>", doubles
// printed with %.17g.

#define IMJ_SHIM_USE_REAL_EVENTS_H 1
#include "shim_vocoder.h"            // functional FFT surface (includes shim.h)

#include "events.h"                  // NoteId/Event/NoteIdsGenerator
#include "midi.h"                    // /root/reference/include/midi.h

// NoteSpec comes from the real note.h now (included below, after the
// Request/Sounds engine types it needs); parse.music.cpp follows it.
#include "stereo.h"                  // constant-power pan
#include "pitch_generators.h"        // MultiOctave/ShufflePattern/Drifter
#include "smoothparam.h"             // step-limited parameter smoothing

#include "loudness.h"                // /root/reference/include/loudness.h
#include "scales.h"                  // /root/reference/include/scales.h
#include "sound.functions.h"         // /root/reference/include/sound.functions.h

#include "shim_audioelement.h"       // itp/maybeAtomic/... for audioelement
#include "shim_crtp.h"               // LocalPairArray etc. for gen.crtp.h
// The wind-waveform oracle (windrender below) reads iterator positions and
// slow-counter state buried in private members (BufferIter inside
// AbsIter/SlowIter/WindFreqIter/Ctrl stacks, ShortTermNoiseAdderCtrl's
// private wobble iterator). These reference headers contain no #include
// directives (unity-build style), so opening access here affects only them.
#define private public
#include "sound.h"                   // Sound taxonomy + soundBaseVolume
#include "audioelement.h"            // AHDSR envelope, LogRamp, oscillators
#include "soundengine.h"             // markov-driven ramp-spec generator
#undef private
#include "program.h"                 // Program (used by gen.crtp.h Impl)
#include "gen.crtp.h"                // ImplCRTP polyphony core
#include "gen.sine.h"                // SynthImpl + sine::Synth alias

#include "shim_channel.h"            // fifo/removeLowBits/... for channel.h
#include "request.h"                 // Request/QueuedRequest/Volumes
#include "channel.h"                 // the L3 Channel xfade/volume machinery

#include "shim_voice.h"              // normalize/denormalize + traversals
#include "paramspec.h"               // ParamSpec (getParamSpecs tables)
#include "gen.voice.h"               // voice params/programs/setup wiring
#include "gen.voice.cpp"             // float Limits<> bound definitions

#include "shim_sound.h"              // ScopedLog/StringPlot + noise stubs
#include "sounds.h"                  // the soundId -> soundBuffer cache
// sound.cpp's noise-table getters are renamed away: the driver injects its
// own deterministic getWhiteNoise/getWhiteNoiseAbsMean (below) for the
// carrier's noise lane; the score oracle only uses SINE/SILENCE buffers.
#define getWhiteNoise shim_unused_getWhiteNoise
#define getPinkNoise shim_unused_getPinkNoise
#define getGreyNoise shim_unused_getGreyNoise
#define getWhiteNoiseAbsMean shim_unused_getWhiteNoiseAbsMean
#define getPinkNoiseAbsMean shim_unused_getPinkNoiseAbsMean
#define getGreyNoiseAbsMean shim_unused_getGreyNoiseAbsMean
#include "sound.cpp"                 // soundBuffer generation (sine law etc.)
#undef getWhiteNoise
#undef getPinkNoise
#undef getGreyNoise
#undef getWhiteNoiseAbsMean
#undef getPinkNoiseAbsMean
#undef getGreyNoiseAbsMean
#include "note.h"                    // NoteSpec + to_request
#include "parse.music.cpp"           // the score language parser

#include "rt.resynth.lib.autotune.cpp"  // /root/reference/source/...
#include "rt.resynth.lib.algo.cpp"      // the full pitch pipeline
#include "rt.resynth.lib.periodicfft.cpp"  // sliding-window FFT driver
#include "rt.resynth.lib.metaqueue.cpp"     // SPSC sample queues + policies
#include "rt.resynth.lib.vocoder.cpp"       // FFT vocoder (runs via shim_vocoder.h)
#include "rt.resynth.lib.midi.cpp"          // MIDI decode (portmidi.h shim)

#include <cstdlib>
#include <cstring>
#include <new>
#include <deque>
#include <functional>
#include <variant>

// the clock/jitter globals gen.crtp.h declares (the reference defines them
// in unity.build.cpp:29-43; same shapes here)
namespace imajuscule::audio {
std::unordered_map<uint64_t, std::optional<DurationNanos>>& midiDelays() {
  static std::unordered_map<uint64_t, std::optional<DurationNanos>> m(100);
  return m;
}
DurationNanos& maxMIDIJitter() {
  static DurationNanos v(0);
  return v;
}
}  // namespace imajuscule::audio

using namespace imajuscule;
using namespace imajuscule::audio;
using namespace imajuscule::audio::rtresynth;

static void print1(const char* key, double a, double v) {
  std::printf("%s %.17g %.17g\n", key, a, v);
}

static void dump_midi(double stretch) {
  Midi midi{stretch};
  std::printf("half_tone_ratio %.17g\n", midi.getHalfToneRatio());
  for (double p = -5.0; p <= 155.0; p += 1.37) {
    print1("p2f", p, midi.midi_pitch_to_freq(MidiPitch{p}));
  }
  for (double f = 1.0; f <= 50000.0; f *= 1.7) {
    auto mp = midi.frequency_to_midi_pitch(f);
    print1("f2p", f, mp ? mp->get() : -1e9);
  }
  for (int n = -24; n <= 24; n += 5) {
    std::printf("transpose %d %.17g\n", n,
                midi.transpose_frequency(440.0, n));
  }
  for (int n = 1; n <= 16; ++n) {
    std::printf("harmonic %d %.17g\n", n,
                midi.midi_pitch_offset_nth_harmonic(n));
  }
  {
    auto adds = compute_harmonic_pitch_adds<10>(midi);
    for (int i = 0; i < 10; ++i)
      std::printf("harmonic_add %d %.17g\n", i, adds[i]);
  }
  for (int note = 0; note < 12; ++note) {
    for (int octave = -1; octave <= 8; octave += 3) {
      std::printf("get_pitch %d %d %.17g\n", note, octave,
                  midi.get_pitch(NoteOctave{static_cast<Note>(note), octave})
                      .get());
    }
  }
  for (double p = 0.0; p <= 151.0; p += 3.77) {
    auto [no, dev] = midi_pitch_to_note_deviation(MidiPitch{p});
    std::printf("note_dev %.17g %d %d %.17g\n", p,
                static_cast<int>(to_underlying(no.note)), no.octave, dev);
  }
  // NoteOctave arithmetic (testAutotune exercises these,
  // rt.resynth.lib.test.cpp:1-31)
  for (long n = -30; n <= 30; n += 7) {
    auto no = NoteOctave{Note::La, 4}.add_halftones(n);
    std::printf("add_halftones %ld %d %d\n", n,
                static_cast<int>(to_underlying(no.note)), no.octave);
  }
  std::printf("dist_halftones %d\n",
              NoteOctave{Note::Do, 3}.dist_halftones(NoteOctave{Note::Sol, 5}));
}

static void dump_loudness() {
  for (int i = 0; i < static_cast<int>(loudness::elvs.size()); ++i)
    for (int j = 0; j < loudness::n_freq; ++j)
      std::printf("elvs %d %d %.17g\n", i, j,
                  static_cast<double>(loudness::elvs[i][j]));
  for (int j = 0; j < loudness::n_freq; ++j)
    std::printf("pitches %d %.17g\n", j, loudness::pitches[j].get());
  const double levels[] = {20., 35., 40., 63., 100.};
  const double ratios[] = {0.0, 0.5, 1.0};
  for (double f = 10.0; f <= 30000.0; f *= 1.33) {
    for (double level : levels) {
      for (double r : ratios) {
        std::printf("freq %.17g %.17g %.17g %.17g\n", f, level, r,
                    static_cast<double>(loudness::equal_loudness_volume_from_freq(
                        static_cast<float>(f), 0, static_cast<float>(r),
                        static_cast<float>(level))));
      }
    }
  }
  for (double p = 0.0; p <= 151.0; p += 2.39) {
    std::printf("pitchvol %.17g %.17g\n", p,
                static_cast<double>(loudness::equal_loudness_volume_from_pitch(
                    MidiPitch{p}, 0, 1.f, 40.f)));
  }
  for (double db = -40.0; db <= 140.0; db += 7.3) {
    std::printf("db2amp %.17g %.17g\n", db,
                static_cast<double>(loudness::db_to_amplitude(
                    static_cast<float>(db), 110.f, 0.6f)));
  }
}

static void dump_scales() {
  for (int i = 0; i < 7; ++i)
    std::printf("well_major %d %.17g\n", i, well_tempered::c_majorScaleAsc[i]);
  for (int i = 0; i < 7; ++i)
    std::printf("well_minor %d %.17g\n", i, well_tempered::c_minorScaleAsc[i]);
  auto j = just::mkMajorScaleAsc<Constexpr::No>();
  for (int i = 0; i < 7; ++i) std::printf("just %d %.17g\n", i, j[i]);
  auto p = pythagorean::mkMajorScaleAsc<Constexpr::No>();
  for (int i = 0; i < 7; ++i) std::printf("pyth %d %.17g\n", i, p[i]);
  auto mp = toMidiPitches(MidiPitch{62.5}, j);
  for (int i = 0; i < 7; ++i)
    std::printf("to_midi %d %.17g\n", i, mp[i].get());
}

static void dump_soundfunc() {
  const int srs[] = {44100, 48000, 96000};
  for (int sr : srs) {
    std::printf("ms_to_frames %d %.17g %d\n", sr, 12.34,
                ms_to_frames(12.34f, sr));
    std::printf("frames_to_ms %d %d %.17g\n", sr, 777,
                static_cast<double>(frames_to_ms(777, sr)));
    std::printf("nanos_to_frames %d %llu %d\n", sr, 123456789ull,
                nanoseconds_to_frames(DurationNanos{123456789ull}, sr));
    std::printf("f2inc %d %.17g %.17g\n", sr, 440.0,
                freq_to_angle_increment(440.0, sr));
    std::printf("inc2f %d %.17g %.17g\n", sr, 0.02,
                angle_increment_to_freq(0.02, sr));
    std::printf("f2period %d %.17g %d\n", sr, 439.3,
                freq_to_period_in_samples(439.3f, static_cast<float>(sr)));
    std::printf("nyquist %d %.17g\n", sr,
                get_nyquist_frequency(static_cast<double>(sr)));
  }
  std::printf("inc2csamples %.17g %.17g\n", 0.031,
              angle_increment_to_period_in_continuous_samples(0.031));
  // waveforms over angle in [0, 2) rad/pi (the reference's unit)
  for (double a = 0.0; a < 2.0; a += 0.0703) {
    print1("saw", a, saw(a));
    print1("triangle", a, triangle(a));
    print1("square", a, square(a));
    std::printf("pulse %.17g %.17g %.17g %.17g %.17g\n", a, 0.37, 1.25, -0.5,
                pulse(a, 0.37, 1.25, -0.5));
  }
}

static void dump_autotune() {
  const MusicalScaleMode modes[] = {MusicalScaleMode::Major,
                                    MusicalScaleMode::MinorNatural,
                                    MusicalScaleMode::MinorHarmonic};
  const double roots[] = {60.0, 61.5, 69.0, 0.25};
  for (int m = 0; m < 3; ++m) {
    auto const& scale = getMusicalScale(modes[m]);
    for (double root : roots) {
      for (double p = -10.0; p <= 160.0; p += 0.83) {
        std::printf("closest %d %.17g %.17g %.17g\n", m, root, p,
                    scale.closest_pitch(MidiPitch{root}, MidiPitch{p}).get());
      }
    }
  }
  // find_closest_pitch over a fixed sorted pitch list
  std::vector<double> pitches{12.0, 40.0, 40.5, 69.0, 100.0};
  for (double p = 0.0; p <= 120.0; p += 1.9) {
    double* r = find_closest_pitch(MidiPitch{p}, pitches,
                                   [](double d) { return MidiPitch{d}; });
    print1("findc", p, r ? *r : -1e9);
  }
}

// Drives the reference's AHDSR envelope state machine
// (EnvelopeCRT::step + AHDSREnvelopeBase, audioelement.h:666-1102) sample by
// sample. stdin lines:
//   A aItp H D dItp R rItp sustain sr minChange relMode zeroAttack
//     pressDelay relAtStep relDelay nSteps
// relMode: 0 = WaitForKeyRelease, 1 = ReleaseAfterDecay; relAtStep: the
// 0-based step index AFTER which onKeyReleased(relDelay) is called (-1 =
// never). Prints "V <value> <state>" per step then "E".
template <typename Env>
static void run_envelope(audioelement::AHDSR const& s, int sr, int min_change,
                         int press_delay, long rel_at, int rel_delay,
                         int n_steps) {
  Env env;
  env.setAHDSR(s, sr);
  env.setMinChangeDurationSamples(min_change);
  env.forgetPastSignals();
  env.tryAcquire();
  env.onKeyPressed(press_delay);
  for (long i = 0; i < n_steps; ++i) {
    env.step();
    std::printf("V %.17g %d\n", double(env.value()),
                static_cast<int>(env.getRelaxedState()));
    if (i == rel_at) env.onKeyReleased(rel_delay);
  }
  std::printf("E\n");
}

static void dump_envelope() {
  int A, aItp, H, D, dItp, R, rItp, sr, min_change, rel_mode, zero_attack,
      press_delay, rel_delay, n_steps;
  double sustain;
  long rel_at;
  while (std::scanf("%d %d %d %d %d %d %d %lf %d %d %d %d %d %ld %d %d", &A,
                    &aItp, &H, &D, &dItp, &R, &rItp, &sustain, &sr,
                    &min_change, &rel_mode, &zero_attack, &press_delay,
                    &rel_at, &rel_delay, &n_steps) == 16) {
    audioelement::AHDSR s{A,
                          static_cast<itp::interpolation>(aItp),
                          H,
                          D,
                          static_cast<itp::interpolation>(dItp),
                          R,
                          static_cast<itp::interpolation>(rItp),
                          static_cast<float>(sustain)};
    using audioelement::AHDSREnvelope;
    using audioelement::AllowZeroAttack;
    using audioelement::EnvelopeRelease;
    if (rel_mode == 0 && zero_attack == 0)
      run_envelope<AHDSREnvelope<Atomicity::No, double,
                                 EnvelopeRelease::WaitForKeyRelease,
                                 AllowZeroAttack::No>>(
          s, sr, min_change, press_delay, rel_at, rel_delay, n_steps);
    else if (rel_mode == 0)
      run_envelope<AHDSREnvelope<Atomicity::No, double,
                                 EnvelopeRelease::WaitForKeyRelease,
                                 AllowZeroAttack::Yes>>(
          s, sr, min_change, press_delay, rel_at, rel_delay, n_steps);
    else if (zero_attack == 0)
      run_envelope<AHDSREnvelope<Atomicity::No, double,
                                 EnvelopeRelease::ReleaseAfterDecay,
                                 AllowZeroAttack::No>>(
          s, sr, min_change, press_delay, rel_at, rel_delay, n_steps);
    else
      run_envelope<AHDSREnvelope<Atomicity::No, double,
                                 EnvelopeRelease::ReleaseAfterDecay,
                                 AllowZeroAttack::Yes>>(
          s, sr, min_change, press_delay, rel_at, rel_delay, n_steps);
  }
}

// Drives a full reference RT voice: Enveloped<SineOscillatorAlgo, AHDSR>
// (audioelement.h:182-289) — notably the wrapper's min-change-duration =
// 2.5 signal periods (characTimeMultiplier, :216-225) stretching short
// attacks/releases for low notes. stdin lines:
//   inc A aItp H D dItp R rItp sustain sr pressDelay relAt relDelay nSteps
// Prints "V <imag>" per step then "E".
static void dump_enveloped() {
  double inc, sustain;
  int A, aItp, H, D, dItp, R, rItp, sr, press_delay, rel_delay, n_steps;
  long rel_at;
  while (std::scanf("%lf %d %d %d %d %d %d %d %lf %d %d %ld %d %d", &inc, &A,
                    &aItp, &H, &D, &dItp, &R, &rItp, &sustain, &sr,
                    &press_delay, &rel_at, &rel_delay, &n_steps) == 14) {
    using namespace audioelement;
    Enveloped<SineOscillatorAlgo<double>,
              AHDSREnvelope<Atomicity::No, double,
                            EnvelopeRelease::WaitForKeyRelease,
                            AllowZeroAttack::No>>
        v;
    v.editEnvelope().setAHDSR(
        AHDSR{A, static_cast<itp::interpolation>(aItp), H, D,
              static_cast<itp::interpolation>(dItp), R,
              static_cast<itp::interpolation>(rItp),
              static_cast<float>(sustain)},
        sr);
    v.forgetPastSignals();
    v.set_sample_rate(sr);
    v.setAngleIncrements(inc);
    v.setStartAngle(0.25);
    v.tryAcquire();
    v.onKeyPressed(press_delay);
    for (long i = 0; i < n_steps; ++i) {
      v.step();
      std::printf("V %.17g\n", v.imag());
      if (i == rel_at) v.onKeyReleased(rel_delay);
    }
    std::printf("E\n");
  }
}

// Drives the reference's additive-harmonics element: MultiEnveloped<
// SineOscillatorAlgo, AHDSREnvelope> (audioelement.h:486-657) — per-harmonic
// phases/volumes, i-times-fundamental increments, per-harmonic envelope
// floors, trailing-silent-harmonic trimming. stdin lines:
//   inc start_angle K  then K lines "phase volume", then
//   A aItp H D dItp R rItp sustain sr relAt nSteps
// Prints "V <imag>" per step then "E".
static void dump_multienv() {
  double inc, start_angle, sustain;
  int K, A, aItp, H, D, dItp, R, rItp, sr, n_steps;
  long rel_at;
  while (std::scanf("%lf %lf %d", &inc, &start_angle, &K) == 3) {
    std::vector<audioelement::harmonicProperties_t> props(
        static_cast<size_t>(K));
    for (auto& p : props) {
      double ph, vol;
      if (std::scanf("%lf %lf", &ph, &vol) != 2) std::exit(2);
      p.phase = static_cast<float>(ph);
      p.volume = static_cast<float>(vol);
    }
    if (std::scanf("%d %d %d %d %d %d %d %lf %d %ld %d", &A, &aItp, &H, &D,
                   &dItp, &R, &rItp, &sustain, &sr, &rel_at, &n_steps) != 11)
      std::exit(2);
    using namespace audioelement;
    MultiEnveloped<SineOscillatorAlgo<double>,
                   AHDSREnvelope<Atomicity::No, double,
                                 EnvelopeRelease::WaitForKeyRelease,
                                 AllowZeroAttack::No>>
        me;
    me.setHarmonics(props, sr);
    me.setAHDSR(AHDSR{A, static_cast<itp::interpolation>(aItp), H, D,
                      static_cast<itp::interpolation>(dItp), R,
                      static_cast<itp::interpolation>(rItp),
                      static_cast<float>(sustain)},
                sr);
    me.forgetPastSignals();
    me.setAngleIncrements(inc);
    me.setStartAngle(start_angle);
    me.tryAcquire();
    me.onKeyPressed(0);
    for (long i = 0; i < n_steps; ++i) {
      me.step();
      std::printf("V %.17g\n", me.imag());
      if (i == rel_at) me.onKeyReleased(0);
    }
    std::printf("E\n");
  }
}

// Drives the reference's LogRamp (periodic exponential frequency glide with
// PROPORTIONAL_VALUE_DERIVATIVE stepping, audioelement.h:2464-2572).
// stdin lines: "from to duration start_sample itpKind nSteps [resetupAt
// from2 to2 dur2 start2 itp2]" (resetupAt = -1 for none).
// Prints "V <value>" per step then "E".
static void dump_logramp() {
  double from, to, dur, start, from2, to2, dur2, start2;
  int kind, n, kind2;
  long resetup_at;
  while (std::scanf("%lf %lf %lf %lf %d %d %ld", &from, &to, &dur, &start,
                    &kind, &n, &resetup_at) == 7) {
    if (resetup_at >= 0) {
      if (std::scanf("%lf %lf %lf %lf %d", &from2, &to2, &dur2, &start2,
                     &kind2) != 5)
        std::exit(2);
    }
    audioelement::LogRamp<double> ramp;
    ramp.setup(from, to, dur, start, static_cast<itp::interpolation>(kind));
    for (long i = 0; i < n; ++i) {
      std::printf("V %.17g\n", ramp.step());
      if (i == resetup_at)
        ramp.setup(from2, to2, dur2, start2,
                   static_cast<itp::interpolation>(kind2));
    }
    std::printf("E\n");
  }
}

// Drives the reference's InterpolatedFreq (audioelement.h:2706-2817) — the
// per-stride frequency retarget glide of ResynthElement. stdin lines:
//   D itp nsteps k   then k lines "step target" (setAngleIncrements(target)
//   applied BEFORE that step index, like the NoteChange oneshot).
// Prints "V <value>" per step then "E".
static void dump_interpfreq() {
  double D;
  int kind, nsteps, k;
  while (std::scanf("%lf %d %d %d", &D, &kind, &nsteps, &k) == 4) {
    std::vector<std::pair<long, double>> targets(k);
    for (auto& t : targets)
      if (std::scanf("%ld %lf", &t.first, &t.second) != 2) std::exit(2);
    audioelement::InterpolatedFreq<double> itf;
    itf.forgetPastSignals();
    itf.setup(D, static_cast<itp::interpolation>(kind));
    std::size_t ti = 0;
    for (long i = 0; i < nsteps; ++i) {
      while (ti < targets.size() && targets[ti].first == i) {
        itf.setAngleIncrements(targets[ti].second);
        ++ti;
      }
      std::printf("V %.17g\n", itf.step());
    }
    std::printf("E\n");
  }
}

// Drives the reference's Phased oscillators (audioelement.h:1396-1748):
// saw/square/triangle trajectories with the anti-aliasing gain, the pulse
// train's width latch at period boundaries, the SineOscillatorAlgo
// rotation+renormalization, and freqAliasingMultiplicator.
static void dump_oscillators() {
  using namespace audioelement;
  for (double inc = 0.0; inc <= 2.05; inc += 0.037)
    std::printf("alias %.17g %.17g\n", inc,
                freqAliasingMultiplicator(inc));
  const double incs[] = {0.0203, 0.41, 1.7};
  for (double inc : incs) {
    FOscillatorAlgo<double, FOscillator::SAW, OscillatorUsage::Raw> saw_;
    FOscillatorAlgo<double, FOscillator::SQUARE, OscillatorUsage::Raw> sq_;
    FOscillatorAlgo<double, FOscillator::TRIANGLE, OscillatorUsage::Raw> tr_;
    saw_.setStartAngle(0.3);
    sq_.setStartAngle(0.3);
    tr_.setStartAngle(0.3);
    saw_.setAngleIncrements(inc);
    sq_.setAngleIncrements(inc);
    tr_.setAngleIncrements(inc);
    for (int i = 0; i < 300; ++i) {
      saw_.step();
      sq_.step();
      tr_.step();
      std::printf("fosc %.17g %d %.17g %.17g %.17g\n", inc, i, saw_.imag(),
                  sq_.imag(), tr_.imag());
    }
  }
  {
    PulseTrainAlgo<double> p;
    p.getAlgo().setPulseWidth(0.3);
    p.setStartAngle(0.0);
    p.setAngleIncrements(0.23);
    for (int i = 0; i < 120; ++i) {
      if (i == 20) p.getAlgo().setPulseWidth(0.8);  // latches at next period
      if (i == 70) p.getAlgo().setPulseWidth(1.4);
      p.step();
      std::printf("pulsetrain %d %.17g\n", i, p.imag());
    }
  }
  for (double inc : incs) {
    SineOscillatorAlgo<double> s;
    s.setStartAngle(0.25);
    s.setAngleIncrements(inc);
    for (int i = 0; i < 20000; ++i) {
      s.step();
      if (i % 333 == 0 || i >= 19990)
        std::printf("sine %.17g %d %.17g %.17g\n", inc, i, s.real(),
                    s.imag());
    }
  }
}

// Drives the reference's SoundEngine ramp-spec generation (the markov node
// lambdas + play()/spec machinery, soundengine.h:240-1124) for
// BIRDS/ROBOTS/SWEEP. Randomness goes through the shim's mt19937; the
// driver pre-prints, for every raw position, BOTH the canonical float
// (what uniform_real_distribution<float>{a,b} will map as u*(b-a)+a) and
// the {0,1} int draw, so the Python side replays the exact sequence
// without reimplementing libstdc++'s engine-to-distribution mapping.
// stdin: mode seed sr base_freq length_ms freq_scatter d1 d2 har_att
//        exp_min exp_max itp freq_itp xfade_mode freq_xfade_frames
//        start pre minpath addl pause low high npre
struct OracleLogger {
  template <typename... A>
  static void err(A...) {}
};

template <audioelement::SoundEngineMode M>
static void run_soundengine(int sr, double base_freq, double length,
                            double freq_scatter, double d1, double d2,
                            double har_att, double exp_min, double exp_max,
                            int itp_, int freq_itp, int xfade_mode,
                            int freq_xfade, int start, int pre, int minpath,
                            int addl, int pause, double low, double high) {
  using namespace audioelement;
  SoundEngine<M, 1, Atomicity::No, OracleLogger> eng;
  eng.set_sample_rate(sr);
  eng.setAngleIncrements(
      freq_to_angle_increment(static_cast<float>(base_freq), sr));
  eng.set_length(static_cast<float>(length));
  eng.set_freq_scatter(static_cast<float>(freq_scatter));
  eng.set_d1(static_cast<float>(d1));
  eng.set_d2(static_cast<float>(d2));
  eng.set_har_att(static_cast<float>(har_att));
  eng.set_length_exp(static_cast<float>(exp_min),
                     static_cast<float>(exp_max));
  eng.set_itp(static_cast<itp::interpolation>(itp_));
  eng.set_freq_interpolation(static_cast<itp::interpolation>(freq_itp));
  eng.set_freq_xfade(freq_xfade);
  eng.set_phase_ratio1(0.f);
  eng.set_phase_ratio2(0.f);
  bool ok = false;
  if constexpr (M == SoundEngineMode::BIRDS)
    ok = eng.initialize_birds(start, pre, minpath, addl,
                              SoundEngineInitPolicy::StartAfresh,
                              static_cast<FreqXfade>(xfade_mode), pause);
  else if constexpr (M == SoundEngineMode::ROBOTS)
    ok = eng.initialize_robot(start, pre, minpath, addl,
                              SoundEngineInitPolicy::StartAfresh, pause);
  else
    ok = eng.initialize_sweep(static_cast<float>(low),
                              static_cast<float>(high));
  std::printf("OK %d\n", ok ? 1 : 0);
  auto& specs = eng.getRampsSpecs();
  for (unsigned i = 0; i < specs.end; ++i) {
    auto& c = specs.a[i];
    std::printf("S %.17g %.17g %.17g %.17g %d\n",
                double(c.get().getAngleIncrementFrom()),
                double(c.get().getAngleIncrementTo()),
                double(c.get().get_duration_in_samples()),
                double(c.volume()), c.getSilenceFollows() ? 1 : 0);
  }
}

// Full per-sample WAVEFORM render of the reference SoundEngine (BIRDS/
// ROBOTS/SWEEP): the 3-ramp rotation, AHDSR xfade envelopes
// (soundengine.h:777-801), LogRamp glides, the per-sample loudness-adjusted
// volume smoothing (LoudnessVolumeAdjusted over the shim Filter law), and
// the articulative orchestration — everything models/soundengine.py's
// batched renderer reassembles. stdin: the run_soundengine surface +
// xfade_len pr1 pr2 n_steps; prints "V <sample>" per step.
template <audioelement::SoundEngineMode M>
static void run_serender(int sr, double base_freq, double length,
                         double freq_scatter, double d1, double d2,
                         double har_att, double exp_min, double exp_max,
                         int itp_, int freq_itp, int xfade_mode,
                         int freq_xfade, int start, int pre, int minpath,
                         int addl, int pause, double low, double high,
                         int xfade_len, double pr1, double pr2,
                         long n_steps) {
  using namespace audioelement;
  SoundEngine<M, 1, Atomicity::No, OracleLogger> eng;
  eng.set_sample_rate(sr);
  eng.setAngleIncrements(
      freq_to_angle_increment(static_cast<float>(base_freq), sr));
  eng.set_length(static_cast<float>(length));
  eng.set_freq_scatter(static_cast<float>(freq_scatter));
  eng.set_d1(static_cast<float>(d1));
  eng.set_d2(static_cast<float>(d2));
  eng.set_har_att(static_cast<float>(har_att));
  eng.set_length_exp(static_cast<float>(exp_min),
                     static_cast<float>(exp_max));
  eng.set_itp(static_cast<itp::interpolation>(itp_));
  eng.set_freq_interpolation(static_cast<itp::interpolation>(freq_itp));
  eng.set_freq_xfade(freq_xfade);
  eng.set_phase_ratio1(static_cast<float>(pr1));
  eng.set_phase_ratio2(static_cast<float>(pr2));
  eng.setEnvelopeCharacTime(xfade_len);
  eng.setLoudnessParams(sr, 5, 1.f, 30.f);
  bool ok = false;
  if constexpr (M == SoundEngineMode::BIRDS)
    ok = eng.initialize_birds(start, pre, minpath, addl,
                              SoundEngineInitPolicy::StartAfresh,
                              static_cast<FreqXfade>(xfade_mode), pause);
  else if constexpr (M == SoundEngineMode::ROBOTS)
    ok = eng.initialize_robot(start, pre, minpath, addl,
                              SoundEngineInitPolicy::StartAfresh, pause);
  else
    ok = eng.initialize_sweep(static_cast<float>(low),
                              static_cast<float>(high));
  std::printf("OK %d\n", ok ? 1 : 0);
  auto& specs = eng.getRampsSpecs();
  for (unsigned i = 0; i < specs.end; ++i) {
    auto& c = specs.a[i];
    std::printf("S %.17g %.17g %.17g %.17g %d\n",
                double(c.get().getAngleIncrementFrom()),
                double(c.get().getAngleIncrementTo()),
                double(c.get().get_duration_in_samples()),
                double(c.volume()), c.getSilenceFollows() ? 1 : 0);
  }
  eng.tryAcquire();
  eng.onKeyPressed(0);
  for (long t = 0; t < n_steps; ++t) {
    eng.step();
    std::printf("V %.17g\n", double(eng.imag()));
  }
}

// Full per-sample WAVEFORM render of the reference WIND engine:
// SoundEngine<WIND> with the real MixOf<WIND> (LowPass<pink,VariableOrder> +
// AsymBandPass<pink> + AsymBandReject<pink> + LoudnessVolumeAdjusted<Sine>,
// soundengine.h:196-222) over a DRIVER-INJECTED pink table, wired exactly
// like voice::setupAudioElement does for WIND (gen.voice.h:939-977). The
// iterator start positions (BufferIter's randomized starts,
// sound.h:192-207) are read out of the engine after the first spec starts
// playing and printed as "P <name> <pos>" / "I <name> <idx>", so the Python
// side replays the same walks without replicating the RNG protocol.
// stdin: sr order xfade_len inc_lo inc_hi n_slow_long n_short_rate
//        short_amp wmin wmax g_lp g_bp g_br g_sine loud_idx loud_ratio
//        loud_level itp seed n_steps n_table <table values...>
namespace imajuscule::audio {
// pink-noise table for soundBufferWrapperAlgo<PINK_NOISE>/PinkNoiseIter
// (sound.h:261-271): DRIVER-INJECTED, like the white table below
static std::vector<double> g_pink_noise_values{0.0};
soundBuffer<double> const& getPinkNoise(int) {
  static soundBuffer<double> b = [] {
    soundBuffer<double> x(g_pink_noise_values.size(), 0.f);
    std::copy(g_pink_noise_values.begin(), g_pink_noise_values.end(),
              x.getBuffer().begin());
    return x;
  }();
  return b;
}
float getPinkNoiseAbsMean(int) {
  double s = 0.0;
  for (double v : g_pink_noise_values) s += std::abs(v);
  return static_cast<float>(s / g_pink_noise_values.size());
}
}  // namespace imajuscule::audio

static void run_windrender() {
  using namespace audioelement;
  int sr, order, xfl, n_slow_long, loud_idx, itp_, seed, n_table;
  double inc_lo, inc_hi, n_short_rate, short_amp, wmin, wmax, glp, gbp, gbr,
      gsine, loud_ratio, loud_level;
  long n_steps;
  if (std::scanf("%d %d %d %lf %lf %d %lf %lf %lf %lf %lf %lf %lf %lf %d "
                 "%lf %lf %d %d %ld %d",
                 &sr, &order, &xfl, &inc_lo, &inc_hi, &n_slow_long,
                 &n_short_rate, &short_amp, &wmin, &wmax, &glp, &gbp, &gbr,
                 &gsine, &loud_idx, &loud_ratio, &loud_level, &itp_, &seed,
                 &n_steps, &n_table) != 21)
    std::exit(2);
  g_pink_noise_values.resize(static_cast<std::size_t>(n_table));
  for (auto& v : g_pink_noise_values)
    if (std::scanf("%lf", &v) != 1) std::exit(2);
  mersenne<SEEDED::No>().seed(static_cast<unsigned>(seed));

  SoundEngine<SoundEngineMode::WIND, 1, Atomicity::No, OracleLogger> eng;
  eng.set_sample_rate(sr);
  // do_initialize guards on positive length/base_freq even for WIND (whose
  // markov lambdas use neither) — any positive values work
  eng.set_length(93.f);
  eng.setAngleIncrements(freq_to_angle_increment(440.f, sr));
  // gen.voice.h:939 + :948 + :951-956
  eng.setFiltersOrder(order);
  range<float> wr;
  wr.extend(static_cast<float>(wmin));
  wr.extend(static_cast<float>(wmax));
  range<float> ra;
  ra.extend(static_cast<float>(inc_lo));
  ra.extend(static_cast<float>(inc_hi));
  for (auto& r : eng.getRamps()) {
    auto& mix = r.getVolumeAdjustment().getOsc().getOsc();
    // SetFilterWidths<WIND> (gen.voice.h:352-357)
    std::get<1>(mix.get()).getOsc().setWidthRange(wr);
    std::get<2>(mix.get()).getOsc().setWidthRange(wr);
    // ConfigureFilters<WIND> (gen.voice.h:369-389)
    auto& bpf = std::get<1>(mix.get());
    auto& bpr = std::get<2>(mix.get());
    bpf.getCtrl().getUnderlyingIter().set_n_slow_steps(n_slow_long);
    bpf.getCtrl().setAngleIncrementsRange(ra);
    bpf.getOsc().getWidth().getUnderlyingIter().set_n_slow_steps(
        n_slow_long);
    bpr.getCtrl().getUnderlyingIter().set_n_slow_steps(n_slow_long);
    bpr.getCtrl().setAngleIncrementsRange(ra);
    bpr.getOsc().getWidth().getUnderlyingIter().set_n_slow_steps(
        n_slow_long);
  }
  eng.setGains(std::array<float, 4>{
      static_cast<float>(glp), static_cast<float>(gbp),
      static_cast<float>(gbr), static_cast<float>(gsine)});
  eng.setLoudnessParams(sr, loud_idx, static_cast<float>(loud_ratio),
                        static_cast<float>(loud_level));
  // SetSlowParams<WIND> per spec ctrl (gen.voice.h:334-341,971-977)
  for (auto& f_control : eng.getRampsSpecs().a) {
    f_control.get().getUnderlyingIter().set_n_slow_steps(n_slow_long);
    f_control.get().set_short_term_noise_rate(
        static_cast<float>(n_short_rate));
    f_control.get().set_short_term_noise_amplitude(
        static_cast<float>(short_amp));
    f_control.get().setAngleIncrementsRange(ra);
  }
  eng.set_itp(static_cast<itp::interpolation>(itp_));
  eng.setEnvelopeCharacTime(xfl);
  bool const ok = eng.initialize_wind(0, 0, 1, 0,
                                      SoundEngineInitPolicy::StartAfresh);
  std::printf("OK %d\n", ok ? 1 : 0);
  if (!ok) return;
  eng.tryAcquire();
  eng.onKeyPressed(0);
  // play the first (never-releasing) spec without stepping the algos, so
  // the iterator positions below are the exact post-init starts
  eng.orchestrate_algos();
  auto* pressed = eng.get_ramps().keyPressed;
  if (!pressed) {
    std::printf("NOPRESS\n");
    return;
  }
  auto& fc = pressed->getVolumeAdjustment().getOsc().getAlgo();
  auto& mc = fc.getCtrl();  // ShortTermNoiseAdderCtrl
  // Exact per-walk start state. NB the reference's spec-start protocol
  // leaves a compound state: playNextSpec runs forgetPastSignals (SlowIter
  // init: position draw -> prev = value there, ++pos) and THEN
  // set_sample_rate, whose BufferIter::set_sample_rate re-draws a FRESH
  // position (sound.h:185-190) without touching the SlowIter's prev — so
  // the first segment eases from a value at one discarded random position
  // toward the table value at another, unadvanced position.
  auto pslow = [](const char* name, auto const& slow) {
    std::printf("P %s %d %.17g %d %d\n", name, slow.it.getPosition(),
                double(slow.prev), int(slow.slow_it), int(slow.n_steps));
  };
  auto pslow2 = [](const char* name, auto const& slow) {
    // SlowIter<AbsIter<BufferIter>> variant (one more .it hop)
    std::printf("P %s %d %.17g %d %d\n", name, slow.it.it.getPosition(),
                double(slow.prev), int(slow.slow_it), int(slow.n_steps));
  };
  pslow2("mainlong", mc.ctrl.ctrl.it.it);
  pslow("wobble", mc.noise);
  auto& mix = fc.getOsc();
  auto& bp = std::get<1>(mix.get());
  auto& br = std::get<2>(mix.get());
  pslow2("bpcenter", bp.getCtrl().ctrl.it.it);
  pslow2("bpwidth", bp.getOsc().getWidth().it.it);
  pslow2("brcenter", br.getCtrl().ctrl.it.it);
  pslow2("brwidth", br.getOsc().getWidth().it.it);
  std::printf("I lp %d\n", std::get<0>(mix.get()).get_element().index);
  std::printf("I bp %d\n", bp.getOsc().getLP().get_element().index);
  std::printf("I brlp %d\n", br.getOsc().getLP().get_element().index);
  std::printf("I brhp %d\n", br.getOsc().getHP().get_element().index);
  auto& sine = std::get<3>(mix.get());
  for (long t = 0; t < n_steps; ++t) {
    eng.step();
    // C = the main control's per-sample increment as received by the sine
    // member (FreqCtrl_::step -> Mix::setAngleIncrements), so the test can
    // pin the control path separately from the audio; W/S = the raw long
    // walk / wobble values feeding it
    std::printf("C %.17g W %.17g S %.17g\n", double(sine.angleIncrements()),
                double(*(mc.ctrl.ctrl.it)), double(*(mc.noise)));
    std::printf("V %.17g\n", double(eng.imag()));
  }
}

// Orchestration timing: step the engine per sample and print the sample
// index at which each spec starts playing (playNextSpec advances
// ramp_specs.it — soundengine.h:738-803: release scheduled xfade before the
// spec's end, then the articulative pause, then the next spec).
template <audioelement::SoundEngineMode M>
static void run_seorch(int sr, double base_freq, double length,
                       double freq_scatter, double exp_min, double exp_max,
                       int itp_, int xfade_mode, int freq_xfade, int pre,
                       int minpath, int addl, int pause, int xfade_len,
                       long n_steps) {
  using namespace audioelement;
  SoundEngine<M, 1, Atomicity::No, OracleLogger> eng;
  eng.set_sample_rate(sr);
  eng.setAngleIncrements(
      freq_to_angle_increment(static_cast<float>(base_freq), sr));
  eng.set_length(static_cast<float>(length));
  eng.set_freq_scatter(static_cast<float>(freq_scatter));
  eng.set_length_exp(static_cast<float>(exp_min),
                     static_cast<float>(exp_max));
  eng.set_itp(static_cast<itp::interpolation>(itp_));
  eng.set_freq_interpolation(itp::EASE_OUT_EXPO);
  eng.set_freq_xfade(freq_xfade);
  eng.set_phase_ratio1(0.f);
  eng.set_phase_ratio2(0.f);
  eng.setEnvelopeCharacTime(xfade_len);
  bool ok = eng.initialize_birds(0, pre, minpath, addl,
                                 SoundEngineInitPolicy::StartAfresh,
                                 static_cast<FreqXfade>(xfade_mode), pause);
  std::printf("OK %d\n", ok ? 1 : 0);
  auto& specs = eng.getRampsSpecs();
  for (unsigned i = 0; i < specs.end; ++i) {
    auto& c = specs.a[i];
    std::printf("S %.17g %.17g %.17g %d\n",
                double(c.get().getAngleIncrementFrom()),
                double(c.get().getAngleIncrementTo()),
                double(c.get().get_duration_in_samples()),
                c.getSilenceFollows() ? 1 : 0);
  }
  eng.tryAcquire();
  eng.onKeyPressed(0);
  unsigned prev_it = 31;  // reset sentinel (5-bit -1)
  for (long t = 0; t < n_steps; ++t) {
    eng.step();
    unsigned const it = specs.it;
    if (it != prev_it) {
      if (it != specs.end)  // final ++it past the last spec = exhaustion
        std::printf("P %ld %u\n", t, it);
      prev_it = it;
    }
  }
}

// Drives the reference's WIND control stack (soundengine.h:46-173:
// ShortTermNoiseAdderCtrl< SoundEngineFreqCtrl< SlowIter<AbsIter<noise>> >,
// SlowIter<noise> >, where Ctrl wraps the long-term iter in a WindFreqIter
// whose ascending walks advance SCALE_UP=3x faster, audioelement.h:
// 2934-2974) over a KNOWN table with deterministic starts — the noise
// CONTENT is test data; every walk/interp/mapping decision is reference
// code. stdin: n_table <values...> n_slow_long inc_min inc_max amp ratio
// n_steps; prints "V <inc>" per control step.
namespace wind_oracle {
struct TestNoiseIter {
  using FPT = float;
  static std::vector<float> table;
  int pos = 0;
  void set_sample_rate(int) {}
  void initializeForRun() { pos = 0; }
  void operator++() {
    ++pos;
    if (pos == static_cast<int>(table.size())) pos = 0;
  }
  float operator*() const { return table[static_cast<size_t>(pos)]; }
  float getAbsMean() const {
    float s = 0.f;
    for (float v : table) s += std::abs(v);
    return s / static_cast<float>(table.size());
  }
};
std::vector<float> TestNoiseIter::table;
}  // namespace wind_oracle

static void dump_windctrl() {
  using namespace audioelement;
  using wind_oracle::TestNoiseIter;
  int n_table;
  if (std::scanf("%d", &n_table) != 1) std::exit(2);
  TestNoiseIter::table.resize(static_cast<size_t>(n_table));
  for (auto& v : TestNoiseIter::table) {
    double d;
    if (std::scanf("%lf", &d) != 1) std::exit(2);
    v = static_cast<float>(d);
  }
  int n_slow_long, itp_kind;
  double inc_min, inc_max, amp, ratio;
  long n_steps;
  if (std::scanf("%d %lf %lf %lf %lf %ld %d", &n_slow_long, &inc_min,
                 &inc_max, &amp, &ratio, &n_steps, &itp_kind) != 7)
    std::exit(2);

  using LongIter = SlowIter<AbsIter<TestNoiseIter>>;
  ShortTermNoiseAdderCtrl<SoundEngineFreqCtrl<LongIter>, SlowIter<TestNoiseIter>>
      ctrl;
  ctrl.set_sample_rate(44100);
  // gen.voice.h wiring: interpolation + slow-step count on the long iter
  ctrl.getUnderlyingIter().set_interpolation(
      static_cast<itp::interpolation>(itp_kind));
  ctrl.getUnderlyingIter().set_n_slow_steps(n_slow_long);
  ctrl.set_short_term_noise_amplitude(static_cast<float>(amp));
  ctrl.set_short_term_noise_rate(static_cast<float>(ratio));
  range<float> r;
  r.extend(static_cast<float>(inc_min));
  r.extend(static_cast<float>(inc_max));
  ctrl.setAngleIncrementsRange(r);
  ctrl.forgetPastSignals();
  for (long i = 0; i < n_steps; ++i)
    std::printf("V %.17g\n", double(ctrl.step()));
}

static void dump_soundengine() {
  int mode, seed, sr, itp_, freq_itp, xfade_mode, freq_xfade, start, pre,
      minpath, addl, pause, npre;
  double base_freq, length, freq_scatter, d1, d2, har_att, exp_min, exp_max,
      low, high;
  while (std::scanf("%d %d %d %lf %lf %lf %lf %lf %lf %lf %lf %d %d %d %d "
                    "%d %d %d %d %d %lf %lf %d",
                    &mode, &seed, &sr, &base_freq, &length, &freq_scatter,
                    &d1, &d2, &har_att, &exp_min, &exp_max, &itp_, &freq_itp,
                    &xfade_mode, &freq_xfade, &start, &pre, &minpath, &addl,
                    &pause, &low, &high, &npre) == 23) {
    mersenne<SEEDED::Yes>().seed(static_cast<unsigned>(seed));
    for (int i = 0; i < npre; ++i) {
      auto cpyf = mersenne<SEEDED::Yes>();
      cpyf.discard(static_cast<unsigned long long>(i));
      auto cpyi = cpyf;
      float const u = std::uniform_real_distribution<float>{0.f, 1.f}(cpyf);
      int const b = std::uniform_int_distribution<>{0, 1}(cpyi);
      std::printf("U %d %.17g %d\n", i, double(u), b);
    }
    using audioelement::SoundEngineMode;
    if (mode == 0)
      run_soundengine<SoundEngineMode::BIRDS>(
          sr, base_freq, length, freq_scatter, d1, d2, har_att, exp_min,
          exp_max, itp_, freq_itp, xfade_mode, freq_xfade, start, pre,
          minpath, addl, pause, low, high);
    else if (mode == 1)
      run_soundengine<SoundEngineMode::ROBOTS>(
          sr, base_freq, length, freq_scatter, d1, d2, har_att, exp_min,
          exp_max, itp_, freq_itp, xfade_mode, freq_xfade, start, pre,
          minpath, addl, pause, low, high);
    else
      run_soundengine<SoundEngineMode::SWEEP>(
          sr, base_freq, length, freq_scatter, d1, d2, har_att, exp_min,
          exp_max, itp_, freq_itp, xfade_mode, freq_xfade, start, pre,
          minpath, addl, pause, low, high);
    std::printf("E\n");
  }
}

// Drives the reference's FFT vocoder (rt.resynth.lib.vocoder.cpp
// FFTModulator + FFTCarrier, fed per sample exactly like Vocoder's
// registered compute feeds them, modulator first — vocoder.cpp:781-809).
// The FFT/window/xfade laws come from shim_vocoder.h (this repo's recovered
// assumptions, matched to analysis/vocoder.py); what this pins is the
// reference's OWN bookkeeping: good_stride, fill_freqs band edges, the
// band-sum boundary conditions, the modulator/carrier window-stride
// cadence, old/new swap timing, and the crossfade indexing in
// FFTCarrier::feed. stdin: sr wss stride_s count_bands min_freq max_freq n
// then n lines "mod car". Prints "G <stride>", "F <edges...>", then per
// sample "V <vocoded>" and, when the modulator bands change, "A <amps...>".
static void dump_vocoder() {
  int sr, count_bands, n;
  double wss, stride_s, min_freq, max_freq;
  if (std::scanf("%d %lf %lf %d %lf %lf %d", &sr, &wss, &stride_s,
                 &count_bands, &min_freq, &max_freq, &n) != 7)
    std::exit(2);
  SetupParams const sp{0.05f, static_cast<float>(wss),
                       static_cast<float>(stride_s), count_bands,
                       static_cast<float>(min_freq),
                       static_cast<float>(max_freq)};
  // NOTE (reference UB, worked around for determinism): (a) Vocoder::setup
  // calls init_dynamic_allocs BEFORE FFTModulator::setup (vocoder.cpp:
  // 849-855), so the PeriodicFFT window lambdas read the uninitialized
  // window_size_seconds at setLambdas time — the FIRST window's length is
  // indeterminate; the driver orders setup() first so the cadence is
  // well-defined from sample 0. (b) FFTCarrier::feed indexes signal_old
  // with sz_half_signal, which stays uninitialized until the first window
  // completes (vocoder.cpp:424,519,532) — the first 2S-1 feeds read
  // through garbage. Placement-new over zeroed storage makes those reads
  // deterministic zeros (matching what the streaming mirror emits).
  void* mem_m = std::calloc(1, sizeof(FFTModulator<double>));
  void* mem_c = std::calloc(1, sizeof(FFTCarrier<double>));
  auto* modulator_p = new (mem_m) FFTModulator<double>();
  auto* carrier_p = new (mem_c) FFTCarrier<double>(*modulator_p);
  auto& modulator = *modulator_p;
  auto& carrier = *carrier_p;
  modulator.setup(sp);
  carrier.setup(sp);
  modulator.init_dynamic_allocs(sr);
  carrier.init_dynamic_allocs(sr);
  std::printf("G %d\n", modulator.getStride(sr));
  {
    std::vector<double> freqs;
    freqs.reserve(static_cast<std::size_t>(count_bands) + 2);
    carrier.setup(sp);  // idempotent; fill freqs via modulator getter
    std::vector<double> f2;
    f2.reserve(static_cast<std::size_t>(count_bands) + 2);
    modulator.getBandsFreqs(f2);
    std::printf("F");
    for (double v : f2) std::printf(" %.17g", v);
    std::printf("\n");
  }
  std::vector<double> last_amps, amps;
  amps.reserve(static_cast<std::size_t>(count_bands) + 1);
  for (int i = 0; i < n; ++i) {
    double m, c;
    if (std::scanf("%lf %lf", &m, &c) != 2) std::exit(2);
    modulator.feed({m, SampleContinuity::Yes});
    double const v = carrier.feed({c, SampleContinuity::Yes});
    modulator.getBandsAmplitudes(amps);
    if (amps != last_amps) {
      last_amps = amps;
      std::printf("A %d", i);
      for (double a : amps) std::printf(" %.17g", a);
      std::printf("\n");
    }
    std::printf("V %.17g\n", v);
  }
}

// Drives the reference's SamplerAlgo (audioelement.h:3274-3383): pitched
// sample playback — lower_bound key selection over the increment->buffer
// map (first key >= increment; silence when none), negative progress =
// delayed start, interleaved multi-channel indexing, out-of-range silence.
// stdin: C n_keys, then per key "inc n v0..vn-1"; then ops:
//   i <inc>   setAngleIncrements
//   k <delay> onKeyPressed(delay)
//   s <n>     step n times, printing "V <imag...>" (C values) per step
template <int C>
static void run_sampler(std::map<double, std::vector<double>> const& samples) {
  audioelement::SamplerAlgo<double, C> alg;
  alg.setSamples(&samples);
  alg.forgetPastSignals();
  char op[4];
  while (std::scanf("%3s", op) == 1) {
    if (op[0] == 'i') {
      double inc;
      if (std::scanf("%lf", &inc) != 1) std::exit(2);
      alg.setAngleIncrements(inc);
    } else if (op[0] == 'k') {
      int delay;
      if (std::scanf("%d", &delay) != 1) std::exit(2);
      alg.onKeyPressed(delay);
    } else if (op[0] == 's') {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      for (int i = 0; i < n; ++i) {
        alg.step();
        std::printf("V");
        if constexpr (C == 1) {
          std::printf(" %.17g", alg.imag());
        } else {
          for (int c = 0; c < C; ++c) std::printf(" %.17g", alg.imag(c));
        }
        std::printf("\n");
      }
    } else {
      std::exit(2);
    }
  }
}

static void dump_sampler() {
  int C, n_keys;
  if (std::scanf("%d %d", &C, &n_keys) != 2) std::exit(2);
  std::map<double, std::vector<double>> samples;
  for (int k = 0; k < n_keys; ++k) {
    double inc;
    int n;
    if (std::scanf("%lf %d", &inc, &n) != 2) std::exit(2);
    auto& v = samples[inc];
    v.resize(static_cast<size_t>(n));
    for (auto& x : v)
      if (std::scanf("%lf", &x) != 1) std::exit(2);
  }
  if (C == 1)
    run_sampler<1>(samples);
  else
    run_sampler<2>(samples);
}

// White-noise table for soundBufferWrapperAlgo<Sound::NOISE> (declared in
// sound.h:239-240, generated by the absent sound.cpp from an UNSEEDED rng —
// content is test data; the driver supplies it)
namespace imajuscule::audio {
static std::vector<double> g_white_noise_values{0.0};
soundBuffer<double> const& getWhiteNoise(int) {
  static soundBuffer<double> b = [] {
    soundBuffer<double> x(g_white_noise_values.size(), 0.f);
    std::copy(g_white_noise_values.begin(), g_white_noise_values.end(),
              x.getBuffer().begin());
    return x;
  }();
  return b;
}
float getWhiteNoiseAbsMean(int) {
  double s = 0.0;
  for (double v : g_white_noise_values) s += std::abs(v);
  return static_cast<float>(s / g_white_noise_values.size());
}
}  // namespace imajuscule::audio

// Drives the reference's vocoder-carrier osc-mix element: the EXACT
// composition of rt.resynth.lib.cpp:21-52 — VolumeAdjusted<Enveloped<
// FreqCtrl_<UnityGainMix<6 x VolumeAdjusted oscillators>, InterpolatedFreq>,
// AHDSR(atomic)>, BaseVolumeDef::One> — initialized the way
// VocoderCarrierElementInitializer does (:137-196) and played the way the
// sine::Synth NoteOn path plays it. stdin:
//   sr A aItp H D dItp R rItp sustain
//   vols <noise> <saw> <tri> <square> <sine> <pulse> <width>
//   table <n> <vals...>
//   on <freq> <vel> <angle> | chg <freq> | off | step <n>  (prints V)
static void dump_carrier() {
  using namespace audioelement;
  // the reference's alias, rt.resynth.lib.cpp:21-52 (type instantiation)
  using CarrierElem = VolumeAdjusted<
      Enveloped<
          FreqCtrl_<
              UnityGainMix<
                  VolumeAdjusted<soundBufferWrapperAlgo<Sound::NOISE>>,
                  VolumeAdjusted<FOscillatorAlgo<
                      double, FOscillator::SAW,
                      OscillatorUsage::FilteredByLoudnessAdaptedSound>>,
                  VolumeAdjusted<FOscillatorAlgo<
                      double, FOscillator::TRIANGLE,
                      OscillatorUsage::FilteredByLoudnessAdaptedSound>>,
                  VolumeAdjusted<FOscillatorAlgo<
                      double, FOscillator::SQUARE,
                      OscillatorUsage::FilteredByLoudnessAdaptedSound>>,
                  VolumeAdjusted<SineOscillatorAlgo<double>>,
                  VolumeAdjusted<PulseTrainAlgo<double>>>,
              InterpolatedFreq<double>>,
          AHDSREnvelope<Atomicity::Yes, double,
                        EnvelopeRelease::WaitForKeyRelease,
                        AllowZeroAttack::No>>,
      BaseVolumeDef::One>;

  int sr, A, aItp, H, D, dItp, R, rItp;
  double sustain;
  if (std::scanf("%d %d %d %d %d %d %d %d %lf", &sr, &A, &aItp, &H, &D,
                 &dItp, &R, &rItp, &sustain) != 9)
    std::exit(2);
  AHDSR const env_params{A,
                         static_cast<itp::interpolation>(aItp),
                         H,
                         D,
                         static_cast<itp::interpolation>(dItp),
                         R,
                         static_cast<itp::interpolation>(rItp),
                         static_cast<float>(sustain)};
  auto elem = std::make_unique<CarrierElem>();
  auto& e = *elem;
  char op[8];
  while (std::scanf("%7s", op) == 1) {
    if (!std::strcmp(op, "vols")) {
      double nv, sv, tv, qv, siv, pv, pw;
      if (std::scanf("%lf %lf %lf %lf %lf %lf %lf", &nv, &sv, &tv, &qv, &siv,
                     &pv, &pw) != 7)
        std::exit(2);
      // VocoderCarrierElementInitializer::operator() (:155-176)
      e.editEnvelope().setAHDSR(env_params, sr);
      e.getVolumeAdjustment().getOsc().getAlgo().getCtrl().setup(
          100, itp::LINEAR);
      auto& oscs = e.getVolumeAdjustment().getOsc().getAlgo().getOsc().get();
      std::get<0>(oscs).setVolumeTarget(static_cast<double>(nv));
      std::get<1>(oscs).setVolumeTarget(static_cast<double>(sv));
      std::get<2>(oscs).setVolumeTarget(static_cast<double>(tv));
      std::get<3>(oscs).setVolumeTarget(static_cast<double>(qv));
      std::get<4>(oscs).setVolumeTarget(static_cast<double>(siv));
      std::get<5>(oscs).setVolumeTarget(static_cast<double>(pv));
      std::get<5>(oscs).getOsc().getAlgo().setPulseWidth(pw);
    } else if (!std::strcmp(op, "table")) {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      g_white_noise_values.resize(static_cast<std::size_t>(n));
      for (auto& v : g_white_noise_values)
        if (std::scanf("%lf", &v) != 1) std::exit(2);
    } else if (!std::strcmp(op, "on")) {
      double freq, vel, angle;
      if (std::scanf("%lf %lf %lf", &freq, &vel, &angle) != 3) std::exit(2);
      // the NoteOn path (gen.crtp.h:421-529 + sine::SynthImpl::
      // setupAudioElement)
      e.forgetPastSignals();
      e.set_sample_rate(sr);
      e.getVolumeAdjustment().setVolumeTarget(1.0 * vel);  // BaseVolume One
      e.setLoudnessParams(sr, 5, 0.8f, 30.f);
      e.setAngleIncrements(freq_to_angle_increment(freq, sr));
      e.setStartAngle(angle);
      e.editEnvelope().tryAcquire();
      e.onKeyPressed(0);
    } else if (!std::strcmp(op, "chg")) {
      double freq;
      if (std::scanf("%lf", &freq) != 1) std::exit(2);
      e.setAngleIncrements(freq_to_angle_increment(freq, sr));
    } else if (!std::strcmp(op, "off")) {
      e.onKeyReleased(0);
    } else if (!std::strcmp(op, "step")) {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      for (int i = 0; i < n; ++i) {
        e.step();
        std::printf("V %.17g\n", e.imag());
      }
    } else {
      std::exit(2);
    }
  }
}

// Drives the reference's Channel request queue (channel.h:88-900): the
// equal-gain request crossfades (write_left_xfade/write_right_xfade +
// handleToZero/onBeginToZero, :410-690,766-785), per-channel volume ramps
// (stepVolume), xfade_now and stopPlayingByXFadeToZero, through the real
// step() block loop. stdin ops:
//   set_xfade <odd_n>                       (UseXfade only, before playing)
//   setvol <v> | tovol <v> <nsteps>
//   req <duration> <volL> <volR> <n> <vals...>   -> prints "ADD 0|1"
//   xfadenow | stop <nsteps>
//   step <n>   (runs in <=16-frame callback chunks) -> prints "F l r" rows
template <imajuscule::audio::XfadePolicy XF>
static void run_channel() {
  using namespace imajuscule;
  using namespace imajuscule::audio;
  Channel<Atomicity::No, 2, XF, MaxQueueSize::Infinite> ch;
  std::deque<std::unique_ptr<soundBuffer<double>>> bufs;
  char op[16];
  while (std::scanf("%15s", op) == 1) {
    if (!std::strcmp(op, "set_xfade")) {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      ch.set_xfade(n);
    } else if (!std::strcmp(op, "setvol")) {
      double v;
      if (std::scanf("%lf", &v) != 1) std::exit(2);
      ch.setVolume(v);
    } else if (!std::strcmp(op, "tovol")) {
      double v;
      int n;
      if (std::scanf("%lf %d", &v, &n) != 2) std::exit(2);
      ch.toVolume(v, n);
    } else if (!std::strcmp(op, "req")) {
      int dur, n;
      double vl, vr;
      if (std::scanf("%d %lf %lf %d", &dur, &vl, &vr, &n) != 4) std::exit(2);
      bufs.emplace_back(std::make_unique<soundBuffer<double>>(
          static_cast<std::size_t>(n), 0.f));
      for (int i = 0; i < n; ++i)
        if (std::scanf("%lf", &bufs.back()->getBuffer()[i]) != 1)
          std::exit(2);
      Request<Atomicity::No, 2> r(bufs.back().get(),
                                  Volumes<2>(std::array<double, 2>{vl, vr}),
                                  dur);
      std::printf("ADD %d\n", ch.addRequest(std::move(r)) ? 1 : 0);
    } else if (!std::strcmp(op, "xfadenow")) {
      ch.xfade_now();
    } else if (!std::strcmp(op, "stop")) {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      ch.stopPlayingByXFadeToZero(n);
    } else if (!std::strcmp(op, "step")) {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      while (n > 0) {
        int const c = n < 16 ? n : 16;
        double out[32] = {0.0};
        ch.step(out, c, 0);
        for (int i = 0; i < c; ++i)
          std::printf("F %.17g %.17g\n", out[2 * i], out[2 * i + 1]);
        n -= c;
      }
    } else {
      std::exit(2);
    }
  }
}

// Drives the reference's full score-playback path: parseMusic
// (source/parse.music.cpp) -> to_request (include/note.h:10-40: cached SINE
// soundBuffer via Sounds/soundId with the truncated period law
// sound.functions.h:45-50, f32 ms_to_frames durations, loud = 2x volume,
// inaudible-frequency silencing request.h:281-299) -> the real Channel
// UseXfade step loop. stdin: "<sr> <time_unit_ms> <vol> <xfade> <nsteps>\n
// <score line>". Prints per-request "DUR n", "ADD 0|1", then "F l r" frames.
static void run_score() {
  using namespace imajuscule;
  using namespace imajuscule::audio;
  int sr, xfade, nsteps;
  double time_unit, vol;
  if (std::scanf("%d %lf %lf %d %d ", &sr, &time_unit, &vol, &xfade,
                 &nsteps) != 5)
    std::exit(2);
  char line[4096];
  if (!std::fgets(line, sizeof line, stdin)) std::exit(2);
  if (auto* nl = std::strchr(line, '\n')) *nl = '\0';
  auto const specs = parseMusic(line);
  static Sounds<Atomicity::No> sounds;
  Midi const midi;
  Channel<Atomicity::No, 2, XfadePolicy::UseXfade, MaxQueueSize::Infinite> ch;
  ch.set_xfade(xfade);
  ch.setVolume(1.);
  for (auto const& s : specs) {
    auto r = to_request<2, Atomicity::No>(
        sr, s, static_cast<float>(time_unit), 1.f, midi, sounds,
        Volumes<2>(std::array<double, 2>{vol, vol}));
    std::printf("DUR %d\n", r.duration_in_frames);
    std::printf("ADD %d\n", ch.addRequest(std::move(r)) ? 1 : 0);
  }
  while (nsteps > 0) {
    int const c = nsteps < 16 ? nsteps : 16;
    double out[32] = {0.0};
    ch.step(out, c, 0);
    for (int i = 0; i < c; ++i)
      std::printf("F %.17g %.17g\n", out[2 * i], out[2 * i + 1]);
    nsteps -= c;
  }
}

// Drives the reference's ImplCRTP polyphony core (gen.crtp.h:195-629) as a
// compiled synth: NoteOn channel acquisition over the 2*nVoices pool (CAS
// tryAcquire of envelope Done2, :398-413), drop policy (:412), NoteOff
// matching by NoteId with FIFO channel scan (:543-592), NoteChange retune
// (:595-618), phase-sync policy, the pitch-wheel multiplier (:320-332), and
// the per-sample compute loop (:350-378). Element: VolumeAdjusted<
// Enveloped<SineOscillatorAlgo, AHDSR>> — every ingredient individually
// oracled already; the filter law inside VolumeAdjusted comes from the
// shim (the repo's recovered alpha, see shim_audioelement.h).
//
// stdin: first line "sr nVoices A aItp H D dItp R rItp sustain", then ops:
//   on <id> <freq> <vel>   -> prints "R 1|0" (accepted | dropped)
//   off <id>
//   chg <id> <freq> <vel>
//   mult <m>               (onAngleIncrementMultiplier)
//   step <n>               -> drains pending oneshots, computes n frames,
//                             prints "V <left-sample>" per frame then
//                             "S <n_rt_active>"
namespace synth_oracle {
struct FakeLock {};
struct FakeOut {
  struct LockFromNRT {
    explicit LockFromNRT(FakeLock) {}
  };
  FakeLock get_lock() { return {}; }
};
struct FakeChans {
  using F = std::function<void(FakeOut&, TimeNanos)>;
  std::vector<F> q;
  template <typename Fn>
  void enqueueOneShot(Fn&& f) {
    q.emplace_back(std::forward<Fn>(f));
  }
  void drain(FakeOut& o, TimeNanos t) {
    std::vector<F> cur;
    cur.swap(q);
    for (auto& f : cur) f(o, t);
  }
};
struct OracleSynthBase {
  static constexpr float get_xfade_length() { return 0.009f; }
  static constexpr float get_gain() { return 1.f; }
  template <typename Element>
  bool setupAudioElement(float freq, Element& e, int sample_rate) {
    e.setAngleIncrements(
        freq_to_angle_increment(static_cast<double>(freq), sample_rate));
    return true;
  }
};
}  // namespace synth_oracle

template <TryAccountForTimeSourceJitter Jitter>
static void run_synthpool() {
  using namespace audioelement;
  using namespace synth_oracle;
  using Env = AHDSREnvelope<Atomicity::Yes, double,
                            EnvelopeRelease::WaitForKeyRelease,
                            AllowZeroAttack::No>;
  using Elem = VolumeAdjusted<Enveloped<SineOscillatorAlgo<double>, Env>>;
  constexpr int kVoices = 4;
  using Synth =
      ImplCRTP<2, Elem, Jitter, SynchronizePhase::Yes,
               DefaultStartPhase::Zero, HandleNoteOff::Yes, OracleSynthBase,
               kVoices>;

  int sr, n_voices_req, A, aItp, H, D, dItp, R, rItp;
  double sustain;
  if (std::scanf("%d %d %d %d %d %d %d %d %d %lf", &sr, &n_voices_req, &A,
                 &aItp, &H, &D, &dItp, &R, &rItp, &sustain) != 10)
    std::exit(2);
  if (n_voices_req != kVoices) {
    std::fprintf(stderr, "driver is compiled for nVoices=%d\n", kVoices);
    std::exit(2);
  }
  AHDSR const env_params{A,
                         static_cast<itp::interpolation>(aItp),
                         H,
                         D,
                         static_cast<itp::interpolation>(dItp),
                         R,
                         static_cast<itp::interpolation>(rItp),
                         static_cast<float>(sustain)};
  auto synth = std::make_unique<Synth>();
  synth->forEachElem([&](auto& c) {
    c.elem.editEnvelope().setAHDSR(env_params, sr);
  });
  FakeOut out;
  FakeChans chans;
  long t = 0;  // current engine sample
  std::vector<double> buf;
  char op[6];
  while (std::scanf("%5s", op) == 1) {
    if (!std::strcmp(op, "on")) {
      long id;
      double freq, vel;
      if (std::scanf("%ld %lf %lf", &id, &freq, &vel) != 3) std::exit(2);
      auto const r = synth->onEvent(
          sr, mkNoteOn(NoteId{id}, static_cast<float>(freq),
                       static_cast<float>(vel)),
          out, chans, {});
      std::printf("R %d\n", r == onEventResult::OK ? 1 : 0);
    } else if (!std::strcmp(op, "ont")) {
      // timestamped NoteOn: the jitter-compensated path
      // (gen.crtp.h:477-527); midi time in nanos, source key 7
      long id;
      double freq, vel;
      unsigned long long tn;
      if (std::scanf("%ld %lf %lf %llu", &id, &freq, &vel, &tn) != 4)
        std::exit(2);
      auto const r = synth->onEvent(
          sr, mkNoteOn(NoteId{id}, static_cast<float>(freq),
                       static_cast<float>(vel)),
          out, chans, TimestampAndSource{TimeNanos{tn}, 7});
      std::printf("R %d\n", r == onEventResult::OK ? 1 : 0);
    } else if (!std::strcmp(op, "offt")) {
      long id;
      unsigned long long tn;
      if (std::scanf("%ld %llu", &id, &tn) != 2) std::exit(2);
      synth->onEvent(sr, mkNoteOff(NoteId{id}), out, chans,
                     TimestampAndSource{TimeNanos{tn}, 7});
    } else if (!std::strcmp(op, "off")) {
      long id;
      if (std::scanf("%ld", &id) != 1) std::exit(2);
      synth->onEvent(sr, mkNoteOff(NoteId{id}), out, chans, {});
    } else if (!std::strcmp(op, "chg")) {
      long id;
      double freq, vel;
      if (std::scanf("%ld %lf %lf", &id, &freq, &vel) != 3) std::exit(2);
      synth->onEvent(sr,
                     mkNoteChange(NoteId{id}, static_cast<float>(vel),
                                  static_cast<float>(freq)),
                     out, chans, {});
    } else if (!std::strcmp(op, "mult")) {
      double m;
      if (std::scanf("%lf", &m) != 1) std::exit(2);
      synth->onAngleIncrementMultiplier(chans, static_cast<float>(m));
    } else if (!std::strcmp(op, "step")) {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      chans.drain(out, TimeNanos{static_cast<uint64_t>(
                           t * (1000000000ll / sr))});
      buf.assign(static_cast<std::size_t>(2 * n), 0.0);
      synth->compute(buf.data(), n);
      for (int i = 0; i < n; ++i)
        std::printf("V %.17g\n", buf[static_cast<std::size_t>(2 * i)]);
      int active = 0;
      synth->forEachRTActiveElem([&active](auto&) { ++active; });
      std::printf("S %d\n", active);
      t += n;
    } else {
      std::exit(2);
    }
  }
}

// Drives the reference's MIDI decode (rt.resynth.lib.midi.cpp:121-154) and
// the PitchWheel value law (:90-102) over raw messages, plus
// NoteIdsGenerator (events.h:228-280). stdin: lines
//   m <status> <d1> <d2>   decode Pm_Message(status, d1, d2)
//   on <key> | off <key> | chg <key>   NoteIdsGenerator ops
static void dump_mididecode() {
  using namespace imajuscule::audio::rtresynth::midi;
  NoteIdsGenerator gen{64};
  char op[4];
  while (std::scanf("%3s", op) == 1) {
    if (op[0] == 'm') {
      int st, d1, d2;
      if (std::scanf("%d %d %d", &st, &d1, &d2) != 3) std::exit(2);
      auto const e = decode(Pm_Message(st, d1, d2));
      if (!e) {
        std::printf("U\n");
      } else if (auto* n = std::get_if<NoteOn>(&*e)) {
        std::printf("ON %d %d %d\n", n->channel, n->key, n->velocity);
      } else if (auto* n2 = std::get_if<NoteOff>(&*e)) {
        std::printf("OFF %d %d %d\n", n2->channel, n2->key, n2->velocity);
      } else if (auto* k = std::get_if<KeyPressure>(&*e)) {
        std::printf("KP %d %d %d\n", k->channel, k->key, k->pressure);
      } else if (auto* c = std::get_if<ControlChange>(&*e)) {
        std::printf("CC %d %d %d\n", c->channel, c->controller_number,
                    c->controller_value);
      } else if (auto* p = std::get_if<ProgramChange>(&*e)) {
        std::printf("PC %d %d\n", p->channel, p->preset);
      } else if (auto* cp = std::get_if<ChannelPressure>(&*e)) {
        std::printf("CP %d %d\n", cp->channel, cp->pressure);
      } else if (auto* w = std::get_if<PitchWheel>(&*e)) {
        std::printf("PW %d %d %.17g\n", w->channel, w->pitchweel,
                    static_cast<double>(w->getCenteredValue()));
      } else {
        std::printf("ANO\n");
      }
    } else if (op[0] == 'o' && op[1] == 'n') {
      long k;
      if (std::scanf("%ld", &k) != 1) std::exit(2);
      std::printf("I %lld\n", static_cast<long long>(
                                  gen.NoteOnId(static_cast<uint64_t>(k)).noteid));
    } else if (op[0] == 'o') {
      long k;
      if (std::scanf("%ld", &k) != 1) std::exit(2);
      std::printf("I %lld\n",
                  static_cast<long long>(
                      gen.NoteOffId(static_cast<uint64_t>(k)).noteid));
    } else if (op[0] == 'c') {
      long k;
      if (std::scanf("%ld", &k) != 1) std::exit(2);
      std::printf("I %lld\n",
                  static_cast<long long>(
                      gen.NoteChangeId(static_cast<uint64_t>(k)).noteid));
    } else {
      std::exit(2);
    }
  }
}

// Constant-power pan (include/stereo.h), pitch generators
// (include/pitch_generators.h) and smoothed params (include/smoothparam.h)
static void dump_small_helpers() {
  for (double pan = -1.4; pan <= 1.4; pan += 0.09) {
    auto g = stereo(pan);
    std::printf("pan %.17g %.17g %.17g\n", pan, g.left(), g.right());
  }
  {
    MidiPitch seq[] = {MidiPitch{60.}, MidiPitch{64.}, MidiPitch{67.}};
    MultiOctave mo{seq, seq + 3, 2};
    for (int i = 0; i < 40; ++i)
      std::printf("multioctave %d %.17g\n", i, mo().get());
    // (1-element sequences hit an out-of-bounds read in the reference's
    // re-ascend path, pitch_generators.h:92-97 — UB, not oracled)
    MultiOctave mo0{seq, seq + 3, 0};
    for (int i = 0; i < 5; ++i)
      std::printf("multioctave0 %d %.17g\n", i, mo0().get());
  }
  {
    MidiPitch seq[] = {MidiPitch{60.}, MidiPitch{62.}, MidiPitch{64.},
                       MidiPitch{65.}, MidiPitch{67.}};
    MultiOctave mo{seq, seq + 5, 1};
    ShufflePattern<MultiOctave> sp{mo, {0, 2, 1, 2}};
    for (int i = 0; i < 30; ++i)
      std::printf("shuffle %d %.17g\n", i, sp().get());
  }
  {
    PitchDrifter pd{0.013};
    for (int i = 0; i < 50; ++i)
      std::printf("drift %d %.17g\n", i, pd(MidiPitch{69.}).get());
  }
  {
    static const float inc = 0.25f;
    SmoothedFloat<&inc> s;
    const float targets[] = {1.f, 1.f, -0.4f, -0.4f, -0.4f, 0.33f};
    int i = 0;
    for (float t : targets) {
      s.setTarget(t);
      for (int k = 0; k < 3; ++k)
        std::printf("smoothed %d %.17g\n", i++, double(s.step()));
    }
  }
}

// Drives the reference's MetaQueue + ReadQueuedSampleSource
// (rt.resynth.lib.metaqueue.cpp:10-158) over a driver-side bounded variant
// queue (the atomic_queue stand-in: single-threaded here, so a deque with
// try_push/try_pop/was_size/capacity reproduces the SPSC interface).
// stdin: capacity, then ops: "p n v0..vn-1" push a buffer, "r n" read n
// samples. Prints "P <ok> <total_dropped>", "R <val> <cont01>" / "R none",
// "Q <size>" after each op.
namespace mq_oracle {
struct VarQueue {
  using value_type = std::variant<CountDroppedFrames, InputSample>;
  explicit VarQueue(unsigned cap) : cap_(cap) {}
  bool try_push(value_type v) {
    if (q_.size() >= cap_) return false;
    q_.push_back(v);
    return true;
  }
  bool try_pop(value_type& v) {
    if (q_.empty()) return false;
    v = q_.front();
    q_.pop_front();
    return true;
  }
  unsigned was_size() const { return static_cast<unsigned>(q_.size()); }
  unsigned capacity() const { return cap_; }
  std::deque<value_type> q_;
  unsigned cap_;
};
}  // namespace mq_oracle

static void dump_metaqueue() {
  int cap;
  if (std::scanf("%d", &cap) != 1) std::exit(2);
  MetaQueue<mq_oracle::VarQueue> mq{static_cast<unsigned>(cap)};
  ReadQueuedSampleSource<mq_oracle::VarQueue> src;
  src.set(mq.queue);
  char op[4];
  int n;
  while (std::scanf("%3s %d", op, &n) == 2) {
    if (op[0] == 'p') {
      std::vector<float> buf(static_cast<size_t>(n));
      for (auto& v : buf) {
        double d;
        if (std::scanf("%lf", &d) != 1) std::exit(2);
        v = static_cast<float>(d);
      }
      bool ok = mq.try_push_buffer(buf.data(), n);
      std::printf("P %d %d\n", ok ? 1 : 0, mq.countDroppedInputFrames());
    } else if (op[0] == 'r') {
      for (int i = 0; i < n; ++i) {
        try {
          auto res = src();
          if (res)
            std::printf("R %.17g %d\n", res->first,
                        res->second == SampleContinuity::Yes ? 1 : 0);
          else
            std::printf("R none\n");
        } catch (std::runtime_error const&) {
          std::printf("R throw\n");  // post-start underrun
        }
      }
    } else {
      std::exit(2);
    }
    std::printf("Q %u\n", mq.queue.was_size());
  }
}

// Score language: each stdin line is a score; prints one line per parsed
// NoteSpec: "N <note|-1> <loud> <duration>", then "S" after each score.
static void dump_score() {
  std::string line;
  while (std::getline(std::cin, line)) {
    auto specs = parseMusic(line);
    for (auto const& s : specs)
      std::printf("N %d %d %u\n",
                  s.note ? static_cast<int>(to_underlying(*s.note)) : -1,
                  s.loud ? 1 : 0, static_cast<unsigned>(s.duration));
    std::printf("S\n");
  }
}

// Drives the reference's PeriodicFFT sliding-window machinery
// (rt.resynth.lib.periodicfft.cpp:14-181) with a trivial "copy the window"
// op, pinning the feed/overlap/negative-overlap/drop-resync bookkeeping.
// argv: periodicfft <window> <stride>; stdin commands:
//   f <n>  feed n samples of a global ramp (value = counter++)
//   d <n>  on_dropped_frames(n), ramp counter += n (frames lost at source)
//   r      on_dropped_frames(nullopt) (unknown drop count -> reset)
// prints "W <v0> <v1> ..." per completed window.
struct CopyWindowOp {
  using FPT = float;
  using Result = std::vector<float>;
  explicit CopyWindowOp(int reserve) { res.reserve(reserve); }
  bool init_data(int window_size) {
    bool changed = window_size != size_;
    size_ = window_size;
    return changed;
  }
  template <typename It>
  void operator()(It b, It e) {
    res.assign(b, e);
  }
  Result const& get_results() const { return res; }
  int size_ = -1;
  Result res;
};

static void dump_periodicfft(int window, int stride) {
  PeriodicFFT<CopyWindowOp> pfft{1 << 16};
  pfft.setLambdas([window]() { return window; }, [stride]() { return stride; },
                  [](int, CopyWindowOp::Result const& r) {
                    std::printf("W");
                    for (float v : r) std::printf(" %.17g", double(v));
                    std::printf("\n");
                  });
  long counter = 0;
  char cmd[8];
  while (std::scanf("%7s", cmd) == 1) {
    if (cmd[0] == 'f') {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      for (int i = 0; i < n; ++i)
        pfft.feed(static_cast<float>(counter++));
    } else if (cmd[0] == 'd') {
      int n;
      if (std::scanf("%d", &n) != 1) std::exit(2);
      counter += n;
      pfft.on_dropped_frames(n);
    } else if (cmd[0] == 'r') {
      pfft.on_dropped_frames(std::nullopt);
    } else {
      std::exit(2);
    }
  }
}

// Drives the reference's ENTIRE per-frame pitch pipeline
// (rt.resynth.lib.algo.cpp stage functions, called in the exact order of
// RtResynth::step, rt.resynth.lib.cpp:1670-1759) plus the synthesize_sounds
// event policy skeleton (:265-382, minus the synth itself). All stage logic
// below is the reference's compiled code; this function is only I/O glue.
//
// stdin: one config line then frames:
//   nearby pmethod vmethod min_volume shift_pre harm_pre at_on at_mode
//     at_root_note at_transpose at_max_pitch at_tol shift_post harm_post
//     max_track max_voices
//   frame <n>
//   <freq> <mag_db>   (xn, strictly increasing freq)
static void dump_pitchpipe() {
  double nearby, min_volume;
  int pmethod, vmethod, at_on, at_mode, at_root_note, at_transpose;
  double shift_pre, harm_pre, at_max_pitch, at_tol, shift_post, harm_post;
  double max_track;
  int max_voices;
  if (std::scanf("%lf %d %d %lf %lf %lf %d %d %d %d %lf %lf %lf %lf %lf %d",
                 &nearby, &pmethod, &vmethod, &min_volume, &shift_pre,
                 &harm_pre, &at_on, &at_mode, &at_root_note, &at_transpose,
                 &at_max_pitch, &at_tol, &shift_post, &harm_post, &max_track,
                 &max_voices) != 16) {
    std::fprintf(stderr, "bad config line\n");
    std::exit(2);
  }

  // the autotune function, built the way RtResynth::mkAutotuneFunction
  // builds its MusicalScale / identity variants (rt.resynth.lib.cpp:
  // 1763-1764,1864-1873)
  std::function<std::optional<MidiPitch>(MidiPitch)> autotune;
  if (!at_on) {
    autotune = [](MidiPitch v) -> std::optional<MidiPitch> { return {v}; };
  } else {
    auto const* scale =
        &getMusicalScale(static_cast<MusicalScaleMode>(at_mode));
    MidiPitch const root_pitch =
        A_pitch + at_transpose +
        half_tones_distance(Note::La, static_cast<Note>(at_root_note));
    autotune = [scale, root_pitch](MidiPitch p) -> std::optional<MidiPitch> {
      return scale->closest_pitch(root_pitch, p);
    };
  }

  Midi midi;
  std::vector<FreqMag<double>> fs;
  std::vector<PitchVolume> freqmags_data, reduced_pitches, autotuned_pitches,
      pitches_tmp;
  std::vector<PitchInterval> pitch_intervals;
  std::vector<std::optional<int>> pitch_changes;
  std::vector<bool> continue_playing;
  std::vector<float> loudnesses;
  std::vector<int> order;
  std::vector<PlayedNote> played_pitches;
  int64_t next_noteid = 0;
  int64_t frame_idx = 0;

  char word[16];
  int n;
  while (std::scanf("%15s %d", word, &n) == 2) {
    ++frame_idx;
    fs.clear();
    for (int i = 0; i < n; ++i) {
      double f, db;
      if (std::scanf("%lf %lf", &f, &db) != 2) std::exit(2);
      fs.push_back({f, db});
    }

    frequencies_to_pitches(midi, fs, freqmags_data);
    aggregate_pitches(nearby, freqmags_data, pitch_intervals);
    reduce_pitches(static_cast<PitchReductionMethod>(pmethod),
                   static_cast<VolumeReductionMethod>(vmethod), min_volume,
                   pitch_intervals, reduced_pitches);
    shift_pitches(static_cast<float>(shift_pre), reduced_pitches);
    harmonize_pitches(static_cast<float>(harm_pre), pitches_tmp,
                      reduced_pitches);
    autotune_pitches(MidiPitch{at_max_pitch}, static_cast<float>(at_tol),
                     autotune, reduced_pitches, autotuned_pitches);
    shift_pitches(static_cast<float>(shift_post), autotuned_pitches);
    harmonize_pitches(static_cast<float>(harm_post), pitches_tmp,
                      autotuned_pitches);
    track_pitches(max_track, autotuned_pitches, played_pitches, pitch_changes,
                  continue_playing);
    int constexpr loudness_idx = loudness::phons_to_index(60.f);
    order_pitches_by_perceived_loudness(
        [loudness_idx](PitchVolume const& pv) {
          return pv.volume / loudness::equal_loudness_volume_db(
                                 loudness::pitches, pv.midipitch,
                                 loudness_idx);
        },
        autotuned_pitches, loudnesses, order);

    for (auto const& pv : autotuned_pitches)
      std::printf("T %.17g %.17g\n", pv.midipitch.get(), pv.volume);
    for (std::size_t i = 0; i < pitch_changes.size(); ++i)
      std::printf("C %zu %d\n", i,
                  pitch_changes[i] ? *pitch_changes[i] : -1);
    for (std::size_t j = 0; j < continue_playing.size(); ++j)
      std::printf("K %zu %d\n", j, continue_playing[j] ? 1 : 0);
    for (int i : order) std::printf("O %d\n", i);

    // synthesize_sounds event policy (rt.resynth.lib.cpp:294-382): offs for
    // !continue_playing, then changes/ons loudest-first; note-on skipped at
    // volume<=0, dropped past the voice cap
    int active = 0;
    for (bool k : continue_playing) active += k ? 1 : 0;
    for (std::size_t j = 0; j < continue_playing.size(); ++j)
      if (!continue_playing[j])
        std::printf("E off %lld\n",
                    static_cast<long long>(played_pitches[j].noteid.noteid));
    for (int idx : order) {
      MidiPitch const new_pitch = autotuned_pitches[idx].midipitch;
      float const new_freq =
          static_cast<float>(midi.midi_pitch_to_freq(new_pitch));
      float const volume = static_cast<float>(autotuned_pitches[idx].volume);
      if (pitch_changes[idx]) {
        PlayedNote& played = played_pitches[*pitch_changes[idx]];
        played.cur_freq = new_freq;
        played.midi_pitch = new_pitch;
        played.cur_velocity = volume;
        std::printf("E change %lld %.17g %.17g\n",
                    static_cast<long long>(played.noteid.noteid),
                    static_cast<double>(new_freq),
                    static_cast<double>(volume));
      } else {
        if (volume <= 0) continue;
        if (active >= max_voices) {
          std::printf("E dropped\n");
          continue;
        }
        ++active;
        ++next_noteid;
        played_pitches.push_back(PlayedNote{frame_idx, NoteId{next_noteid},
                                            new_pitch, new_freq, volume});
        std::printf("E on %lld %.17g %.17g\n",
                    static_cast<long long>(next_noteid),
                    static_cast<double>(new_freq),
                    static_cast<double>(volume));
      }
    }
    remove_dead_notes(continue_playing, played_pitches);
    sort_by_current_pitch(played_pitches);
    for (auto const& pn : played_pitches)
      std::printf("P %lld %.17g %.17g %.17g %lld\n",
                  static_cast<long long>(pn.noteid.noteid),
                  pn.midi_pitch.get(), static_cast<double>(pn.cur_freq),
                  static_cast<double>(pn.cur_velocity),
                  static_cast<long long>(pn.note_on_frame_id));
    std::printf("F %lld\n", static_cast<long long>(frame_idx));
  }
}

// Drives the reference's voice param/program system (gen.voice.h): the 27
// factory programs (getPrograms(), gen.voice.h:700-810, name-sorted by
// ProgramsI, program.h), the Limits<> f32 normalize/denormalize roundtrip,
// and setupAudioElement's param->SoundEngine wiring (gen.voice.h:882-1037)
// — run against a PROBE element that records every engine setter call with
// the exact (converted) argument values the reference computes, so the
// repo's transcribed preset tables + effective-config derivation
// (models/voice_presets.py) are pinned against the reference's own code,
// including its int truncations (set_freq_xfade, articulative pause,
// SetSlowParams' int parameters) vs roundings (setEnvelopeCharacTime).
namespace voice_probe {

using imajuscule::StereoGain;
using imajuscule::range;
namespace ae = imajuscule::audio::audioelement;

static void W1(char const* k, double v) {
  std::printf("W %s %.17g\n", k, v);
}
static void W2(char const* k, double a, double b) {
  std::printf("W %s %.17g %.17g\n", k, a, b);
}

// All probes print only when their tag is non-null; the engine ctor tags
// ramp 0 and ramp-spec 0 only (the reference applies identical config to
// all 3 ramps / all 30 specs — gen.voice.h:946-951, 968-979).
struct SlowIterProbe {
  char const* tag = nullptr;
  void set_n_slow_steps(int32_t n) {
    if (tag) std::printf("W %s_n_slow_steps %d\n", tag, n);
  }
};
struct WidthProbe {  // band width ctrl (Ctrl over noise iter)
  SlowIterProbe it;
  SlowIterProbe& getUnderlyingIter() { return it; }
};
struct CenterProbe {  // band center-frequency ctrl
  char const* tag = nullptr;
  SlowIterProbe it;
  SlowIterProbe& getUnderlyingIter() { return it; }
  void setAngleIncrementsRange(range<float> const& r) {
    if (tag)
      std::printf("W %s_range %.17g %.17g\n", tag, double(r.getMin()),
                  double(r.getMax()));
  }
};
struct BandOscProbe {  // the asym band algo inside the wind Mix
  char const* tag = nullptr;
  WidthProbe width;
  void setWidthRange(range<float> const& r) {
    if (tag)
      std::printf("W %s_width_range %.17g %.17g\n", tag, double(r.getMin()),
                  double(r.getMax()));
  }
  WidthProbe& getWidth() { return width; }
};
struct BandProbe {  // FreqCtrl_ tuple member: getOsc() + getCtrl()
  BandOscProbe osc;
  CenterProbe ctrl;
  BandOscProbe& getOsc() { return osc; }
  CenterProbe& getCtrl() { return ctrl; }
};
struct MixPad {};  // tuple slots 0 (LP) and 3 (sine): untouched by setup
struct MixProbe {
  std::tuple<MixPad, BandProbe, BandProbe, MixPad> t;
  auto& get() { return t; }
};
struct RampOscProbe {
  MixProbe mix;
  MixProbe& getOsc() { return mix; }
};
struct RampVAProbe {
  RampOscProbe o;
  RampOscProbe& getOsc() { return o; }
};
struct RampProbe {
  bool record = false;  // only ramp 0 prints (all 3 get identical calls)
  RampVAProbe va;
  RampVAProbe& getVolumeAdjustment() { return va; }
  void setStereoGain(StereoGain g) {
    if (record) W2("stereo_gain", g.left(), g.right());
  }
};
struct SpecCtrlProbe {  // wind ramp-spec freq control (ShortTermNoiseAdder)
  bool record = false;
  SlowIterProbe it;
  SlowIterProbe& getUnderlyingIter() { return it; }
  void set_short_term_noise_rate(float f) {
    if (record) W1("spec_short_rate", f);
  }
  void set_short_term_noise_amplitude(float f) {
    if (record) W1("spec_short_amp", f);
  }
  void setAngleIncrementsRange(range<float> const& r) {
    if (record) W2("spec_range", r.getMin(), r.getMax());
  }
};
struct FCtrlProbe {
  SpecCtrlProbe inner;
  SpecCtrlProbe& get() { return inner; }
};

struct ProbeEngine {
  using FPT = float;
  std::array<RampProbe, 3> ramps;
  struct Specs {
    std::array<FCtrlProbe, 30> a;  // RampSpecs capacity, soundengine.h:1035
  } specs;
  ProbeEngine() {
    ramps[0].record = true;
    auto& mix = ramps[0].va.o.mix;
    std::get<1>(mix.t).osc.tag = "bp";
    std::get<1>(mix.t).osc.width.it.tag = "bp_width";
    std::get<1>(mix.t).ctrl.tag = "bp_center";
    std::get<1>(mix.t).ctrl.it.tag = "bp_center";
    std::get<2>(mix.t).osc.tag = "br";
    std::get<2>(mix.t).osc.width.it.tag = "br_width";
    std::get<2>(mix.t).ctrl.tag = "br_center";
    std::get<2>(mix.t).ctrl.it.tag = "br_center";
    specs.a[0].inner.record = true;
    specs.a[0].inner.it.tag = "spec_long";
  }
  auto& getRamps() { return ramps; }
  auto& getRampsSpecs() { return specs; }
  void set_itp(itp::interpolation i) { W1("itp", double(int(i))); }
  void setEnvelopeCharacTime(int n) { W1("env_charac_time", n); }
  void set_length_exp(float lo, float hi) { W2("length_exp", lo, hi); }
  void set_freq_scatter(float f) { W1("freq_scatter", f); }
  void set_phase_ratio1(float f) { W1("phase_ratio1", f); }
  void set_phase_ratio2(float f) { W1("phase_ratio2", f); }
  void setAngleIncrements(float f) { W1("angle_increments", f); }
  void set_length(float f) { W1("length", f); }
  void setLoudnessParams(int sr, int low_index, float log_ratio,
                         float level) {
    std::printf("W loudness %d %d %.17g %.17g\n", sr, low_index,
                double(log_ratio), double(level));
  }
  void setFiltersOrder(int o) { W1("filters_order", o); }
  template <typename T>
  void setGains(T&& gains) {
    std::printf("W gains");
    for (float g : gains) std::printf(" %.17g", double(g));
    std::printf("\n");
  }
  bool initialize_sweep(float lo, float hi) {
    W2("init_sweep", lo, hi);
    return true;
  }
  void set_freq_xfade(int n) { W1("freq_xfade", n); }
  void set_freq_interpolation(itp::interpolation i) {
    W1("freq_itp", double(int(i)));
  }
  bool initialize_birds(int s, int p, int m, int a, ae::SoundEngineInitPolicy,
                        imajuscule::audio::FreqXfade x, int pause) {
    std::printf("W init_birds %d %d %d %d %d %d\n", s, p, m, a,
                int(static_cast<unsigned char>(x)), pause);
    return true;
  }
  bool initialize_wind(int s, int p, int m, int a,
                       ae::SoundEngineInitPolicy) {
    std::printf("W init_wind %d %d %d %d\n", s, p, m, a);
    return true;
  }
  void set_d1(float f) { W1("d1", f); }
  void set_d2(float f) { W1("d2", f); }
  void set_har_att(float f) { W1("har_att", f); }
  bool initialize_robot(int s, int p, int m, int a, ae::SoundEngineInitPolicy,
                        int pause) {
    std::printf("W init_robot %d %d %d %d %d\n", s, p, m, a, pause);
    return true;
  }
};

struct ProbeElement {
  static constexpr int count_channels = 2;
  ProbeEngine engine;
  ProbeEngine& getOsc() { return engine; }
};

struct DummyPD {};

template <imajuscule::audio::voice::Mode M>
struct VoiceDumper
    : public imajuscule::audio::voice::ImplBase<M, std::vector<float>,
                                                DummyPD> {
  template <typename E>
  bool setup(float freq, E& e, int sr) {
    return this->setupAudioElement(freq, e, sr);
  }
};

// Mirrors the thread_local auto-seed protocol in setupAudioElement
// (gen.voice.h:909-925): SEED param 0 -> seed increments per note. The
// counter is a thread_local INSIDE the ImplBase<MODE,...> member function,
// so each mode's instantiation counts from 1 independently.
static int g_expected_seed = 0;

template <imajuscule::audio::voice::Mode M>
static void dump_voice_mode(int mode_id, int sr, float freq) {
  g_expected_seed = 0;
  VoiceDumper<M> v;
  v.initializeSlow();
  int const n = v.countPrograms();
  std::printf("COUNT %d %d\n", mode_id, n);
  for (int i = 0; i < n; ++i) {
    auto const& prog = v.getProgram(i);
    std::printf("NAME %d %d %s\n", mode_id, i, prog.name.c_str());
    std::printf("NP %d\n", int(prog.params.size()));
    for (std::size_t j = 0; j < prog.params.size(); ++j)
      std::printf("PARAM %d %.17g\n", int(j), double(prog.params[j]));
    v.useProgram(i);
    int pan_seed;
    if (M == imajuscule::audio::voice::Mode::SWEEP) {
      // sweep setup never reseeds (gen.voice.h:906-929 runs only for
      // MODE != SWEEP); the driver seeds deterministically instead.
      pan_seed = 999;
      mersenne<SEEDED::Yes>().seed(static_cast<unsigned>(pan_seed));
    } else {
      ++g_expected_seed;  // value<SEED>() is 0 in every factory program
      if (g_expected_seed > 257) g_expected_seed = 1;
      pan_seed = g_expected_seed;
    }
    {  // pre-print the pan draw (first uniform(-1,1) after seeding)
      std::mt19937 cpy(static_cast<unsigned>(pan_seed));
      float const pan =
          std::uniform_real_distribution<float>{-1.f, 1.f}(cpy);
      std::printf("PANSEED %d %.17g\n", pan_seed, double(pan));
    }
    ProbeElement e;
    bool const ok = v.setup(freq, e, sr);
    std::printf("OK %d\n", ok ? 1 : 0);
  }
}

static void dump_voice() {
  using imajuscule::audio::voice::Mode;
  int sr;
  double freq;
  if (std::scanf("%d %lf", &sr, &freq) != 2) std::exit(2);
  g_expected_seed = 0;
  dump_voice_mode<Mode::BIRDS>(0, sr, static_cast<float>(freq));
  dump_voice_mode<Mode::ROBOTS>(1, sr, static_cast<float>(freq));
  dump_voice_mode<Mode::SWEEP>(2, sr, static_cast<float>(freq));
  dump_voice_mode<Mode::WIND>(3, sr, static_cast<float>(freq));
}

}  // namespace voice_probe

// Drives the reference's offline note resynthesis (include/resynth.hpp:
// the enveloped-sine oscillator pool with active-slot reuse, AHDSR
// 1000/0/1000/10000 frames sustain .7, per-note DbToMag volume targets,
// frame-unstriding, and the stride + (end - start) delayed release).
// The WAV surface is shimmed to capture samples in memory; everything
// else (pool policy, envelope, VolumeAdjusted smoothing, sine) is the
// reference's own compiled code. stdin: sr stride n, then n x
// (startFrame endFrame freq amp_db); prints "S <sample>" per frame.
#include <filesystem>

namespace imajuscule::audio {

// cpp.algorithms WAV surface (recovered from usage in resynth.hpp only;
// the capture writer stores samples for the driver)
enum class WaveFormat { IEEE_FLOAT };
enum class ShimSampleFormat { F64, F32 };
template <typename T>
struct AudioSample;
template <>
struct AudioSample<double> {
  static constexpr ShimSampleFormat format = ShimSampleFormat::F64;
};
template <>
struct AudioSample<float> {
  static constexpr ShimSampleFormat format = ShimSampleFormat::F32;
};
struct CountChannels {
  explicit CountChannels(int v) : v(v) {}
  int v;
};
struct ShimWavHeader {
  int channels = 1;
  int sample_rate = 0;
};
inline ShimWavHeader pcm(WaveFormat, int sample_rate, CountChannels c,
                         ShimSampleFormat) {
  return ShimWavHeader{c.v, sample_rate};
}
struct WAVWriter {
  WAVWriter(std::filesystem::path const&, ShimWavHeader h) : header_(h) {}
  void Initialize() {}
  void writeSample(double v) { samples().push_back(v); }
  int count_channels() const { return header_.channels; }
  static std::vector<double>& samples() {
    static std::vector<double> s;
    return s;
  }

 private:
  ShimWavHeader header_;
};
// Memory-backed WAV reader matching the cpp.algorithms reader surface used
// by RtResynthOfflineJob (rt.resynth.lib.params.cpp:294-307,370-389): the
// rtjob driver registers named mono float buffers; "paths" select them.
struct WAVReader {
  explicit WAVReader(std::filesystem::path const& p) : name_(p.string()) {}
  void Initialize() {
    auto it = registry().find(name_);
    if (it == registry().end())
      throw std::runtime_error("WAVReader: unknown buffer " + name_);
    data_ = &it->second.second;
    sr_ = it->second.first;
  }
  int getSampleRate() const { return sr_; }
  int countChannels() const { return 1; }
  bool HasMore() const { return data_ && pos_ < data_->size(); }
  template <typename T>
  T ReadAsOneFloat() {
    return static_cast<T>((*data_)[pos_++]);
  }
  static std::map<std::string, std::pair<int, std::vector<float>>>&
  registry() {
    static std::map<std::string, std::pair<int, std::vector<float>>> r;
    return r;
  }

 private:
  std::string name_;
  std::vector<float> const* data_ = nullptr;
  std::size_t pos_ = 0;
  int sr_ = 0;
};
// cpp.algorithms DeducedNote (recovered from resynth.hpp usage and
// main.resynth.cpp:21-44: frequency/amplitude(dB)/startFrame/endFrame)
template <typename T>
struct DeducedNote {
  T frequency;
  T amplitude;
  int startFrame;
  int endFrame;
};

}  // namespace imajuscule::audio

#include "resynth.hpp"

static void dump_resynth() {
  int sr, stride, n;
  if (std::scanf("%d %d %d", &sr, &stride, &n) != 3) std::exit(2);
  std::vector<DeducedNote<double>> notes(static_cast<size_t>(n));
  for (auto& d : notes) {
    if (std::scanf("%d %d %lf %lf", &d.startFrame, &d.endFrame,
                   &d.frequency, &d.amplitude) != 4)
      std::exit(2);
  }
  WAVWriter::samples().clear();
  resynth(notes, stride, sr, "unused.wav");
  for (double v : WAVWriter::samples()) std::printf("S %.17g\n", v);
}

// =========================================================================
// Assembled offline RtResynth oracle: compiles the reference's OWN
// RtResynth (source/rt.resynth.lib.cpp) — the offline duplex constructor
// loop with delayed-output feedback (:1185-1235,1624-1668), the exact step
// stage order (:1670-1759), synthesize_sounds driving the real 127-voice
// synth (:265-382), through the stepper + post chain
// (simple_audio_context.h:69-112, out.h:605-648 reconstruction) — behind
// shim_rtresynth.h. Two run modes:
//   analysis_active=0: the reference's own offline ctor verbatim (in which
//     the analysis step never runs: the PeriodicFFT callback early-returns
//     on !thread_resynth_active, :1582 — the flag is only set by the
//     REALTIME init. The shipped offline behavior is vocoder+passthrough
//     only.)
//   analysis_active=1: the private-ctor flow with thread_resynth_active
//     enabled, i.e. the REALTIME pipeline semantics driven sample-by-sample
//     by the offline loop — the full assembled analysis->synth->stepper
//     path this oracle exists to pin.
// =========================================================================
#include "sound.defines.h"           // SAMPLE (float)
#include "shim_rtresynth.h"

#define private public
#include "rt.resynth.lib.pubsub.cpp"     // AudioBufferPubSub/Aggregator
#include "rt.resynth.lib.locked.data.cpp"  // NonRealtimeAnalysisFrame
#include "rt.resynth.lib.params.cpp"       // Preset/Postprocessing/OfflineJob
#include "simple_audio_context.h"          // the real Stepper
#include "rt.resynth.lib.cpp"              // RtResynth itself
#undef private

static void run_rtjob(const char* preset_path) {
  using namespace imajuscule::audio::rtresynth;
  // the assembled pin uses the repo's resynth-analysis calibration
  // (amplitude law) for the shimmed findFrequenciesSqMag — see
  // shim_vocoder.h shim_sqmag_norm_mode
  imajuscule::shim_sqmag_norm_mode() = 1;
  int sr, n_voice, n_carrier, post, seed_no, seed_yes, npre, analysis_active;
  if (std::scanf("%d %d %d %d %d %d %d %d", &sr, &n_voice, &n_carrier, &post,
                 &seed_no, &seed_yes, &npre, &analysis_active) != 8)
    std::exit(2);
  {
    auto& reg = WAVReader::registry();
    reg.clear();
    auto& voice = reg["voice"];
    voice.first = sr;
    voice.second.resize(static_cast<std::size_t>(n_voice));
    for (auto& v : voice.second)
      if (std::scanf("%f", &v) != 1) std::exit(2);
    auto& carrier = reg["carrier"];
    carrier.first = sr;
    carrier.second.resize(static_cast<std::size_t>(n_carrier));
    for (auto& v : carrier.second)
      if (std::scanf("%f", &v) != 1) std::exit(2);
  }
  WAVWriter::samples().clear();

  // Seed + pre-print the RNG draw streams so the Python side can replay
  // them (same scheme as serender): pan draws come from mersenne<No>
  // (ResynthElementInitializer, rt.resynth.lib.cpp:115), start-phase draws
  // from mersenne<Yes> (gen.crtp.h:152). Each uniform_real_distribution
  // <float> call consumes one mt19937 output.
  mersenne<SEEDED::No>().seed(static_cast<unsigned>(seed_no));
  mersenne<SEEDED::Yes>().seed(static_cast<unsigned>(seed_yes));
  for (int i = 0; i < npre; ++i) {
    {
      auto c = mersenne<SEEDED::No>();
      c.discard(static_cast<unsigned long long>(i));
      std::printf("UN %d %.17g\n", i,
                  double(std::uniform_real_distribution<float>{-1.f, 1.f}(c)));
    }
    {
      auto c = mersenne<SEEDED::Yes>();
      c.discard(static_cast<unsigned long long>(i));
      std::printf("US %d %.17g\n", i,
                  double(std::uniform_real_distribution<float>{-1.f, 1.f}(c)));
    }
  }

  if (std::getenv("ORACLE_TRACE_RNG"))
    mersenne_trace() = true;  // pre-print used copies; live draws from here

  RtResynthOfflineJobConfig cfg;
  cfg.preset_file = preset_path;
  cfg.post = post ? Postprocessing::Limit : Postprocessing::None;
  cfg.input_voice_file = n_voice ? "voice" : "";
  cfg.input_carrier_file = n_carrier ? "carrier" : "";
  cfg.output_file = "out";
  RtResynthOfflineJob job(cfg);

  if (!analysis_active) {
    // the reference's own offline constructor, verbatim (calloc zeroes the
    // storage so the reference's uninitialized-member reads — e.g. the
    // vocoder window-size-before-setup UB documented at dump_vocoder — are
    // deterministically zero)
    void* mem = std::calloc(1, sizeof(RtResynth));
    auto* r = new (mem) RtResynth(job);
    r->~RtResynth();
    std::free(mem);
  } else {
    // the private-ctor flow of RtResynth(job) (rt.resynth.lib.cpp:
    // 1185-1235) with the analysis step live
    void* mem = std::calloc(1, sizeof(RtResynth));
    auto* r = new (mem)
        RtResynth(RtResynth::Mode::Offline, job.get_samplerate(),
                  job.getPostprocessing());
    r->restorePreset(job.getPreset());
    r->job = &job;
    r->init();
    r->thread_resynth_active = true;  // what the realtime analysis thread's
                                      // existence means to the FFT callback
    // REFERENCE UB WORKAROUND (documented): init_analysis captures the
    // LOCAL `local_count_dropped_input_frames` BY REFERENCE in the
    // PeriodicFFT callback (rt.resynth.lib.cpp:1577), which dangles once
    // init_analysis returns — garbage dropped-counts push note timestamps
    // ~INT32_MAX frames into the future and silence the synth. Re-set the
    // lambdas with the same bodies (:1573-1621) over a driver-owned
    // counter (0: the offline loop can never drop frames).
    {
      static uint64_t dropped_input_frames;
      dropped_input_frames = 0;
      double const nanos_per_frame = 1. / static_cast<double>(r->sample_rate);
      r->periodic_fft.setLambdas(
          [r]() { return r->getEvenWindowSizeFrames(); },
          [r]() {
            return std::max(
                1, static_cast<int>(0.5f + r->getWindowCenterStrideSeconds() *
                                               r->sample_rate));
          },
          [r, nanos_per_frame](int const window_center_stride,
                               FrequenciesSqMag<double> const&
                                   frequencies_sqmag) {
            if (!r->thread_resynth_active) return;
            extractLocalMaxFreqsMags(
                r->sample_rate /
                    std::decay_t<decltype(r->periodic_fft)>::FftOp::
                        windowed_signal_stride,
                frequencies_sqmag, SqMagToDb<double>(), r->freqmags);
            // diagnostic taps for Python-side stage comparison: the peaks
            // fed to step(), and the post-step played-note state (the
            // consumer diffs states into events)
            if (std::getenv("ORACLE_RTJOB_TAPS")) {
              static int64_t tap_frame = 0;
              for (auto const& fm : r->freqmags)
                std::printf("PK %lld %.17g %.17g\n",
                            static_cast<long long>(tap_frame),
                            double(fm.freq), double(fm.mag_db));
              struct AfterStep {
                RtResynth* r;
                int64_t frame;
                ~AfterStep() {
                  for (auto const& pn : r->played_pitches)
                    std::printf("NT %lld %lld %.17g %.17g %.17g\n",
                                static_cast<long long>(frame),
                                static_cast<long long>(pn.noteid.noteid),
                                pn.midi_pitch.get(), double(pn.cur_freq),
                                double(pn.cur_velocity));
                }
              };
              AfterStep after{r, tap_frame};
              ++tap_frame;
              r->step(
                  r->freqmags,
                  std::optional{TimestampAndSource(
                      TimeNanos(static_cast<uint64_t>(
                          (r->analysis_frames_counter +
                           dropped_input_frames) *
                          nanos_per_frame)),
                      to_underlying(RtResynth::MidiSource::Analysis))},
                  window_center_stride);
              r->storeAudioOutputQueueFillRatio(
                  r->output_2_analysis_queue->queue.was_size() /
                  static_cast<float>(
                      r->output_2_analysis_queue->queue.capacity()));
              r->storeAudioInputQueueFillRatio(
                  r->input_2_analysis_queue->queue.was_size() /
                  static_cast<float>(
                      r->input_2_analysis_queue->queue.capacity()));
              return;
            }
            r->step(
                r->freqmags,
                std::optional{TimestampAndSource(
                    TimeNanos(static_cast<uint64_t>(
                        (r->analysis_frames_counter + dropped_input_frames) *
                        nanos_per_frame)),
                    to_underlying(RtResynth::MidiSource::Analysis))},
                window_center_stride);
            r->storeAudioOutputQueueFillRatio(
                r->output_2_analysis_queue->queue.was_size() /
                static_cast<float>(
                    r->output_2_analysis_queue->queue.capacity()));
            r->storeAudioInputQueueFillRatio(
                r->input_2_analysis_queue->queue.was_size() /
                static_cast<float>(
                    r->input_2_analysis_queue->queue.capacity()));
          });
    }
    RecordF input_f = r->input_func_with_direct_input();
    PlayF output_f = r->output_func();
    int zero_since = 0;
    double const nanoseconds_increment = 1000000000. / r->sample_rate;
    int64_t frame = 0;
    // driver guard: the reference's loop condition keeps looping while the
    // tail is SILENT (`zero_since > sample_rate`, :1233 — inverted tail
    // logic, documented), which cannot terminate on silent-ending inputs;
    // cap at inputs + 2 s.
    int64_t const max_frames =
        static_cast<int64_t>(std::max(n_voice, n_carrier)) +
        2 * static_cast<int64_t>(r->sample_rate);
    do {
      float voice;
      job.read_voice(voice);
      input_f(&voice, 1);
      r->analyze_until_input_starvation();
      float output[nAudioOut];
      output_f(output, 1,
               TimeNanos{static_cast<uint64_t>(nanoseconds_increment *
                                               static_cast<double>(frame))});
      ++frame;
      job.write_output(output, nAudioOut);
      double sumAbs{};
      for (auto o : output) sumAbs += std::abs(o);
      if (sumAbs < 0.000001) {
        ++zero_since;
      } else {
        zero_since = 0;
      }
      if (std::getenv("ORACLE_RTJOB_DEBUG") && frame % 500 == 0) {
        std::fprintf(stderr,
                     "dbg frame=%lld fed=%llu step_idx=%lld freqmags=%zu "
                     "played=%zu rtactive=%d dropped=%d\n",
                     static_cast<long long>(frame),
                     static_cast<unsigned long long>(
                         r->analysis_frames_counter),
                     static_cast<long long>(r->analysis_frame_idx),
                     r->freqmags.size(), r->played_pitches.size(),
                     r->synth.someEnvelopesRTActive() ? 1 : 0,
                     r->dropped_note_on.load());
        r->synth.forEachRTActiveElem([](auto& e) {
          auto& va = e.elem.getOsc();  // VolumeAdjusted (privates opened)
          std::fprintf(stderr,
                       "  elem imag0=%.9g inner=%.9g inc=%.9g env=%s "
                       "vol=%.9g vtgt=%.9g envv=%.9g oscimag=%.9g ang=%.9g\n",
                       double(e.elem.imag(0)), double(va.imag()),
                       double(e.elem.angleIncrements()),
                       toString(e.elem.getEnvelope().getRelaxedState()),
                       va.volume ? double(*va.volume) : -99.0,
                       va.volume_target ? double(*va.volume_target) : -99.0,
                       double(va.osc.env.value()), double(va.osc.algo.imag()),
                       double(va.osc.algo.angle()));
          std::fprintf(stderr,
                       "    env counter=%d ahdCounter=%d hasAhd=%d A=%d "
                       "minChange=%d\n",
                       int(va.osc.env.counter), int(va.osc.env.ahdCounter),
                       va.osc.env.ahdState ? int(get_value(va.osc.env.ahdState))
                                           : -1,
                       int(va.osc.env.A),
                       int(va.osc.env.minChangeDuration));
        });
      }
    } while ((job.has_more_voice() || job.has_more_carrier() ||
              zero_since > r->sample_rate) &&
             frame < max_frames);
    r->thread_resynth_active = false;
    // no teardown: finalize() spins on compute unregistration that only a
    // further step() could perform; the process exits via _Exit below
    // (skipping static destruction with the analysis thread still live)
  }

  for (double v : WAVWriter::samples()) std::printf("S %.17g\n", v);
  std::fflush(stdout);
  std::_Exit(0);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: oracle midi <stretch>|loudness|scales|soundfunc|"
                 "autotune\n");
    return 2;
  }
  if (!std::strcmp(argv[1], "midi")) {
    dump_midi(argc > 2 ? std::atof(argv[2]) : 1.0);
  } else if (!std::strcmp(argv[1], "loudness")) {
    dump_loudness();
  } else if (!std::strcmp(argv[1], "scales")) {
    dump_scales();
  } else if (!std::strcmp(argv[1], "soundfunc")) {
    dump_soundfunc();
  } else if (!std::strcmp(argv[1], "autotune")) {
    dump_autotune();
  } else if (!std::strcmp(argv[1], "pitchpipe")) {
    dump_pitchpipe();
  } else if (!std::strcmp(argv[1], "score")) {
    dump_score();
  } else if (!std::strcmp(argv[1], "metaqueue")) {
    dump_metaqueue();
  } else if (!std::strcmp(argv[1], "helpers")) {
    dump_small_helpers();
  } else if (!std::strcmp(argv[1], "envelope")) {
    dump_envelope();
  } else if (!std::strcmp(argv[1], "enveloped")) {
    dump_enveloped();
  } else if (!std::strcmp(argv[1], "multienv")) {
    dump_multienv();
  } else if (!std::strcmp(argv[1], "logramp")) {
    dump_logramp();
  } else if (!std::strcmp(argv[1], "interpfreq")) {
    dump_interpfreq();
  } else if (!std::strcmp(argv[1], "oscillators")) {
    dump_oscillators();
  } else if (!std::strcmp(argv[1], "soundengine")) {
    dump_soundengine();
  } else if (!std::strcmp(argv[1], "sampler")) {
    dump_sampler();
  } else if (!std::strcmp(argv[1], "vocoder")) {
    dump_vocoder();
  } else if (!std::strcmp(argv[1], "mididecode")) {
    dump_mididecode();
  } else if (!std::strcmp(argv[1], "carrier")) {
    dump_carrier();
  } else if (!std::strcmp(argv[1], "playscore")) {
    run_score();
  } else if (!std::strcmp(argv[1], "channel")) {
    if (argc > 2 && !std::strcmp(argv[2], "skip"))
      run_channel<imajuscule::audio::XfadePolicy::SkipXfade>();
    else
      run_channel<imajuscule::audio::XfadePolicy::UseXfade>();
  } else if (!std::strcmp(argv[1], "synthpool")) {
    imajuscule::audio::midiDelays().clear();
    run_synthpool<TryAccountForTimeSourceJitter::No>();
  } else if (!std::strcmp(argv[1], "synthpool-jitter")) {
    imajuscule::audio::midiDelays().clear();
    if (argc > 2)
      imajuscule::audio::maxMIDIJitter() =
          DurationNanos{std::strtoull(argv[2], nullptr, 10)};
    run_synthpool<TryAccountForTimeSourceJitter::Yes>();
  } else if (!std::strcmp(argv[1], "voice")) {
    voice_probe::dump_voice();
  } else if (!std::strcmp(argv[1], "resynth")) {
    dump_resynth();
  } else if (!std::strcmp(argv[1], "windctrl")) {
    dump_windctrl();
  } else if (!std::strcmp(argv[1], "windrender")) {
    run_windrender();
  } else if (!std::strcmp(argv[1], "serender")) {
    // mode seed sr base_freq length scatter d1 d2 har emin emax itp fitp
    // xmode fxf start pre minp addl pause low high xfade_len pr1 pr2
    // n_steps npre
    int mode, seed, sr, itp_, fitp, xmode, fxf, start, pre, minp, addl,
        pause, xfl, npre;
    long n;
    double bf, len, sc, d1, d2, har, emin, emax, low, high, pr1, pr2;
    if (std::scanf("%d %d %d %lf %lf %lf %lf %lf %lf %lf %lf %d %d %d %d "
                   "%d %d %d %d %d %lf %lf %d %lf %lf %ld %d",
                   &mode, &seed, &sr, &bf, &len, &sc, &d1, &d2, &har, &emin,
                   &emax, &itp_, &fitp, &xmode, &fxf, &start, &pre, &minp,
                   &addl, &pause, &low, &high, &xfl, &pr1, &pr2, &n,
                   &npre) != 27)
      return 2;
    mersenne<SEEDED::Yes>().seed(static_cast<unsigned>(seed));
    for (int i = 0; i < npre; ++i) {
      auto cpyf = mersenne<SEEDED::Yes>();
      cpyf.discard(static_cast<unsigned long long>(i));
      auto cpyi = cpyf;
      float const u = std::uniform_real_distribution<float>{0.f, 1.f}(cpyf);
      int const b = std::uniform_int_distribution<>{0, 1}(cpyi);
      std::printf("U %d %.17g %d\n", i, double(u), b);
    }
    using audioelement::SoundEngineMode;
    if (mode == 0)
      run_serender<SoundEngineMode::BIRDS>(
          sr, bf, len, sc, d1, d2, har, emin, emax, itp_, fitp, xmode, fxf,
          start, pre, minp, addl, pause, low, high, xfl, pr1, pr2, n);
    else if (mode == 1)
      run_serender<SoundEngineMode::ROBOTS>(
          sr, bf, len, sc, d1, d2, har, emin, emax, itp_, fitp, xmode, fxf,
          start, pre, minp, addl, pause, low, high, xfl, pr1, pr2, n);
    else
      run_serender<SoundEngineMode::SWEEP>(
          sr, bf, len, sc, d1, d2, har, emin, emax, itp_, fitp, xmode, fxf,
          start, pre, minp, addl, pause, low, high, xfl, pr1, pr2, n);
  } else if (!std::strcmp(argv[1], "seorch")) {
    // seed sr base_freq length scatter emin emax itp xmode fxf pre minp
    // addl pause xfade_len n_steps
    int seed, sr, itp_, xmode, fxf, pre, minp, addl, pause, xfl;
    long n;
    double bf, len, sc, emin, emax;
    if (std::scanf("%d %d %lf %lf %lf %lf %lf %d %d %d %d %d %d %d %d %ld",
                   &seed, &sr, &bf, &len, &sc, &emin, &emax, &itp_, &xmode,
                   &fxf, &pre, &minp, &addl, &pause, &xfl, &n) != 16)
      return 2;
    mersenne<SEEDED::Yes>().seed(static_cast<unsigned>(seed));
    for (int i = 0; i < 120; ++i) {
      auto cpyf = mersenne<SEEDED::Yes>();
      cpyf.discard(static_cast<unsigned long long>(i));
      float const u = std::uniform_real_distribution<float>{0.f, 1.f}(cpyf);
      std::printf("U %d %.17g 0\n", i, double(u));
    }
    run_seorch<audioelement::SoundEngineMode::BIRDS>(
        sr, bf, len, sc, emin, emax, itp_, xmode, fxf, pre, minp, addl,
        pause, xfl, n);
  } else if (!std::strcmp(argv[1], "rtjob")) {
    if (argc < 3) return 2;
    run_rtjob(argv[2]);
  } else if (!std::strcmp(argv[1], "periodicfft")) {
    if (argc < 4) return 2;
    dump_periodicfft(std::atoi(argv[2]), std::atoi(argv[3]));
  } else {
    std::fprintf(stderr, "unknown table %s\n", argv[1]);
    return 2;
  }
  return 0;
}
