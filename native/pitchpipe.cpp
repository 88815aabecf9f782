// Native pitch pipeline: the per-frame analysis stages of rt.resynth
// (reference source/rt.resynth.lib.algo.cpp), reimplemented as a standalone
// C++ library driven through a C ABI (ctypes).
//
// Stages per analysis frame (RtResynth::step, rt.resynth.lib.cpp:1670-1759):
//   frequencies_to_pitches -> aggregate_pitches -> reduce_pitches ->
//   shift -> harmonize -> autotune -> shift -> harmonize ->
//   track_pitches -> order_by_perceived_loudness -> note on/change/off
//
// This is host-side control logic (tens of peaks per frame) that the device
// can't help with; in Python it dominates the offline chain's wall time, so
// it runs here at C++ speed. The Python wrapper (analysis/native.py) feeds
// peak arrays straight from the device STFT and receives compact event
// arrays per frame.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPitchEpsilon = 0.0001;

struct PitchVolume {
  double pitch;
  double volume;
};

struct PlayedNote {
  int64_t noteid;
  double pitch;
};

struct Config {
  double nearby_distance_tones;
  double min_volume;
  double max_track_pitches;
  double shift_pre, shift_post;
  double harmonize_pre, harmonize_post;
  double autotune_max_pitch;
  double autotune_tolerance;
  int pitch_method;   // 0 center, 1 maxvol, 2 ponderate
  int volume_method;  // 0 maxvol, 1 sum
  int max_voices;
  double analysis_volume;
};

// ISO-226 pitch grid + 60-phon contour SPL, filled by the wrapper so the
// tables stay single-sourced in Python (utils/loudness.py).
struct LoudnessTable {
  std::vector<double> pitches;
  std::vector<double> spl;  // contour dB at the chosen phon index
  double eval(double pitch) const {
    // reference `closest` interpolation (include/loudness.h:152-186)
    size_t n = pitches.size();
    size_t hi = std::upper_bound(pitches.begin(), pitches.end(), pitch) - pitches.begin();
    if (hi == 0) return spl[0];
    if (hi >= n) return spl[n - 1];
    double lo_v = pitches[hi - 1], hi_v = pitches[hi];
    double ratio = (pitch - lo_v) / (hi_v - lo_v);
    return ratio * spl[hi] + (1.0 - ratio) * spl[hi - 1];
  }
};

struct Ctx {
  Config cfg;
  LoudnessTable loudness;
  std::vector<double> allowed;  // sorted allowed pitches (chord/interval modes)
  // musical-scale mode: octave-folded snapping with the exact arithmetic of
  // MusicalScalePitches::closest_pitch (rt.resynth.lib.autotune.cpp:89-142)
  bool use_scale = false;
  double scale_root = 60.0;
  std::vector<double> scale_pitches;     // 0..12 inclusive
  std::vector<double> scale_equidistant; // midpoints
  std::vector<PlayedNote> played;
  int64_t next_noteid = 0;
  int64_t dropped = 0;

  // scratch
  std::vector<PitchVolume> pvs, reduced, tuned;
  std::vector<int> changes;       // index into played, or -1
  std::vector<uint8_t> cont;
  std::vector<int> order;
};

inline double freq_to_pitch(double freq) {
  return 69.0 + 12.0 * std::log2(freq / 440.0);
}
inline double pitch_to_freq(double pitch) {
  return 440.0 * std::pow(2.0, (pitch - 69.0) / 12.0);
}

void aggregate_reduce(Ctx& c) {
  // aggregate_pitches + reduce_pitches (algo.cpp:124-184) fused single pass
  c.reduced.clear();
  size_t i = 0, n = c.pvs.size();
  while (i < n) {
    double min_p = c.pvs[i].pitch, max_p = min_p;
    double max_vol = 0.0, max_vol_pitch = min_p;
    double sum_vol = 0.0, sum_pv = 0.0;
    size_t j = i;
    for (; j < n; ++j) {
      double p = c.pvs[j].pitch;
      double new_min = std::min(min_p, p), new_max = std::max(max_p, p);
      if (j > i && (new_max - new_min) > c.cfg.nearby_distance_tones) break;
      min_p = new_min; max_p = new_max;
      double v = c.pvs[j].volume;
      sum_vol += v;
      sum_pv += p * v;
      if (v > max_vol) { max_vol = v; max_vol_pitch = p; }
    }
    double vol = (c.cfg.volume_method == 0) ? max_vol : sum_vol;
    if (vol >= c.cfg.min_volume) {
      double pitch;
      switch (c.cfg.pitch_method) {
        case 0: pitch = 0.5 * (min_p + max_p); break;
        case 1: pitch = max_vol_pitch; break;
        default: pitch = sum_pv / sum_vol; break;
      }
      c.reduced.push_back({pitch, vol});
    }
    i = j;
  }
}

void shift(std::vector<PitchVolume>& v, double amount) {
  if (!amount) return;
  for (auto& p : v) p.pitch += amount;
}

void harmonize(std::vector<PitchVolume>& v, double amount) {
  // algo.cpp:318-371. The reference finds the merge target with
  // find_closest_pitch (lower_bound + neighbor compare, algo.cpp:189-218)
  // over the GROWING vector, whose sorted invariant its own appends break —
  // so the search can miss the true closest element. We reproduce that
  // probe-for-probe (pinned against compiled reference code by
  // tests/test_reference_oracle.py).
  if (!amount) return;
  size_t sz = v.size();
  for (size_t i = 0; i < sz; ++i) {
    double hp = v[i].pitch + amount;
    auto lb = std::lower_bound(v.begin(), v.end(), hp,
                               [](const PitchVolume& a, double p) { return a.pitch < p; });
    size_t best;
    if (lb == v.end()) best = v.size() - 1;
    else if (lb == v.begin()) best = 0;
    else {
      size_t k = static_cast<size_t>(lb - v.begin());
      best = (std::abs(hp - v[k].pitch) < std::abs(hp - v[k - 1].pitch)) ? k : k - 1;
    }
    if (std::abs(v[best].pitch - hp) <= kPitchEpsilon) v[best].volume += v[i].volume;
    else v.push_back({hp, v[i].volume});
  }
  std::stable_sort(v.begin(), v.end(),
                   [](const PitchVolume& a, const PitchVolume& b) { return a.pitch < b.pitch; });
}

double closest_allowed(const std::vector<double>& allowed, double pitch) {
  auto it = std::lower_bound(allowed.begin(), allowed.end(), pitch);
  if (it == allowed.end()) return allowed.back();
  if (it == allowed.begin()) return allowed.front();
  double hi = *it, lo = *(it - 1);
  return (std::abs(pitch - hi) < std::abs(pitch - lo)) ? hi : lo;
}

double scale_snap(const Ctx& c, double pitch) {
  double half_tones_dist = pitch - c.scale_root;
  double octave_dist = half_tones_dist / 12.0;
  int oct = (octave_dist >= 0.0) ? static_cast<int>(octave_dist)
                                 : static_cast<int>(octave_dist) - 1;
  double translated = pitch - oct * 12;
  double rel = translated - c.scale_root;
  size_t i = 0;
  while (i < c.scale_equidistant.size() && rel >= c.scale_equidistant[i]) ++i;
  double offset = rel - c.scale_pitches[i];
  return pitch - offset;
}

void autotune(Ctx& c, const std::vector<PitchVolume>& in, std::vector<PitchVolume>& out) {
  // algo.cpp:191-229
  out.clear();
  for (const auto& pv : in) {
    double tp;
    if (pv.pitch <= c.cfg.autotune_max_pitch) {
      if (c.use_scale) tp = scale_snap(c, pv.pitch);
      else tp = c.allowed.empty() ? pv.pitch : closest_allowed(c.allowed, pv.pitch);
      if (tp > c.cfg.autotune_max_pitch) tp = pv.pitch;  // keep output sorted
    } else {
      tp = pv.pitch;
    }
    if (std::abs(tp - pv.pitch) <= c.cfg.autotune_tolerance) {
      if (!out.empty() && std::abs(out.back().pitch - tp) < kPitchEpsilon)
        out.back().volume += pv.volume;
      else
        out.push_back({tp, pv.volume});
    }
  }
}

void track(Ctx& c) {
  // algo.cpp:256-305 (monotonic two-pointer matching)
  c.changes.assign(c.tuned.size(), -1);
  c.cont.assign(c.played.size(), 0);
  size_t it = 0, end = c.played.size();
  for (size_t idx = 0; idx < c.tuned.size(); ++idx) {
    double np_ = c.tuned[idx].pitch;
    while (it != end) {
      if (c.played[it].pitch < np_ - c.cfg.max_track_pitches) { ++it; continue; }
      if (c.played[it].pitch <= np_ + c.cfg.max_track_pitches) {
        c.changes[idx] = static_cast<int>(it);
        c.cont[it] = 1;
        ++it;
      }
      break;
    }
  }
}

struct TrackedNoteC {
  // control trail: (frame, freq, volume) triples
  std::vector<int> cframe;
  std::vector<double> cfreq, cvol;
  int64_t release_frame;  // NEVER if still playing at the end
  double pan;
};

constexpr int64_t kNeverFrame = 1000000000;  // models/resynth_bank.py NEVER_FRAME

}  // namespace

extern "C" {

Ctx* pitchpipe_create(const double* cfg_values, int n_cfg,
                      const double* loud_pitches, const double* loud_spl, int n_loud,
                      const double* allowed, int n_allowed) {
  (void)n_cfg;
  auto* c = new Ctx();
  const double* v = cfg_values;
  c->cfg.nearby_distance_tones = v[0];
  c->cfg.min_volume = v[1];
  c->cfg.max_track_pitches = v[2];
  c->cfg.shift_pre = v[3];
  c->cfg.shift_post = v[4];
  c->cfg.harmonize_pre = v[5];
  c->cfg.harmonize_post = v[6];
  c->cfg.autotune_max_pitch = v[7];
  c->cfg.autotune_tolerance = v[8];
  c->cfg.pitch_method = static_cast<int>(v[9]);
  c->cfg.volume_method = static_cast<int>(v[10]);
  c->cfg.max_voices = static_cast<int>(v[11]);
  c->cfg.analysis_volume = v[12];
  c->loudness.pitches.assign(loud_pitches, loud_pitches + n_loud);
  c->loudness.spl.assign(loud_spl, loud_spl + n_loud);
  if (n_allowed > 0) c->allowed.assign(allowed, allowed + n_allowed);
  return c;
}

// musical-scale autotune mode (exact MusicalScalePitches arithmetic)
void pitchpipe_set_scale(Ctx* c, double root_pitch,
                         const double* scale, int n_scale,
                         const double* equidistant, int n_equi) {
  c->use_scale = true;
  c->scale_root = root_pitch;
  c->scale_pitches.assign(scale, scale + n_scale);
  c->scale_equidistant.assign(equidistant, equidistant + n_equi);
}

void pitchpipe_destroy(Ctx* c) { delete c; }

int64_t pitchpipe_dropped(const Ctx* c) { return c->dropped; }

// Process one frame. peaks: (freq, mag_db) sorted by freq. Emits events into
// the out arrays (capacity `cap`):
//   kinds: 0 = note_on, 1 = note_change, 2 = note_off
// Returns the number of events.
int pitchpipe_process_frame(Ctx* c,
                            const double* freqs, const double* mags_db, int n_peaks,
                            int* out_kind, int64_t* out_noteid,
                            double* out_freq, double* out_volume, int cap) {
  // frequencies_to_pitches (algo.cpp:10-29)
  c->pvs.clear();
  for (int i = 0; i < n_peaks; ++i) {
    if (freqs[i] > 0)
      c->pvs.push_back({freq_to_pitch(freqs[i]), std::pow(10.0, mags_db[i] / 20.0)});
  }

  aggregate_reduce(*c);
  shift(c->reduced, c->cfg.shift_pre);
  harmonize(c->reduced, c->cfg.harmonize_pre);
  autotune(*c, c->reduced, c->tuned);
  shift(c->tuned, c->cfg.shift_post);
  harmonize(c->tuned, c->cfg.harmonize_post);
  track(*c);

  // perceived loudness order (60 phon; rt.resynth.lib.cpp:1712-1720)
  c->order.resize(c->tuned.size());
  for (size_t i = 0; i < c->order.size(); ++i) c->order[i] = static_cast<int>(i);
  std::vector<double> w(c->tuned.size());
  for (size_t i = 0; i < c->tuned.size(); ++i)
    w[i] = c->tuned[i].volume / c->loudness.eval(c->tuned[i].pitch);
  std::stable_sort(c->order.begin(), c->order.end(), [&](int a, int b) { return w[a] > w[b]; });

  int n_out = 0;
  // note offs (synthesize_sounds, rt.resynth.lib.cpp:296-313)
  for (size_t j = 0; j < c->played.size(); ++j) {
    if (!c->cont[j] && n_out < cap) {
      out_kind[n_out] = 2;
      out_noteid[n_out] = c->played[j].noteid;
      out_freq[n_out] = 0;
      out_volume[n_out] = 0;
      ++n_out;
    }
  }
  int active = 0;
  for (auto f : c->cont) active += f;

  // note changes / ons, loudest first
  std::vector<PlayedNote> new_notes;
  for (int idx : c->order) {
    double pitch = c->tuned[idx].pitch;
    double freq = pitch_to_freq(pitch);
    double volume = c->cfg.analysis_volume * c->tuned[idx].volume;
    int pc = c->changes[idx];
    if (pc >= 0) {
      c->played[pc].pitch = pitch;
      if (n_out < cap) {
        out_kind[n_out] = 1;
        out_noteid[n_out] = c->played[pc].noteid;
        out_freq[n_out] = freq;
        out_volume[n_out] = volume;
        ++n_out;
      }
    } else {
      if (volume <= 0) continue;
      if (active >= c->cfg.max_voices) { ++c->dropped; continue; }
      ++active;
      ++c->next_noteid;
      new_notes.push_back({c->next_noteid, pitch});
      if (n_out < cap) {
        out_kind[n_out] = 0;
        out_noteid[n_out] = c->next_noteid;
        out_freq[n_out] = freq;
        out_volume[n_out] = volume;
        ++n_out;
      }
    }
  }

  // remove dead + keep alive + sort by pitch (algo.cpp:415-440)
  std::vector<PlayedNote> kept;
  kept.reserve(c->played.size() + new_notes.size());
  for (size_t j = 0; j < c->played.size(); ++j)
    if (c->cont[j]) kept.push_back(c->played[j]);
  for (auto& nn : new_notes) kept.push_back(nn);
  std::stable_sort(kept.begin(), kept.end(),
            [](const PlayedNote& a, const PlayedNote& b) { return a.pitch < b.pitch; });
  c->played = std::move(kept);
  return n_out;
}

// --- shared helpers for the fused offline runs -----------------------------

namespace {

struct Win {
  int64_t f0, f1, rel_f;
  double A, H, D, R;
};

// Run the per-frame pipeline over the whole (n_frames, k) peak arrays and
// build the tracked-note trails. pan_draws consumed once per note-on in
// event order (PitchTracker.rng semantics). Returns 0, or -1 on overflow.
int run_tracking(Ctx* c, const double* freqs, const double* mags,
                 int64_t n_frames, int k, double stereo_spread,
                 const double* pan_draws, int64_t n_pan,
                 std::vector<TrackedNoteC>& notes) {
  std::vector<double> vf, vm;
  std::vector<int> out_kind(4096);
  std::vector<int64_t> out_nid(4096);
  std::vector<double> out_freq(4096), out_vol(4096);
  const int64_t nid_base = c->next_noteid;
  int64_t pan_i = 0;
  for (int64_t f = 0; f < n_frames; ++f) {
    vf.clear();
    vm.clear();
    const double* fr = freqs + f * k;
    const double* mg = mags + f * k;
    for (int j = 0; j < k; ++j) {
      if (fr[j] > 0.0 && std::isfinite(mg[j]) && std::isfinite(fr[j])) {
        vf.push_back(fr[j]);
        vm.push_back(mg[j]);
      }
    }
    int n_ev = pitchpipe_process_frame(
        c, vf.data(), vm.data(), static_cast<int>(vf.size()), out_kind.data(),
        out_nid.data(), out_freq.data(), out_vol.data(),
        static_cast<int>(out_kind.size()));
    for (int e = 0; e < n_ev; ++e) {
      int64_t idx = out_nid[e] - nid_base - 1;
      switch (out_kind[e]) {
        case 0: {  // note on
          if (pan_i >= n_pan) return -1;
          TrackedNoteC note;
          note.cframe.push_back(static_cast<int>(f));
          note.cfreq.push_back(out_freq[e]);
          note.cvol.push_back(out_vol[e]);
          note.release_frame = kNeverFrame;
          note.pan = stereo_spread * pan_draws[pan_i++];
          notes.push_back(std::move(note));
          break;
        }
        case 1:  // change
          if (idx >= 0 && idx < static_cast<int64_t>(notes.size())) {
            notes[idx].cframe.push_back(static_cast<int>(f));
            notes[idx].cfreq.push_back(out_freq[e]);
            notes[idx].cvol.push_back(out_vol[e]);
          }
          break;
        default:  // off
          if (idx >= 0 && idx < static_cast<int64_t>(notes.size()))
            notes[idx].release_frame = f;
      }
    }
  }
  return 0;
}

// Per-note effective frame windows + envelope floors (_note_windows).
std::vector<Win> compute_wins(const std::vector<TrackedNoteC>& notes,
                              int64_t total_frames, double S, double sr,
                              double attack, double hold, double decay,
                              double sustain, double release) {
  const double min_dt = sr / 1000.0;
  const bool has_decay = sustain < 0.999999;
  std::vector<Win> wins(notes.size());
  for (size_t ni = 0; ni < notes.size(); ++ni) {
    const auto& note = notes[ni];
    double init_inc = 2.0 * note.cfreq[0] / sr;
    double min_change = std::floor(0.5 + 2.5 * 2.0 / std::max(std::abs(init_inc), 1e-9));
    Win w;
    w.f0 = note.cframe[0];
    w.A = std::max({attack, min_dt, min_change, 1.0});
    w.H = std::max(hold, 0.0);
    w.D = has_decay ? std::max({decay, min_dt, min_change, 1.0}) : 0.0;
    w.R = std::max({release, min_dt, min_change, 1.0});
    w.rel_f = std::min(note.release_frame, total_frames);
    w.f1 = std::min(total_frames,
                    w.rel_f + static_cast<int64_t>(std::ceil(w.R / S)) + 1);
    wins[ni] = w;
  }
  return wins;
}

double env_pressed_val(double tp, double A, double H, double D, double sus) {
  if (tp < A) return std::min(std::max((tp + 1.0) / A, 0.0), 1.0);
  if (tp < A + H) return 1.0;
  if (D != 0.0 && tp < A + H + D)
    return 1.0 + (sus - 1.0) * std::min((tp - A - H + 1.0) / D, 1.0);
  return sus;
}

// stable pack order by first frame (_build_slot_tables argsort kind=stable)
std::vector<int> pack_order(const std::vector<Win>& wins) {
  std::vector<int> order(wins.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = static_cast<int>(i);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return wins[a].f0 < wins[b].f0; });
  return order;
}

}  // namespace

// Fused offline run: the whole analysis's host side in one call.
//
// Consumes the device peak arrays (n_frames, k) [freq, mag_db; invalid
// entries have non-finite mag or freq<=0], runs the per-frame pipeline +
// note tracking (same semantics as pitchpipe_process_frame driven frame by
// frame), then packs the tracked notes into polyphony slots and emits the
// (total_frames, n_slots, 16) float32 control table consumed by the device
// renderer — an exact port of models/resynth_bank.py _build_slot_tables
// (same field order, same f64 boundary recurrences, same RNG draw order:
// pan_draws consumed once per note-on in event order, phase_draws once per
// packed note in stable f0 order).
//
// Returns the number of tracked notes (>= 0) or -1 on bad arguments.
int64_t pitchpipe_run_offline(
    Ctx* c, const double* freqs, const double* mags, int64_t n_frames, int k,
    // render config (models/resynth_bank.py TrackedRenderConfig)
    int stride, int n_slots, int64_t total_frames, double sample_rate,
    // raw AHDSR (samples; floors applied per note like _note_windows)
    double attack, double hold, double decay, double sustain, double release,
    double stereo_spread, const double* pan_draws, int64_t n_pan,
    const double* phase_draws, int64_t n_phase, float* table_out) {
  if (!c || n_slots <= 0 || stride <= 0) return -1;
  const double S = stride;
  const double sr = sample_rate;

  std::vector<TrackedNoteC> notes;
  if (run_tracking(c, freqs, mags, n_frames, k, stereo_spread, pan_draws,
                   n_pan, notes) < 0)
    return -1;
  std::vector<Win> wins = compute_wins(notes, total_frames, S, sr, attack,
                                       hold, decay, sustain, release);
  const bool has_decay = sustain < 0.999999;
  const double sus = has_decay ? std::min(std::max(sustain, 0.0), 1.0) : 1.0;
  const double FAR = 1e12;

  // --- slot packing + table build (_build_slot_tables) ----------------------
  constexpr int NF = 16;
  enum {
    F_INC, F_RATIO, F_PHB, F_VTGT, F_VB, F_ALPHA, F_TP0, F_TR0,
    F_TOP, F_A, F_H, F_D, F_SUS, F_R, F_GL, F_GR
  };
  // defaults for inactive entries
  for (int64_t t = 0; t < total_frames * n_slots; ++t) {
    float* row = table_out + t * NF;
    std::memset(row, 0, NF * sizeof(float));
    row[F_INC] = 1e-6f;
    row[F_A] = 1.0f;
    row[F_SUS] = 1.0f;
    row[F_R] = 1.0f;
    row[F_TP0] = -1e9f;
  }

  auto env_pressed = [&](double tp, double A, double H, double D) {
    return env_pressed_val(tp, A, H, D, sus);
  };

  std::vector<int> order = pack_order(wins);
  std::vector<int64_t> slot_free_at(n_slots, 0);
  int64_t phase_i = 0;

  for (int ni : order) {
    const auto& note = notes[ni];
    const auto& w = wins[ni];
    if (w.f0 >= total_frames || w.f1 <= w.f0) continue;
    int slot = -1;
    for (int s = 0; s < n_slots; ++s)
      if (slot_free_at[s] <= w.f0) { slot = s; break; }
    if (slot < 0) continue;  // polyphony exceeded: drop (onDroppedNote)
    slot_free_at[slot] = w.f1;

    double press = static_cast<double>(w.f0) * S;
    double rel_sample = (note.release_frame < kNeverFrame)
                            ? static_cast<double>(note.release_frame) * S
                            : FAR;
    double top = (rel_sample < FAR)
                     ? env_pressed(rel_sample - 1.0 - press, w.A, w.H, w.D)
                     : sus;
    double th = 0.25 * M_PI * (note.pan + 1.0);
    double gl = std::cos(th), gr = std::sin(th);

    if (phase_i >= n_phase) return -1;
    double phase = phase_draws[phase_i++];
    size_t i = 0;
    double cur_f = note.cfreq[0], cur_v = note.cvol[0];
    double prev_inc = 2.0 * cur_f / sr;
    double vol_b = cur_v;
    for (int64_t cc = w.f0; cc < w.f1; ++cc) {
      if (i + 1 < note.cframe.size() && note.cframe[i + 1] <= cc) {
        ++i;
        cur_f = note.cfreq[i];
        cur_v = note.cvol[i];
      }
      double inc_to = 2.0 * cur_f / sr;
      double inc_from = (cc > w.f0) ? prev_inc : inc_to;
      double ratio = (inc_to != inc_from) ? std::log(inc_to / inc_from) : 0.0;
      double inc_eff = std::min(2.0 / S, std::abs(inc_to));
      double alpha = 1.0 - std::exp(-M_PI * inc_eff);

      float* row = table_out + (cc * n_slots + slot) * NF;
      row[F_INC] = static_cast<float>(inc_from);
      row[F_RATIO] = static_cast<float>(ratio);
      row[F_PHB] = static_cast<float>(phase);
      row[F_VTGT] = static_cast<float>(cur_v);
      row[F_VB] = static_cast<float>(vol_b);
      row[F_ALPHA] = static_cast<float>(alpha);
      row[F_TP0] = static_cast<float>(static_cast<double>(cc) * S - press);
      row[F_TR0] = static_cast<float>(
          std::max(static_cast<double>(cc) * S - rel_sample, -FAR));
      row[F_TOP] = static_cast<float>(top);
      row[F_A] = static_cast<float>(w.A);
      row[F_H] = static_cast<float>(w.H);
      row[F_D] = static_cast<float>(w.D);
      row[F_SUS] = static_cast<float>(sus);
      row[F_R] = static_cast<float>(w.R);
      row[F_GL] = static_cast<float>(gl);
      row[F_GR] = static_cast<float>(gr);

      double dphi = (ratio != 0.0)
                        ? (inc_from / (ratio / S)) * std::expm1(ratio)
                        : S * inc_from;
      phase = std::fmod(phase + dphi, 2.0);
      vol_b = cur_v + (vol_b - cur_v) * std::pow(1.0 - alpha, S);
      prev_inc = inc_to;
    }
  }
  return static_cast<int64_t>(notes.size());
}

}  // extern "C"
