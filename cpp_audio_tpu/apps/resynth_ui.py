"""Terminal dashboard for the analysis/resynthesis/vocoder pipeline — the
headless analog of the reference's wxWidgets UI.

Reference (source/rt.resynth.ui.cpp:7 and siblings): `MyFrame` shows param
sliders grouped and colored by section, a `PitchWindow` scrolling view of the
played notes (rt.resynth.ui.analysis.cpp:14), a `VocoderWindow` of live band
envelopes (rt.resynth.ui.vocoder.cpp:16), an autotune widget block, and
polled gauges (CPU load, queue fill, per-stage durations).

Here the same data feeds render as text: a pitch roll (time x MIDI pitch,
volume-shaded), vocoder band envelope rows, the grouped parameter panel, and
the per-stage duration gauges — driven from a WAV offline, since this
environment has no audio devices.

Usage:
  python -m cpp_audio_tpu.apps.resynth_ui input.wav [--vocoder] [--width 100]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

SHADES = " .:-=+*#%@"


def shade(v: float) -> str:
    """Map 0..1 to an ASCII intensity character."""
    i = int(np.clip(v, 0.0, 1.0) * (len(SHADES) - 1) + 0.5)
    return SHADES[i]


def pitch_roll(tracked, n_frames: int, *, width: int = 100,
               height: int = 24) -> str:
    """The PitchWindow analog: tracked notes on a (pitch, time) grid,
    brightness = volume (reference rt.resynth.ui.analysis.cpp:14)."""
    if not tracked:
        return "(no notes)"
    vmax_all = max(v for tn in tracked for (_, _, v) in tn.frames) or 1.0
    pitches = [69.0 + 12.0 * np.log2(max(freq, 1e-9) / 440.0)
               for tn in tracked for (_, freq, v) in tn.frames
               if v >= 0.02 * vmax_all]  # range from audible notes only
    if not pitches:
        return "(no audible notes)"
    lo = np.floor(min(pitches)) - 1
    hi = np.ceil(max(pitches)) + 1
    grid = np.zeros((height, width))
    col = lambda f: min(int(f * width / max(n_frames, 1)), width - 1)
    row = lambda p: int((hi - p) / (hi - lo + 1e-9) * (height - 1))
    for tn in tracked:
        end = min(tn.release_frame, n_frames)
        frames = tn.frames + [(end, tn.frames[-1][1], tn.frames[-1][2])]
        for (f0, freq, vol), (f1, _, _) in zip(frames[:-1], frames[1:]):
            p = 69.0 + 12.0 * np.log2(max(freq, 1e-9) / 440.0)
            if not (lo <= p <= hi):
                continue  # sub-threshold artifacts excluded from the range
            r = row(p)
            for c in range(col(f0), max(col(f1), col(f0) + 1)):
                grid[r, c] = max(grid[r, c], vol / vmax_all)
    lines = []
    for r in range(height):
        p = hi - (hi - lo) * r / (height - 1)
        label = f"{p:6.1f} |" if r % 4 == 0 else "       |"
        lines.append(label + "".join(shade(v) for v in grid[r]))
    lines.append("       +" + "-" * width)
    return "\n".join(lines)


def vocoder_bands(band_amps: np.ndarray, band_freqs: np.ndarray,
                  *, width: int = 100) -> str:
    """The VocoderWindow analog: one shaded row per band over time
    (reference rt.resynth.ui.vocoder.cpp:16)."""
    n_frames, n_bands = band_amps.shape
    edges = np.linspace(0, n_frames, width + 1).astype(int)
    vmax = band_amps.max() or 1.0
    lines = []
    for b in reversed(range(n_bands)):
        vals = [band_amps[a:c, b].max() if c > a else 0.0
                for a, c in zip(edges[:-1], edges[1:])]
        lines.append(f"{band_freqs[b]:7.0f}Hz |"
                     + "".join(shade(v / vmax) for v in vals))
    return "\n".join(lines)


PARAM_GROUPS = {
    "analysis": ["window_size_seconds", "window_center_stride_seconds",
                 "min_volume", "analysis_volume", "max_voices"],
    "pitch": ["nearby_distance_tones", "max_track_pitches",
              "pitch_shift_pre_autotune", "pitch_shift_post_autotune",
              "pitch_harmonize_pre_autotune", "pitch_harmonize_post_autotune",
              "pitch_method", "volume_method"],
    "autotune": ["use_autotune", "autotune_max_pitch",
                 "autotune_tolerance_pitches", "autotune_kwargs"],
    "envelope": ["env_attack_seconds", "env_hold_seconds", "env_decay_seconds",
                 "env_release_seconds", "env_sustain_level"],
    "output": ["stereo_spread", "sample_rate", "dtype", "seed"],
}


def param_panel(config) -> str:
    """Grouped parameter listing (the MyFrame slider sections analog,
    reference rt.resynth.ui.cpp param sections colored by group)."""
    d = dataclasses.asdict(config)
    out = []
    for group, names in PARAM_GROUPS.items():
        out.append(f"[{group}]")
        for n in names:
            if n in d:
                v = d[n]
                v = getattr(v, "name", v)
                out.append(f"  {n:32s} = {v}")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("input", help="input WAV (the microphone analog)")
    ap.add_argument("--vocoder", action="store_true",
                    help="also show the vocoder band-envelope window")
    ap.add_argument("--width", type=int, default=100)
    ap.add_argument("--height", type=int, default=24)
    args = ap.parse_args(argv)

    from ..analysis import resynth
    from ..analysis import vocoder as voc
    from ..utils import wav
    from ..utils.profiling import StageDurations

    data, sr = wav.read_wav(args.input)
    mono = data.mean(axis=1) if data.ndim == 2 else data
    cfg = resynth.ResynthConfig(sample_rate=sr)
    stages = StageDurations()

    t0 = time.perf_counter()
    peaks = resynth.analyze(mono, cfg)
    stages.record("fft+peaks", time.perf_counter() - t0)
    t0 = time.perf_counter()
    # python tracker: it also returns the per-frame AnalysisFrameResult feed
    # (the NonRealtimeAnalysisFrame analog) that the note counters need
    tracked, frame_stats, dropped = resynth.track(peaks, cfg,
                                                  prefer_native=False)
    stages.record("pitch pipeline", time.perf_counter() - t0)

    print("=== parameters " + "=" * (args.width - 7))
    print(param_panel(cfg))
    print()
    print("=== pitch window (notes) " + "=" * (args.width - 17))
    print(pitch_roll(tracked, len(peaks), width=args.width, height=args.height))
    n_on = sum(s.note_on for s in frame_stats)
    n_off = sum(s.note_off for s in frame_stats)
    n_chg = sum(s.note_change for s in frame_stats)
    print(f"frames={len(peaks)} notes: on={n_on} change={n_chg} off={n_off} "
          f"dropped={dropped}")

    if args.vocoder:
        params = voc.VocoderParams(sample_rate=sr)
        edges = params.band_freqs()
        n_vf = max(1, (len(mono) - params.modulator_window) // params.stride + 1)
        t0 = time.perf_counter()
        amps = np.asarray(voc._modulator_band_amps_fast(
            mono.astype(np.float32), edges,
            window=params.modulator_window, stride=params.stride,
            n_frames=n_vf, sample_rate=sr))
        stages.record("vocoder bands", time.perf_counter() - t0)
        print()
        print("=== vocoder window (band envelopes) " + "=" * (args.width - 28))
        print(vocoder_bands(amps, edges[:-1], width=args.width))

    print()
    print("=== stage durations (UI gauges) ===")
    for stage, info in stages.summary().items():
        print(f"  {stage:20s} {1e3 * info['last']:9.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
