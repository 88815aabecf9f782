"""Assembled offline RtResynth end-to-end comparison vs the compiled oracle.

Drives tests/oracle `rtjob` (the reference's OWN RtResynth offline duplex
loop, rt.resynth.lib.cpp:1185-1235,1624-1759, compiled from /root/reference)
and the repo's analysis/offline_job.run_offline on the same input + preset,
replaying the oracle's pre-printed RNG streams (pan: mersenne<No>, start
phase: mersenne<Yes>) through ResynthConfig.pan_draw_values /
phase_draw_values. Reports per-leg RMS error in dB and the measured lag.

CPU-only. Usage:
    bash tools/pyrun.sh tools/rtjob_compare.py [seconds] [case]
"""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import toolenv  # noqa: E402

toolenv.setup_cpu()

REF = Path("/root/reference")
ORACLE_DIR = Path(__file__).resolve().parent.parent / "tests" / "oracle"


def build_oracle(exe: Path) -> Path:
    if exe.exists():
        return exe
    subprocess.run(
        ["g++", "-std=c++17", "-O1", "-DNDEBUG", "-fpermissive",
         "-I", str(ORACLE_DIR), "-I", str(REF / "include"),
         "-I", str(REF / "source"),
         str(ORACLE_DIR / "oracle.cpp"), "-o", str(exe)],
        check=True, capture_output=True)
    return exe


def run_rtjob(exe, preset_path, voice, carrier, sr, *, post=0, seed_no=12345,
              seed_yes=999, npre=4096, analysis_active=1, debug=False,
              taps=False):
    lines = ["%d %d %d %d %d %d %d %d" % (
        sr, len(voice), len(carrier), post, seed_no, seed_yes, npre,
        analysis_active)]
    lines += ["%.9g" % v for v in np.asarray(voice, np.float32)]
    lines += ["%.9g" % v for v in np.asarray(carrier, np.float32)]
    env = dict(os.environ)
    if debug:
        env["ORACLE_RTJOB_DEBUG"] = "1"
    if taps:
        env["ORACLE_RTJOB_TAPS"] = "1"
    out = subprocess.run(
        [str(exe), "rtjob", str(preset_path)], input="\n".join(lines) + "\n",
        capture_output=True, text=True, env=env, check=True)
    un = np.zeros(npre)
    us = np.zeros(npre)
    samples = []
    peaks = {}   # frame -> [(freq, mag_db)]
    notes = {}   # frame -> [(noteid, pitch, freq, velocity)]
    for line in out.stdout.splitlines():
        key, *vals = line.split()
        if key == "S":
            samples.append(float(vals[0]))
        elif key == "UN":
            un[int(vals[0])] = float(vals[1])
        elif key == "US":
            us[int(vals[0])] = float(vals[1])
        elif key == "PK":
            peaks.setdefault(int(vals[0]), []).append(
                (float(vals[1]), float(vals[2])))
        elif key == "NT":
            notes.setdefault(int(vals[0]), []).append(
                (int(vals[1]), float(vals[2]), float(vals[3]),
                 float(vals[4])))
    stereo = np.array(samples).reshape(-1, 2)
    if debug:
        sys.stderr.write(out.stderr)
    return stereo, un, us, peaks, notes


def rms_db(err, ref):
    r = float(np.sqrt(np.mean(np.square(np.asarray(ref, np.float64)))))
    e = float(np.sqrt(np.mean(np.square(np.asarray(err, np.float64)))))
    return 20.0 * np.log10(max(e, 1e-30) / max(r, 1e-30))


def best_lag(a, b, max_lag=64):
    """lag minimizing ||a[t] - b[t+lag]|| over [-max_lag, max_lag]."""
    best = (1e99, 0)
    n = min(len(a), len(b)) - max_lag
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            d = a[:n] - b[lag:lag + n]
        else:
            d = a[-lag:n] - b[:n + lag]
        e = float(np.sqrt(np.mean(d * d)))
        if e < best[0]:
            best = (e, lag)
    return best[1]


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    case = sys.argv[2] if len(sys.argv) > 2 else "analysis"
    sr = 44100
    n = int(sr * seconds)

    from cpp_audio_tpu.analysis import offline_job
    from cpp_audio_tpu.analysis.presets_json import ResynthPreset

    exe = build_oracle(Path(tempfile.gettempdir()) / "oracle_rtjob")

    t = np.arange(n) / sr
    rng = np.random.default_rng(7)
    # voice: two sustained partials + a vibrato component (note changes)
    voice = (0.4 * np.sin(2 * np.pi * 220.0 * t)
             + 0.2 * np.sin(2 * np.pi * 330.0 * t)
             + 0.15 * np.sin(2 * np.pi * (495.0 * t
                                          + 2.0 * np.sin(2 * np.pi * 0.7 * t))))
    voice = voice.astype(np.float32)
    carrier = np.zeros(0, np.float32)

    p = ResynthPreset()
    p.analysis_volume = 1.0
    if case == "env":
        p.env_attack_seconds = 0.02
        p.env_hold_seconds = 0.01
        p.env_decay_seconds = 0.05
        p.env_sustain_level = 0.6
        p.env_release_seconds = 0.1

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        preset_path = f.name
    p.save(preset_path)

    ref, un, us, opeaks, onotes = run_rtjob(exe, preset_path, voice, carrier,
                                            sr, taps=True)
    print("oracle: frames", ref.shape, "rms %.6f" % np.sqrt((ref ** 2).mean()),
          "first nz", int(np.argmax(np.abs(ref).max(axis=1) > 0)))

    # --- stage comparison: analysis peaks + tracked note states ---
    from cpp_audio_tpu.analysis import resynth as rs

    cfg = offline_job.resynth_config_from_preset(p, sr)
    cfg.dtype = "float64"
    cfg.pan_draw_values = un
    cfg.phase_draw_values = us
    gained = p.analysis_input_gain * voice.astype(np.float64)
    rpeaks = rs.analyze(gained, cfg)
    nf = min(len(rpeaks), 1 + max(opeaks) if opeaks else 0)
    print("repo frames", len(rpeaks), "oracle tap frames",
          1 + max(opeaks) if opeaks else 0)
    bad = 0
    for f in range(nf):
        o = sorted(opeaks.get(f, []))
        g = sorted((float(a), float(b)) for (a, b) in rpeaks[f])
        if len(o) != len(g) or any(
                abs(a[0] - b[0]) > 1e-6 * max(1.0, abs(a[0]))
                or abs(a[1] - b[1]) > 1e-6 * max(1.0, abs(a[1]))
                for a, b in zip(o, g)):
            bad += 1
            if bad <= 3:
                print("PEAK DIFF frame", f)
                print("  oracle:", o[:6])
                print("  repo:  ", g[:6])
    print("peak-diff frames: %d/%d" % (bad, nf))

    tracker = rs.PitchTracker(cfg)
    bad = 0
    for f in range(nf):
        tracker.step(rpeaks[f])
        o = sorted((fr, v_) for (_, _, fr, v_) in onotes.get(f, []))
        # repo TrackedNote stores volume = analysis_volume * pv.volume; the
        # oracle's cur_velocity = gain_analysis * vol / reduceUnadjustedVolumes
        g = sorted((n.frames[-1][1],
                    n.frames[-1][2] / rs.REDUCE_UNADJUSTED_VOLUMES)
                   for n in tracker.voices.values()
                   if n.release_frame > f)
        ok = len(o) == len(g) and all(
            abs(a[0] - b[0]) <= 1e-4 * max(1.0, abs(a[0]))
            and abs(a[1] - b[1]) <= 1e-4 * max(1e-6, abs(a[1]))
            for a, b in zip(o, g))
        if not ok:
            bad += 1
            if bad <= 3:
                print("NOTE DIFF frame", f, "oracle", len(o), "repo", len(g))
                print("  oracle:", [(round(a, 4), round(b, 6))
                                    for a, b in o[:5]])
                print("  repo:  ", [(round(a, 4), round(b, 6))
                                    for a, b in g[:5]])
    print("note-diff frames: %d/%d" % (bad, nf))

    got = offline_job.run_offline(
        p, voice.astype(np.float64), None, sr, dtype="float64",
        pan_draw_values=un, phase_draw_values=us)
    print("repo:   frames", got.shape, "rms %.6f" % np.sqrt((got ** 2).mean()),
          "first nz", int(np.argmax(np.abs(got).max(axis=1) > 0)))

    m = min(len(ref), len(got))
    lag = best_lag(ref[:, 0], got[:, 0])
    print("lag (repo relative to oracle):", lag)
    if lag >= 0:
        a, b = ref[:m - lag], got[lag:m]
    else:
        a, b = ref[-lag:m], got[:m + lag]
    print("RMS error: %.1f dB" % rms_db(a - b, a))
    # per-second breakdown to localize divergence onset
    for s0 in range(0, m // sr):
        sl = slice(s0 * sr, (s0 + 1) * sr)
        print("  second %d: %.1f dB" % (s0, rms_db(a[sl] - b[sl], a[sl])))


if __name__ == "__main__":
    main()
