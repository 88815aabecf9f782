"""Debug the rtjob feedback_drone failure: windowed error vs time."""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import toolenv  # noqa: E402

toolenv.setup_cpu()

from rtjob_compare import build_oracle, rms_db, run_rtjob  # noqa: E402

from cpp_audio_tpu.analysis import offline_job  # noqa: E402
from cpp_audio_tpu.analysis.presets_json import ResynthPreset  # noqa: E402

SR = 44100


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "feedback"
    n = int(SR * 2.0)
    t = np.arange(n) / SR
    voice = (0.4 * np.sin(2 * np.pi * 220.0 * t)
             + 0.2 * np.sin(2 * np.pi * 330.0 * t)
             + 0.15 * np.sin(2 * np.pi * (495.0 * t + 2.0 * np.sin(
                 2 * np.pi * 0.7 * t)))).astype(np.float32)

    p = ResynthPreset()
    p.analysis_volume = 1.0
    p.min_volume = 0.01
    if case == "feedback":
        p.analysis_output_feedback_gain = 0.5
        p.output_delay_seconds = 0.25
    elif case == "autotune":
        p.use_autotune = True
        p.pitch_harmonize_post_autotune = 7.0

    exe = build_oracle(Path(tempfile.gettempdir()) / "oracle_rtjob")
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        preset_path = f.name
    p.save(preset_path)

    post = 1 if case == "feedback" else 0
    ref, un, us, opeaks, onotes = run_rtjob(exe, preset_path, voice,
                                            np.zeros(0, np.float32), SR,
                                            post=post, taps=True)

    if case == "autotune":
        from cpp_audio_tpu.analysis import offline_job as oj
        from cpp_audio_tpu.analysis import resynth as rs
        cfg = oj.resynth_config_from_preset(p, SR)
        cfg.dtype = "float64"
        cfg.pan_draw_values = un
        cfg.phase_draw_values = us
        gained = p.analysis_input_gain * voice.astype(np.float64)
        rpeaks = rs.analyze(gained, cfg)
        nf = min(len(rpeaks), 1 + max(opeaks) if opeaks else 0)
        tracker = rs.PitchTracker(cfg)
        bad = 0
        for fidx in range(nf):
            tracker.step(rpeaks[fidx])
            o = sorted((fr, v_) for (_, _, fr, v_) in onotes.get(fidx, []))
            g = sorted((nn.frames[-1][1],
                        nn.frames[-1][2] / rs.REDUCE_UNADJUSTED_VOLUMES)
                       for nn in tracker.voices.values()
                       if nn.release_frame > fidx)
            ok = len(o) == len(g) and all(
                abs(a[0] - b[0]) <= 1e-4 * max(1.0, abs(a[0]))
                and abs(a[1] - b[1]) <= 1e-4 * max(1e-6, abs(a[1]))
                for a, b in zip(o, g))
            if not ok:
                bad += 1
                if bad <= 6:
                    print("NOTE DIFF frame", fidx, "oracle", len(o),
                          "repo", len(g))
                    print("  oracle:", [(round(a, 4), round(b, 6))
                                        for a, b in o[:8]])
                    print("  repo:  ", [(round(a, 4), round(b, 6))
                                        for a, b in g[:8]])
        print("note-diff frames: %d/%d" % (bad, nf))
        # creation-order comparison: noteid rank vs pitch, first frames with
        # notes (pan draws are consumed in creation order)
        shown = 0
        tr2 = rs.PitchTracker(cfg)
        for fidx in range(nf):
            tr2.step(rpeaks[fidx])
            o = sorted((nid, round(pv, 3))
                       for (nid, pv, _, _) in onotes.get(fidx, []))
            g = sorted((nid, round(nn.frames[-1][1], 3))
                       for nid, nn in tr2.voices.items()
                       if nn.release_frame > fidx)
            if o and shown < 4:
                shown += 1
                print("frame", fidx)
                print("  oracle id->pitch:", o[:10])
                print("  repo   id->pitch:", g[:10])
                print("  repo   id->pan:  ",
                      [(nid, round(nn.pan, 4))
                       for nid, nn in sorted(tr2.voices.items())][:10])
    got = offline_job.run_offline(p, voice.astype(np.float64), None, SR,
                                  post="limit" if post else "none",
                                  dtype="float64", pan_draw_values=un,
                                  phase_draw_values=us)
    m = min(len(ref), len(got))
    print("ref rms %.6f  got rms %.6f  err %.1f dB"
          % (np.sqrt((ref[:m] ** 2).mean()),
             np.sqrt((got[:m] ** 2).mean()),
             rms_db(ref[:m] - got[:m], ref[:m])))
    rm, gm = ref[:m].sum(axis=1), got[:m].sum(axis=1)
    print("mono err %.1f dB   L err %.1f dB   R err %.1f dB"
          % (rms_db(rm - gm, rm),
             rms_db(ref[:m, 0] - got[:m, 0], ref[:m, 0]),
             rms_db(ref[:m, 1] - got[:m, 1], ref[:m, 1])))
    # spectrum of the difference, steady-state midsection
    seg = slice(SR // 2, SR // 2 + 32768)
    for ch in (0, 1):
        d = (ref[seg, ch] - got[seg, ch]) * np.hanning(32768)
        sp = np.abs(np.fft.rfft(d))
        top = np.argsort(sp)[-6:][::-1]
        print("ch%d diff peaks:" % ch,
              [(round(i * SR / 32768, 1), round(float(sp[i]), 2))
               for i in top])
        r = np.abs(np.fft.rfft(ref[seg, ch] * np.hanning(32768)))
        topr = np.argsort(r)[-8:][::-1]
        print("ch%d ref  peaks:" % ch,
              [(round(i * SR / 32768, 1), round(float(r[i]), 2))
               for i in topr])
        g = np.abs(np.fft.rfft(got[seg, ch] * np.hanning(32768)))
        print("ch%d got @ref peaks:" % ch,
              [(round(i * SR / 32768, 1), round(float(g[i]), 2))
               for i in topr])
    W = SR // 8  # 125 ms windows
    for w in range(m // W):
        lo, hi = w * W, (w + 1) * W
        print("  [%5.2fs] ref %.5f got %.5f err %6.1f dB"
              % (lo / SR, np.sqrt((ref[lo:hi] ** 2).mean()),
                 np.sqrt((got[lo:hi] ** 2).mean()),
                 rms_db(ref[lo:hi] - got[lo:hi], ref[lo:hi])))


if __name__ == "__main__":
    main()
