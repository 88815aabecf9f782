"""The `resynth` / `rt.resynth.job` apps.

  python -m cpp_audio_tpu.apps.resynth input.wav output.wav
      offline analysis -> resynthesis (reference main.resynth.cpp)
  python -m cpp_audio_tpu.apps.resynth --job job.json
      headless JSON job (reference rt.resynth.job scheme,
      rt.resynth.lib.params.cpp:183-389)
  python -m cpp_audio_tpu.apps.resynth input.wav output.wav --live
      block-streaming duplex loop (the realtime RtResynth shape: input fed
      block-by-block through PeriodicFFT into the live tracker + streaming
      synth, output pulled per block — rt.resynth.lib.cpp:1185-1235)
"""

from __future__ import annotations

import argparse

from ..analysis import offline_job, resynth


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", nargs="?")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--job", help="JSON job config path")
    ap.add_argument("--autotune", action="store_true")
    ap.add_argument("--live", action="store_true",
                    help="stream through the live duplex pipeline")
    ap.add_argument("--block-size", type=int, default=512,
                    help="callback block size for --live")
    ap.add_argument("--vocode", metavar="CARRIER_WAV",
                    help="vocode the input against this carrier instead of "
                         "resynthesizing")
    ap.add_argument("--debug-vocoder", metavar="DIR",
                    help="tap every vocoder stage to WAVs in DIR "
                         "(the reference's IMJ_DEBUG_VOCODER)")
    args = ap.parse_args(argv)

    if args.job:
        offline_job.run_job_file(args.job)
        print(f"ran job {args.job}")
        return 0
    if not args.input or not args.output:
        ap.error("need input and output (or --job)")
    from ..utils import wav as wavio

    if args.live:
        from ..analysis.streaming import LiveResynth

        data, sr = wavio.read_wav(args.input)
        cfg = resynth.ResynthConfig(sample_rate=sr, use_autotune=args.autotune)
        live = LiveResynth(cfg)
        out = live.run_duplex(data.mean(axis=1), block_size=args.block_size)
        wavio.write_wav(args.output, out, sr)
        s = live.stats
        print(f"wrote {args.output} (live: {s.windows} windows, "
              f"on={s.note_on} change={s.note_change} off={s.note_off})")
        return 0

    if args.vocode:
        import numpy as np

        from ..analysis import vocoder

        mod, sr = wavio.read_wav(args.input)
        car, sr2 = wavio.read_wav(args.vocode)
        if sr2 != sr:
            ap.error("sample rate mismatch between input and carrier")
        out = vocoder.vocode(mod.mean(axis=1), car.mean(axis=1),
                             vocoder.VocoderParams(sample_rate=sr),
                             debug_dir=args.debug_vocoder)
        wavio.write_wav(args.output, np.asarray(out), sr)
        print(f"wrote {args.output} (vocoded)")
        return 0

    cfg = resynth.ResynthConfig(use_autotune=args.autotune)
    resynth.resynth_wav(args.input, args.output, cfg)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
