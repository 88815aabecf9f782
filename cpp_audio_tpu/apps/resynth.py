"""The `resynth` / `rt.resynth.job` apps.

  python -m cpp_audio_tpu.apps.resynth input.wav output.wav
      offline analysis -> resynthesis (reference main.resynth.cpp)
  python -m cpp_audio_tpu.apps.resynth --job job.json
      headless JSON job (reference rt.resynth.job scheme,
      rt.resynth.lib.params.cpp:183-389)
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
    args = ap.parse_args(argv)

    if args.job:
        offline_job.run_job_file(args.job)
        print(f"ran job {args.job}")
        return 0
    if not args.input or not args.output:
        ap.error("need input and output (or --job)")
    cfg = resynth.ResynthConfig(use_autotune=args.autotune)
    resynth.resynth_wav(args.input, args.output, cfg)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
