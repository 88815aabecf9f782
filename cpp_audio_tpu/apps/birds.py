"""The `birds` app: render procedural SoundEngine programs
(reference source/main.birds.cpp — interactive CLI that picks a
BIRDS/ROBOTS/WIND program and plays notes; here: render to WAV, with an
interactive prompt mode when run with --interactive).

Run: python -m cpp_audio_tpu.apps.birds --mode birds --program 0 --seconds 5 out.wav
"""

from __future__ import annotations

import argparse

import numpy as np

from ..models import soundengine, voice_presets, wind
from ..utils import wav as wavio


def render(mode: str, program, seconds: float, *, freq: float = 440.0,
           sample_rate: int = 44100, seed: int = 1) -> np.ndarray:
    m = voice_presets.Mode(mode)
    prog = voice_presets.get_program(m, program)
    n = int(seconds * sample_rate)
    if m is voice_presets.Mode.WIND:
        return wind.render_program(prog, n, sample_rate, seed=seed)
    return soundengine.render_program(prog, freq, n, sample_rate, seed=seed)


def list_programs() -> str:
    lines = []
    for mode, progs in voice_presets.PROGRAMS.items():
        lines.append(f"{mode.value}:")
        for i, p in enumerate(progs):
            lines.append(f"  {i}: {p.name}")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output", nargs="?", default="birds.wav")
    ap.add_argument("--mode", default="birds",
                    choices=[m.value for m in voice_presets.Mode])
    ap.add_argument("--program", default="0")
    ap.add_argument("--freq", type=float, default=440.0)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--sample-rate", type=int, default=44100)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--list", action="store_true", help="list programs and exit")
    args = ap.parse_args(argv)

    if args.list:
        print(list_programs())
        return 0

    program = int(args.program) if args.program.isdigit() else args.program
    progs = voice_presets.PROGRAMS[voice_presets.Mode(args.mode)]
    if isinstance(program, int) and not (0 <= program < len(progs)):
        ap.error(f"program index {program} out of range (mode {args.mode} has "
                 f"{len(progs)} programs; use --list)")
    out = render(args.mode, program, args.seconds, freq=args.freq,
                 sample_rate=args.sample_rate, seed=args.seed)
    wavio.write_wav(args.output, out, args.sample_rate)
    print(f"wrote {args.output} ({args.seconds}s, mode={args.mode})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
