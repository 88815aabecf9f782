"""The `tune` app: score playground with hot-reloadable synth presets
(reference source/main.tune.cpp — oscillator synths defined by
synth/Envelope*.txt + Harmonics*.txt + LowPass.txt, scores via parseMusic).

  python -m cpp_audio_tpu.apps.tune "do re mi-- fa" out.wav --synth-dir synth/
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..core import voices
from ..models import harmonics
from ..utils import presets, score
from ..utils import wav as wavio


def render_score(score_text: str, *, synth_dir=None, sample_rate: int = 44100,
                 time_unit_ms: float = 180.0, octave: int = 4,
                 envelope_file: str = "EnvelopeFast.txt",
                 harmonics_file: str = "Harmonics.txt",
                 lowpass_file: str = "LowPass.txt",
                 sample_files: list | None = None):
    """Render a score with the oscillator synth, or — when `sample_files`
    maps frequencies to WAVs ("440=pluck.wav") — with the sampler synth
    (reference TuneSamplerElement, main.tune.cpp:108,1710-1790)."""
    specs = score.parse_music(score_text)
    notes = score.notespecs_to_notes(specs, sample_rate=sample_rate,
                                     time_unit_ms=time_unit_ms, octave=octave)
    total = int(max((n.release for n in notes), default=0) + sample_rate)

    if sample_files:
        from ..models import sampler as smp
        from ..utils import wav as wavio

        smap = smp.SampleMap()
        for spec_str in sample_files:
            freq_s, path = spec_str.split("=", 1)
            data, sr2 = wavio.read_wav(path)
            mono = data.mean(axis=1)
            smap.add_for_frequency(float(freq_s), sample_rate,
                                   smp.trim_sample(mono))
        scfg = smp.SamplerConfig(sample_rate=sample_rate)
        if synth_dir is not None:
            ah = presets.parse_envelope_file(Path(synth_dir) / envelope_file,
                                             sample_rate)
            scfg = smp.SamplerConfig(sample_rate=sample_rate, ahdsr=ah)
        return smp.render_notes(notes, smap, total, scfg), sample_rate

    if synth_dir is not None:
        d = Path(synth_dir)
        ahdsr = presets.parse_envelope_file(d / envelope_file, sample_rate)
        vols = tuple(presets.parse_harmonics_file(d / harmonics_file))
        lp = presets.parse_lowpass_file(d / lowpass_file)
    else:
        ahdsr, vols, lp = None, (1.0, 0.5, 0.25), 800.0
    cfg = harmonics.HarmonicsSynthConfig(
        sample_rate=sample_rate, ahdsr=ahdsr, harmonic_volumes=vols,
        lowpass_freq=lp,
    )
    sch = voices.schedule_from_notes(notes, pad_to=8)
    return harmonics.render_schedule(sch, total, cfg), sample_rate


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("score", help="score string, or @file to read one")
    ap.add_argument("output", nargs="?", default="tune.wav")
    ap.add_argument("--synth-dir", default=None,
                    help="directory with Envelope*/Harmonics*/LowPass presets")
    ap.add_argument("--time-unit-ms", type=float, default=180.0)
    ap.add_argument("--octave", type=int, default=4)
    ap.add_argument("--sample", action="append", default=None,
                    metavar="FREQ=WAV",
                    help="use the sampler synth with this pitched sample "
                         "(repeatable), e.g. --sample 440=pluck.wav")
    args = ap.parse_args(argv)

    text = args.score
    if text.startswith("@"):
        text = Path(text[1:]).read_text()
    try:
        out, sr = render_score(text, synth_dir=args.synth_dir,
                               time_unit_ms=args.time_unit_ms,
                               octave=args.octave, sample_files=args.sample)
    except ValueError as e:
        ap.error(str(e))
    wavio.write_wav(args.output, out, sr)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
