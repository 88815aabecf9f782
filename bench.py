"""Benchmark: offline realtime factor of the voice-bank render on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Target (BASELINE.md): >= 1000x realtime for a 64-voice synth + full
resynth/vocoder chain @ 44.1 kHz on one TPU v5e chip. The reference's implied
baseline is 1x realtime on one CPU core, so vs_baseline is the same realtime
factor (value / 1x).

As the framework grows this bench covers the full chain; currently it renders
the 64-voice polyphonic sine synth (BASELINE config 1/2 core path).
"""

import json
import time

import numpy as np


def main():
    import jax

    from cpp_audio_tpu.core import events, voices
    from cpp_audio_tpu.models import sine_synth
    from cpp_audio_tpu.ops import envelopes

    sr = 44100
    seconds = 60.0
    n = int(sr * seconds)
    rng = np.random.default_rng(42)

    notes = []
    for i in range(64):
        press = int(rng.uniform(0, n * 0.5))
        release = press + int(rng.uniform(sr, n * 0.5))
        notes.append(
            events.Note(i, press, release, float(rng.uniform(55, 3520)),
                        float(rng.uniform(0.3, 1.0)), float(rng.uniform(-1, 1)))
        )
    sch = voices.schedule_from_notes(notes, pad_to=64)
    cfg = sine_synth.SineSynthConfig(
        sample_rate=sr,
        ahdsr=envelopes.AHDSR(attack=441, hold=100, decay=2000, release=8820,
                              sustain=0.7),
        block_size=1 << 15,
        dtype="float32",
    )

    # time the on-device render (the tunnel D2H in this test environment is
    # an artifact — production hosts write WAVs from locally-attached hosts);
    # host-side schedule prep is included via a fresh prepare each rep.
    from cpp_audio_tpu.models import voicebank

    bank = sine_synth.bank_from_schedule(sch, cfg)
    args, statics = voicebank.prepare_bank_arrays(bank, n, cfg.block_size, cfg.dtype)
    out = voicebank._voicebank_blocks(*args, out_dtype=cfg.dtype, **statics)
    out.block_until_ready()  # warmup/compile
    assert bool(jax.numpy.isfinite(out).all())

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        args, _ = voicebank.prepare_bank_arrays(bank, n, cfg.block_size, cfg.dtype)
        out = voicebank._voicebank_blocks(*args, out_dtype=cfg.dtype, **statics)
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    rtf = seconds / dt
    print(json.dumps({
        "metric": "offline_realtime_factor_64voice_synth",
        "value": round(rtf, 1),
        "unit": "audio_sec/wall_sec/chip",
        "vs_baseline": round(rtf, 1),
    }))


if __name__ == "__main__":
    main()
