"""Fast (band-pass + cumsum) modulator path vs the exact windowed-FFT path."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import vocoder


def test_fast_modulator_matches_exact():
    sr = 44100
    t = np.arange(sr)
    sig = (0.5 * np.sin(2 * np.pi * 300 * t / sr)
           + 0.2 * np.sin(2 * np.pi * 3000 * t / sr))
    p = vocoder.VocoderParams(sample_rate=sr, count_bands=6)
    car = 0.5 * np.sign(np.sin(2 * np.pi * 150 * t / sr))
    out_exact = vocoder.vocode(sig, car, p, exact_modulator=True)
    out_fast = vocoder.vocode(sig, car, p, exact_modulator=False)
    # the fast path has sharp band edges while the windowed-FFT path leaks
    # across edges; in-band gains match, so outputs agree to ~20% RMS (the
    # `exact_modulator=True` path remains available for strict parity)
    n = min(len(out_exact), len(out_fast))
    err = np.sqrt(np.mean((out_exact[sr // 8 : n] - out_fast[sr // 8 : n]) ** 2))
    ref = np.sqrt(np.mean(out_exact[sr // 8 : n] ** 2))
    assert err < 0.25 * ref


def test_fast_modulator_silence():
    p = vocoder.VocoderParams()
    out = vocoder.vocode(np.zeros(44100), np.ones(44100), p)
    assert np.max(np.abs(out)) < 1e-9
