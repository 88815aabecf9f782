"""Crossfade ops + deterministic spectral-fingerprint regression tests.

The fingerprints pin down the renderers' output (SURVEY §4: golden tests);
they are spectral band energies in dB, stable to ~0.5 dB across platforms and
dtypes, so any semantic regression (envelope timing, volume laws, markov
scheduling) trips them while benign float noise does not.
"""

import numpy as np
import pytest

from cpp_audio_tpu.ops import crossfade


class TestCrossfade:
    def test_weights_sum_to_one(self):
        for shape in ("linear", "sinusoidal"):
            wn, wo = crossfade.xfade_weights(64, shape)
            np.testing.assert_allclose(wn + wo, 1.0, atol=1e-12)
            assert wn[-1] == pytest.approx(1.0)

    def test_crossfade_constant_is_constant(self):
        old = np.ones(100)
        new = np.ones(100)
        out = np.asarray(crossfade.crossfade(old, new, 50))
        np.testing.assert_allclose(out, 1.0, atol=1e-7)

    def test_splice_length(self):
        a = np.zeros(100)
        b = np.ones(80)
        out = np.asarray(crossfade.splice(a, b, 20))
        assert out.shape[0] == 100 + 80 - 20
        assert out[0] == 0.0 and out[-1] == 1.0


def band_fingerprint(mono: np.ndarray, sr: int = 44100, n_bands: int = 12):
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(len(mono), 1 / sr)
    edges = np.logspace(np.log10(40), np.log10(16000), n_bands + 1)
    out = []
    for i in range(n_bands):
        sel = (freqs >= edges[i]) & (freqs < edges[i + 1])
        out.append(10 * np.log10(max(spec[sel].sum(), 1e-20)))
    return np.array(out)


class TestGoldenFingerprints:
    """Deterministic renders pinned by band-energy fingerprints (dB)."""

    def test_sine_synth_fingerprint(self):
        from cpp_audio_tpu.core import events, voices
        from cpp_audio_tpu.models import sine_synth
        from cpp_audio_tpu.ops import envelopes

        notes = [events.Note(1, 0, 30000, 440.0, 1.0, 0.0),
                 events.Note(2, 5000, 35000, 660.0, 0.7, 0.5)]
        sch = voices.schedule_from_notes(notes, pad_to=8)
        cfg = sine_synth.SineSynthConfig(
            ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=441, release=4410,
                                  sustain=0.7),
            dtype="float64",
        )
        out = sine_synth.render_schedule(sch, 44100, cfg)
        fp = band_fingerprint(out.sum(axis=1))
        # regenerate with: print(np.round(fp, 2)) after intentional changes
        expect = np.array([-11.46, -1.63, -0.48, 12.98, 65.32, 61.54, 10.99,
                           -9.31, -19.24, -27.32, -34.06, -39.43])
        np.testing.assert_allclose(fp, expect, atol=1.0)

    def test_bird_program_fingerprint(self):
        from cpp_audio_tpu.models import soundengine, voice_presets

        p = voice_presets.get_program(voice_presets.Mode.BIRDS,
                                      "Standard & Cute bird")
        out = soundengine.render_program(p, 440.0, 44100, seed=32, pan=0.0,
                                         dtype="float64")
        fp = band_fingerprint(out.sum(axis=1))
        top_band = int(np.argmax(fp))
        # the bird chirps concentrate in the upper-mid bands; pin the peak
        # band and the total energy
        assert 6 <= top_band <= 11
        total = 10 * np.log10(np.sum(out**2) + 1e-20)
        assert 5.0 < total < 16.0  # measured 10.49 dB at seed 32
