"""FFT vocoder tests (config 5 core)."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import vocoder


def sine(f, n, sr=44100, amp=1.0):
    return amp * np.sin(2 * np.pi * f * np.arange(n) / sr)


class TestVocoder:
    def test_stride_is_odd(self):
        p = vocoder.VocoderParams()
        assert p.stride % 2 == 1

    def test_band_freqs_log_spaced(self):
        p = vocoder.VocoderParams(count_bands=5, min_freq=100, max_freq=20000)
        f = p.band_freqs()
        assert len(f) == 6
        assert f[0] == pytest.approx(100)
        assert f[-1] == pytest.approx(20000)
        ratios = f[1:] / f[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-6)

    def test_band_gating(self):
        # modulator energy at 300 Hz only -> carrier content passes only in
        # the band containing 300 Hz
        sr = 44100
        n = sr
        p = vocoder.VocoderParams(sample_rate=sr, count_bands=8,
                                  min_freq=100, max_freq=10000)
        mod = sine(300.0, n, sr)
        edges = p.band_freqs()
        # carrier tones: one inside the 300 Hz band, one in a far band
        b300 = np.searchsorted(edges, 300.0) - 1
        inside = np.sqrt(edges[b300] * edges[b300 + 1])
        far = np.sqrt(edges[6] * edges[7])
        car = sine(inside, n, sr, 0.5) + sine(far, n, sr, 0.5)
        out = vocoder.vocode(mod, car, p)
        spec = np.abs(np.fft.rfft(out[sr // 4 :] * np.hanning(len(out) - sr // 4)))
        freqs = np.fft.rfftfreq(len(out) - sr // 4, 1 / sr)
        lvl_in = spec[np.argmin(np.abs(freqs - inside))]
        lvl_far = spec[np.argmin(np.abs(freqs - far))]
        assert lvl_in > 10 * lvl_far

    def test_silence_modulator_silences_output(self):
        sr = 44100
        p = vocoder.VocoderParams(sample_rate=sr)
        out = vocoder.vocode(np.zeros(sr), sine(440, sr, sr), p)
        assert np.max(np.abs(out)) < 1e-9

    def test_amplitude_tracks_modulator(self):
        sr = 44100
        p = vocoder.VocoderParams(sample_rate=sr, count_bands=4,
                                  min_freq=100, max_freq=8000)
        car = sine(440.0, sr, sr)
        loud = vocoder.vocode(sine(440.0, sr, sr, 0.8), car, p)
        soft = vocoder.vocode(sine(440.0, sr, sr, 0.2), car, p)
        r_loud = np.sqrt(np.mean(loud[sr // 2 :] ** 2))
        r_soft = np.sqrt(np.mean(soft[sr // 2 :] ** 2))
        assert r_loud / r_soft == pytest.approx(4.0, rel=0.2)

    def test_mix_volumes(self):
        sr = 44100
        mod = sine(440.0, sr // 2, sr, 0.5)
        car = sine(700.0, sr // 2, sr, 0.5)
        p = vocoder.VocoderParams(sample_rate=sr, volume_vocoded=0.0,
                                  volume_modulator=1.0, volume_carrier=0.0)
        out = vocoder.vocode(mod, car, p)
        np.testing.assert_allclose(out, mod[: len(out)], atol=1e-12)

    def test_output_continuity(self):
        # crossfade must avoid frame-boundary clicks
        sr = 44100
        p = vocoder.VocoderParams(sample_rate=sr)
        mod = sine(300.0, sr, sr)
        car = sine(350.0, sr, sr)
        out = vocoder.vocode(mod, car, p)
        d = np.abs(np.diff(out[sr // 4 :]))
        # max jump bounded by the max slope of a 350 Hz sine at this amplitude
        amp = np.max(np.abs(out[sr // 4 :]))
        assert d.max() < amp * 2 * np.pi * 800 / sr


def test_debug_taps(tmp_path):
    """debug_dir writes every vocoder stage (IMJ_DEBUG_VOCODER analog)."""
    import numpy as np

    from cpp_audio_tpu.analysis import vocoder
    from cpp_audio_tpu.utils import wav as wavio

    sr = 44100
    n = sr // 2
    t = np.arange(n) / sr
    mod = 0.5 * np.sin(2 * np.pi * 440 * t)
    car = np.sign(np.sin(2 * np.pi * 110 * t))
    p = vocoder.VocoderParams(sample_rate=sr)
    vocoder.vocode(mod, car, p, debug_dir=tmp_path)
    names = {f.name for f in tmp_path.iterdir()}
    assert {"modulator.wav", "carrier.wav", "vocoded.wav"} <= names
    assert sum(1 for x in names if x.startswith("band_")) == p.count_bands
    d, _ = wavio.read_wav(tmp_path / "modulator.wav")
    assert np.abs(d).max() > 0.1
