"""Filter-bank + envelope-follower vocoder variant (VERDICT round-1 item 9;
reference rt.resynth.lib.vocoder.cpp:46-79,254-400,560-733)."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import vocoder as voc


def _signals(n, sr, mod_freq=330.0, trem=3.0):
    t = np.arange(n) / sr
    mod = np.sin(2 * np.pi * mod_freq * t) * (0.5 + 0.5 * np.sin(2 * np.pi * trem * t))
    car = np.sign(np.sin(2 * np.pi * 110.0 * t))
    return mod, car


class TestFilterBankVocoder:
    def test_env_follower_tracks_band_energy(self):
        """A tone in band b modulates only that band's carrier content."""
        sr = 44100
        n = sr
        p = voc.VocoderParams(sample_rate=sr, count_bands=4)
        mod, car = _signals(n, sr, mod_freq=330.0)
        out = voc.vocode_filter_bank(mod, car, p)
        assert out.shape == (n,)
        assert np.abs(out).max() > 1e-3
        # silence the modulator -> vocoded output dies
        out0 = voc.vocode_filter_bank(np.zeros(n), car, p)
        assert np.abs(out0).max() < 1e-6

    def test_cutoff_ratio_controls_envelope_speed(self):
        """env_follower_cutoff_ratio sets the envelope follower's low-pass:
        a slower follower smears the tremolo depth of the output."""
        sr = 44100
        n = sr
        mod, car = _signals(n, sr, trem=8.0)

        def depth(ratio):
            p = voc.VocoderParams(sample_rate=sr,
                                  env_follower_cutoff_ratio=ratio)
            out = voc.vocode_filter_bank(mod, car, p)
            # tremolo depth = envelope swing of the output, via block RMS
            b = sr // 20
            rms = np.array([np.sqrt((out[i:i + b] ** 2).mean())
                            for i in range(0, n - b, b)])[2:]
            return (rms.max() - rms.min()) / max(rms.max(), 1e-12)

        assert depth(1.0 / 4.0) > depth(1.0 / 400.0) + 0.1

    def test_contrast_with_fft_mode(self):
        """Both modes carry the modulator's tremolo onto the carrier, but the
        band envelopes differ (IIR follower vs windowed FFT energies) — pin
        that they correlate yet are not identical."""
        sr = 44100
        n = sr
        mod, car = _signals(n, sr)
        p = voc.VocoderParams(sample_rate=sr)
        out_fft = np.asarray(voc.vocode(mod, car, p))
        out_fb = voc.vocode_filter_bank(mod, car, p)
        m = min(len(out_fft), len(out_fb))
        b = sr // 20
        env_f = np.array([np.abs(out_fft[i:i + b]).mean()
                          for i in range(0, m - b, b)])
        env_b = np.array([np.abs(out_fb[i:i + b]).mean()
                          for i in range(0, m - b, b)])
        c = np.corrcoef(env_f[2:], env_b[2:])[0, 1]
        assert c > 0.7  # same gross envelope
        assert np.abs(out_fft[:m] - out_fb[:m]).max() > 1e-3  # different design

    def test_volume_mix(self):
        sr = 44100
        mod, car = _signals(8192, sr)
        p = voc.VocoderParams(sample_rate=sr, volume_vocoded=0.0,
                              volume_modulator=0.5, volume_carrier=0.25)
        out = voc.vocode_filter_bank(mod, car, p)
        np.testing.assert_allclose(out, 0.5 * mod + 0.25 * car, atol=1e-5)

    def test_cli_mode_switch(self, tmp_path):
        from cpp_audio_tpu.apps import resynth as app
        from cpp_audio_tpu.utils import wav as wavio

        sr = 44100
        mod, car = _signals(sr // 2, sr)
        wavio.write_wav(tmp_path / "m.wav", mod.astype(np.float32), sr)
        wavio.write_wav(tmp_path / "c.wav", car.astype(np.float32), sr)
        assert app.main([str(tmp_path / "m.wav"), str(tmp_path / "o.wav"),
                         "--vocode", str(tmp_path / "c.wav"),
                         "--vocode-mode", "filterbank"]) == 0
        d, _ = wavio.read_wav(tmp_path / "o.wav")
        assert np.abs(d).max() > 1e-4
