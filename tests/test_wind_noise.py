"""Noise tables and WIND mode tests."""

import numpy as np
import pytest

from cpp_audio_tpu.models import wind
from cpp_audio_tpu.models import voice_presets as vp
from cpp_audio_tpu.ops import noise


class TestNoiseTables:
    def test_white_normalized(self):
        w = noise.white_noise_table(10000)
        assert np.max(np.abs(w)) == pytest.approx(1.0)
        assert abs(np.mean(w)) < 0.05

    def test_atom_is_plus_minus_one(self):
        a = noise.atom_noise_table(1000)
        assert set(np.unique(a)) == {-1.0, 1.0}

    def test_pink_spectrum_slope(self):
        sr = 44100
        p = noise.pink_noise_table(1 << 17, sr)
        spec = np.abs(np.fft.rfft(p)) ** 2
        freqs = np.fft.rfftfreq(len(p), 1 / sr)
        # average power in octave bands: pink noise has equal energy per
        # octave, i.e. power density ~1/f
        def band_power(f0):
            sel = (freqs >= f0) & (freqs < 2 * f0)
            return spec[sel].mean() * f0

        p100, p800, p3200 = band_power(100), band_power(800), band_power(3200)
        # f * PSD should be roughly flat across octaves (within ~4x)
        assert 0.25 < p800 / p100 < 4.0
        assert 0.25 < p3200 / p800 < 4.0

    def test_grey_attenuates_sensitive_band(self):
        sr = 44100
        g = noise.grey_noise_table(1 << 16, sr)
        p = noise.pink_noise_table(1 << 16, sr)
        def band(x, f0, f1):
            s = np.abs(np.fft.rfft(x)) ** 2
            fr = np.fft.rfftfreq(len(x), 1 / sr)
            return s[(fr >= f0) & (fr < f1)].mean()
        # equal-loudness filter cuts the 2-5k sensitive band relative to lows
        ratio_grey = band(g, 2000, 5000) / band(g, 50, 200)
        ratio_pink = band(p, 2000, 5000) / band(p, 50, 200)
        assert ratio_grey < ratio_pink * 0.2

    def test_tables_cached(self):
        t1 = noise.get_noise_tables(44100)
        t2 = noise.get_noise_tables(44100)
        assert t1 is t2
        assert len(t1["white"]) == int(44100 / 0.05)


class TestWind:
    def test_medium_wind_renders(self):
        p = vp.get_program(vp.Mode.WIND, "Medium wind in trees")
        out = wind.render_program(p, 16384, seed=3, dtype="float64")
        assert out.shape == (16384, 2)
        assert np.all(np.isfinite(out))
        assert np.max(np.abs(out)) > 1e-4

    def test_sine_wind_is_tonal(self):
        p = vp.get_program(vp.Mode.WIND, "Kettle whistle pure")
        out = wind.render_program(p, 44100, seed=3, pan=0.0, dtype="float64")
        mono = out.sum(axis=1)[22050:]
        spec = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
        freqs = np.fft.rfftfreq(len(mono), 1 / 44100)
        peak_f = freqs[np.argmax(spec)]
        # centers 7.5..7.7 octaves -> 10*2^7.5..10*2^7.7 = 1810..2080 Hz
        assert 1500 < peak_f < 2500
        # tonal: peak dominates the spectrum
        assert spec.max() > 20 * np.median(spec)

    def test_heavy_rain_order13(self):
        p = vp.get_program(vp.Mode.WIND, "Heavy rain")
        out = wind.render_program(p, 8192, seed=5, dtype="float64")
        assert np.all(np.isfinite(out))
        assert np.max(np.abs(out)) > 1e-5

    def test_determinism(self):
        p = vp.get_program(vp.Mode.WIND, "Steady wind")
        o1 = wind.render_program(p, 8192, seed=9, pan=0.0, dtype="float64")
        o2 = wind.render_program(p, 8192, seed=9, pan=0.0, dtype="float64")
        np.testing.assert_array_equal(o1, o2)

    def test_bandpass_program_is_bandlimited(self):
        # Steady wind: BP center ~ octave 5.2-5.5 -> 370-450 Hz, width 1.3 oct
        p = vp.get_program(vp.Mode.WIND, "Steady wind")
        out = wind.render_program(p, 44100, seed=11, pan=0.0, dtype="float64")
        mono = out.sum(axis=1)[10000:]
        spec = np.abs(np.fft.rfft(mono)) ** 2
        freqs = np.fft.rfftfreq(len(mono), 1 / 44100)
        in_band = spec[(freqs > 100) & (freqs < 2000)].mean()
        out_band = spec[(freqs > 8000) & (freqs < 16000)].mean()
        assert in_band > 10 * out_band

    def test_lowpass_mode_reference_defaults(self):
        """soundengine.h:217's LowPass member never receives a cutoff in the
        reference; lowpass_mode offers the two plausible defaults of the
        absent cpp.algorithms Filter (mute / bypass) next to the divergent
        musical default (control)."""
        import dataclasses

        # every factory preset keeps pink_lp_gain at the reference's
        # make_common default 0 (the member is inaudible either way);
        # raise it to make the mode choice observable
        p = dataclasses.replace(
            vp.get_program(vp.Mode.WIND, "Steady wind"), pink_lp_gain=1.0)
        kw = dict(seed=13, pan=0.0, dtype="float64")
        ctl = wind.render_program(p, 8192, **kw)
        mute = wind.render_program(p, 8192, lowpass_mode="mute", **kw)
        byp = wind.render_program(p, 8192, lowpass_mode="bypass", **kw)
        for o in (ctl, mute, byp):
            assert np.all(np.isfinite(o))
        # same noise walk, different LP member handling
        assert not np.array_equal(ctl, mute)
        assert not np.array_equal(mute, byp)
        # mute drops the LP contribution entirely: ctl - mute is the LP leg
        lp_leg = ctl - mute
        assert np.max(np.abs(lp_leg)) > 0


class TestDeviceControlExpansion:
    """device_controls=True expands the control walks ON DEVICE from
    per-segment tables (wind.wind_long_walk_segments ->
    wind._expand_long_walk_dev) instead of shipping audio-rate arrays.
    The expansion must reproduce the host walk exactly."""

    def test_walk_expansion_matches_host_exactly(self):
        import jax.numpy as jnp

        tables = wind.get_noise_tables(44100)
        pink = np.asarray(tables["pink"], np.float32)
        for n_steps, itp, T in ((12, 0, 60000), (997, 8, 60000)):
            host = wind.wind_long_walk(pink, 1234, n_steps, itp, T,
                                       prev0=0.37)
            seg = wind.wind_long_walk_segments(pink, 1234, n_steps, T,
                                               prev0=0.37)
            dev = np.asarray(wind._expand_long_walk_dev(
                jnp.asarray(seg[0]), jnp.asarray(seg[1]),
                jnp.asarray(seg[2]), jnp.asarray(seg[3]),
                n_steps=n_steps, itp_code=itp, T=T))
            np.testing.assert_array_equal(dev, host)

    def test_render_device_controls_parity(self):
        p = vp.get_program(vp.Mode.WIND, "Heavy rain")
        a = wind.render_program(p, 24000, seed=5)
        b = wind.render_program(p, 24000, seed=5, device_controls=True)
        ref = max(float(np.sqrt((a ** 2).mean())), 1e-12)
        err = float(np.sqrt(((a - b) ** 2).mean())) / ref
        assert err < 1e-5, f"device-controls render diverges: {err:.2e}"
