"""Harmonics synth (config 2), preset parsing, FIR design tests."""

import numpy as np
import pytest

from cpp_audio_tpu.core import events, voices
from cpp_audio_tpu.models import harmonics
from cpp_audio_tpu.ops import envelopes, fir
from cpp_audio_tpu.utils import loudness, presets, wav
from cpp_audio_tpu.utils.interp import Itp

SYNTH_DIR = "/root/reference/synth"


class TestPresetParsing:
    def test_envelope_fast(self):
        a = presets.parse_envelope_file(f"{SYNTH_DIR}/EnvelopeFast.txt", 44100)
        # A=1 dot=10ms=441, H=10ms, D=2 dots=20ms, S=4 dots=0.4, R=4 dots
        assert a.attack == 441
        assert a.hold == 441
        assert a.decay == 882
        assert a.release == 1764
        assert a.sustain == pytest.approx(0.4)
        assert a.attack_itp == int(Itp.EASE_OUT_CUBIC)
        assert a.decay_itp == int(Itp.LINEAR)

    def test_envelope_zero(self):
        a = presets.parse_envelope_file(f"{SYNTH_DIR}/EnvelopeZero.txt", 44100)
        assert a.attack == 0 and a.sustain == 0.0

    def test_harmonics_file(self):
        vols = presets.parse_harmonics_file(f"{SYNTH_DIR}/Harmonics.txt")
        # lines: 5,2,0,2,0,1,0,3 dots -> normalized by 5
        np.testing.assert_allclose(vols, np.array([5, 2, 0, 2, 0, 1, 0, 3]) / 5.0)

    def test_lowpass_file(self):
        assert presets.parse_lowpass_file(f"{SYNTH_DIR}/LowPass.txt") == 800.0


def one_note_schedule(freq=220.0, release=30000):
    return voices.schedule_from_notes(
        [events.Note(1, 0, release, freq, 1.0, 0.0)], pad_to=1
    )


class TestHarmonicsSynth:
    def _cfg(self, **kw):
        kw.setdefault(
            "ahdsr", envelopes.AHDSR(attack=441, hold=0, decay=441, release=4410, sustain=0.8)
        )
        kw.setdefault("dtype", "float64")
        return harmonics.HarmonicsSynthConfig(sample_rate=44100, **kw)

    def test_harmonic_spectrum(self):
        cfg = self._cfg(harmonic_volumes=(1.0, 0.5, 0.25))
        out = harmonics.render_schedule(one_note_schedule(220.0), 44100, cfg)
        seg = out[8192 : 8192 + 16384, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        freqs = np.fft.rfftfreq(len(seg), 1 / 44100)

        def level(f):
            # band RSS instead of bin max: insensitive to FFT scalloping
            b = int(round(f * len(seg) / 44100))
            return np.sqrt(np.sum(spec[b - 4 : b + 5] ** 2))

        l1, l2, l3 = level(220.0), level(440.0), level(660.0)
        assert l2 / l1 == pytest.approx(0.5, rel=0.05)
        assert l3 / l1 == pytest.approx(0.25, rel=0.05)
        # harmonic 4 absent
        assert level(880.0) < l1 * 0.01

    def test_trailing_silent_harmonics_trimmed(self):
        cfg = self._cfg(harmonic_volumes=(1.0, 0.0, 0.5, 0.0, 0.0))
        sch = one_note_schedule()
        bank = harmonics.bank_from_schedule(sch, cfg)
        assert bank.n_rows == 3  # trailing zeros dropped (audioelement.h:507-521)

    def test_lowpass_attenuates_highs(self):
        cfg_lp = self._cfg(harmonic_volumes=(1.0, 1.0, 1.0, 1.0), lowpass_freq=300.0)
        cfg_raw = self._cfg(harmonic_volumes=(1.0, 1.0, 1.0, 1.0))
        sch = one_note_schedule(300.0)
        o_lp = harmonics.render_schedule(sch, 30000, cfg_lp)
        o_raw = harmonics.render_schedule(sch, 30000, cfg_raw)
        seg_lp, seg_raw = o_lp[8192:24576, 0], o_raw[8192:24576, 0]

        def level(seg, f):
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            b = int(round(f * len(seg) / 44100))
            return spec[b - 3 : b + 4].max()

        # 4th harmonic (1200 Hz, 2 octaves above 300 Hz cutoff) attenuated much
        # more than the fundamental
        att_fund = level(seg_lp, 300.0) / level(seg_raw, 300.0)
        att_h4 = level(seg_lp, 1200.0) / level(seg_raw, 1200.0)
        assert att_h4 < att_fund * 0.25

    def test_phase_offsets_applied(self):
        # two harmonics at equal volume with the 2nd phase-shifted: outputs differ
        cfg0 = self._cfg(harmonic_volumes=(1.0, 1.0))
        cfg1 = self._cfg(harmonic_volumes=(1.0, 1.0), harmonic_phases=(0.0, 1.0))
        o0 = harmonics.render_schedule(one_note_schedule(), 20000, cfg0)
        o1 = harmonics.render_schedule(one_note_schedule(), 20000, cfg1)
        assert np.max(np.abs(o0 - o1)) > 1e-3

    def test_tune_preset_end_to_end(self, tmp_path):
        sr = 44100
        ah = presets.parse_envelope_file(f"{SYNTH_DIR}/EnvelopeFast.txt", sr)
        vols = presets.parse_harmonics_file(f"{SYNTH_DIR}/Harmonics.txt")
        lp = presets.parse_lowpass_file(f"{SYNTH_DIR}/LowPass.txt")
        cfg = harmonics.HarmonicsSynthConfig(
            sample_rate=sr, ahdsr=ah, harmonic_volumes=tuple(vols), lowpass_freq=lp
        )
        out = harmonics.render_schedule(one_note_schedule(261.63), sr, cfg)
        assert np.all(np.isfinite(out))
        assert np.max(np.abs(out)) > 1e-3
        p = tmp_path / "h.wav"
        wav.write_wav(p, out, sr)
        assert p.exists()


class TestFirDesign:
    def test_freq_sampling_matches_target(self):
        sr = 44100
        h = fir.loudness_fir_coefficients(sr, 8192, 4095)
        H = np.abs(np.fft.rfft(h, 16384))
        freqs = np.fft.rfftfreq(16384, 1 / sr)
        for f in [100.0, 500.0, 1000.0, 5000.0]:
            target = float(loudness.equal_loudness_volume_from_freq(f))
            got = H[np.argmin(np.abs(freqs - f))]
            # low frequencies carry steep curve detail; the FIR smooths them
            assert got == pytest.approx(target, rel=0.15, abs=0.005), f

    def test_firls_flat_design(self):
        # flat target -> near-delta filter
        h = fir.firls(101, [0.0, 1.0], [1.0, 1.0])
        H = np.abs(np.fft.rfft(h, 1024))
        np.testing.assert_allclose(H, 1.0, atol=0.01)

    def test_firls_loudness(self):
        sr = 44100
        h = fir.loudness_fir_firls(sr, 2 * 15 * 15 + 1)  # length 451 like i=15
        assert len(h) == 451
        # linear phase (symmetric)
        np.testing.assert_allclose(h, h[::-1], atol=1e-12)

    def test_fft_convolve_latency_trim(self):
        import jax.numpy as jnp

        x = np.zeros(64)
        x[10] = 1.0
        h = np.zeros(9)
        h[4] = 1.0  # pure delay of 4 = latency of linear-phase length-9
        y = np.asarray(fir.fft_convolve(jnp.asarray(x), jnp.asarray(h), trim_latency=True))
        np.testing.assert_allclose(y, x, atol=1e-12)
