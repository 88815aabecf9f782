"""Tests for oscillators, envelopes, filters against per-sample reference emulations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpp_audio_tpu.ops import envelopes, filters, oscillators
from cpp_audio_tpu.utils.interp import Itp, ease


class TestOscillators:
    def test_phase_trajectory_wraps(self):
        incs = jnp.full((1, 100), 0.3)
        ph, final = oscillators.phase_trajectory(jnp.array([1.9]), incs)
        ph = np.asarray(ph)
        assert np.all(ph >= 0) and np.all(ph < 2)
        # step semantics: first phase is 1.9 + 0.3 wrapped
        assert ph[0, 0] == pytest.approx(0.2, abs=1e-5)
        assert float(final[0]) == pytest.approx(ph[0, -1])

    def test_sine_purity(self):
        # constant-increment sine must be spectrally pure; use a 4-term
        # Blackman-Harris window (-92 dB sidelobes) so the window itself
        # doesn't mask the -80 dB criterion
        sr, f, n = 44100, 441.0, 8192
        inc = 2 * f / sr
        ph = oscillators.phase_trajectory_const(0.0, inc, n, dtype=jnp.float64)
        sig = np.asarray(oscillators.sine(ph))
        k = np.arange(n)
        w = (0.35875 - 0.48829 * np.cos(2 * np.pi * k / n)
             + 0.14128 * np.cos(4 * np.pi * k / n)
             - 0.01168 * np.cos(6 * np.pi * k / n))
        spec = np.abs(np.fft.rfft(sig * w))
        peak_bin = int(np.argmax(spec))
        assert abs(peak_bin - f * n / sr) <= 1
        others = spec.copy()
        others[max(0, peak_bin - 8) : peak_bin + 9] = 0
        assert 20 * np.log10(others.max() / spec[peak_bin]) < -80

    def test_cumsum_matches_const_path(self):
        inc = 0.01
        n = 1000
        incs = jnp.full((n,), inc, dtype=jnp.float64)
        ph1, _ = oscillators.phase_trajectory(0.0, incs)
        ph2 = oscillators.phase_trajectory_const(0.0, inc, n, dtype=jnp.float64)
        # compare circularly: at an exact wrap boundary one path may give 0,
        # the other 2-eps
        d = np.abs(np.asarray(ph1) - np.asarray(ph2))
        d = np.minimum(d, 2.0 - d)
        assert d.max() < 1e-9

    def test_waveforms_match_reference_pointwise(self):
        # reference piecewise definitions (sound.functions.h:86-138)
        ph = np.linspace(0, 2, 201)
        saw = np.asarray(oscillators.saw(jnp.array(ph)))
        np.testing.assert_allclose(saw, np.where(ph <= 1, ph, ph - 2), atol=1e-7)
        sq = np.asarray(oscillators.square(jnp.array(ph)))
        np.testing.assert_allclose(sq, np.where((ph > 0.5) & (ph < 1.5), -1, 1))
        tri = np.asarray(oscillators.triangle(jnp.array(ph)))
        expect = np.where(ph < 0.5, 2 * ph, np.where(ph < 1.5, 2 - 2 * ph, -4 + 2 * ph))
        np.testing.assert_allclose(tri, expect, atol=1e-6)

    def test_waveform_dc_free(self):
        n = 4000
        ph = oscillators.phase_trajectory_const(0.0, 2.0 / n * 50, n)  # 50 periods
        # 80 samples/period quantizes the square's duty cycle by 1 sample
        # (2/80 DC), so the honest bound is ~0.03
        for wf in [oscillators.saw, oscillators.square, oscillators.triangle]:
            assert abs(float(jnp.mean(wf(ph)))) < 0.03

    def test_pulse_train_dc_free(self):
        w = 0.3
        high, low = oscillators.pulse_train_levels(w)
        n = 10000
        ph = oscillators.phase_trajectory_const(0.0, 2.0 / 100.0, n)  # period 100
        sig = oscillators.pulse(ph, w, high, low)
        assert abs(float(jnp.mean(sig))) < 2e-2
        assert float(high - low) == pytest.approx(1.0)

    def test_aliasing_multiplicator(self):
        # reference audioelement.h:466-483
        f = oscillators.freq_aliasing_multiplicator
        assert float(f(0.0)) == 1.0
        assert float(f(2.0)) == 0.0  # Nyquist: hspp = 0.5 < 1
        assert float(f(0.25)) == 1.0  # hspp = 4
        assert float(f(0.5)) == pytest.approx(1.0 / 3.0)  # hspp = 2 -> (2-1)/3

    def test_mixdown_matches_loop(self):
        rng = np.random.default_rng(0)
        sig = rng.standard_normal((5, 64)).astype(np.float32)
        gains = rng.standard_normal((5, 2)).astype(np.float32)
        out = np.asarray(oscillators.mixdown(jnp.array(sig), jnp.array(gains)))
        expect = np.zeros((64, 2), np.float32)
        for v in range(5):
            for c in range(2):
                expect[:, c] += gains[v, c] * sig[v]
        np.testing.assert_allclose(out, expect, rtol=1e-5)


def reference_ahdsr_step(params, press, release, n, auto_release=False, min_change=0.0):
    """Direct per-sample emulation of EnvelopeCRT + AHDSREnvelopeBase."""
    A = max(max(params.attack, min_change), 1.0)
    H = max(params.hold, 0.0)
    has_decay = params.sustain < 0.999999
    S = min(max(params.sustain, 0.0), 1.0) if has_decay else 1.0
    D = max(max(params.decay, min_change), 1.0) if has_decay else 0.0
    R = max(max(params.release, min_change), 1.0)
    out = np.zeros(n)
    if release <= press:
        return out
    if auto_release:
        release = min(release, press + A + H + D)
    top = None
    for t in range(n):
        tp = t - press
        if tp < 0:
            continue
        if t < release:
            if tp < A:
                out[t] = ease(Itp(params.attack_itp), (tp + 1) / A)
            elif tp < A + H:
                out[t] = 1.0
            elif tp < A + H + D:
                out[t] = 1.0 + (S - 1.0) * ease(Itp(params.decay_itp), (tp - A - H + 1) / D)
            else:
                out[t] = S
        else:
            if top is None:
                top = out[t - 1] if t > 0 else 0.0
            k = t - release + 1
            if k < R:
                out[t] = top * (1.0 - ease(Itp(params.release_itp), k / R))
    return out


class TestEnvelopes:
    def _params(self, **kw):
        d = dict(
            attack=50, attack_itp=int(Itp.LINEAR), hold=10, decay=30,
            decay_itp=int(Itp.LINEAR), release=40, release_itp=int(Itp.LINEAR),
            sustain=0.6,
        )
        d.update(kw)
        return envelopes.AHDSR(**d)

    def test_matches_reference_emulation_linear(self):
        p = self._params()
        n = 300
        env = np.asarray(
            envelopes.ahdsr_envelope(jnp.arange(n), p, press=20, release=150)
        )
        ref = reference_ahdsr_step(p, 20, 150, n)
        np.testing.assert_allclose(env, ref, atol=1e-5)

    def test_matches_reference_eased(self):
        p = self._params(
            attack_itp=int(Itp.EASE_OUT_EXPO),
            decay_itp=int(Itp.EASE_IN_EXPO),
            release_itp=int(Itp.EASE_INOUT_CIRC),
            sustain=0.3,
        )
        n = 400
        env = np.asarray(envelopes.ahdsr_envelope(jnp.arange(n), p, press=0, release=200))
        ref = reference_ahdsr_step(p, 0, 200, n)
        np.testing.assert_allclose(env, ref, atol=1e-5)

    def test_release_during_attack(self):
        p = self._params(attack=100)
        n = 300
        env = np.asarray(envelopes.ahdsr_envelope(jnp.arange(n), p, press=0, release=50))
        ref = reference_ahdsr_step(p, 0, 50, n)
        np.testing.assert_allclose(env, ref, atol=1e-5)
        # top value is attack value at sample 49: ease(50/100)=0.5
        assert env[49] == pytest.approx(0.5, abs=1e-5)
        assert env[50] < 0.5

    def test_never_released_sustains(self):
        p = self._params()
        env = np.asarray(envelopes.ahdsr_envelope(jnp.arange(200), p, press=0))
        assert env[-1] == pytest.approx(0.6, abs=1e-5)

    def test_no_decay_when_sustain_is_one(self):
        p = self._params(sustain=1.0)
        env = np.asarray(envelopes.ahdsr_envelope(jnp.arange(200), p, press=0))
        assert env[100] == pytest.approx(1.0)

    def test_release_before_press_skips_note(self):
        p = self._params()
        env = np.asarray(envelopes.ahdsr_envelope(jnp.arange(100), p, press=50, release=50))
        np.testing.assert_array_equal(env, 0.0)

    def test_auto_release(self):
        p = self._params()
        n = 300
        env = np.asarray(
            envelopes.ahdsr_envelope(jnp.arange(n), p, press=0, auto_release=True)
        )
        ref = reference_ahdsr_step(p, 0, envelopes.NEVER, n, auto_release=True)
        np.testing.assert_allclose(env, ref, atol=1e-5)
        assert env[-1] == 0.0

    def test_min_change_extends_short_phases(self):
        p = self._params(attack=1, release=1)
        n = 500
        env = np.asarray(
            envelopes.ahdsr_envelope(jnp.arange(n), p, press=0, release=200, min_change=80.0)
        )
        ref = reference_ahdsr_step(p, 0, 200, n, min_change=80.0)
        np.testing.assert_allclose(env, ref, atol=1e-5)
        # attack takes 80 samples now
        assert env[40] == pytest.approx(ease(Itp.LINEAR, 41 / 80), abs=1e-5)

    def test_batched_voices(self):
        V = 8
        p = envelopes.AHDSR(
            attack=np.full((V, 1), 50.0), attack_itp=np.full((V, 1), int(Itp.LINEAR)),
            hold=np.full((V, 1), 0.0), decay=np.full((V, 1), 30.0),
            decay_itp=np.full((V, 1), int(Itp.LINEAR)), release=np.full((V, 1), 40.0),
            release_itp=np.full((V, 1), int(Itp.LINEAR)),
            sustain=np.linspace(0.1, 0.8, V).reshape(V, 1),
        )
        press = np.arange(V).reshape(V, 1) * 10.0
        release = press + 100.0
        env = np.asarray(envelopes.ahdsr_envelope(jnp.arange(400), p, press, release))
        assert env.shape == (V, 400)
        for v in range(V):
            sp = envelopes.AHDSR(50, int(Itp.LINEAR), 0, 30, int(Itp.LINEAR), 40,
                                 int(Itp.LINEAR), float(p.sustain[v, 0]))
            ref = reference_ahdsr_step(sp, int(press[v, 0]), int(release[v, 0]), 400)
            np.testing.assert_allclose(env[v], ref, atol=1e-5)


def reference_onepole(x, alpha, y0=0.0):
    y = np.empty_like(x)
    prev = y0
    a = np.broadcast_to(alpha, x.shape)
    for i in range(len(x)):
        prev = prev + a[i] * (x[i] - prev)
        y[i] = prev
    return y


class TestFilters:
    def test_linear_recurrence_matches_loop(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(257)
        y = np.asarray(filters.onepole_lowpass(jnp.array(x), 0.1, y0=0.5))
        ref = reference_onepole(x, 0.1, y0=0.5)
        np.testing.assert_allclose(y, ref, atol=1e-5)

    def test_time_varying_alpha(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(100)
        alpha = rng.uniform(0.01, 0.9, 100)
        y = np.asarray(filters.onepole_lowpass(jnp.array(x), jnp.array(alpha)))
        ref = reference_onepole(x, alpha)
        np.testing.assert_allclose(y, ref, atol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        y = np.asarray(filters.onepole_lowpass(jnp.array(x), 0.3))
        for v in range(4):
            np.testing.assert_allclose(y[v], reference_onepole(x[v], 0.3), atol=1e-5)

    @pytest.mark.parametrize("shape,axis", [((257,), -1), ((3, 1000), -1),
                                            ((100, 4), 0), ((5,), -1),
                                            ((2, 64), -1)])
    def test_chunked_affine_scan_exact(self, shape, axis):
        """chunked_affine_scan == the sequential recurrence (f64 exact up to
        one re-association per chunk boundary) at lengths spanning multiple
        recursion levels, non-multiple-of-chunk padding, and leading time
        axes."""
        rng = np.random.default_rng(7)
        a = rng.uniform(0.0, 1.0, shape)
        b = rng.standard_normal(shape)
        y = np.asarray(filters.chunked_affine_scan(
            jnp.array(a), jnp.array(b), y0=0.25, axis=axis, chunk=16))
        am = np.moveaxis(a, axis, -1).reshape(-1, shape[axis])
        bm = np.moveaxis(b, axis, -1).reshape(-1, shape[axis])
        ym = np.moveaxis(y, axis, -1).reshape(-1, shape[axis])
        for r in range(am.shape[0]):
            prev = 0.25
            for t in range(am.shape[1]):
                prev = am[r, t] * prev + bm[r, t]
                assert ym[r, t] == pytest.approx(prev, rel=1e-12, abs=1e-12)

    def test_chunked_affine_scan_matches_linear_recurrence(self):
        rng = np.random.default_rng(8)
        a = rng.uniform(0.0, 1.0, (4, 300))
        b = rng.standard_normal((4, 300))
        y1 = np.asarray(filters.linear_recurrence(jnp.array(a), jnp.array(b)))
        y2 = np.asarray(filters.chunked_affine_scan(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(y1, y2, atol=1e-10)

    def test_cascade_order(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(128)
        y = np.asarray(filters.cascade(jnp.array(x), 0.2, order=3))
        ref = x
        for _ in range(3):
            ref = reference_onepole(ref, 0.2)
        np.testing.assert_allclose(y, ref, atol=1e-5)

    def test_lowpass_magnitude_response(self):
        # -3 dB at analog-prototype cutoff for low cutoffs
        sr = 44100
        fc = 1000.0
        inc = 2 * fc / sr
        alpha = float(filters.alpha_from_angle_increment(inc))
        n = 1 << 15
        t = np.arange(n)
        for f, expect_db, tol in [(100.0, -0.04, 0.3), (1000.0, -3.0, 0.7), (8000.0, -18.3, 2.0)]:
            x = np.sin(2 * np.pi * f * t / sr)
            y = np.asarray(filters.onepole_lowpass(jnp.array(x, dtype=jnp.float64), alpha))
            # steady-state amplitude over the last half
            amp = np.sqrt(2 * np.mean(y[n // 2 :] ** 2))
            db = 20 * np.log10(amp / (1 / np.sqrt(2)) * (1 / np.sqrt(2)))
            assert db == pytest.approx(expect_db, abs=tol), f

    def test_highpass_complements(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(64)
        lp = np.asarray(filters.onepole_lowpass(jnp.array(x), 0.25))
        hp = np.asarray(filters.onepole_highpass(jnp.array(x), 0.25))
        np.testing.assert_allclose(lp + hp, x, atol=1e-6)

    def test_cascade_fft_matches_scan(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(512).astype(np.float32)
        for order in [1, 4, 20]:
            y_scan = np.asarray(filters.cascade(jnp.array(x), 0.15, order=order))
            y_fft = np.asarray(filters.cascade_fft(jnp.array(x), 0.15, order=order))
            np.testing.assert_allclose(y_fft, y_scan, atol=1e-3)

    def test_cascade_fft_highpass_matches_scan(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal(512).astype(np.float32)
        for order in [1, 3]:
            y_scan = np.asarray(filters.cascade(jnp.array(x), 0.2, order=order, kind="highpass"))
            y_fft = np.asarray(filters.cascade_fft(jnp.array(x), 0.2, order=order, kind="highpass"))
            np.testing.assert_allclose(y_fft, y_scan, atol=1e-3)

    def test_band_gain_compensation(self):
        # reference formula (1 + 1/w^2)^ORDER
        assert float(filters.band_gain_compensation(2.0, 3)) == pytest.approx(1.25**3)


class TestFastmath:
    def test_sinpi_accuracy(self):
        import numpy as np
        from cpp_audio_tpu.ops import fastmath

        x = np.linspace(-7.0, 7.0, 200001)
        got = np.asarray(fastmath.sinpi(x.astype(np.float32)))
        ref = np.sin(np.pi * x)
        # bound includes f32 quantization of x itself (pi * ulp(7) ~ 1.5e-6)
        assert np.max(np.abs(got - ref)) < 2e-6  # still ~ -114 dB

    def test_sinpi_principal_matches(self):
        import numpy as np
        from cpp_audio_tpu.ops import fastmath

        x = np.linspace(-1.0, 0.999999, 20001).astype(np.float32)
        a = np.asarray(fastmath.sinpi(x))
        b = np.asarray(fastmath.sinpi_principal(x))
        assert np.max(np.abs(a - b)) < 1e-7

    def test_cospi(self):
        import numpy as np
        from cpp_audio_tpu.ops import fastmath

        x = np.linspace(-2.0, 2.0, 20001).astype(np.float32)
        assert np.max(np.abs(np.asarray(fastmath.cospi(x))
                             - np.cos(np.pi * x))) < 2e-6


class TestRingModulation:
    """RingModulationAlgo (audioelement.h:3183-3271) as a named op."""

    def test_product_semantics(self):
        import numpy as np

        from cpp_audio_tpu.ops import oscillators as osc

        a = np.asarray([0.5, -1.0, 0.25])
        b = np.asarray([2.0, 0.5, -4.0])
        np.testing.assert_allclose(np.asarray(osc.ring_modulate(a, b)),
                                   [1.0, -0.5, -1.0])

    def test_two_sine_ring_mod_spectrum(self):
        """sin(f1) * sin(f2) has energy at f1-f2 and f1+f2, not at f1/f2."""
        import numpy as np

        from cpp_audio_tpu.ops import oscillators as osc

        sr = 44100
        n = 1 << 15
        f1, f2 = 1000.0, 150.0
        y = np.asarray(osc.ring_modulate_sines(
            2 * f1 / sr, 2 * f2 / sr, n, dtype=__import__("jax.numpy",
                                                          fromlist=["x"]).float64))
        spec = np.abs(np.fft.rfft(y * np.hanning(n)))
        freqs = np.fft.rfftfreq(n, 1 / sr)
        def amp_at(f):
            return spec[np.argmin(np.abs(freqs - f))]
        assert amp_at(f1 - f2) > 50 * amp_at(f1)
        assert amp_at(f1 + f2) > 50 * amp_at(f1)
