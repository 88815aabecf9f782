"""Hybrid df32 analysis (ops/dfft_hybrid.py): f32 peak selection + factored
direct-DFT df32 re-evaluation of the selected bins.

Accuracy contract (module docstring budget, validated here at small shapes):
  - DFT values at selected bins match the f64 DFT to ~1e-6 relative on
    coherent (peak-neighborhood) bins; the absolute error floor is
    ~2^-24 * ||windowed frame|| (the f32 MXU accumulator), so noise-floor
    bins carry larger RELATIVE error — the selection-churn semantics are
    documented in docs/FIDELITY.md.
  - Peak SELECTION equals the f32 pipeline's (ops/stft._top_peaks) exactly.
  - QIFFT freq/mag of peaks above -60 dB match the host f64 pipeline to
    ~1e-4 Hz / ~1e-2 dB (measured on the bench workload: <= 3e-5 Hz and
    2e-3 dB above -40 dB; the bound here is looser for the small test FFT).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpp_audio_tpu.ops import df32, dfft_hybrid, stft as stft_ops


def _df_pair(x64):
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


class TestDftBins:
    def test_matches_f64_dft_at_selected_bins(self):
        rng = np.random.default_rng(0)
        N, W, F = 512, 480, 3
        sig = np.zeros((F, W))
        t = np.arange(W)
        for f in range(F):
            sig[f] = (0.7 * np.sin(2 * np.pi * (40.25 + f) * t / N + 0.3)
                      + 0.2 * np.sin(2 * np.pi * 97.6 * t / N)
                      + 1e-4 * rng.standard_normal(W))
        sig32 = sig.astype(np.float32)
        fw = (jnp.asarray(sig32), jnp.zeros((F, W), jnp.float32))
        bins = np.stack([np.array([39, 40, 41, 97, 98, 99, 0, N // 2])
                         for _ in range(F)])
        xre, xim = dfft_hybrid.dft_bins_df(
            fw, jnp.asarray(bins, jnp.int32), N=N)
        got = df32.to_f64(xre) + 1j * df32.to_f64(xim)

        ref = np.stack([
            np.fft.rfft(sig32[f].astype(np.float64), n=N)[bins[f]]
            for f in range(F)])
        scale = np.sqrt(np.mean(np.abs(sig32.astype(np.float64)) ** 2)) * W
        err = np.abs(got - ref)
        # absolute floor: a few ulps of the signal norm
        assert err.max() < 1e-6 * scale
        # coherent (strong) bins: tight relative accuracy
        strong = np.abs(ref) > 0.05 * np.abs(ref).max()
        rel = (err / np.abs(ref))[strong]
        assert rel.max() < 3e-6

    def test_various_chunk_geometries(self):
        # N < CH, N == CH, N > CH with W < N
        rng = np.random.default_rng(1)
        for N, W in [(64, 64), (128, 100), (256, 200), (1024, 1000)]:
            sig32 = rng.standard_normal((2, W)).astype(np.float32) * 0.3
            fw = (jnp.asarray(sig32), jnp.zeros((2, W), jnp.float32))
            bins = np.stack([[0, 1, N // 4, N // 2 - 1, N // 2]] * 2)
            xre, xim = dfft_hybrid.dft_bins_df(
                fw, jnp.asarray(bins, jnp.int32), N=N)
            got = df32.to_f64(xre) + 1j * df32.to_f64(xim)
            ref = np.stack([
                np.fft.rfft(sig32[f].astype(np.float64), n=N)[bins[f]]
                for f in range(2)])
            scale = np.abs(sig32).sum()
            assert np.abs(got - ref).max() < 1e-6 * scale, (N, W)


class TestHybridPeaks:
    sr = 8000
    W = 480
    N = 512
    stride = 160
    k = 8

    def _setup(self, seed=0):
        rng = np.random.default_rng(seed)
        n = self.sr // 2
        t = np.arange(n) / self.sr
        sig = (0.5 * np.sin(2 * np.pi * 620.3 * t + 0.2)
               + 0.25 * np.sin(2 * np.pi * 1533.7 * t + 1.0)
               + 1e-5 * rng.standard_normal(n))
        sig32 = sig.astype(np.float32)
        window = stft_ops.gaussian_window(self.W, sigmas=4.0)
        w64 = np.asarray(window, np.float64)
        scale64 = (2.0 / float(np.sum(w64))) ** 2
        whi, wlo = _df_pair(w64)
        shi, slo = _df_pair(scale64)
        return sig32, w64, scale64, (whi, wlo, shi, slo)

    def _run_hybrid(self, sig32, planes):
        whi, wlo, shi, slo = planes
        fh, fl, mh, ml = dfft_hybrid.hybrid_peaks_df32(
            jnp.asarray(sig32), whi, wlo, shi, slo, window_size=self.W,
            stride=self.stride, fft_length=self.N, sample_rate=self.sr,
            k=self.k)
        return (np.asarray(fh, np.float64) + np.asarray(fl),
                np.asarray(mh, np.float64) + np.asarray(ml))

    def test_selection_matches_f32_pipeline(self):
        sig32, w64, scale64, planes = self._setup()
        freq, mag = self._run_hybrid(sig32, planes)
        f32f, f32m = stft_ops.extract_top_peaks(
            stft_ops.stft_sqmag(sig32, w64.astype(np.float32), self.stride,
                                use_matmul_dft=False),
            self.sr, self.N, k=self.k)
        f32f = np.asarray(f32f, np.float64)
        f32m = np.asarray(f32m, np.float64)
        binw = self.sr / self.N
        fin_h = np.isfinite(mag)
        fin_f = np.isfinite(f32m)
        assert (fin_h == fin_f).all()
        # identical selected bins, in the same (frequency) order
        np.testing.assert_array_equal(
            np.where(fin_h, np.rint(freq / binw), -1),
            np.where(fin_f, np.rint(f32f / binw), -1))

    def test_strong_peaks_match_host_f64(self):
        sig32, w64, scale64, planes = self._setup()
        freq, mag = self._run_hybrid(sig32, planes)
        n = len(sig32)
        n_frames = (n - self.W) // self.stride + 1
        binw = self.sr / self.N
        checked = 0
        for f in range(n_frames):
            fr64 = sig32[f * self.stride:f * self.stride + self.W].astype(
                np.float64) * w64
            sq64 = np.abs(np.fft.rfft(fr64, n=self.N)) ** 2 * scale64
            db = 10 * np.log10(np.maximum(sq64, 1e-30))
            for j in range(self.k):
                if not np.isfinite(mag[f, j]) or mag[f, j] < -60.0:
                    continue
                b = int(np.rint(freq[f, j] / binw))
                if b in (0, self.N // 2):
                    # edge bins: the -600 dB QIFFT sentinel inflates
                    # noise-floor mags above the -60 dB gate; their values
                    # are noise-floor-grade (churn semantics, FIDELITY.md)
                    continue
                p = db[b - 1] if b > 0 else -600.0
                c = db[b]
                nx = db[b + 1] if b < self.N // 2 else -600.0
                den = p - 2 * c + nx
                d = 0.5 * (p - nx) / den if abs(den) > 1e-12 else 0.0
                d = float(np.clip(d, -0.5, 0.5))
                assert abs(freq[f, j] - (b + d) * binw) < 2e-4
                assert abs(mag[f, j] - (c - 0.25 * (p - nx) * d)) < 2e-2
                checked += 1
        assert checked >= n_frames * 2  # both sines, every frame

    def test_all_padding_when_silent(self):
        planes = self._setup()[3]
        sig32 = np.zeros(self.sr // 2, np.float32)
        freq, mag = self._run_hybrid(sig32, planes)
        assert not np.isfinite(mag).any()


class TestChainIntegration:
    def test_fused_df_chain_hybrid_equals_standalone(self):
        """The fused chain's hybrid output equals calling hybrid_peaks_df32
        on the rendered mixdown directly (wiring check, tiny workload)."""
        from cpp_audio_tpu.analysis import chain as chain_mod
        from cpp_audio_tpu.analysis import resynth, vocoder
        from cpp_audio_tpu.models import sine_synth
        from cpp_audio_tpu.core import events, voices
        from cpp_audio_tpu.ops import envelopes

        sr = 44100
        n = sr // 2
        notes = [events.Note(0, 0, n // 2, 440.0, 0.5, 0.0),
                 events.Note(1, 100, n // 2, 660.0, 0.4, 0.2)]
        sch = voices.schedule_from_notes(notes, pad_to=2)
        cfg = sine_synth.SineSynthConfig(
            sample_rate=sr, ahdsr=envelopes.AHDSR(attack=441, hold=10,
                                                  decay=441, release=441,
                                                  sustain=0.7),
            block_size=1 << 13, dtype="float32")
        bank = sine_synth.bank_from_schedule(sch, cfg)
        rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                     dtype="df32")
        vparams = vocoder.VocoderParams(sample_rate=sr)
        carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))
        assert chain_mod.DF_ANALYSIS_MODE == "hybrid"
        freq, mag = chain_mod.df32_analysis_peaks(
            bank, n, rcfg, vparams, carrier, block_size=cfg.block_size)
        fin = np.isfinite(mag)
        assert fin.any()
        # the strongest peak of each frame sits at one of the synth notes
        strongest = np.take_along_axis(
            freq, np.nanargmax(np.where(fin, mag, -np.inf), 1)[:, None], 1)
        mid = strongest[2:-2, 0]
        assert (np.minimum(np.abs(mid - 440.0), np.abs(mid - 660.0)) < 2.0
                ).all()
