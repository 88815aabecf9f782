"""df32 top-k peak extraction vs the f64 pipeline (ops/stft._top_peaks)."""

import numpy as np

import jax.numpy as jnp

from cpp_audio_tpu.ops import df32, dfft, stft as stft_ops


def _make_signal(n, sr, seed=0, voices=24):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = np.zeros(n)
    for _ in range(voices):
        f = rng.uniform(80.0, 8000.0)
        a = 10.0 ** rng.uniform(-3.0, 0.0)
        sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    return sig.astype(np.float32)


def test_df_peaks_match_f64_pipeline():
    sr = 44100
    n = sr * 2
    sig32 = _make_signal(n, sr)
    window_size, stride, k = 8000, 3969, 64
    window = stft_ops.gaussian_window(window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(window_size)

    # f64 reference pipeline on the SAME f32 samples
    sq64 = stft_ops._stft_sqmag(
        jnp.asarray(sig32, jnp.float64), jnp.asarray(window, jnp.float64),
        window_size=window_size, stride=stride, fft_length=fft_len,
        use_matmul_dft=False)
    f64_freq, f64_mag = stft_ops._top_peaks(sq64, sample_rate=sr,
                                            fft_length=fft_len, k=k)
    f64_freq = np.asarray(f64_freq)
    f64_mag = np.asarray(f64_mag)

    sq = dfft.stft_sqmag_df32(jnp.asarray(sig32), window,
                              window_size=window_size, stride=stride,
                              fft_length=fft_len)
    fh, fl, mh, ml = stft_ops._top_peaks_df(sq[0], sq[1], sample_rate=sr,
                                            fft_length=fft_len, k=k)
    freq = df32.to_f64((fh, fl))
    mag = df32.to_f64((mh, ml))

    v64 = np.isfinite(f64_mag)
    v = np.isfinite(np.asarray(mh))
    # identical selection sets (this is what protects the tracker's RNG
    # draw counters)
    assert np.array_equal(v, v64)
    df = np.abs(freq - f64_freq)
    dm = np.abs(mag - f64_mag)
    # loud peaks (the ones that render) agree to df32 grade
    loud = v & (f64_mag > -60.0)
    assert loud.sum() > 100
    assert df[loud].max() < 1e-9     # Hz
    assert dm[v].max() < 1e-7        # dB (all lanes)
    # noise-floor lanes may carry larger RAW freq error (the df32 FFT's
    # absolute error floor is ~1e-12 of the frame norm, and QIFFT divides
    # by the bin value) — but their render contribution is freq_err *
    # amplitude, which stays df32-grade uniformly:
    amp = 10.0 ** (np.where(v, f64_mag, -600.0) / 20.0)
    assert np.max(np.where(v, df * amp, 0.0)) < 1e-9
