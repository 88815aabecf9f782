"""df32 FFT (ops/dfft.py) accuracy vs the f64 FFT it stands in for."""

import numpy as np
import pytest

import jax.numpy as jnp

from cpp_audio_tpu.ops import df32, dfft, stft as stft_ops


def _to64(pair):
    return df32.to_f64(pair)


@pytest.mark.parametrize("n", [8, 64, 1024])
def test_complex_fft_matches_f64(n):
    rng = np.random.default_rng(7)
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    Xr, Xi = dfft.fft_df32(df32.df(xr), df32.df(xi))
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    got = _to64(Xr) + 1j * _to64(Xi)
    err = np.abs(got - ref)
    assert err.max() <= 1e-11 * np.abs(ref).max()


@pytest.mark.parametrize("n", [16, 4096, 16384])
def test_rfft_matches_f64(n):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    Xr, Xi = dfft.rfft_df32(df32.df(x))
    ref = np.fft.rfft(x.astype(np.float64))
    got = _to64(Xr) + 1j * _to64(Xi)
    err = np.abs(got - ref)
    assert err.max() <= 1e-11 * np.abs(ref).max()
    assert got.shape[-1] == n // 2 + 1


def test_rfft_batched():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 256)).astype(np.float32)
    Xr, Xi = dfft.rfft_df32(df32.df(x))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    got = _to64(Xr) + 1j * _to64(Xi)
    assert np.abs(got - ref).max() <= 1e-11 * np.abs(ref).max()


def test_stft_sqmag_df32_matches_f64_pipeline():
    """The df32 STFT tracks ops/stft._stft_sqmag at f64 to ~1e-12 relative —
    the precision that keeps QIFFT frequency noise below the -80 dB budget
    (tools/fidelity_budget.py)."""
    sr = 44100
    n = sr // 2
    t = np.arange(n) / sr
    sig64 = np.zeros(n)
    rng = np.random.default_rng(11)
    for f, a in [(220.3, 0.4), (440.0, 0.3), (1234.5, 0.2), (3999.9, 0.1)]:
        sig64 += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig32 = sig64.astype(np.float32)

    window_size, stride = 8000, 3969
    window = stft_ops.gaussian_window(window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(window_size)

    # host f64 reference of the SAME f32 samples
    ref = np.asarray(stft_ops._stft_sqmag(
        jnp.asarray(sig32, jnp.float64), jnp.asarray(window, jnp.float64),
        window_size=window_size, stride=stride, fft_length=fft_len,
        use_matmul_dft=False))

    sq = dfft.stft_sqmag_df32(jnp.asarray(sig32), window,
                              window_size=window_size, stride=stride,
                              fft_length=fft_len)
    got = _to64(sq)
    assert got.shape == ref.shape
    peak = ref.max()
    # absolute error relative to the frame peak: every bin above -240 dB of
    # the peak carries df32-grade accuracy
    assert np.abs(got - ref).max() <= 1e-11 * peak
    # and peak bins specifically are ~1e-12 relative
    pk = ref > 1e-3 * peak
    assert (np.abs(got - ref)[pk] / ref[pk]).max() <= 1e-10
