"""ops/dft.py matmul-DFT must match jnp.fft to f32-faithful accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpp_audio_tpu.ops import dft, stft


@pytest.mark.parametrize("m,fft_len", [(100, 128), (512, 512), (8001, 8192)])
def test_rfft_matmul_matches_fft(m, fft_len):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((7, m)), jnp.float32)
    re, im = dft.rfft_matmul(x, fft_len)
    ref = np.fft.rfft(np.asarray(x, np.float64), n=fft_len)
    scale = np.maximum(np.abs(ref), 1.0)
    np.testing.assert_allclose(np.asarray(re) / scale, ref.real / scale, atol=2e-4)
    np.testing.assert_allclose(np.asarray(im) / scale, ref.imag / scale, atol=2e-4)


@pytest.mark.parametrize("fft_len,out_len", [(128, 128), (512, 70), (1024, 1024)])
def test_irfft_matmul_roundtrip(fft_len, out_len):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, fft_len))
    spec = np.fft.rfft(x)
    y = dft.irfft_matmul(jnp.asarray(spec.real, jnp.float32),
                         jnp.asarray(spec.imag, jnp.float32),
                         fft_len, out_len=out_len)
    np.testing.assert_allclose(np.asarray(y), x[:, :out_len], atol=1e-4)


def test_stft_sqmag_matmul_path_matches_fft_path():
    rng = np.random.default_rng(2)
    sr = 44100
    sig = rng.standard_normal(sr // 2).astype(np.float32)
    window = stft.gaussian_window(8000, 4.0)
    a = np.asarray(stft.stft_sqmag(sig, window, 3969, use_matmul_dft=False))
    b = np.asarray(stft.stft_sqmag(sig, window, 3969, use_matmul_dft=True))
    # compare in dB where the spectrum is above the f32 noise floor
    mask = a > 1e-10
    np.testing.assert_allclose(10 * np.log10(b[mask]), 10 * np.log10(a[mask]),
                               atol=0.01)


def test_carrier_vocode_matmul_path_matches_fft_path():
    from cpp_audio_tpu.analysis import vocoder

    rng = np.random.default_rng(3)
    sr = 44100
    n = sr // 2
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr)).astype(np.float32)
    vp = vocoder.VocoderParams(sample_rate=sr)
    S = vp.stride
    car_fft = stft.fft_length_for(2 * S)
    bm = vocoder._band_matrix(vp.band_freqs(), car_fft // 2 + 1, sr / car_fft)
    n_frames = max(0, (n - 2 * S) // S + 1)
    amps = jnp.asarray(rng.uniform(0.1, 1.0, (n_frames, 5)), jnp.float32)
    a = vocoder._carrier_vocode(jnp.asarray(carrier), amps, jnp.asarray(bm, jnp.float32),
                                stride=S, fft_len=car_fft, use_matmul_dft=False)
    b = vocoder._carrier_vocode(jnp.asarray(carrier), amps, jnp.asarray(bm, jnp.float32),
                                stride=S, fft_len=car_fft, use_matmul_dft=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
