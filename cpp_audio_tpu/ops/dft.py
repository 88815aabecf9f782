"""Batched real DFTs as MXU matmuls.

XLA's TPU FFT underuses the hardware for *batched mid-size* transforms (a
(667, 8192) rfft measures ~35 ms on v5e — ~2% of HBM bandwidth — while the
equivalent two f32 matmuls run in ~1 ms on the MXU). For the STFT analysis
frames (thousands of windows of 2^9..2^13 points) and the vocoder's carrier
frames, a dense DFT-matrix matmul is the speed-of-light formulation:
FLOPs = B*N*(N/2+1)*4 land on the systolic array instead of a memory-bound
butterfly schedule. Single LARGE transforms (the whole-signal 2^22 rfft in
the vocoder's modulator) stay on jnp.fft.

Numerics: angles are computed as ((t*k) mod N) * (2*pi/N) with exact int32
products, so f32 cos/sin see arguments in [0, 2*pi) — no large-angle
catastrophic cancellation. Matmuls run at HIGHEST precision (f32-faithful on
TPU via bf16 multi-passing). Max observed error vs jnp.fft is ~1e-6 relative
— far below the -80 dB parity budget.

Used by ops/stft.py (analysis sqmag spectra) and analysis/vocoder.py (carrier
modulate + inverse). Reference scope: these stand in for the cpp.algorithms
fft::Algo_ forward/inverse used by PeriodicFFT and the vocoder
(source/rt.resynth.lib.periodicfft.cpp:184-244,
source/rt.resynth.lib.vocoder.cpp:414-475).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


def _dft_angles(m: int, fft_length: int, dtype) -> jnp.ndarray:
    """(m, nbins) angle matrix 2*pi*t*k/N, exact mod-N in int32."""
    nbins = fft_length // 2 + 1
    t = jnp.arange(m, dtype=jnp.int32)[:, None]
    k = jnp.arange(nbins, dtype=jnp.int32)[None, :]
    tk = (t * k) % np.int32(fft_length)
    return tk.astype(dtype) * np.dtype(dtype).type(2.0 * np.pi / fft_length)


def rfft_matmul(x, fft_length: int):
    """rfft of x (..., m) zero-padded to fft_length -> (re, im) (..., N/2+1).

    Matches jnp.fft.rfft(x, n=fft_length) (im sign convention e^{-i w t}).
    Only the first m rows of the DFT matrix are materialized — the zero pad
    contributes nothing.
    """
    m = x.shape[-1]
    ang = _dft_angles(m, fft_length, x.dtype)
    re = jnp.matmul(x, jnp.cos(ang), precision=_PREC)
    im = -jnp.matmul(x, jnp.sin(ang), precision=_PREC)
    return re, im


def rfft_sqmag_matmul(x, fft_length: int):
    """|rfft(x, fft_length)|^2 via two matmuls."""
    re, im = rfft_matmul(x, fft_length)
    return re * re + im * im


def irfft_matmul(re, im, fft_length: int, out_len: int | None = None):
    """Inverse of rfft_matmul: (re, im) (..., N/2+1) -> (..., out_len).

    Matches jnp.fft.irfft(re + 1j*im, n=fft_length)[..., :out_len].
    x[t] = (1/N) * sum_k w_k * (re_k cos(2 pi t k / N) - im_k sin(...)),
    w_0 = w_{N/2} = 1, else 2.
    """
    out_len = fft_length if out_len is None else out_len
    nbins = fft_length // 2 + 1
    ang = _dft_angles(out_len, fft_length, re.dtype)  # (out_len, nbins)
    w = jnp.full((nbins,), 2.0 / fft_length, re.dtype)
    w = w.at[0].set(1.0 / fft_length)
    if fft_length % 2 == 0:
        w = w.at[-1].set(1.0 / fft_length)
    cosm = jnp.cos(ang) * w[None, :]  # (out_len, nbins)
    sinm = jnp.sin(ang) * w[None, :]
    return (jnp.matmul(re, cosm.T, precision=_PREC)
            - jnp.matmul(im, sinm.T, precision=_PREC))
