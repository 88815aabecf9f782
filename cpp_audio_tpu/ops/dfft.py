"""df32 (double-float32) FFT: Stockham autosort radix-2 in compensated f32.

Why: the resynth pipeline's QIFFT peak refinement amplifies the f32 FFT's
relative bin noise ~1000x into per-frame frequency noise, which decorrelates
the rendered audio from the host f64 pipeline to ~-8 dB (measured in
tools/fidelity_budget.py); and a single flipped noise-floor peak decision
shifts the tracker's RNG draw counters, decorrelating everything after it.
TPUs have no f64 FFT, so the precise analysis path computes the STFT in df32
(hi, lo) f32 pairs (ops/df32.py): every butterfly is a handful of VPU
adds/muls, the result is within ~1e-12 relative of the f64 FFT, and every
downstream decision margin is covered.

Structure: the Stockham autosort formulation — per stage only slicing,
broadcast twiddle multiplies, and one concat (XLA-friendly: no bit-reversal
gather, which executes near-scalar on TPU). Real input uses the classic
half-length complex packing + untangle, so a 16384-point rfft runs 13
radix-2 stages on 8192 complex points.

The reference computes its analysis FFT in double on the CPU
(fft::Algo_ via source/rt.resynth.lib.periodicfft.cpp:252-325); this module
is the TPU-native equivalent of "analysis precision is double-grade".
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import df32


def _twiddle_np(L: int):
    """exp(-i*pi*l/L) for l in 0..L-1, as f64 (host)."""
    ang = -np.pi * np.arange(L, dtype=np.float64) / L
    return np.cos(ang), np.sin(ang)


def _df_consts(x64):
    hi = np.asarray(x64, np.float64).astype(np.float32)
    lo = (np.asarray(x64, np.float64) - hi.astype(np.float64)).astype(
        np.float32)
    return hi, lo


@functools.lru_cache(maxsize=None)
def _stage_twiddles(N: int):
    """Per-stage df32 twiddle tables for a size-N Stockham radix-2 FFT."""
    out = []
    L = 1
    while L < N:
        cr, ci = _twiddle_np(L)
        out.append((_df_consts(cr), _df_consts(ci)))
        L *= 2
    return out


def _cmul(ar, ai, br, bi):
    """Complex df32 multiply: (ar + i*ai) * (br + i*bi)."""
    rr = df32.sub(df32.mul(ar, br), df32.mul(ai, bi))
    ri = df32.add(df32.mul(ar, bi), df32.mul(ai, br))
    return rr, ri


def fft_df32(xr, xi):
    """Complex df32 FFT along the LAST axis (length must be a power of two).

    xr, xi: (hi, lo) pairs of equal-shape f32 arrays.
    Returns (Xr, Xi) df32 pairs, natural bin order.
    """
    N = xr[0].shape[-1]
    assert N & (N - 1) == 0, "fft_df32 needs a power-of-two length"
    batch = xr[0].shape[:-1]
    Xr = tuple(v.reshape(*batch, 1, N) for v in xr)
    Xi = tuple(v.reshape(*batch, 1, N) for v in xi)
    M = N
    L = 1
    tw = _stage_twiddles(N)
    si = 0
    while M > 1:
        M //= 2
        er = tuple(v[..., :, :M] for v in Xr)
        ei = tuple(v[..., :, :M] for v in Xi)
        orr = tuple(v[..., :, M:] for v in Xr)
        oi = tuple(v[..., :, M:] for v in Xi)
        (wr_hi, wr_lo), (wi_hi, wi_lo) = tw[si]
        si += 1
        if L == 1:
            tr, ti = orr, oi  # w == 1
        else:
            wr = (jnp.asarray(wr_hi)[:, None], jnp.asarray(wr_lo)[:, None])
            wi = (jnp.asarray(wi_hi)[:, None], jnp.asarray(wi_lo)[:, None])
            tr, ti = _cmul(orr, oi, wr, wi)
        ar = df32.add(er, tr)
        ai = df32.add(ei, ti)
        br = df32.sub(er, tr)
        bi = df32.sub(ei, ti)
        Xr = tuple(jnp.concatenate([a, b], axis=-2)
                   for a, b in zip(ar, br))
        Xi = tuple(jnp.concatenate([a, b], axis=-2)
                   for a, b in zip(ai, bi))
        L *= 2
    return (tuple(v[..., 0] for v in Xr), tuple(v[..., 0] for v in Xi))


@functools.lru_cache(maxsize=None)
def _untangle_twiddles(N: int):
    """exp(-2*pi*i*k/N) for k in 0..N/2, df32 (for the real-packing untangle)."""
    ang = -2.0 * np.pi * np.arange(N // 2 + 1, dtype=np.float64) / N
    return _df_consts(np.cos(ang)), _df_consts(np.sin(ang))


def rfft_df32(x):
    """Real-input df32 FFT -> positive-frequency bins 0..N/2.

    x: df32 pair (hi, lo) of shape (..., N), N a power of two >= 4.
    Returns (Xr, Xi) df32 pairs of shape (..., N/2 + 1).
    """
    xh, xl = x
    N = xh.shape[-1]
    h = N // 2
    # pack z = x[0::2] + i*x[1::2], half-length complex FFT
    zr = (xh[..., 0::2], xl[..., 0::2])
    zi = (xh[..., 1::2], xl[..., 1::2])
    Zr, Zi = fft_df32(zr, zi)
    # extend with Z[h] = Z[0]; reversed-conjugate partner Zc[k] = conj(Z[h-k])
    Zr = tuple(jnp.concatenate([v, v[..., :1]], axis=-1) for v in Zr)
    Zi = tuple(jnp.concatenate([v, v[..., :1]], axis=-1) for v in Zi)
    Zcr = tuple(v[..., ::-1] for v in Zr)
    Zci = tuple(-v[..., ::-1] for v in Zi)
    # X[k] = (Z + Zc)/2 + w_k * (Z - Zc)/(2i),  w_k = exp(-2*pi*i*k/N)
    Ar = df32.scale_pow2(df32.add(Zr, Zcr), np.float32(0.5))
    Ai = df32.scale_pow2(df32.add(Zi, Zci), np.float32(0.5))
    Dr = df32.sub(Zr, Zcr)
    Di = df32.sub(Zi, Zci)
    # (Dr + i*Di) / (2i) = Di/2 - i*Dr/2
    Br = df32.scale_pow2(Di, np.float32(0.5))
    Bi = df32.scale_pow2(Dr, np.float32(-0.5))
    (wr_hi, wr_lo), (wi_hi, wi_lo) = _untangle_twiddles(N)
    wr = (jnp.asarray(wr_hi), jnp.asarray(wr_lo))
    wi = (jnp.asarray(wi_hi), jnp.asarray(wi_lo))
    Tr, Ti = _cmul(Br, Bi, wr, wi)
    return df32.add(Ar, Tr), df32.add(Ai, Ti)


def stft_sqmag_df32_arrays(signal_f32, whi, wlo, shi, slo, *,
                           window_size: int, stride: int, fft_length: int):
    """Jit-friendly df32 STFT sqmag: window and sqmag scale arrive as df32
    ARRAY operands (hi, lo) so the whole computation can live inside a
    larger jitted program (the fused offline chain)."""
    from . import df32
    from . import stft as stft_ops

    n = signal_f32.shape[0]
    n_frames = max(0, (n - window_size) // stride + 1)
    frames = stft_ops.frame_signal(signal_f32, window_size, stride, n_frames)
    fw = df32.add(df32.two_prod(frames, whi[None, :]),
                  df32.two_prod(frames, wlo[None, :]))
    pad = fft_length - window_size
    if pad:
        fw = tuple(jnp.pad(v, ((0, 0), (0, pad))) for v in fw)
    Xr, Xi = rfft_df32(fw)
    sq = df32.add(df32.mul(Xr, Xr), df32.mul(Xi, Xi))
    return df32.mul(sq, (shi, slo))


def stft_sqmag_df32(signal_f32, window_f64, *, window_size: int, stride: int,
                    fft_length: int, scale_f64: float | None = None):
    """df32 squared-magnitude STFT of an f32 signal.

    The framing matches ops/stft._stft_sqmag (frame f covers
    [f*stride, f*stride + window_size)); the window and the unit-sine
    normalization scale are carried from their f64 values as df32 constants,
    so the result tracks the host f64 pipeline's sqmag to ~1e-12 relative.

    Returns a df32 pair of shape (n_frames, fft_length//2 + 1).
    """
    from . import stft as stft_ops

    n = signal_f32.shape[0]
    n_frames = max(0, (n - window_size) // stride + 1)
    frames = stft_ops.frame_signal(signal_f32, window_size, stride, n_frames)
    w64 = np.asarray(window_f64, np.float64)
    if scale_f64 is None:
        scale_f64 = 2.0 / float(np.sum(w64))
    whi, wlo = _df_consts(w64)
    # windowed frame in df32: f32 sample (exact) x df32 window
    fw = df32.add(df32.two_prod(frames, jnp.asarray(whi)[None, :]),
                  df32.two_prod(frames, jnp.asarray(wlo)[None, :]))
    pad = fft_length - window_size
    if pad:
        fw = tuple(jnp.pad(v, ((0, 0), (0, pad))) for v in fw)
    Xr, Xi = rfft_df32(fw)
    sq = df32.add(df32.mul(Xr, Xr), df32.mul(Xi, Xi))
    s_hi, s_lo = _df_consts(scale_f64 * scale_f64)
    return df32.mul(sq, (jnp.asarray(s_hi), jnp.asarray(s_lo)))
