"""Hybrid df32 analysis: f32 FFT peak selection + df32 re-evaluation of the
selected bins by a factored direct DFT on the MXU.

The full-ladder df32 FFT (ops/dfft.py) computes every one of the N/2 spectrum
bins in compensated double-f32 — ~10 GFLOP of VPU butterflies per 60 s
analysis, plus a double-width top-k sort. But the tracker only consumes the
top k=128 peaks per frame, and QIFFT refinement only reads each peak's 3-bin
neighborhood: ~384 of 4097 bins actually need double-grade precision. This
module selects peaks from the cheap f32 rfft spectrum (selection is
noise-floor churn either way — see docs/FIDELITY.md's same-peaks acceptance
methodology) and re-evaluates ONLY the selected bins' DFT values precisely.

The re-evaluation X[b] = sum_n fw[n] e^{-2pi i b n / N} is structured so that
every heavy operation is an MXU matmul and no per-lane transcendental or
df32 multiply is needed. With n = a*CH + n0 and b = (N/CH)*q + r:

    b*n mod N = (b*a*CH) + (N/CH)*q*n0 + r*n0       (mod N)

so the twiddle factors into three SMALL constant tables, all host-built from
f64 trig:

    OT[r, a]  = e^{-2pi i r a / (N/CH)}     (outer chunk twiddle)
    U [q, n0] = e^{-2pi i q n0 / CH}        (coarse inner twiddle)
    V [r, n0] = e^{-2pi i r n0 / N}         (fine inner twiddle)

Per selected bin the tables are row-selected by one-hot MATMULS (one-hot
width N/CH = 64 — selections stay exact at precision=HIGHEST and run on the
MXU; a plain gather of these rows executes near-scalar on TPU). The inner
twiddle is the elementwise complex product U*V, combined in PLAIN f32 (6
flops/lane) plus a separately-carried first-order residual dIn built from
the tables' df32 lo limbs — so twiddle values are df32-grade without any
190-flop df32 complex multiplies on the 32M-lane twiddle tensor.

Error budget (relative, on the selected bins' sqmag; bench shapes W=8000,
N=8192, CH=128):
  - twiddle product rounding (one f32 rounding per lane, random):  ~1e-7
  - matmul product rounding at HIGHEST (f32-faithful products):    ~1e-7
  - chunk accumulation (CH=128 inside the MXU's f32 accumulator,
    compensated across chunks by a df32 two_sum):                  ~5e-8
  - outer reduce over A=64 chunks (two-level pairwise f32 +
    separately-reduced correction term):                           ~2e-7
QIFFT amplifies sqmag noise by ~0.2 * 4.34/denom_dB bins; with the Gaussian
window's ~5.4 dB/bin^2 curvature, eps ~ 3e-7 keeps peak frequencies within
~1e-6 Hz of the host f64 pipeline — a 12 s render phase drift below -90 dB
(the BASELINE bar is -80 dB; tests/test_hybrid_df.py pins the agreement, the
bench fidelity row measures it end to end on hardware).

Reference scope: this realizes the same "analysis precision is double-grade"
contract as the ladder (the reference computes its analysis FFT in double on
the CPU, source/rt.resynth.lib.periodicfft.cpp:252-325) at a fraction of the
device cost.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import df32
from . import stft as stft_ops

_HI = jax.lax.Precision.HIGHEST

# "lean" (default) or "compensated" — see dft_bins_df
DEFAULT_VARIANT = os.environ.get("CPP_AUDIO_HYBRID_VARIANT", "lean")


def _df_planes(x64):
    """f64 -> (hi, lo) f32 numpy planes."""
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@functools.lru_cache(maxsize=None)
def _ct_tables(N: int, CH: int):
    """Host-built df32 twiddle tables for the factored direct DFT.

    Returns dict of numpy f32 planes:
      U  : (Q, CH)  e^{-2pi i q n0 / CH},   Q = N//2 // (N//CH) + 1
      V  : (R, CH)  e^{-2pi i r n0 / N},    R = N//CH
      OT : (R, A)   e^{-2pi i r a / A},     A = N//CH
    each as (re_hi, re_lo, im_hi, im_lo).
    """
    assert N % CH == 0 and N & (N - 1) == 0
    A = N // CH
    Q = (N // 2) // A + 1
    n0 = np.arange(CH, dtype=np.float64)

    def tab(rows, denom):
        ang = -2.0 * np.pi * np.outer(rows, n0) / denom
        re_h, re_l = _df_planes(np.cos(ang))
        im_h, im_l = _df_planes(np.sin(ang))
        return re_h, re_l, im_h, im_l

    U = tab(np.arange(Q, dtype=np.float64), CH)
    V = tab(np.arange(A, dtype=np.float64), N)
    a = np.arange(A, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(np.arange(A, dtype=np.float64), a) / A
    ot_re = _df_planes(np.cos(ang))
    ot_im = _df_planes(np.sin(ang))
    OT = (ot_re[0], ot_re[1], ot_im[0], ot_im[1])
    # plane-stacked variants: one selection einsum per TABLE (the one-hot
    # operand is read once; 2 planes ride as a trailing axis)
    stack = lambda t: (np.stack([t[0], t[2]], axis=-1),
                       np.stack([t[1], t[3]], axis=-1))
    return {"U": U, "V": V, "OT": OT, "A": A, "Q": Q,
            "Uh": stack(U)[0], "Ul": stack(U)[1],
            "Vh": stack(V)[0], "Vl": stack(V)[1],
            "OTh": stack(OT)[0], "OTl": stack(OT)[1]}


def _onehot(idx, width):
    return (idx[..., None] == jnp.arange(width, dtype=idx.dtype)
            ).astype(jnp.float32)


def _pair_reduce(x):
    """Sum over the last axis with a two-level pairwise split: bounds the
    worst-case f32 accumulation error at ~eps*sqrt(A) instead of eps*A."""
    n = x.shape[-1]
    m = 1
    while m * m < n:
        m *= 2
    if n % m == 0:
        return x.reshape(*x.shape[:-1], n // m, m).sum(-1).sum(-1)
    return x.sum(-1)


def dft_bins_df(fw, bins, *, N: int, CH: int = 128,
                variant: str = "lean"):
    """df32-grade DFT values at selected bins.

    fw: df32 pair (hi, lo) of (F, W) real windowed frames (W <= N);
    bins: (F, J) int32 in [0, N//2]. Returns (Xre, Xim) df32 pairs (F, J).

    variant="compensated" carries first-order correction channels for the
    fw lo limb, the twiddle tables' lo limbs and the outer twiddle residual
    (peak values ~1e-9 relative of host f64). variant="lean" drops them:
    each is a ~1e-7-relative systematic term, an order under the ~1.2e-6
    QIFFT budget, while the dropped channels cost ~2x the matmul FLOPs and
    ~2.5x the HBM traffic of the whole re-evaluation (the v1 hybrid was
    HBM-bound at ladder speed on a v5e because of them). The chunked
    accumulation structure — the part that matters at any precision — is
    identical: CH-sample MXU chunks + two-level pairwise outer reduce.
    """
    fwh, fwl = fw
    F, W = fwh.shape
    CH = min(CH, N)
    t = _ct_tables(N, CH)
    A = t["A"]
    lean = variant == "lean"
    if W < N:
        fwh = jnp.pad(fwh, ((0, 0), (0, N - W)))
        fwl = jnp.pad(fwl, ((0, 0), (0, N - W)))
    fwh = fwh.reshape(F, A, CH)
    fwl = fwl.reshape(F, A, CH)

    q = bins // A
    r = bins % A
    oh_q = _onehot(q, t["Q"])
    oh_r = _onehot(r, A)

    def sel2(oh, tab3):
        # one einsum per table: (F,J,rows) x (rows,CH,2) — the one-hot is
        # read once, re/im planes ride the trailing axis
        return jnp.einsum("fjr,rnp->fjnp", oh, jnp.asarray(tab3),
                          precision=_HI)

    u_h = sel2(oh_q, t["Uh"])
    v_h = sel2(oh_r, t["Vh"])
    u_rh, u_ih = u_h[..., 0], u_h[..., 1]
    v_rh, v_ih = v_h[..., 0], v_h[..., 1]

    # inner twiddle In = U*V in plain f32 (one rounding per lane, random
    # across lanes — averages out in the coherent bin sums)
    in_rh = u_rh * v_rh - u_ih * v_ih
    in_ih = u_rh * v_ih + u_ih * v_rh

    def inner(sig, tw):
        return jnp.einsum("fac,fjc->fja", sig, tw, precision=_HI)

    m_re = inner(fwh, in_rh)
    m_im = inner(fwh, in_ih)

    o_h = sel2(oh_r, t["OTh"])
    o_rh, o_ih = o_h[..., 0], o_h[..., 1]

    pm_re = o_rh * m_re - o_ih * m_im
    pm_im = o_rh * m_im + o_ih * m_re

    if lean:
        zre = _pair_reduce(pm_re)
        zim = _pair_reduce(pm_im)
        return ((zre, jnp.zeros_like(zre)), (zim, jnp.zeros_like(zim)))

    u_l = sel2(oh_q, t["Ul"])
    v_l = sel2(oh_r, t["Vl"])
    u_rl, u_il = u_l[..., 0], u_l[..., 1]
    v_rl, v_il = v_l[..., 0], v_l[..., 1]
    din_r = (u_rh * v_rl - u_ih * v_il) + (u_rl * v_rh - u_il * v_ih)
    din_i = (u_rh * v_il + u_ih * v_rl) + (u_rl * v_ih + u_il * v_rh)

    c_re = inner(fwl, in_rh) + inner(fwh, din_r)
    c_im = inner(fwl, in_ih) + inner(fwh, din_i)

    o_l = sel2(oh_r, t["OTl"])
    o_rl, o_il = o_l[..., 0], o_l[..., 1]

    pc_re = (o_rh * c_re - o_ih * c_im) + (o_rl * m_re - o_il * m_im)
    pc_im = (o_rh * c_im + o_ih * c_re) + (o_rl * m_im + o_il * m_re)

    xre = df32.two_sum(_pair_reduce(pm_re), _pair_reduce(pc_re))
    xim = df32.two_sum(_pair_reduce(pm_im), _pair_reduce(pc_im))
    return xre, xim


@functools.lru_cache(maxsize=None)
def _mod_vectors(N: int):
    """e^{-2pi i n/N} as f32 (cos, sin) host vectors — the +-1-bin signal
    modulation of dft_bins3_df."""
    ang = -2.0 * np.pi * np.arange(N, dtype=np.float64) / N
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def dft_bins3_df(fw, bins, *, N: int, CH: int = 128):
    """Lean 3-bin-neighborhood DFT: (Xm, Xc, Xp) = X at bins (b-1, b, b+1)
    for each center bin b, as df32 pairs of (F, J) arrays.

    Twiddles are built ONLY for the center bins (3x smaller one-hots /
    selections / outer tensors than evaluating 3J bins directly); the
    neighbors come from modulating the SIGNAL by e^{-+2pi i n/N}:
    X[b+1] = DFT_{fw * e^{-2pi i n/N}}[b], and since fw is real the b-1
    modulation is the conjugate — the four modulated inner matmuls serve
    BOTH neighbors by sign. Total inner contractions: 6 (same matmul flops
    as the direct 3J evaluation, at a third of the selection traffic).
    Out-of-range neighbor bins (b=0 or b=N/2 edges) produce valid DFT
    values at the aliased bins; the QIFFT edge guards (-600 dB sentinels)
    make them unused, matching the host pipeline exactly.
    """
    fwh = fw[0]
    F, W = fwh.shape
    CH = min(CH, N)
    t = _ct_tables(N, CH)
    A = t["A"]
    if W < N:
        fwh = jnp.pad(fwh, ((0, 0), (0, N - W)))
    mc, ms = _mod_vectors(N)
    # _mod_vectors returns cos/sin of the NEGATIVE angle already:
    # gp = fw * e^{-2pi i n/N} = fw*(mc + i*ms)
    gpr = fwh * jnp.asarray(mc)[None, :]
    gpi = fwh * jnp.asarray(ms)[None, :]
    s0 = fwh.reshape(F, A, CH)
    spr = gpr.reshape(F, A, CH)
    spi = gpi.reshape(F, A, CH)

    q = bins // A
    r = bins % A
    oh_q = _onehot(q, t["Q"])
    oh_r = _onehot(r, A)

    def sel2(oh, tab3):
        return jnp.einsum("fjr,rnp->fjnp", oh, jnp.asarray(tab3),
                          precision=_HI)

    u_h = sel2(oh_q, t["Uh"])
    v_h = sel2(oh_r, t["Vh"])
    in_rh = u_h[..., 0] * v_h[..., 0] - u_h[..., 1] * v_h[..., 1]
    in_ih = u_h[..., 0] * v_h[..., 1] + u_h[..., 1] * v_h[..., 0]

    def inner(sig, tw):
        return jnp.einsum("fac,fjc->fja", sig, tw, precision=_HI)

    i0r = inner(s0, in_rh)
    i0i = inner(s0, in_ih)
    i1 = inner(spr, in_rh)
    i2 = inner(spi, in_ih)
    i3 = inner(spr, in_ih)
    i4 = inner(spi, in_rh)

    o_h = sel2(oh_r, t["OTh"])
    o_rh, o_ih = o_h[..., 0], o_h[..., 1]

    def outred(m_re, m_im):
        p_re = o_rh * m_re - o_ih * m_im
        p_im = o_rh * m_im + o_ih * m_re
        zre = _pair_reduce(p_re)
        zim = _pair_reduce(p_im)
        return ((zre, jnp.zeros_like(zre)), (zim, jnp.zeros_like(zim)))

    Xc = outred(i0r, i0i)
    Xp = outred(i1 - i2, i3 + i4)
    Xm = outred(i1 + i2, i3 - i4)
    return Xm, Xc, Xp


def hybrid_peaks_df32(signal_f32, whi, wlo, shi, slo, *, window_size: int,
                      stride: int, fft_length: int, sample_rate: int, k: int):
    """f32-select / df32-re-evaluate analysis: drop-in replacement for the
    (dfft.stft_sqmag_df32_arrays + stft._top_peaks_df) ladder pair inside the
    fused chain. Returns (freq_hi, freq_lo, mag_db_hi, mag_db_lo), each
    (n_frames, k), frequency-sorted with -inf mag padding.

    whi/wlo: df32 window planes; shi/slo: df32 unit-sine sqmag scale.
    """
    n = signal_f32.shape[0]
    n_frames = max(0, (n - window_size) // stride + 1)
    frames = stft_ops.frame_signal(signal_f32, window_size, stride, n_frames)

    # f32 spectrum for SELECTION (which bins are peaks / top-k ordering)
    fr32 = frames * whi[None, :]
    spec = jnp.fft.rfft(fr32, n=fft_length)
    sq32 = jnp.abs(spec) ** 2 * shi
    bins, top_db = stft_ops._top_bins(sq32, sample_rate=sample_rate,
                                      fft_length=fft_length, k=k)
    fin = jnp.isfinite(top_db)
    nb = fft_length // 2 + 1

    # df32 windowed frames (exact: f32 samples x df32 window)
    fw = df32.add(df32.two_prod(frames, whi[None, :]),
                  df32.two_prod(frames, wlo[None, :]))

    # evaluate the selected bins' 3-bin neighborhoods precisely
    b = bins

    def sqmag(xre, xim):
        sq = df32.add(df32.mul(xre, xre), df32.mul(xim, xim))
        return df32.mul(sq, (shi, slo))

    if DEFAULT_VARIANT == "lean":
        xm, xc, xp = dft_bins3_df(fw, b, N=fft_length)
        sp = sqmag(*xm)
        sc = sqmag(*xc)
        sn = sqmag(*xp)
    else:
        bins3 = jnp.stack([jnp.maximum(b - 1, 0), b,
                           jnp.minimum(b + 1, nb - 1)], axis=-1)
        F = bins3.shape[0]
        xre, xim = dft_bins_df(fw, bins3.reshape(F, -1), N=fft_length,
                               variant=DEFAULT_VARIANT)
        sq = df32.add(df32.mul(xre, xre), df32.mul(xim, xim))
        sq = df32.mul(sq, (shi, slo))
        sq3h = sq[0].reshape(F, k, 3)
        sq3l = sq[1].reshape(F, k, 3)
        sp = (sq3h[..., 0], sq3l[..., 0])
        sc = (sq3h[..., 1], sq3l[..., 1])
        sn = (sq3h[..., 2], sq3l[..., 2])

    return stft_ops._qifft_df(b.astype(jnp.float32), sp, sc, sn, fin,
                              nb=nb, sample_rate=sample_rate,
                              fft_length=fft_length)
