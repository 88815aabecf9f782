"""Framed STFT + spectral peak extraction — batched over all frames at once.

The reference's PeriodicFFT feeds one sample at a time into a sliding window
and runs one FFT per stride on the analysis thread
(source/rt.resynth.lib.periodicfft.cpp:14-181, windowing at :252-325).
Offline on TPU there is no recurrence between frames: every window is sliced
from the signal by its start index and ALL frames FFT together as one batched
rfft — embarrassingly parallel.

Window: half-Gaussian of `sigmas`=4 mirrored to a symmetric even-length
window (half_gaussian_window usage at rt.resynth.lib.periodicfft.cpp:288-293),
or rectangular.

Peak extraction (`extractLocalMaxFreqsMags` / findFrequenciesSqMag from
cpp.algorithms, called at source/rt.resynth.lib.cpp:1591-1596): local maxima
of the squared-magnitude spectrum, refined with quadratic interpolation of the
dB values (QIFFT) to sub-bin frequency accuracy.

Normalization: the window is scaled so that a full-scale unit-amplitude sine
at a bin center yields squared magnitude 1 (0 dB) — making `DbToMag(mag_db)`
(rt.resynth.lib.algo.cpp:22-26) directly the sine's amplitude, which is what
resynthesis plays back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def half_gaussian_window(sigmas: float, half_size: int) -> np.ndarray:
    """Right half of a Gaussian window covering `sigmas` standard deviations."""
    i = np.arange(half_size, dtype=np.float64)
    x = sigmas * (i + 0.5) / half_size
    return np.exp(-0.5 * x * x)


def gaussian_window(window_size: int, sigmas: float = 4.0) -> np.ndarray:
    """Symmetric even-length Gaussian analysis window (reference default)."""
    assert window_size % 2 == 0
    half = half_gaussian_window(sigmas, window_size // 2)
    return np.concatenate([half[::-1], half])


def rectangular_window(window_size: int) -> np.ndarray:
    return np.ones(window_size, dtype=np.float64)


def fft_length_for(window_size: int, zero_padding_factor: int = 1) -> int:
    """Smallest power of two >= window_size * zero_padding_factor."""
    n = 1
    target = window_size * zero_padding_factor
    while n < target:
        n *= 2
    return n


def frame_signal(signal, window_size: int, stride: int, n_frames: int):
    """(n_frames, window_size) sliding frames WITHOUT a gather.

    Frame starts are multiples of `stride`, so reshape the signal into
    stride-sized blocks and take ceil(W/S) consecutive block rows per frame —
    static slices + one concat, which XLA lowers to plain copies. The naive
    `signal[starts[:,None] + arange(W)]` general gather costs ~30 ms on TPU
    for a 60 s analysis; this form costs well under 1 ms.
    """
    S, W = stride, window_size
    m = -(-W // S)  # blocks covering one window
    nblk = n_frames - 1 + m
    need = nblk * S
    sig = jnp.pad(signal, (0, max(0, need - signal.shape[0])))[:need]
    blocks = sig.reshape(nblk, S)
    parts = [blocks[f0:f0 + n_frames] for f0 in range(m)]
    return jnp.concatenate(parts, axis=1)[:, :W]


@functools.partial(jax.jit, static_argnames=("window_size", "stride", "fft_length",
                                             "use_matmul_dft"))
def _stft_sqmag(signal, window, *, window_size: int, stride: int, fft_length: int,
                use_matmul_dft: bool = False):
    n = signal.shape[0]
    n_frames = max(0, (n - window_size) // stride + 1)
    frames = frame_signal(signal, window_size, stride, n_frames) * window[None, :]
    # scale so a unit sine at a bin center gives sqmag 1
    scale = 2.0 / jnp.sum(window)
    if use_matmul_dft and fft_length <= MATMUL_DFT_MAX_FFT:
        from . import dft

        return dft.rfft_sqmag_matmul(frames, fft_length) * scale**2
    spec = jnp.fft.rfft(frames, n=fft_length)
    return jnp.abs(spec) ** 2 * scale**2


# Crossover measured on a v5e (jax.profiler device time): batched rffts of
# (26449, 512) run 4.6 ms vs 1.4 ms as MXU matmuls, but (665, 16384) rffts
# run 1.4 ms vs 13.4 ms — the DFT matrix grows O(n^2) while FFT work grows
# O(n log n), so the MXU only wins for small transforms.
MATMUL_DFT_MAX_FFT = 2048


def use_matmul_dft_default(dtype) -> bool:
    """Batched SMALL DFTs (fft_length <= MATMUL_DFT_MAX_FFT) go through MXU
    matmuls on TPU (ops/dft.py); large transforms and other backends use
    XLA's native FFT (the consumers apply the size threshold)."""
    import jax as _jax

    return _jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


def stft_sqmag(signal, window, stride: int, zero_padding_factor: int = 1,
               use_matmul_dft: bool | None = None):
    """(n_frames, n_bins) squared magnitudes. Frame f covers
    [f*stride, f*stride + len(window))."""
    signal = jnp.asarray(signal)
    window = jnp.asarray(window, signal.dtype)
    ws = int(window.shape[0])
    if use_matmul_dft is None:
        use_matmul_dft = use_matmul_dft_default(signal.dtype)
    return _stft_sqmag(
        signal, window,
        window_size=ws, stride=int(stride),
        fft_length=fft_length_for(ws, zero_padding_factor),
        use_matmul_dft=bool(use_matmul_dft),
    )


@functools.partial(jax.jit, static_argnames=("sample_rate", "fft_length"))
def _peaks(sqmag, *, sample_rate: int, fft_length: int):
    eps = 1e-30
    db = 10.0 * jnp.log10(jnp.maximum(sqmag, eps))
    prev = jnp.concatenate([jnp.full_like(db[..., :1], -600.0), db[..., :-1]], axis=-1)
    nxt = jnp.concatenate([db[..., 1:], jnp.full_like(db[..., :1], -600.0)], axis=-1)
    is_peak = (db > prev) & (db >= nxt) & (sqmag > eps)
    # QIFFT: parabola through (prev, db, next) in dB
    denom = prev - 2.0 * db + nxt
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (prev - nxt) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    bins = jnp.arange(db.shape[-1], dtype=db.dtype)
    freq = (bins[None, :] + delta) * (sample_rate / fft_length)
    mag_db = db - 0.25 * (prev - nxt) * delta
    return is_peak, freq, mag_db


def extract_local_max_freqs_mags(sqmag, sample_rate: int, fft_length: int,
                                 min_db: float = -200.0):
    """Batched spectral peak extraction.

    Returns (is_peak, freq, mag_db) arrays shaped like sqmag; a host consumer
    filters by the mask. Peaks at DC/Nyquist edges are suppressed by the
    -600 dB sentinels.
    """
    is_peak, freq, mag_db = _peaks(
        jnp.asarray(sqmag), sample_rate=sample_rate, fft_length=fft_length
    )
    is_peak = is_peak & (mag_db > min_db)
    return is_peak, freq, mag_db


# exact-equivalent f32 top-k strategies (see _radix_top_select); module-level
# so an A/B bench can flip it before tracing
USE_RADIX_TOP_SELECT = True


@functools.partial(jax.jit, static_argnames=("sample_rate", "fft_length", "k"))
def _top_peaks(sqmag, *, sample_rate: int, fft_length: int, k: int):
    is_peak, freq, mag_db = _peaks(sqmag, sample_rate=sample_rate,
                                   fft_length=fft_length)
    score = jnp.where(is_peak, mag_db, -jnp.inf)
    # TPU: lax.top_k lowers to a full-width sort, and every take_along_axis
    # gather afterwards executes near-scalar (0.6-0.8 ms each on the bench
    # shapes). Two tricks (measured 6.3 ms -> 2.1 ms on a v5e):
    #  1. adjacent bins can never BOTH be peaks (is_peak needs db > prev),
    #     so an elementwise pair-reduce halves the sort width exactly;
    #  2. multi-operand lax.sort carries freq/mag along with the score, so
    #     no index gathers are needed at all.
    pad = (-score.shape[-1]) % 2
    if pad:
        score = jnp.pad(score, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        freq = jnp.pad(freq, ((0, 0), (0, pad)))
    se, so = score[:, ::2], score[:, 1::2]
    pick = se >= so
    s2 = jnp.where(pick, se, so)
    f2 = jnp.where(pick, freq[:, ::2], freq[:, 1::2])
    # NB the score IS the winner's mag_db (score = where(is_peak, mag_db,
    # -inf) and only peaks can win) — no third sort operand needed
    if USE_RADIX_TOP_SELECT and s2.dtype == jnp.float32 and k < s2.shape[-1]:
        # TPU fast path: exact radix-select (see _radix_top_select) — a
        # full-width lax.sort on the bench shapes (665 x 2049) costs 1.7 ms
        # on a v5e; the bitwise selection + one small one-hot compaction
        # matmul replaces it with cheap vector passes
        return _radix_top_select(s2, f2, k)
    s_neg, s_freq = jax.lax.sort((-s2, f2), dimension=-1, num_keys=1)
    top_db = -s_neg[:, :k]
    top_freq = s_freq[:, :k]
    # return sorted by frequency within each frame (pipeline invariant)
    key = jnp.where(jnp.isfinite(top_db), top_freq, jnp.inf)
    _, out_freq, out_db = jax.lax.sort((key, top_freq, top_db), dimension=-1,
                                       num_keys=1)
    return out_freq, out_db


def _radix_top_select(s2, f2, k: int):
    """Exact top-k selection without a sort, bit-identical to the stable
    lax.sort((-s2, f2), num_keys=1)[:k] + frequency re-sort pair it replaces.

    Four-bit MSB-first radix select finds the k-th largest score's exact bit
    pattern per row (scores bitcast to sort-order-preserving uint32), then the
    selected lanes compact in index order — which IS frequency order, since
    peak bins are >= 2 apart and QIFFT deltas are clipped to +-0.5 bin — via
    a one-hot matmul. Stable tie-break (earliest index wins among equal
    scores) is reproduced by ranking equal-to-threshold lanes with a cumsum.
    Entries whose score is -inf (padding / non-peaks) are appended after the
    finite ones in index order, exactly like the sort pair's key trick. Cost
    on the bench shapes: 8 count-reduce passes + one (R, W, k) x (R, W, 2)
    contraction, ~3x cheaper than the full-width sort on a v5e.
    """
    R, W = s2.shape
    u = jax.lax.bitcast_convert_type(s2, jnp.uint32)
    neg = (u >> 31).astype(jnp.bool_)
    u = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))
    prefix = jnp.zeros((R, 1), jnp.uint32)
    kk = jnp.full((R,), k, jnp.int32)
    digits = jnp.arange(16, dtype=jnp.int32)
    for shift in range(28, -1, -4):
        if shift + 4 >= 32:
            matches = jnp.ones(u.shape, jnp.bool_)
        else:
            hi_mask = jnp.uint32(0xFFFFFFFF) << (shift + 4)
            matches = (u & hi_mask) == prefix
        nib = (u >> shift) & jnp.uint32(15)
        cnts = jnp.stack([jnp.sum(matches & (nib == d), axis=-1,
                                  dtype=jnp.int32) for d in range(16)], -1)
        rev = jnp.cumsum(cnts[:, ::-1], axis=-1)[:, ::-1]  # count(nib >= d)
        dstar = jnp.sum((rev >= kk[:, None]).astype(jnp.int32), axis=-1) - 1
        cnt_gt = jnp.sum(jnp.where(digits[None] > dstar[:, None], cnts, 0),
                         axis=-1)
        kk = kk - cnt_gt
        prefix = prefix | (dstar.astype(jnp.uint32) << shift)[:, None]
    gt = u > prefix
    eq = u == prefix
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
    sel = gt | (eq & (eq_rank <= kk[:, None]))
    finite = jnp.isfinite(s2)
    fin_sel = sel & finite
    inf_sel = sel & ~finite
    nfin = jnp.sum(fin_sel, axis=-1, dtype=jnp.int32)
    pos = jnp.where(
        fin_sel, jnp.cumsum(fin_sel.astype(jnp.int32), -1) - 1,
        nfin[:, None] + jnp.cumsum(inf_sel.astype(jnp.int32), -1) - 1)
    # two-stage compaction: a flat (R, W, k) one-hot materializes
    # R*W*k floats (~350 MB at bench shapes — 1.65 ms of pure HBM traffic
    # on a v5e, the top-3 op of BOTH chains). Split pos = 16*p1 + p0:
    # stage 1 scatters values into ceil(k/16) GROUPS elementwise
    # ((R, G, W, c) ~ W*k/16 floats), stage 2 compacts within groups with a
    # 16-wide one-hot matmul — ~8x less traffic, identical values (one-hot
    # products are exact at HIGHEST).
    vals = jnp.stack([f2, jnp.where(fin_sel, s2, 0.0)], axis=-1)
    n_g = -(-k // 16)
    p1 = pos // 16
    p0 = pos % 16
    grp = jnp.arange(n_g, dtype=jnp.int32)
    g_mask = (sel & (pos < k))[:, None, :] \
        & (p1[:, None, :] == grp[None, :, None])          # (R, G, W)
    G = jnp.where(g_mask[..., None], vals[:, None, :, :], 0.0)
    oh0 = ((p0[..., None] == jnp.arange(16, dtype=jnp.int32)) & sel[..., None]
           ).astype(s2.dtype)                              # (R, W, 16)
    out = jnp.einsum("rgwc,rwp->rgpc", G, oh0,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(out.shape[0], n_g * 16, 2)[:, :k]
    out_db = jnp.where(jnp.arange(k)[None, :] < nfin[:, None], out[..., 1],
                       -jnp.inf)
    return out[..., 0], out_db


def _top_bins(sq, *, sample_rate: int, fft_length: int, k: int):
    """f32 top-k peak SELECTION: returns (bins (F, k) int32 ascending,
    mag_db (F, k) f32 with -inf padding). Same is_peak/score/top-k semantics
    as `_top_peaks`, but carrying the integer bin index instead of the QIFFT
    frequency — the selection front end of the hybrid df32 analysis
    (ops/dfft_hybrid.py), which re-evaluates only the selected bins'
    3-bin neighborhoods in compensated double-f32."""
    is_peak, _freq, mag_db = _peaks(sq, sample_rate=sample_rate,
                                    fft_length=fft_length)
    score = jnp.where(is_peak, mag_db, -jnp.inf)
    lane = jnp.broadcast_to(
        jnp.arange(score.shape[-1], dtype=score.dtype)[None, :], score.shape)
    pad = (-score.shape[-1]) % 2
    if pad:
        score = jnp.pad(score, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        lane = jnp.pad(lane, ((0, 0), (0, pad)))
    se, so = score[:, ::2], score[:, 1::2]
    pick = se >= so
    s2 = jnp.where(pick, se, so)
    b2 = jnp.where(pick, lane[:, ::2], lane[:, 1::2])
    if USE_RADIX_TOP_SELECT and s2.dtype == jnp.float32 and k < s2.shape[-1]:
        bins_f, top_db = _radix_top_select(s2, b2, k)
    else:
        kk = min(k, s2.shape[-1])
        s_neg, s_bin = jax.lax.sort((-s2, b2), dimension=-1, num_keys=1)
        top_db = -s_neg[:, :kk]
        top_bin = s_bin[:, :kk]
        if kk < k:
            top_db = jnp.pad(top_db, ((0, 0), (0, k - kk)),
                             constant_values=-jnp.inf)
            top_bin = jnp.pad(top_bin, ((0, 0), (0, k - kk)))
        key = jnp.where(jnp.isfinite(top_db), top_bin, jnp.inf)
        _, bins_f, top_db = jax.lax.sort((key, top_bin, top_db), dimension=-1,
                                         num_keys=1)
    fin = jnp.isfinite(top_db)
    bins = jnp.where(fin, bins_f, 0.0).astype(jnp.int32)
    return bins, top_db


@functools.partial(jax.jit, static_argnames=("sample_rate", "fft_length", "k"))
def _top_peaks_df(sq_hi, sq_lo, *, sample_rate: int, fft_length: int, k: int):
    """df32 top-k peak extraction: same pipeline as `_top_peaks`, but QIFFT
    frequencies and magnitudes are computed in compensated double-f32 from a
    df32 sqmag spectrum (ops/dfft.stft_sqmag_df32), so they track the host
    f64 pipeline's values to ~1e-11 relative — the precision that keeps
    frequency noise (and every downstream tracker decision) inside the
    -80 dB render budget (see ops/dfft.py).

    Selection (is_peak, top-k ordering) uses f32 scores derived FROM the
    df32 sqmag: is_peak local-max tests compare df32 pairs exactly; the
    top-k boundary ordering carries ~5e-7 dB noise (f32 log of an exact
    sqmag), so a boundary flip needs two interpolated mags within ~1e-6 dB
    of each other AND of the k-th rank — measured never on the bench
    campaigns (the raw-f32 pipeline's ~1e-2 dB mag noise flipped peaks every
    few frames).

    Returns (freq_hi, freq_lo, mag_db_hi, mag_db_lo), each (n_frames, k),
    frequency-sorted with -inf mag padding.
    """
    from . import df32

    F, nb = sq_hi.shape
    sq = (sq_hi, sq_lo)
    eps = 1e-30

    def shift(pair, off, fill):
        if off == -1:
            return tuple(
                jnp.concatenate([jnp.full_like(v[:, :1], f), v[:, :-1]], 1)
                for v, f in zip(pair, fill))
        return tuple(
            jnp.concatenate([v[:, 1:], jnp.full_like(v[:, :1], f)], 1)
            for v, f in zip(pair, fill))

    sq_p = shift(sq, -1, (0.0, 0.0))
    sq_n = shift(sq, +1, (0.0, 0.0))
    lane = jnp.arange(nb, dtype=jnp.float32)
    at_first = lane[None, :] == 0
    at_last = lane[None, :] == nb - 1
    gt_prev = df32.compare_lt(sq_p, sq) | at_first
    ge_next = ~df32.compare_lt(sq, sq_n) | at_last
    is_peak = gt_prev & ge_next & (sq_hi > eps)

    # f32 selection score: interpolated mag from f32 dbs of the df32 sqmag
    db32 = 10.0 * jnp.log10(jnp.maximum(sq_hi, eps))
    prev32 = jnp.where(at_first, -600.0,
                       jnp.concatenate([db32[:, :1], db32[:, :-1]], 1))
    nxt32 = jnp.where(at_last, -600.0,
                      jnp.concatenate([db32[:, 1:], db32[:, -1:]], 1))
    denom32 = prev32 - 2.0 * db32 + nxt32
    delta32 = jnp.where(jnp.abs(denom32) > 1e-12,
                        0.5 * (prev32 - nxt32) / denom32, 0.0)
    delta32 = jnp.clip(delta32, -0.5, 0.5)
    mag32 = db32 - 0.25 * (prev32 - nxt32) * delta32
    score = jnp.where(is_peak, mag32, -jnp.inf)

    # pair-reduce (adjacent bins can't both be peaks), carrying the bin id
    # and the df32 sqmag triple of each winner
    chans = [jnp.broadcast_to(lane[None, :], (F, nb)),
             sq_p[0], sq_p[1], sq_hi, sq_lo, sq_n[0], sq_n[1]]
    pad = (-nb) % 2
    if pad:
        score = jnp.pad(score, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        chans = [jnp.pad(c, ((0, 0), (0, pad))) for c in chans]
    se, so = score[:, ::2], score[:, 1::2]
    pick = se >= so
    s2 = jnp.where(pick, se, so)
    ch2 = [jnp.where(pick, c[:, ::2], c[:, 1::2]) for c in chans]

    # top-k by score (stable), then re-sort selected lanes by bin index
    # (== frequency order: peak bins are >= 2 apart, deltas clipped to +-.5)
    ops = jax.lax.sort((-s2, *ch2), dimension=-1, num_keys=1)
    top_s = -ops[0][:, :k]
    top_ch = [o[:, :k] for o in ops[1:]]
    fin = jnp.isfinite(top_s)
    key = jnp.where(fin, top_ch[0], jnp.inf)
    ops2 = jax.lax.sort((key, top_s, *top_ch), dimension=-1, num_keys=1)
    top_s = ops2[1]
    bin_i, sp_hi, sp_lo, sc_hi, sc_lo, sn_hi, sn_lo = ops2[2:]
    fin = jnp.isfinite(top_s)

    # df32 QIFFT at the selected triples
    return _qifft_df(bin_i, (sp_hi, sp_lo), (sc_hi, sc_lo), (sn_hi, sn_lo),
                     fin, nb=nb, sample_rate=sample_rate,
                     fft_length=fft_length)


def _qifft_df(bin_i, sp, sc, sn, fin, *, nb: int, sample_rate: int,
              fft_length: int):
    """df32 QIFFT refinement at selected bins: parabola through the dB values
    of the (prev, center, next) df32 sqmag triples, mirroring the f64 host
    pipeline (`_peaks`) term for term in compensated double-f32.

    bin_i: (F, k) f32 integer-valued center bins; sp/sc/sn: df32 pairs of the
    sqmag at bins (b-1, b, b+1); fin: validity mask (False lanes -> -inf mag).
    Returns (freq_hi, freq_lo, mag_db_hi, mag_db_lo)."""
    from . import df32

    eps = 1e-30
    sc_hi = sc[0]

    def db_df(pair):
        guarded = df32.where(pair[0] > eps, pair,
                             (jnp.full_like(pair[0], eps),
                              jnp.zeros_like(pair[0])))
        return df32.mul_f32(df32.log10(guarded), np.float32(10.0))

    at0 = bin_i == 0
    atl = bin_i == nb - 1
    neg600 = (jnp.full_like(sc_hi, -600.0), jnp.zeros_like(sc_hi))
    dbp = df32.where(at0, neg600, db_df(sp))
    dbc = db_df(sc)
    dbn = df32.where(atl, neg600, db_df(sn))
    denom = df32.add(df32.sub(dbp, df32.scale_pow2(dbc, np.float32(2.0))),
                     dbn)
    pmn = df32.sub(dbp, dbn)
    delta = df32.mul_f32(df32.div(pmn, df32.where(
        jnp.abs(denom[0]) > 1e-12, denom,
        (jnp.ones_like(denom[0]), jnp.zeros_like(denom[0])))),
        np.float32(0.5))
    delta = df32.where(jnp.abs(denom[0]) > 1e-12, delta,
                       (jnp.zeros_like(delta[0]), jnp.zeros_like(delta[1])))
    half = (jnp.full_like(delta[0], 0.5), jnp.zeros_like(delta[0]))
    delta = df32.min_df(df32.max_df(delta, df32.neg(half)), half)
    binw_hi, binw_lo = dfft_consts(sample_rate / fft_length)
    freq = df32.mul(df32.add_f32(delta, bin_i),
                    (jnp.asarray(binw_hi), jnp.asarray(binw_lo)))
    corr = df32.mul_f32(df32.mul(pmn, delta), np.float32(0.25))
    mag = df32.sub(dbc, corr)
    mag_hi = jnp.where(fin, mag[0], -jnp.inf)
    mag_lo = jnp.where(fin, mag[1], 0.0)
    return freq[0], freq[1], mag_hi, mag_lo


def dfft_consts(x64: float):
    hi = np.float32(x64)
    return hi, np.float32(np.float64(x64) - np.float64(hi))


def extract_top_peaks(sqmag, sample_rate: int, fft_length: int, k: int = 127):
    """Device-side top-k peak extraction: returns (freq, mag_db) arrays of
    shape (n_frames, k), frequency-sorted, with -inf mag padding.

    This keeps the host<->device transfer tiny ((frames, k) instead of full
    (frames, bins) masks) — the tracker only ever uses the strongest peaks
    (the reference's synth has 127 voices, rt.resynth.lib.cpp:208).
    """
    return _top_peaks(jnp.asarray(sqmag), sample_rate=sample_rate,
                      fft_length=fft_length, k=k)


def top_peaks_to_lists(freq, mag_db) -> list[list[tuple[float, float]]]:
    """Host conversion of extract_top_peaks output to per-frame lists."""
    freq = np.asarray(freq)
    mag_db = np.asarray(mag_db)
    valid = np.isfinite(mag_db)
    return [list(zip(freq[f][valid[f]].tolist(), mag_db[f][valid[f]].tolist()))
            for f in range(freq.shape[0])]


def peaks_to_lists(is_peak, freq, mag_db) -> list[list[tuple[float, float]]]:
    """Host conversion: per-frame sorted [(freq, mag_db), ...] lists."""
    is_peak = np.asarray(is_peak)
    freq = np.asarray(freq)
    mag_db = np.asarray(mag_db)
    out = []
    for f in range(is_peak.shape[0]):
        sel = is_peak[f]
        out.append(list(zip(freq[f][sel].tolist(), mag_db[f][sel].tolist())))
    return out


def db_to_mag(db):
    """DbToMag (rt.resynth.lib.algo.cpp:22-26)."""
    return 10.0 ** (np.asarray(db) / 20.0)
