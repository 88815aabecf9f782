"""FFT vocoder (reference source/rt.resynth.lib.vocoder.cpp).

Pipeline per stride S (defaults: 5 ms stride, 0.10 s modulator window, 5
log-spaced bands 100..20000 Hz — rt.resynth.lib.cpp:987-992):
  modulator: sliding GAUSSIAN-windowed sqmag spectrum (the reference's
             4-sigma window, PeriodicFFT<SqMagFftOperation<Window::Gaussian>>
             at vocoder.cpp:241) -> per-band amplitude sqrt(sum of sqmag
             over the band's bins) (FFTModulator, vocoder.cpp:101-163)
  carrier:   window of 2S samples, raw FFT -> scale each bin by its band's
             modulator amplitude -> IFFT (FFTCarrier, vocoder.cpp:396-475)
  output:    sample k of the new frame crossfades with sample k+S of the
             previous frame using a LINEAR equal-gain crossfade
             (vocoder.cpp:500-541, law per the comment at :538-541; stride
             forced odd by good_stride so the stride+1-point xfade table is
             even, vocoder.cpp:84-93)

Offline TPU form: all modulator windows and all carrier frames batch through
one rfft each; band summation and bin scaling are (bins x bands) matmuls; the
crossfade combine is vectorized over frames. No queues — the reference's
ReadQueuedSampleSource half-duplex machinery exists to balance real-time
latency (rt.resynth.lib.metaqueue.cpp:78-158) and has no offline counterpart.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stft as stft_ops
from ..ops.oscillators import chunked_cumsum as cumsum_chunked

MODULATOR_MAX_FFT = 2**16
CARRIER_MAX_FFT = 2**17
MAX_BANDS = 50

# fast-modulator implementation selector ("decimated" | "full"): "full" keeps
# every band ifft at the whole-signal FFT length; "decimated" shrinks each
# narrow band's ifft to a bandwidth-proportional length (see
# _modulator_band_amps_decimated) — same windowed band energies to ~1%.
FAST_MODULATOR_MODE = "decimated"
_SSB_GUARD_HZ = 300.0  # decimated rate >= band width + this (alias guard)
_MIN_SSB_M = 4096      # floor on the per-band ifft length


@dataclass(frozen=True)
class VocoderParams:
    """Defaults from rt.resynth.lib.cpp:986-999."""

    sample_rate: int = 44100
    env_follower_cutoff_ratio: float = 1.0 / 20.0
    modulator_window_size_seconds: float = 0.10
    stride_seconds: float = 0.005
    count_bands: int = 5
    min_freq: float = 100.0
    max_freq: float = 20000.0
    # output mix (voice/carrier/vocoder volumes, rt.resynth.lib.cpp:994-996)
    volume_modulator: float = 0.0
    volume_carrier: float = 0.0
    volume_vocoded: float = 1.0
    # The reference modulator windows its FFTs with the 4-sigma Gaussian
    # (PeriodicFFT<SqMagFftOperation<Window::Gaussian>>, vocoder.cpp:241;
    # window construction periodicfft.cpp:287-293). "rectangular" is kept
    # for A/B only — it was this repo's (incorrect) round-1 reading.
    modulator_window_shape: str = "gaussian"

    def modulator_window_array(self) -> np.ndarray:
        W = self.modulator_window
        if self.modulator_window_shape == "gaussian":
            return stft_ops.gaussian_window(W, sigmas=4.0)
        return np.ones(W, np.float64)

    @property
    def stride(self) -> int:
        """good_stride: odd (vocoder.cpp:84-93)."""
        s = max(1, int(0.5 + self.stride_seconds * self.sample_rate))
        return s + 1 if s % 2 == 0 else s

    @property
    def modulator_window(self) -> int:
        w = max(1, int(0.5 + self.sample_rate * self.modulator_window_size_seconds))
        if w % 2 == 1:
            w += 1
        return min(MODULATOR_MAX_FFT, w)

    def band_freqs(self) -> np.ndarray:
        """count_bands+1 log-spaced edges (SetupParams::fill_freqs)."""
        return np.exp(np.linspace(np.log(self.min_freq), np.log(self.max_freq),
                                  self.count_bands + 1))


def _band_matrix(freq_edges: np.ndarray, n_bins: int, bin_hz: float) -> np.ndarray:
    """(n_bins, n_bands) indicator: bin b belongs to band i when its frequency
    lies in (edge_i, edge_{i+1}] (FFTModulator binning, vocoder.cpp:134-158)."""
    hz = np.arange(n_bins) * bin_hz
    m = np.zeros((n_bins, len(freq_edges) - 1))
    for i in range(len(freq_edges) - 1):
        m[:, i] = (hz > freq_edges[i]) & (hz <= freq_edges[i + 1])
    return m


def _modulator_band_amps_fast(signal, edges, *, window: int, stride: int,
                              n_frames: int, sample_rate: int, mode=None,
                              shape: str = "gaussian"):
    """O(n) band amplitudes over the whole signal — dispatch wrapper.

    edges may be a static tuple/ndarray of band-edge frequencies (enables the
    "decimated" implementation, whose per-band ifft sizes are compile-time
    functions of the edges) or a traced device array (falls back to "full").
    shape: the analysis window ("gaussian" = the reference's 4-sigma window,
    vocoder.cpp:241; "rectangular" for A/B).
    """
    mode = mode or FAST_MODULATOR_MODE
    if mode == "decimated" and not isinstance(edges, jax.core.Tracer):
        edges_t = tuple(float(e) for e in np.asarray(edges))
        return _modulator_band_amps_decimated(
            signal, edges=edges_t, window=window, stride=stride,
            n_frames=n_frames, sample_rate=sample_rate, shape=shape)
    if isinstance(edges, (tuple, list)):
        edges = jnp.asarray(np.asarray(edges), signal.dtype)
    return _modulator_band_amps_full(
        signal, edges, window=window, stride=stride, n_frames=n_frames,
        sample_rate=sample_rate, shape=shape)


def _window_sq(window: int, shape: str) -> np.ndarray:
    """w^2 of the modulator analysis window (host constant)."""
    if shape == "gaussian":
        w = stft_ops.gaussian_window(window, sigmas=4.0)
    else:
        w = np.ones(window, np.float64)
    return w * w


def _window_sum(window: int, shape: str) -> float:
    if shape == "gaussian":
        return float(stft_ops.gaussian_window(window, sigmas=4.0).sum())
    return float(window)


def _amps_from_band_energy(band_e, *, window: int, shape: str):
    """Band amplitude from windowed band energy E_w = sum_t w^2(t) x_b^2(t):
    amp = sqrt(2 E_w / sum(w^2)) — calibrated so a unit-amplitude in-band
    sine reads amp 1 under ANY window shape (E_w = sum w^2 * sin^2 =
    sum(w^2)/2), with no dependence on the power-of-two FFT padding. (The
    reference's absolute scale lives in cpp.algorithms' unavailable
    normalize_window/findFrequenciesSqMag; this is the physically-calibrated
    recovered convention: the band envelope IS the in-band amplitude.)"""
    sumw2 = float(np.sum(_window_sq(window, shape)))
    return jnp.sqrt(jnp.maximum(2.0 * band_e / sumw2, 0.0))


def _class_strided_sample(C, offs, J: int, S: int):
    """M[j, i] = C_ext[offs[i] + j*S] for j < J, i < d as a one-hot MXU
    contraction (general gathers execute near-scalar on TPU; these positions
    decompose into d residue classes of exact stride S).

    C: (L,) cumsum (edge-replicated past its end); offs: STATIC np ints (d,)
    with max(offs) - min(offs) < S (so offs//S spans at most 2 values).
    """
    offs = np.asarray(offs, np.int64)
    d = offs.shape[0]
    q = offs // S
    s = offs % S
    q0, q1 = int(q.min()), int(q.max())
    assert q1 - q0 <= 1, (q0, q1)
    rows_needed = J + q1 + 1
    need = rows_needed * S
    L = C.shape[0]
    if need > L:
        C = jnp.concatenate(
            [C, jnp.broadcast_to(C[..., -1:], C.shape[:-1] + (need - L,))],
            axis=-1)
    else:
        C = C[..., :need]
    R2 = C.reshape(C.shape[:-1] + (rows_needed, S))
    sel = jnp.asarray((s[None, :] == np.arange(S)[:, None]), C.dtype)  # (S,d)
    cols = jnp.einsum("...rs,sd->...rd", R2, sel,
                      precision=jax.lax.Precision.HIGHEST)
    base = cols[..., q0:q0 + J, :]
    if q1 > q0:
        shift = cols[..., q0 + 1:q0 + 1 + J, :]
        out = jnp.where(jnp.asarray(q - q0 == 1)[None, :], shift, base)
    else:
        out = base
    return out  # (..., J, d)


def _strided_interp_read(C, *, d: int, stride: int, base: int, n_frames: int):
    """C[(f*stride + base)/d] for f < n_frames with linear interpolation at
    fractional positions (the fraction is a per-residue-class constant:
    frame f = d*j + i reads position j*stride + (i*stride + base)/d exactly,
    so the samples are d residue-class strided reads)."""
    J = -(-n_frames // d)
    i = np.arange(d)
    pos = (i * stride + base) / d
    offs = np.floor(pos).astype(np.int64)
    alpha = pos - offs
    lo = _class_strided_sample(C, offs, J, stride)
    hi = _class_strided_sample(C, offs + 1, J, stride)
    a = jnp.asarray(alpha[None, :], C.dtype)
    out = (lo * (1.0 - a) + hi * a).reshape(C.shape[:-1] + (J * d,))
    return out[..., :n_frames]


def _windowed_energy_at_frames(C, *, d: int, stride: int, window: int,
                               n_frames: int):
    """E[f] = C[(f*stride+window)/d] - C[(f*stride)/d] for f < n_frames,
    where C is an inclusive cumsum on a d-decimated grid (the rectangular-
    window box sum)."""
    hi = _strided_interp_read(C, d=d, stride=stride, base=window,
                              n_frames=n_frames)
    lo = _strided_interp_read(C, d=d, stride=stride, base=0,
                              n_frames=n_frames)
    return hi - lo


def _windowed_gauss_energy_conv(dens, *, d: int, stride: int, window: int,
                                shape: str, n_frames: int):
    """E_w[f] = sum_l g(l*d) * dens_interp(f*stride/d + l) for f < n_frames
    (g = the w^2 analysis-window kernel, dens on a d-decimated grid, linear
    interpolation at the fractional per-residue-class alignment) — as ONE
    matmul instead of FFT convs: frame f = d*j + i reads position
    j*S + (i*S)/d, so output channel i correlates dens with a per-class
    kernel k_i[l] = (1-a_i) g[l - q_i] + a_i g[l - q_i - 1]
    (q_i + a_i = i*S/d) at output stride S. nf*(W/d + S) MACs total.

    Executed as ONE (rows, S) x (S, d*c) matmul + c shifted-diagonal adds:
    with the kernel zero-padded to c = ceil(K/S) chunks of S taps,
    out[j, i] = sum_c M[j+c, i, c] where M = dens.reshape(rows, S) @ kern
    chunks. (An equivalent lax.conv with window_strides=S was 20-100x
    slower on TPU: XLA rewrites the strided conv into a degenerate
    stride-1 conv with a (J*S + K)-tap kernel that executes near-scalar —
    ~6 ms of a 10 ms chain render; the matmul form is MXU-native.)"""
    S = stride
    gd = _window_sq(window, shape)[::d]
    Lg = gd.shape[0]
    K = Lg + S + 1  # kernel span covers the max class shift q_i <= S-1
    i = np.arange(d)
    pos = i * S / d
    q = np.floor(pos).astype(np.int64)
    alpha = pos - q
    u = np.arange(K)
    # k_i[u] = (1-a_i)*gd[u-q_i] + a_i*gd[u-q_i-1], gd out-of-range -> 0
    idx = u[None, :] - q[:, None]

    def safe_gd(v):
        return np.where((v >= 0) & (v < Lg), gd[np.clip(v, 0, Lg - 1)], 0.0)

    kern = (1.0 - alpha)[:, None] * safe_gd(idx) \
        + alpha[:, None] * safe_gd(idx - 1)

    J = -(-n_frames // d)
    c = -(-K // S)  # kernel chunks of S taps
    kpad = np.zeros((d, c * S))
    kpad[:, :K] = kern
    kmat = kpad.reshape(d, c, S)
    rows = J + c - 1
    need = rows * S  # >= (J-1)*S + K; the extra taps are kernel zeros
    m = dens.shape[0]
    if need > m:
        dens = jnp.concatenate([dens, jnp.zeros((need - m,), dens.dtype)])
    else:
        dens = dens[:need]
    M = jnp.einsum("rs,dcs->rdc", dens.reshape(rows, S),
                   jnp.asarray(kmat, dens.dtype),
                   precision=jax.lax.Precision.HIGHEST)  # (rows, d, c)
    out = M[0:J, :, 0]
    for cc in range(1, c):
        out = out + M[cc:cc + J, :, cc]
    return out.reshape(-1)[:n_frames]  # (J, d) interleave -> frames


@functools.partial(jax.jit, static_argnames=("edges", "window", "stride",
                                             "n_frames", "sample_rate",
                                             "shape"))
def _modulator_band_amps_decimated(signal, *, edges, window: int, stride: int,
                                   n_frames: int, sample_rate: int,
                                   shape: str = "gaussian"):
    """Decimated band energies: one whole-signal FFT, then per band a SMALL
    complex ifft of just that band's positive-frequency bins (single-sideband
    at baseband) yields the band's analytic signal z at a decimated rate
    fs_dec = sample_rate * m / n_fft. 2|z|^2 is the band's energy density;
    windowed sums come from a cumsum read at (interpolated) stride positions.

    The ifft length m only needs fs_dec >= band_width + guard, NOT 2x width:
    the `window`-sample energy window is itself a low-pass (first null at
    sample_rate/window Hz, 1/f rolloff), so energy-density detail above a few
    hundred Hz — including anything aliasing down from the fs_dec fold — is
    attenuated out of the windowed sums regardless. Total ifft work is
    therefore ~ sum of band widths (~half the spectrum) instead of
    n_bands x n_fft.

    Deviations from _modulator_band_amps_full: the dropped 2 f_c ripple term
    (O(1/(2 pi f_c window/sr)), <=1% on the lowest default band) and the
    alias guard (<=~0.5%); measured <=0.4% RMS per band on broadband inputs.

    edges: STATIC tuple of band-edge Hz. Returns (n_frames, n_bands) amps.
    """
    n = signal.shape[0]
    fdt = signal.dtype
    n_bands = len(edges) - 1
    if n_frames <= 0:
        return jnp.zeros((0, n_bands), fdt)
    n_fft = 1
    while n_fft < n:
        n_fft *= 2
    half = n_fft // 2
    # only positive-frequency bins are consumed (SSB segments), so the
    # forward transform is a real FFT — half the work of the full complex
    # transform the masked-ifft path needs
    X = jnp.fft.rfft(signal, n=n_fft)
    guard_bins = int(np.ceil(_SSB_GUARD_HZ * n_fft / sample_rate))

    def hz_bins(lo_hz, hi_hz):
        """Positive-frequency bin range of mask (hz > lo) & (hz <= hi)."""
        k_lo = int(np.floor(lo_hz * n_fft / sample_rate)) + 1
        k_hi = min(int(np.floor(hi_hz * n_fft / sample_rate)), half)
        return k_lo, k_hi

    def ssb_energy(k_lo, k_hi):
        if k_hi < k_lo:
            return jnp.zeros((n_frames,), fdt)
        width = k_hi - k_lo + 1
        m = _MIN_SSB_M
        while m < width + guard_bins:
            m *= 2
        m = min(m, n_fft)
        d = n_fft // m
        seg = jax.lax.slice(X, (k_lo,), (k_hi + 1,))
        if k_lo == 0:  # DC bin has no conjugate partner
            seg = jnp.concatenate([seg[:1] * 0.5, seg[1:]])
        if k_hi == half:  # Nyquist bin likewise
            seg = jnp.concatenate([seg[:-1], seg[-1:] * 0.5])
        z = jnp.fft.ifft(seg, n=m)
        dens = jnp.real(z) ** 2 + jnp.imag(z) ** 2
        dens = jnp.where(jnp.arange(m) * d < n, dens, 0.0).astype(fdt)
        if shape == "rectangular":
            C = cumsum_chunked(dens)
            delta = _windowed_energy_at_frames(
                C, d=d, stride=stride, window=window, n_frames=n_frames)
        else:
            delta = _windowed_gauss_energy_conv(
                dens, d=d, stride=stride, window=window, shape=shape,
                n_frames=n_frames)
        return 2.0 * d * (m / n_fft) ** 2 * delta

    band_e = jnp.stack(
        [ssb_energy(*hz_bins(edges[b], edges[b + 1])) for b in range(n_bands)],
        axis=-1)  # (n_frames, n_bands)

    return _amps_from_band_energy(band_e, window=window, shape=shape)


@functools.partial(jax.jit, static_argnames=("window", "stride", "n_frames",
                                             "sample_rate", "shape"))
def _modulator_band_amps_full(signal, edges, *, window: int, stride: int,
                              n_frames: int, sample_rate: int,
                              shape: str = "gaussian"):
    """O(n) band amplitudes: per-band band-pass over the WHOLE signal (one
    big rfft + bin mask + irfft per band), then windowed energy — box sums
    via cumsum (rectangular) or a w^2 convolution (gaussian).

    By Parseval, the sum of squared windowed-DFT magnitudes over a band's
    bins equals (fft_len/2) x the w-weighted energy of the band-filtered
    window (up to edge leakage), so this matches the per-window FFT
    formulation while doing ~window/stride (= 20x at the defaults) less
    work — the windows overlap 95% (window 0.10 s, stride 5 ms).

    edges: (n_bands+1,) band edge frequencies. Returns (n_frames, n_bands).
    """
    n = signal.shape[0]
    if n_frames <= 0:
        return jnp.zeros((0, edges.shape[0] - 1), signal.dtype)
    # TPU FFTs need power-of-two lengths; zero-pad the whole-signal transform
    n_fft = 1
    while n_fft < n:
        n_fft *= 2
    # Work on the FULL complex spectrum with symmetric masks and pack TWO
    # real band signals per complex ifft (ifft(A + iB) = y_a + i y_b for
    # hermitian A, B): irfft's hermitian-extension lowers to whole-spectrum
    # `reverse` passes that cost more than the FFTs themselves on TPU.
    fdt = signal.dtype
    cdt = jnp.complex128 if fdt == jnp.float64 else jnp.complex64
    X = jnp.fft.fft(signal.astype(cdt), n=n_fft)
    idx = jnp.arange(n_fft)
    folded = jnp.minimum(idx, n_fft - idx).astype(fdt)
    hz = folded * (sample_rate / n_fft)
    n_bands = edges.shape[0] - 1
    gauss = shape != "rectangular"
    ys = []
    for p in range(0, n_bands, 2):
        mask_a = ((hz > edges[p]) & (hz <= edges[p + 1])).astype(fdt)
        if p + 1 < n_bands:
            mask_b = ((hz > edges[p + 1]) & (hz <= edges[p + 2])).astype(fdt)
            z = jnp.fft.ifft(X * (mask_a + 1j * mask_b))
            pair = (jnp.real(z), jnp.imag(z))
        else:
            z = jnp.fft.ifft(X * mask_a)
            pair = (jnp.real(z),)
        ys.extend(yy[:n] for yy in pair)
    if gauss:
        # Gaussian-windowed energies: one strided conv per band (d = 1)
        band_e = jnp.stack(
            [_windowed_gauss_energy_conv(y * y, d=1, stride=stride,
                                         window=window, shape=shape,
                                         n_frames=n_frames) for y in ys],
            axis=-1)
        return _amps_from_band_energy(band_e, window=window, shape=shape)
    # band-MAJOR layout: (bands, n) keeps the long time axis in lanes — a
    # (n, 5) layout runs the cumsum and slices at 5/128 lane occupancy
    y = jnp.stack(ys, axis=0)
    e = cumsum_chunked(y * y, axis=-1)  # (bands, n) inclusive
    # windowed energies at stride positions are REGULAR: e[f*S + W] - e[f*S].
    # Strided lax.slice instead of e[ends] - e[starts] index-array gathers
    # (general gathers pay per index on TPU — ~1 ms for 2x12k indices here).
    # Edge-replicate pad reproduces the min(end, n-1) clamp exactly.
    e_pad = jnp.concatenate(
        [e, jnp.broadcast_to(e[:, -1:], (e.shape[0], window + 1))], axis=-1)
    lim = stride * (n_frames - 1) + 1
    ends_e = jax.lax.slice(e_pad, (0, window), (e.shape[0], window + lim),
                           (1, stride))
    starts_e = jax.lax.slice(e_pad, (0, 0), (e.shape[0], lim), (1, stride))
    band_e = (ends_e - starts_e).T  # (n_frames, bands)
    return _amps_from_band_energy(band_e, window=window, shape=shape)


@functools.partial(jax.jit, static_argnames=("window", "stride", "fft_len",
                                             "shape"))
def _modulator_band_amps(signal, band_mat, *, window: int, stride: int,
                         fft_len: int, shape: str = "gaussian"):
    """(n_frames, n_bands) band amplitudes from sliding windowed FFTs — the
    literal FFTModulator form: per window, sqmag spectrum, band amplitude =
    sqrt(sum of sqmag over the band's bins) (vocoder.cpp:122-162). The
    window is the reference's 4-sigma Gaussian (SqMagFftOperation<
    Window::Gaussian>, vocoder.cpp:241); per-bin scale (2/sum_w)^2 makes a
    unit in-band sine read ~1 at fft_len == window.
    """
    n = signal.shape[0]
    n_frames = max(0, (n - window) // stride + 1)
    frames = stft_ops.frame_signal(signal, window, stride, n_frames)
    if shape == "gaussian":
        win = stft_ops.gaussian_window(window, sigmas=4.0)
    else:
        win = np.ones(window, np.float64)
    frames = frames * jnp.asarray(win, frames.dtype)[None, :]
    spec = jnp.fft.rfft(frames, n=fft_len)
    # amp^2 = (4/(fft_len*sum(w^2))) * sum_bins |F|^2: the band-limited
    # Parseval image of sqrt(2 E_w / sum(w^2)) — unit in-band sine -> amp 1
    # under any window, independent of the pow2 padding
    scale = 2.0 / np.sqrt(fft_len * float((win * win).sum()))
    sq = jnp.abs(spec) ** 2 * scale**2
    # precision=HIGHEST: TPU's default f32 matmul is bf16-grade; these are
    # VALUE-carrying energy sums (the -53 dB mixdown class, CLAUDE.md)
    return jnp.sqrt(jnp.matmul(sq, band_mat,
                               precision=jax.lax.Precision.HIGHEST))


@functools.partial(jax.jit, static_argnames=("stride", "fft_len", "use_matmul_dft"))
def _carrier_vocode(carrier, band_amps, band_mat_full, *, stride: int, fft_len: int,
                    use_matmul_dft: bool = False):
    """Modulate carrier FFT frames by band amplitudes and overlap-crossfade.

    Returns the vocoded signal of length n_frames*stride (frame r covers
    output samples [r*stride, (r+1)*stride)).
    """
    window = 2 * stride
    n = carrier.shape[0]
    n_frames = max(0, (n - window) // stride + 1)
    frames = stft_ops.frame_signal(carrier, window, stride, n_frames)
    # per-bin gain from that frame's band amplitudes (modulate_bands).
    # precision=HIGHEST: value-carrying — the TPU default's bf16-grade
    # products truncate every gain to ~0.4% (measured -56 dB on the vocoded
    # leg, round-5 fix; band_mat_full is 0/1 so HIGHEST makes this exact)
    gains = jnp.matmul(band_amps, band_mat_full.T,
                       precision=jax.lax.Precision.HIGHEST)  # (frames, bins)
    if use_matmul_dft:
        from ..ops import dft

        re, im = dft.rfft_matmul(frames, fft_len)
        sig = dft.irfft_matmul(re * gains, im * gains, fft_len, out_len=window)
    else:
        spec = jnp.fft.rfft(frames, n=fft_len)
        sig = jnp.fft.irfft(spec * gains, n=fft_len)[:, :window]

    # LINEAR equal-gain crossfade of the first half of frame r with the
    # second half of frame r-1: "during its 2nd half, 'old' contribution
    # goes linearily from 1 to 0" (vocoder.cpp:538-541); the xfade table
    # spans stride+1 points (good_stride forces that even, vocoder.cpp:89),
    # so step i = k+1 of the new frame weighs (k+1)/stride
    k = jnp.arange(stride)
    w_new = (k + 1.0) / stride
    w_old = 1.0 - w_new
    new_part = sig[:, :stride]
    old_part = jnp.concatenate(
        [jnp.zeros((1, stride), sig.dtype), sig[:-1, stride:]], axis=0
    )
    return (new_part * w_new[None, :] + old_part * w_old[None, :]).reshape(-1)


def vocode_filter_bank(modulator, carrier, params: VocoderParams, *,
                       order: int = 1, device_out: bool = False,
                       debug_dir=None) -> np.ndarray:
    """Filter-bank + envelope-follower vocoder variant.

    The reference preserves this pre-FFT design in comments
    (rt.resynth.lib.vocoder.cpp:46-79 BandPass/EnvelopeFollower, :368-381
    Modulator::feed, :700-717 Carrier::feed, orders :735-737): per band b
    with edges (f_lo, f_hi):
      modulator band   m_b = LP_N(f_hi, HP_N(f_lo, modulator))
      band envelope  env_b = LP_1(f_lo * env_follower_cutoff_ratio, |m_b|)
      carrier band     c_b = LP_N(f_hi, HP_N(f_lo, carrier))
      vocoded          out = sum_b env_b * c_b
    This is where `env_follower_cutoff_ratio` (rt.resynth.lib.cpp:985,
    default 1/20) acts. TPU form: bands stack on a leading axis; each
    one-pole cascade is an associative linear recurrence (ops/filters).
    """
    sr = params.sample_rate
    n = min(len(modulator), len(carrier))
    if n == 0:
        return np.zeros(0) if not device_out else jnp.zeros(0)
    fdt = jnp.float32
    mod = jnp.asarray(modulator, fdt)[:n]
    car = jnp.asarray(carrier, fdt)[:n]
    edges = params.band_freqs()
    f_lo = jnp.asarray(edges[:-1], fdt)[:, None]     # (B, 1)
    f_hi = jnp.asarray(edges[1:], fdt)[:, None]
    from ..ops import filters as flt
    from ..utils.convert import freq_to_angle_increment

    a_lo = flt.alpha_from_angle_increment(freq_to_angle_increment(f_lo, sr))
    a_hi = flt.alpha_from_angle_increment(freq_to_angle_increment(f_hi, sr))
    a_env = flt.alpha_from_angle_increment(freq_to_angle_increment(
        f_lo * params.env_follower_cutoff_ratio, sr))

    def band_pass(x):
        y = flt.cascade(jnp.broadcast_to(x[None, :], (len(edges) - 1, n)),
                        a_lo, order, kind="highpass")
        return flt.cascade(y, a_hi, order, kind="lowpass")

    m_b = band_pass(mod)
    env = flt.cascade(jnp.abs(m_b), a_env, 1, kind="lowpass")
    c_b = band_pass(car)
    vocoded = jnp.sum(env * c_b, axis=0)
    out = (params.volume_vocoded * vocoded
           + params.volume_modulator * mod
           + params.volume_carrier * car)
    if debug_dir is not None:
        from pathlib import Path

        from ..utils import wav as wavio

        d = Path(debug_dir)
        d.mkdir(parents=True, exist_ok=True)
        for b in range(env.shape[0]):
            wavio.write_wav(d / f"band_{b}.wav",
                            np.clip(np.asarray(env[b]), -1.0, 1.0), sr)
        wavio.write_wav(d / "vocoded.wav", np.asarray(vocoded), sr)
    return out if device_out else np.asarray(out)


def vocode(modulator, carrier, params: VocoderParams, *,
           exact_modulator: bool = False, device_out: bool = False,
           debug_dir=None) -> np.ndarray:
    """Offline vocoder: (modulator, carrier) mono arrays -> mono output.

    Output sample t mixes volume_modulator*modulator + volume_carrier*carrier
    + volume_vocoded*vocoded (Vocoder compute, vocoder.cpp:761-812).

    debug_dir: when set, every stage is tapped to WAVs there — modulator,
    carrier, per-band envelope signals, and the raw vocoded signal (the
    reference's IMJ_DEBUG_VOCODER AsyncWavWriter taps,
    rt.resynth.lib.vocoder.cpp:165-174,248-252).
    """
    sr = params.sample_rate
    S = params.stride
    W = params.modulator_window
    n = min(len(modulator), len(carrier))
    # f32 device path (transfer + FFT throughput); band envelopes and the
    # carrier modulation are perceptual quantities far above the f32 floor.
    # jnp.asarray keeps already-on-device signals on device.
    modulator = jnp.asarray(modulator, jnp.float32)[:n]
    carrier = jnp.asarray(carrier, jnp.float32)[:n]

    mod_fft = stft_ops.fft_length_for(W)
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = params.band_freqs()
    bm_mod = _band_matrix(edges, mod_fft // 2 + 1, sr / mod_fft)
    bm_car = _band_matrix(edges, car_fft // 2 + 1, sr / car_fft)

    n_mod_frames = max(0, (n - W) // S + 1)
    if exact_modulator:
        amps = _modulator_band_amps(
            jnp.asarray(modulator), jnp.asarray(bm_mod),
            window=W, stride=S, fft_len=mod_fft,
            shape=params.modulator_window_shape,
        )
    else:
        amps = _modulator_band_amps_fast(
            jnp.asarray(modulator), jnp.asarray(edges),
            window=W, stride=S, n_frames=n_mod_frames, sample_rate=sr,
            shape=params.modulator_window_shape,
        )

    # align: the carrier frame covering output [r*S, (r+1)*S) uses the most
    # recent modulator result available at its window end (2S + r*S): index
    # r - offset with offset = ceil((W - 2S)/S)
    n_car_frames = max(0, (n - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0, max(len(amps) - 1, 0))
    if len(amps) == 0:
        return np.zeros(0)
    amps_aligned = amps[jnp.asarray(rows)]  # device-side alignment gather

    vocoded = (_carrier_vocode(
        jnp.asarray(carrier), jnp.asarray(amps_aligned), jnp.asarray(bm_car),
        stride=S, fft_len=car_fft,
        use_matmul_dft=stft_ops.use_matmul_dft_default(carrier.dtype),
    ))
    # vocoded sample t corresponds to input sample t (frame r's new-half
    # starts at carrier sample r*S)
    out_len = len(vocoded)
    out = (params.volume_vocoded * vocoded
           + params.volume_modulator * modulator[:out_len]
           + params.volume_carrier * carrier[:out_len])
    if debug_dir is not None:
        from pathlib import Path

        from ..utils import wav as wavio

        d = Path(debug_dir)
        d.mkdir(parents=True, exist_ok=True)
        wavio.write_wav(d / "modulator.wav", np.asarray(modulator), sr)
        wavio.write_wav(d / "carrier.wav", np.asarray(carrier), sr)
        # band envelopes at analysis rate, upsampled to audio rate by hold
        env = np.repeat(np.asarray(amps_aligned), S, axis=0)[:out_len]
        for b in range(env.shape[1]):
            wavio.write_wav(d / f"band_{b}.wav",
                            np.clip(env[:, b], -1.0, 1.0), sr)
        wavio.write_wav(d / "vocoded.wav", np.asarray(vocoded), sr)
    return out if device_out else np.asarray(out)
