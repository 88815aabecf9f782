"""One-pole IIR filter cascades — time-parallel via associative scan.

The reference's `Filter<T, 1, KIND, ORDER>` (from cpp.algorithms; used at
include/audioelement.h:2058 for Low/HighPassAlgo and at
include/audioelement.h:1227 for volume smoothing) is a cascade of ORDER
identical one-pole sections, configured from an angle increment
(`initWithAngleIncrement`) and stepped one sample at a time.

TPU-first design: a first-order recurrence y[t] = a[t]*y[t-1] + b[t] is
solved for a whole block with `jax.lax.associative_scan` (O(log T) depth,
parallel over voices); an ORDER-deep cascade is ORDER chained scans. When the
coefficient is constant over the block (every mode except the noise-driven
wind filters), the whole cascade collapses to a single FFT convolution with
the analytic impulse response h[n] = alpha^N * C(n+N-1, N-1) * (1-alpha)^n —
one O(T log T) parallel op regardless of ORDER (the reference itself notes FFT
is preferable for steep filters, source/rt.resynth.lib.vocoder.cpp:735-737).

Coefficient mapping: the cascade's per-section magnitude follows the analog RC
prototype |H_lp|^2 = 1/(1+(f/fc)^2) that the reference's band-gain
compensation assumes (BandPassAlgo_::setCompensation's cross-check,
include/audioelement.h:2129-2143). We use the impulse-invariant mapping
alpha = 1 - exp(-pi * inc), whose time constant is proportional to the signal
period as the volume-smoothing comment requires (audioelement.h:1200).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def alpha_from_angle_increment(increment):
    """EMA coefficient for a cutoff given as angle increment (rad/pi)."""
    inc = jnp.abs(jnp.asarray(increment))
    return 1.0 - jnp.exp(-jnp.asarray(np.pi, inc.dtype) * inc)


def linear_recurrence(a, b, y0=0.0, *, axis: int = -1):
    """Solve y[t] = a[t] * y[t-1] + b[t] in parallel (associative scan).

    a, b: same shape, time on `axis`. y0 broadcastable to the non-time shape.
    Returns y with the same shape as b.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a, b = jnp.broadcast_arrays(a, b)
    # fold y0 into the first step: y[0] = a[0]*y0 + b[0]
    y0 = jnp.asarray(y0, b.dtype)
    b0 = jnp.take(b, jnp.array([0]), axis=axis) + jnp.take(a, jnp.array([0]), axis=axis) * jnp.expand_dims(y0, axis)

    b = jax.lax.dynamic_update_slice_in_dim(b, b0, 0, axis)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, b1 * a2 + b2

    _, y = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return y


def chunked_affine_scan(a, b, y0=0.0, *, axis: int = -1, chunk: int = 64):
    """Exact y[t] = a[t]*y[t-1] + b[t], compile-light at long L.

    Same recurrence as `linear_recurrence`, but shaped for XLA the way
    `oscillators.chunked_cumsum` shapes prefix sums: reshape time into
    (L/chunk, chunk) so the sequential dependency runs only over the chunk
    axis — an unrolled loop of `chunk` fused elementwise steps, each
    vectorized over all (batch, L/chunk) lanes at once — then recurse on the
    per-chunk carries (depth log_chunk L). `lax.associative_scan`'s
    slice/concat ladder compiles pathologically at L ~ 1e5 and a plain
    `lax.scan` costs ~0.2 ms per step on TPU regardless of body size; this
    form compiles in milliseconds and runs as a handful of fused kernels.

    Exact (not closed-form): every output is produced by the literal
    recurrence; chunk carries re-enter through the within-chunk cumulative
    coefficient product, so ordering differs from the sequential evaluation
    only by one product/add association per chunk boundary.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a, b = jnp.broadcast_arrays(a, b)
    if axis != -1 and axis != b.ndim - 1:
        a = jnp.moveaxis(a, axis, -1)
        b = jnp.moveaxis(b, axis, -1)
    L = b.shape[-1]
    # fold y0 into the first step: y[0] = a[0]*y0 + b[0]
    y0 = jnp.asarray(y0, b.dtype)
    b = jnp.concatenate(
        [b[..., :1] + a[..., :1] * jnp.expand_dims(y0, -1), b[..., 1:]],
        axis=-1)

    def scan_flat(a, b):
        L = b.shape[-1]
        if L <= 1:
            return b
        c = min(chunk, L)
        pad = (-L) % c
        if pad:
            # identity steps: y stays on the previous value
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                        constant_values=1)
            b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
        nc = (L + pad) // c
        ac = a.reshape(*a.shape[:-1], nc, c)
        bc = b.reshape(*b.shape[:-1], nc, c)
        y, P = bc[..., 0], ac[..., 0]
        ys, Ps = [y], [P]
        for t in range(1, c):
            y = ac[..., t] * y + bc[..., t]
            P = P * ac[..., t]
            ys.append(y)
            Ps.append(P)
        ylocal = jnp.stack(ys, axis=-1)
        Ploc = jnp.stack(Ps, axis=-1)
        # carries: z[k] = A[k]*z[k-1] + B[k] over the chunk axis
        z = scan_flat(Ploc[..., -1], ylocal[..., -1])
        carry = jnp.concatenate([jnp.zeros_like(z[..., :1]), z[..., :-1]],
                                axis=-1)
        out = ylocal + Ploc * carry[..., None]
        return out.reshape(*b.shape[:-1], L + pad)[..., :L]

    out = scan_flat(a, b)
    if axis != -1 and axis != out.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def onepole_lowpass(x, alpha, y0=0.0, *, axis: int = -1):
    """y[t] = y[t-1] + alpha*(x[t] - y[t-1]); alpha scalar, per-voice or per-sample."""
    x = jnp.asarray(x)
    alpha = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), x.shape)
    return linear_recurrence(1.0 - alpha, alpha * x, y0, axis=axis)


def onepole_highpass(x, alpha, y0=0.0, *, axis: int = -1):
    """Complementary one-pole high-pass: x - lowpass(x)."""
    return jnp.asarray(x) - onepole_lowpass(x, alpha, y0, axis=axis)


def cascade(x, alpha, order: int, *, kind: str = "lowpass", axis: int = -1, y0=0.0):
    """ORDER identical one-pole sections in series (reference Filter<_,1,KIND,ORDER>).

    `order` is static. alpha may vary per sample (wind-mode noise-driven
    cutoffs). All sections start from the same y0 (default 0).
    """
    f = onepole_lowpass if kind == "lowpass" else onepole_highpass
    y = x
    for _ in range(order):
        y = f(y, alpha, y0, axis=axis)
    return y


def cascade_impulse_response(alpha, order: int, length: int, dtype=jnp.float32):
    """Analytic impulse response of an `order`-stage one-pole lowpass cascade.

    h[n] = alpha^order * C(n+order-1, order-1) * (1-alpha)^n, computed in log
    space for numerical stability at high orders.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    n = jnp.arange(length, dtype=jnp.float32)
    log_binom = (
        jax.lax.lgamma(n + order) - jax.lax.lgamma(n + 1.0) - jax.lax.lgamma(float(order))
    )
    log_h = order * jnp.log(jnp.maximum(alpha, 1e-30)) + log_binom + n * jnp.log(
        jnp.maximum(1.0 - alpha, 1e-30)
    )
    return jnp.exp(log_h).astype(dtype)


def cascade_fft(x, alpha, order: int, *, kind: str = "lowpass", ir_length: int | None = None):
    """Constant-coefficient cascade via FFT convolution (time axis last).

    Equivalent to `cascade` with scalar alpha, but a single parallel op —
    the fast path for high-order offline filtering (e.g. wind programs with
    order up to ~89, source/main.birds.cpp:82).
    """
    x = jnp.asarray(x)
    T = x.shape[-1]
    if ir_length is None:
        ir_length = T
    h = cascade_impulse_response(alpha, order, ir_length, dtype=x.dtype)
    n_fft = 1
    while n_fft < T + ir_length - 1:
        n_fft *= 2
    X = jnp.fft.rfft(x, n=n_fft)
    Hf = jnp.fft.rfft(h, n=n_fft)
    y = jnp.fft.irfft(X * Hf, n=n_fft)[..., :T].astype(x.dtype)
    if kind == "highpass":
        # N-stage complementary HP differs from x - LP^N; build it recursively:
        # hp^N(x) = hp(hp^{N-1}(x)); hp(x) = x - lp(x). In the frequency domain
        # HP^N = (1 - LP)^N, so convolve with the expanded impulse response.
        delta = jnp.zeros(ir_length, x.dtype).at[0].set(1.0)
        h_hp1 = delta - h if order == 1 else None
        if h_hp1 is None:
            h1 = cascade_impulse_response(alpha, 1, ir_length, dtype=x.dtype)
            Hf1 = jnp.fft.rfft(jnp.zeros(n_fft, x.dtype).at[0].set(1.0)) - jnp.fft.rfft(
                h1, n=n_fft
            )
            y = jnp.fft.irfft(X * Hf1**order, n=n_fft)[..., :T].astype(x.dtype)
        else:
            y = jnp.fft.irfft(X * jnp.fft.rfft(h_hp1, n=n_fft), n=n_fft)[..., :T].astype(
                x.dtype
            )
    return y


def band_gain_compensation(width_factor, order: int):
    """Equal-center-power gain for the HP(LP) band-pass cascade.

    reference BandPassAlgo_::setCompensation (include/audioelement.h:2129-2144):
    compensation = (1 + 1/width_factor^2)^ORDER.
    """
    sq_inv = 1.0 / (jnp.asarray(width_factor) ** 2)
    return (1.0 + sq_inv) ** order
