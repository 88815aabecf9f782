"""Oscillator bank primitives — parallel over voices AND time.

The reference advances each oscillator one sample at a time (`Phased::step`,
include/audioelement.h:1450-1467; `SineOscillatorAlgo::step` complex rotation +
renormalization, include/audioelement.h:2413-2451). On TPU we instead compute
the full phase trajectory of a block in closed form:

    phases = wrap(phase0 + cumsum(increments))        # parallel prefix, VPU
    sine   = sin(pi * phases)                          # exact, no drift

which is parallel over (voices, time) with no recurrence. The complex-rotation
trick exists only to avoid a per-sample `sin` call on scalar CPUs; evaluating
`sin` vectorized is both faster and more accurate here (no renormalization
error), so we keep the reference's *angle convention* (units of rad/pi, period
2 — include/sound.functions.h:57-62) but not its iteration scheme.

Waveform functions follow include/sound.functions.h:86-138, and the anti-alias
gain follows freqAliasingMultiplicator (include/audioelement.h:466-483).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def wrap_phase(phase):
    """Normalize phase into [0, 2) (reference phaseToNormalForm, audioelement.h:417-428)."""
    return jnp.mod(phase, 2.0)


def chunked_cumsum(x, *, axis: int = -1, chunk: int = 128,
                   wrap: float | None = None):
    """Inclusive cumsum along `axis` as two levels of triangular matmuls.

    Rationale: XLA lowers big `jnp.cumsum` to an O(n^2) triangular product and
    `lax.associative_scan` to an O(log n)-deep slice/concat ladder whose
    compile time is pathological for L ~ 1e5 (tens of seconds per shape).
    Reshaping to (L/c, c) chunks turns the same prefix sum into
        within = x_chunks @ upper_triangular_ones(c)        # one MXU matmul
        offs   = exclusive_cumsum(chunk_totals)             # recurse on L/c
    which compiles in milliseconds and runs on the MXU on TPU.

    precision=HIGHEST is REQUIRED: the TPU's default f32 matmul precision is
    bf16-grade, which scrambles accumulated phases (a -5 dB render error seen
    on hardware, invisible in CPU tests).

    wrap: when the result is only meaningful modulo `wrap` (phase
    accumulation: angles are mod 2 rad/pi), chunk totals are wrapped before
    recursing so f32 magnitudes stay ~chunk-sized instead of O(sum) — the
    absolute error of the wrapped cumsum stays ~1e-5 at ANY length instead of
    growing with the running total.
    """
    x = jnp.asarray(x)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    L = x.shape[-1]
    prec = jax.lax.Precision.HIGHEST
    if L <= chunk:
        tri = jnp.tril(jnp.ones((L, L), x.dtype))  # out[j] = sum_{i<=j} x[i]
        out = jnp.einsum("...i,ji->...j", x, tri, precision=prec)
    else:
        pad = (-L) % chunk
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        xc = xp.reshape(*x.shape[:-1], (L + pad) // chunk, chunk)
        tri = jnp.tril(jnp.ones((chunk, chunk), x.dtype))
        within = jnp.einsum("...i,ji->...j", xc, tri, precision=prec)
        totals = within[..., -1]
        if wrap is not None:
            totals = jnp.mod(totals, wrap)
        offs = chunked_cumsum(totals, chunk=chunk, wrap=wrap) - totals
        out = (within + offs[..., None]).reshape(*x.shape[:-1], L + pad)[..., :L]
    if axis != -1 and axis != out.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def phase_trajectory(phase0, increments, *, axis: int = -1):
    """Integrate per-sample angle increments into per-sample phases.

    Args:
      phase0: starting phase(s), shape = increments.shape without `axis`.
      increments: per-sample angle increments (rad/pi), any batch shape.
      axis: the time axis of `increments`.

    Returns:
      (phases, final_phase): phases has the shape of `increments`; each phase
      is the angle *after* stepping (matches the reference where `step()`
      advances the angle before the sample is read). final_phase re-enters the
      next block as phase0.
    """
    cum = chunked_cumsum(increments, axis=axis, wrap=2.0)
    phase0 = jnp.asarray(phase0)
    phases = wrap_phase(jnp.expand_dims(phase0, axis) + cum)
    final = jnp.take(phases, jnp.array([-1]), axis=axis)
    final = jnp.squeeze(final, axis=axis)
    return phases, final


def phase_trajectory_const(phase0, increment, n: int, *, dtype=jnp.float32):
    """Phases for a constant frequency, avoiding cumsum error accumulation.

    phase[t] = wrap(phase0 + (t+1) * increment). Shapes broadcast:
    phase0/increment (...,) -> (..., n).
    """
    t = jnp.arange(1, n + 1, dtype=dtype)
    ph = jnp.expand_dims(jnp.asarray(phase0, dtype), -1) + jnp.expand_dims(
        jnp.asarray(increment, dtype), -1
    ) * t
    return wrap_phase(ph)


def sine(phases):
    """sin of a rad/pi phase.

    float32 (the fast render path) uses the degree-9 sin(pi*x) polynomial
    (ops/fastmath.py, ~ -138 dB error — below f32 roundoff); float64 (the
    verification path) keeps the exact libm sin.
    """
    phases = jnp.asarray(phases)
    if phases.dtype == jnp.float64:
        return jnp.sin(jnp.asarray(np.pi, phases.dtype) * phases)
    from . import fastmath

    return fastmath.sinpi(phases)


def cosine(phases):
    return jnp.cos(jnp.asarray(np.pi, phases.dtype) * phases)


def saw(phases):
    """0..1 -> 0..1 then 1..2 -> -1..0 (reference sound.functions.h:127-138)."""
    return jnp.where(phases <= 1.0, phases, phases - 2.0)


def square(phases):
    """+1 except (0.5, 1.5) -> -1 (reference sound.functions.h:86-95)."""
    return jnp.where((phases > 0.5) & (phases < 1.5), -1.0, 1.0).astype(phases.dtype)


def triangle(phases):
    """0..0.5 -> 0..1, 0.5..1.5 -> 1..-1, 1.5..2 -> -1..0 (sound.functions.h:114-125)."""
    return jnp.where(
        phases < 0.5,
        2.0 * phases,
        jnp.where(phases < 1.5, 2.0 - 2.0 * phases, -4.0 + 2.0 * phases),
    )


def pulse(phases, pulse_width, high, low):
    """`high` while phase < width else `low` (reference sound.functions.h:97-112)."""
    return jnp.where(phases < pulse_width, high, low)


def pulse_train_levels(pulse_width):
    """DC-free (high, low) levels for a given width (PulseTrainAlgo_::setPulseWidth,
    include/audioelement.h:1699-1718): high = (2-w)/2, low = high-1."""
    w = jnp.clip(pulse_width, 0.0, 2.0)
    high = 0.5 * (2.0 - w)
    return high, high - 1.0


def freq_aliasing_multiplicator(increment):
    """Smooth gain fade approaching the aliasing limit.

    reference include/audioelement.h:466-483: with halfSamplesPerPeriod =
    1/|inc|, gain ramps 0 -> 1 as hspp goes 1 -> 4 (i.e. frequencies above
    sr/8 start fading, silent beyond Nyquist).
    """
    inc = jnp.abs(jnp.asarray(increment))
    hspp = jnp.where(inc == 0.0, jnp.inf, 1.0 / jnp.maximum(inc, 1e-30))
    return jnp.clip((hspp - 1.0) / 3.0, 0.0, 1.0)


def ring_modulate(a, b):
    """Elementwise product of two signals — RingModulationAlgo
    (include/audioelement.h:3183-3271: `imag() = osc1.imag() * osc2.imag()`,
    both members stepped in lockstep). In array form the members are any two
    rendered signals (oscillator banks, noise, envelopes)."""
    return jnp.asarray(a) * jnp.asarray(b)


def ring_modulate_sines(inc1, inc2, n: int, *, phase1=0.0, phase2=0.0,
                        dtype=jnp.float32):
    """Classic two-sine ring mod at constant increments (the shape the
    reference's Sounds cache preallocates as `ringmods`, include/sounds.h:
    5-89): returns sin(pi*ph1(t)) * sin(pi*ph2(t)) over n samples."""
    p1 = phase_trajectory_const(phase1, inc1, n, dtype=dtype)
    p2 = phase_trajectory_const(phase2, inc2, n, dtype=dtype)
    return ring_modulate(sine(p1), sine(p2))


def mixdown(signals, gains):
    """Sum a voice bank into output channels on the MXU.

    signals: (V, T) per-voice samples; gains: (V, C) per-voice channel gains.
    Returns (T, C). This replaces the reference's serial
    `buffer[i] += voice.imag(j)` accumulation (gen.crtp.h:350-378).
    """
    # precision=HIGHEST: TPU's default f32 matmul is bf16-grade — on the
    # final mix bus that is an audible ~-50 dB noise floor (CLAUDE.md)
    return jnp.einsum(
        "vt,vc->tc", signals, gains, preferred_element_type=signals.dtype,
        precision=jax.lax.Precision.HIGHEST
    )
