"""WIND mode: pink-noise-driven filter textures (rain, wind, bubbles...).

Reference composition (include/soundengine.h:196-222 MixOf<WIND> +
gen.voice.h:955-985 wiring):
    Mix[ LowPass<pink, N>,
         AsymBandPass<pink, N>   (center + width driven by slow |pink| noise),
         AsymBandReject<pink, N>,
         loudness-adjusted sine  (freq = long-term noise walk * short wobble) ]
Controls:
  - long-term control: |pink| sampled every n_slow_long samples, interpolated
    (SlowIter/AbsIter/Ctrl, audioelement.h:2823-3029), mapped exponentially
    into the angle-increment range of the center octaves (SoundEngineFreqCtrl,
    soundengine.h:48-104; octave -> 10*2^octave Hz, gen.voice.h:855-861)
  - short-term wobble: inc *= 2^(noise*amp), noise rate inversely
    proportional to the long-term frequency (ShortTermNoiseAdderCtrl,
    soundengine.h:107-173)
  - band width: 2^lerp(width_range, |noise|), gain-compensated
    (BandAlgo_::step, audioelement.h:2288-2302)

TPU-native: noise-walk positions are cumsums, table reads are gathers, and
the order-N one-pole cascades with per-sample cutoffs run as a fori_loop of
associative scans (one compile regardless of order; the reference's hardest
preset is order 129 'Bubbles').

The reference leaves the LowPass member's cutoff at its filter default (no
setFilterAngleIncrements call reaches it; soundengine.h:217 declares the
member, gen.voice.h wires only the band algos). By default this renderer
instead tracks the main control frequency — a documented divergence that
makes the member musically useful. For parity work `lowpass_mode` selects
the plausible reference defaults instead: the `Filter` type lives in the
absent cpp.algorithms sibling, so its never-initialized coefficient is
either 0 (member contributes silence -> "mute") or passes the signal
unfiltered ("bypass"); both are provided. NB every factory preset leaves
PINK_NOISE_LP_GAIN at its make_common default of 0 (gen.voice.h:625-699),
so the choice is inaudible for all 27 programs either way — it only
matters for user programs that raise the LP gain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import oscillators
from ..ops.filters import linear_recurrence
from ..ops.noise import get_noise_tables
from ..utils.interp import Itp, ease
from .soundengine import _loudness_lut
from .voice_presets import Mode, VoiceProgram


def _slow_noise(table, pos):
    """Sample a looping table at fractional positions with linear interp."""
    n = table.shape[0]
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    v0 = table[jnp.mod(i0, n)]
    v1 = table[jnp.mod(i0 + 1, n)]
    return v0 + (v1 - v0) * frac


def _cascade_dynamic(x, alpha, order, *, kind: str, stage_gain=None):
    """Order-N one-pole cascade with per-sample alpha via fori_loop of scans.

    stage_gain: optional per-sample gain applied after EVERY stage. The
    band-pass gain compensation (1 + 1/wf^2)^ORDER (BandPassAlgo_::
    setCompensation, audioelement.h:2129-2143) reaches 2^ORDER at width
    factor 1 while the cascade output shrinks like 2^-ORDER — exact in the
    reference's f64 scalar math, catastrophic in f32 when applied as one
    end factor. Distributing one (1+1/wf^2)^(1/ORDER)-per-stage factor is
    algebraically identical and keeps every intermediate O(1).
    """

    def lp_body(_, y):
        y = linear_recurrence(1.0 - alpha, alpha * y)
        return y if stage_gain is None else stage_gain * y

    def hp_body(_, y):
        y = y - linear_recurrence(1.0 - alpha, alpha * y)
        return y if stage_gain is None else stage_gain * y

    body = lp_body if kind == "lowpass" else hp_body
    return jax.lax.fori_loop(0, order, body, x)


@functools.partial(jax.jit, static_argnames=("T", "order", "itp_long", "dtype",
                                             "lowpass_mode"))
def _render_wind(pink, offsets, params, lut, lut_lo, lut_step, gains,
                 *, T: int, order: int, itp_long, dtype: str,
                 lowpass_mode: str = "control"):
    wdt = jnp.dtype(dtype)
    t = jnp.arange(T, dtype=wdt)
    (n_slow_long, n_slow_short, ratio_amp, log_inc_min, log_inc_max,
     inv_approx, w_min, w_max, lp_gain, bp_gain, br_gain, sine_gain,
     xfade, velocity) = (params[i] for i in range(14))

    def slow_abs_ctrl(off, itp_code):
        pos = off + t / jnp.maximum(n_slow_long, 1.0)
        i0 = jnp.floor(pos)
        frac = pos - i0
        if itp_code is not None and itp_code != int(Itp.LINEAR):
            frac = ease(itp_code, frac)
        n = pink.shape[0]
        ii = jnp.mod(i0.astype(jnp.int32), n)
        v0 = jnp.abs(pink[ii])
        v1 = jnp.abs(pink[jnp.mod(ii + 1, n)])
        return v0 + (v1 - v0) * frac

    def exp_map(v):
        v = v * inv_approx
        return jnp.exp(log_inc_min + (log_inc_max - log_inc_min) * v)

    # main control: long-term walk + short-term wobble (soundengine.h:134-143)
    inc_long = exp_map(slow_abs_ctrl(offsets[0], itp_long))
    short_rate = 1.0 / (1.0 + n_slow_short / jnp.maximum(inc_long, 1e-9))
    pos_short = offsets[1] + oscillators.chunked_cumsum(short_rate)
    wobble = _slow_noise(pink, pos_short)
    inc_main = inc_long * jnp.exp2(wobble * ratio_amp)

    # sine member with equal-loudness volume
    phase = oscillators.wrap_phase(oscillators.chunked_cumsum(inc_main, wrap=2.0))
    idx = jnp.clip((jnp.log2(jnp.maximum(inc_main, 1e-9)) - lut_lo) / lut_step,
                   0.0, lut.shape[0] - 1.001)
    i0 = idx.astype(jnp.int32)
    fr = idx - i0
    lvol = lut[i0] * (1.0 - fr) + lut[i0 + 1] * fr
    y_sine = lvol * oscillators.sine(phase) * oscillators.freq_aliasing_multiplicator(inc_main)

    # source noise (BufferIter with randomized start, sound.h:181-233)
    n = pink.shape[0]
    src = pink[jnp.mod(offsets[2].astype(jnp.int32) + jnp.arange(T), n)]

    def band_member(off_center, off_width, kind: str):
        center = exp_map(slow_abs_ctrl(off_center, itp_long))
        wn = slow_abs_ctrl(off_width, None)
        wf = jnp.exp2(w_min + (w_max - w_min) * jnp.clip(wn, 0.0, 1.0))
        low = center / wf
        high = center * wf
        a_low = 1.0 - jnp.exp(-jnp.pi * low)
        a_high = 1.0 - jnp.exp(-jnp.pi * high)
        if kind == "bandpass":
            # compensation (1 + 1/wf^2)^order distributed as sqrt-per-stage
            # across the 2*order stages (see _cascade_dynamic docstring)
            g = jnp.sqrt(1.0 + 1.0 / (wf * wf))
            y = _cascade_dynamic(src, a_high, order, kind="lowpass",
                                 stage_gain=g)
            y = _cascade_dynamic(y, a_low, order, kind="highpass",
                                 stage_gain=g)
            return y
        # band-reject: LP at low + HP at high (audioelement.h:2186-2241)
        return (_cascade_dynamic(src, a_low, order, kind="lowpass")
                + _cascade_dynamic(src, a_high, order, kind="highpass"))

    y_bp = band_member(offsets[3], offsets[4], "bandpass")
    y_br = band_member(offsets[5], offsets[6], "bandreject")
    if lowpass_mode == "control":  # documented divergence (module docstring)
        a_main = 1.0 - jnp.exp(-jnp.pi * inc_main)
        y_lp = _cascade_dynamic(src, a_main, order, kind="lowpass")
    elif lowpass_mode == "bypass":  # reference default if Filter init passes
        y_lp = src
    else:  # "mute": reference default if the uninitialized coefficient is 0
        y_lp = jnp.zeros_like(src)

    mix = lp_gain * y_lp + bp_gain * y_bp + br_gain * y_br + sine_gain * y_sine
    env = jnp.clip((t + 1.0) / jnp.maximum(xfade, 1.0), 0.0, 1.0)
    sig = velocity * env * mix
    return sig[:, None] * gains[None, :]


def render_program(program: VoiceProgram, n_samples: int, sample_rate: int = 44100,
                   *, seed: int = 1, velocity: float = 1.0, pan: float | None = None,
                   n_channels: int = 2, dtype: str = "float32",
                   lowpass_mode: str = "control") -> np.ndarray:
    """Render a WIND program to (n_samples, C).

    lowpass_mode: "control" (default; LP member tracks the main control
    frequency), "mute" or "bypass" (the two plausible reference defaults —
    see module docstring)."""
    p = program
    assert p.mode is Mode.WIND
    rng = np.random.default_rng(seed)
    tables = get_noise_tables(sample_rate)
    pink = tables["pink"]
    inv_approx = 1.0 / (2.0 * tables["pink_abs_mean"])

    f_lo = 10.0 * 2.0**p.center_octave_min
    f_hi = 10.0 * 2.0**p.center_octave_max
    inc_lo = 2.0 * min(f_lo, f_hi) / sample_rate
    inc_hi = 2.0 * max(f_lo, f_hi) / sample_rate

    n_slow_long = sample_rate * p.seconds_slow_iter_long
    n_slow_short = sample_rate * p.seconds_slow_iter_short
    xfade = int(0.5 + p.xfade_seconds * sample_rate)

    params = np.array([
        n_slow_long, n_slow_short, p.center_short_term_ratio,
        np.log(inc_lo), np.log(inc_hi), inv_approx,
        p.bp_width_min, p.bp_width_max,
        p.pink_lp_gain, p.pink_bp_gain, p.pink_br_gain, p.sine_gain,
        xfade, velocity * p.gain,
    ])
    offsets = rng.uniform(0, len(pink) - 1, 7)

    if pan is None:
        pan = float(rng.uniform(-1.0, 1.0))
    th = 0.25 * np.pi * (pan + 1.0)
    gains = np.array([np.cos(th), np.sin(th)])[:n_channels]
    if n_channels == 1:
        gains = np.ones(1)

    lut_lo, lut_step, lut = _loudness_lut(
        p.loudness_ref_freq_index, p.loudness_compensation, p.loudness_level,
        sample_rate,
    )
    dt = np.dtype(dtype)
    out = _render_wind(
        jnp.asarray(pink, dt), jnp.asarray(offsets, dt), jnp.asarray(params, dt),
        jnp.asarray(lut, dt), jnp.asarray(lut_lo, dt), jnp.asarray(lut_step, dt),
        jnp.asarray(gains, dt),
        T=n_samples, order=int(p.filter_order), itp_long=int(p.interpolation),
        dtype=dtype, lowpass_mode=lowpass_mode,
    )
    return np.asarray(out)
