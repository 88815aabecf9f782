"""AHDSR envelopes in closed form — parallel over voices AND time.

The reference implements the envelope as a per-sample state machine
(EnvelopeCRT::step + AHDSREnvelopeBase::stepPressed,
include/audioelement.h:666-1099) with states
KeyPressed{Attacking,Holding,Decaying,Sustaining} / KeyReleased / Done.

Because every phase has a known, fixed duration and a known interpolation
curve, the envelope value at sample t is a *closed-form* function of
(t - press_time, release_time, params). We evaluate that closed form for a
whole (voices, time) tile at once — no recurrence, no state machine on the
device. The voice-ownership state machine (EnvelopeStateAcquisition CAS,
audioelement.h:354-399) becomes host-side voice allocation in core/voices.py.

Semantics matched to the reference:
  - attack starts at `press`; sample k of attack (k=0..A-1) has value
    ease_attack((k+1)/A)  [ahdCounter is incremented before interpolation,
    audioelement.h:960-999]
  - hold (H samples) at 1, then decay sample k has 1+(S-1)*ease_decay((k+1)/D),
    then sustain at S
  - no decay phase when sustain > 0.999999 (setAHDSR, audioelement.h:928-945)
  - release starting at sample r: value tops out at env(r-1) =: top, sample k
    of release (k=0..R-1) has top*(1-ease_release((k+1)/R))  [counter is
    incremented before interpolation, audioelement.h:732-742]
  - a release at or before the press skips the note entirely
    (audioelement.h:774-777)
  - `ReleaseAfterDecay` mode auto-releases at press+A+H+D
    (audioelement.h:960-971)
  - safety minimums: attack/decay/release >= minChangeDuration
    (getMaxCounterForAHD / getReleaseTime, audioelement.h:1002-1084); the
    Enveloped wrapper sets minChangeDuration = 2.5 signal periods
    (audioelement.h:216-225); non-zero-attack envelopes also impose >= 1ms
    (normalizedMinDt, audioelement.h:863-872)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..utils.interp import Itp, ease_select

NEVER = np.int64(2**62)  # sentinel for "key never released"


@dataclass
class AHDSR:
    """AHDSR parameters; scalars or per-voice arrays (broadcast against time).

    Durations are in samples (like the reference's int32 fields,
    audioelement.h:314-322).
    """

    attack: Any = 100000
    attack_itp: Any = int(Itp.LINEAR)
    hold: Any = 0
    decay: Any = 100000
    decay_itp: Any = int(Itp.LINEAR)
    release: Any = 100000
    release_itp: Any = int(Itp.LINEAR)
    sustain: Any = 0.5

    def with_min_dt(self, sample_rate: int, *, allow_zero_attack: bool = False) -> "AHDSR":
        """Apply the reference's 1ms floor (normalizedMinDt) to A/D/R."""
        if allow_zero_attack:
            return self
        min_dt = sample_rate // 1000
        return AHDSR(
            attack=np.maximum(self.attack, min_dt),
            attack_itp=self.attack_itp,
            hold=np.maximum(self.hold, 0),
            decay=np.maximum(self.decay, min_dt),
            decay_itp=self.decay_itp,
            release=np.maximum(self.release, min_dt),
            release_itp=self.release_itp,
            sustain=self.sustain,
        )


def min_change_duration_from_increment(increment):
    """Enveloped's anti-crack floor: 2.5 signal periods in samples
    (audioelement.h:216-225; period = 2/|inc| per sound.functions.h:70-76)."""
    inc = jnp.abs(jnp.asarray(increment))
    return 2.5 * 2.0 / jnp.maximum(inc, 1e-9)


def ahdsr_envelope(
    t,
    params: AHDSR,
    press,
    release=NEVER,
    *,
    min_change=0.0,
    auto_release: bool = False,
    dtype=jnp.float32,
):
    """Closed-form AHDSR value at absolute sample indices `t`.

    Args:
      t: (T,) or (..., T) absolute sample indices (integer or float).
      params: AHDSR with fields broadcastable to the voice shape, e.g. (V, 1).
      press: absolute index of the first attack sample, broadcastable (V, 1).
      release: absolute index of the first release sample; NEVER if none.
      min_change: per-voice safety duration in samples (2.5 periods).
      auto_release: EnvelopeRelease::ReleaseAfterDecay mode.

    Returns: envelope values, broadcast shape of the inputs (V, T).
    """
    f = lambda x: jnp.asarray(x, dtype)
    t = f(t)
    press = f(press)
    release = f(release)
    min_change = f(min_change)

    sustain_raw = f(params.sustain)
    has_decay = sustain_raw < 0.999999
    sustain = jnp.where(has_decay, jnp.clip(sustain_raw, 0.0, 1.0), 1.0)

    A = jnp.maximum(f(params.attack), min_change)
    A = jnp.maximum(A, 1.0)
    H = jnp.maximum(f(params.hold), 0.0)
    D = jnp.where(has_decay, jnp.maximum(jnp.maximum(f(params.decay), min_change), 1.0), 0.0)
    R = jnp.maximum(jnp.maximum(f(params.release), min_change), 1.0)

    a_itp = jnp.asarray(params.attack_itp)
    d_itp = jnp.asarray(params.decay_itp)
    r_itp = jnp.asarray(params.release_itp)

    if auto_release:
        release = jnp.minimum(release, press + A + H + D)

    def env_pressed(tp):
        """Envelope during the pressed phases at local time tp (>= 0)."""
        va = ease_select(a_itp, (tp + 1.0) / A)
        vd = 1.0 + (sustain - 1.0) * ease_select(d_itp, (tp - A - H + 1.0) / D_safe)
        return jnp.where(
            tp < A, va, jnp.where(tp < A + H, 1.0, jnp.where(tp < A + H + D, vd, sustain))
        )

    D_safe = jnp.maximum(D, 1.0)

    skipped = release <= press  # pressed and immediately released -> no note
    tp = t - press
    top = env_pressed(release - 1.0 - press)
    k_rel = t - release + 1.0
    v_rel = top * (1.0 - ease_select(r_itp, k_rel / R))

    env = jnp.where(
        (tp < 0) | skipped,
        0.0,
        jnp.where(t < release, env_pressed(tp), jnp.where(k_rel < R, v_rel, 0.0)),
    )
    return env


def envelope_end_time(params: AHDSR, press, release, *, min_change=0.0,
                      auto_release: bool = False):
    """First sample index at which the envelope is guaranteed 0 forever after."""
    A = np.maximum(np.maximum(np.asarray(params.attack, np.float64), min_change), 1.0)
    H = np.maximum(np.asarray(params.hold, np.float64), 0.0)
    sustain = np.asarray(params.sustain, np.float64)
    has_decay = sustain < 0.999999
    D = np.where(has_decay, np.maximum(np.maximum(np.asarray(params.decay, np.float64), min_change), 1.0), 0.0)
    R = np.maximum(np.maximum(np.asarray(params.release, np.float64), min_change), 1.0)
    release = np.asarray(release, np.float64)
    if auto_release:
        release = np.minimum(release, np.asarray(press, np.float64) + A + H + D)
    return release + R
