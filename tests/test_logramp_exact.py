"""Exact LogRamp periodic legs vs a per-sample f64 scalar port of the
reference (VERDICT round-1 item 4).

scalar_logramp is a direct line-by-line port of LogRamp::do_step
(include/audioelement.h:2523-2543): per sample, if cur_sample + 0.5 > D
restart at 0 and swap(from, to); output the eased value at cur_sample/D in
the CURRENT orientation; advance cur_sample by C*f with f the linearly
interpolated increment at (cur_sample+0.5)/D and
C = -ln(from/to)/(to-from) computed once at setup (invariant under the
swap, audioelement.h:2563-2573).
"""

import numpy as np
import pytest

from cpp_audio_tpu.models.soundengine import logramp_increments
from cpp_audio_tpu.utils.interp import Itp, ease_np


def scalar_logramp(n, frm, to, D, s0, itp_code):
    """f64 per-sample port of LogRamp (audioelement.h:2464-2572)."""
    C = 1.0 if to == frm else -np.log(frm / to) / (to - frm)
    s = s0
    a, b = frm, to
    out = np.empty(n)
    for k in range(n):
        if s + 0.5 > D:
            s = 0.0
            a, b = b, a
        out[k] = a + (b - a) * ease_np(Itp(itp_code), s / D)
        f = a + (b - a) * (s + 0.5) / D
        s += C * f
    return out


def closed_form(n, frm, to, D, s0, itp_code):
    import jax.numpy as jnp

    k = jnp.arange(n, dtype=jnp.float64)
    return np.asarray(logramp_increments(
        k, jnp.float64(frm), jnp.float64(to), jnp.float64(D),
        jnp.float64(s0), jnp.asarray(int(itp_code))))


CASES = [
    # (from_inc, to_inc, D, s0, itp) — ascending, descending, mid-range
    # starts (the xfade_freq path re-enters mid-leg), non-linear easing
    (0.01, 0.04, 1000.0, 0.0, Itp.LINEAR),
    (0.05, 0.008, 2500.0, 0.0, Itp.LINEAR),
    (0.004, 0.02, 700.0, 350.0, Itp.LINEAR),
    (0.02, 0.004, 1500.0, 1200.0, Itp.LINEAR),
    (0.01, 0.03, 900.0, 0.0, Itp.EASE_INOUT_QUAD),
    (0.03, 0.01, 1200.0, 400.0, Itp.EASE_IN_EXPO),
]


@pytest.mark.parametrize("frm,to,D,s0,itp", CASES)
def test_multi_leg_trajectory_exact(frm, to, D, s0, itp):
    """40k samples = many ping-pong legs; must match the discrete scalar
    recurrence to f64 roundoff (the legs are affine recurrences with exact
    closed forms — no ODE approximation)."""
    n = 40000
    want = scalar_logramp(n, frm, to, D, s0, int(itp))
    got = closed_form(n, frm, to, D, s0, int(itp))
    span = abs(to - frm)
    assert np.abs(got - want).max() < 1e-10 * span


def test_in_leg_trajectory_is_time_warped():
    """PROPORTIONAL_VALUE_DERIVATIVE calibrates C so every leg takes ~D
    samples, but WITHIN a leg the progress is exponential in time (fast
    through the high-frequency end) — the round-1 'legs take D samples
    each, linear progress' approximation got the duration right and the
    trajectory wrong. Pin both properties against the scalar port."""
    frm, to, D = 0.01, 0.04, 2000.0
    out = scalar_logramp(30000, frm, to, D, 0.0, int(Itp.LINEAR))
    d = np.sign(np.diff(out))
    flips = np.nonzero(np.diff(d) != 0)[0]
    assert len(flips) >= 3
    legs = np.diff(flips)
    # leg duration = D samples in both directions (C calibration)
    assert all(abs(int(g) - int(D)) <= 2 for g in legs)
    # within-leg warp: the value midpoint is NOT at the leg's time midpoint
    mid_value = 0.5 * (frm + to)
    first_leg = out[: flips[0] + 1]
    t_mid = int(np.argmin(np.abs(first_leg - mid_value)))
    assert abs(t_mid - D / 2) > 0.1 * D
    got = closed_form(30000, frm, to, D, 0.0, int(Itp.LINEAR))
    np.testing.assert_allclose(got, out, atol=1e-12)


def test_constant_ramp():
    out = closed_form(5000, 0.02, 0.02, 800.0, 0.0, int(Itp.LINEAR))
    np.testing.assert_allclose(out, 0.02)
