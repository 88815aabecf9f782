"""Output limiter + hygiene (reference cpp.algorithms Limiter<double>, applied
in the post chain at include/out.h:605-648: reverb -> limiter -> clamp ->
NaN guard).

Design (the reference implementation is in the unavailable sibling repo):
an instant-attack / exponential-release peak follower
    p[t] = max(|x[t]|, r * p[t-1])
solved in parallel with an associative max-scan, followed by gain
    g[t] = min(1, ceiling / p[t]).
The follower recurrence is associative over (p, r^n) pairs, so the whole
limiter is O(log T) depth — no sequential loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def peak_follower(x_abs, release: float, *, axis: int = -1):
    """p[t] = max(x_abs[t], release * p[t-1]) via associative scan."""
    x_abs = jnp.asarray(x_abs)
    r = jnp.full_like(x_abs, release)

    def combine(lhs, rhs):
        p1, rn1 = lhs
        p2, rn2 = rhs
        return jnp.maximum(p2, p1 * rn2), rn1 * rn2

    p, _ = jax.lax.associative_scan(combine, (x_abs, r), axis=axis)
    return p


def limit(x, *, ceiling: float = 1.0, release_ms: float = 50.0,
          sample_rate: int = 44100, axis: int = 0):
    """Limit so |output| <= ceiling, with smooth gain recovery.

    Multi-channel input is limited by the cross-channel peak so the stereo
    image is preserved (matching the reference's single Limiter on the
    interleaved bus, out.h:427,605-648).
    """
    x = jnp.asarray(x)
    release = float(np.exp(-1.0 / (release_ms * 1e-3 * sample_rate)))
    x_abs = jnp.max(jnp.abs(x), axis=-1) if x.ndim == 2 else jnp.abs(x)
    p = peak_follower(x_abs, release, axis=axis)
    gain = jnp.minimum(1.0, ceiling / jnp.maximum(p, 1e-12))
    if x.ndim == 2:
        gain = gain[:, None]
    return x * gain


def clamp_and_guard(x, limit_val: float = 1.0):
    """Final clamp + NaN->0 guard (reference out.h:620-646)."""
    x = jnp.asarray(x)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return jnp.clip(x, -limit_val, limit_val)
