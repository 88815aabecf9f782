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


def _peak_follower_np(x_abs, release: float, p0: float = 0.0) -> np.ndarray:
    """numpy peak_follower with an initial state, for host block streaming.

    Closed form per chunk: p[t] = max(max_{u<=t} x[u]*r^(t-u), p0*r^(t+1))
    = r^t * max(runmax(x[u]*r^-u), p0*r); chunks bound the r^-u exponent.
    """
    x_abs = np.asarray(x_abs, np.float64)
    n = len(x_abs)
    out = np.empty(n)
    logr = np.log(release) if release > 0 else -np.inf
    ch = max(64, min(4096, int(30.0 / max(-logr, 1e-12))))
    p = float(p0)
    for s in range(0, n, ch):
        e = min(s + ch, n)
        t = np.arange(e - s)
        winv = np.exp(-logr * t)                       # r^-t, bounded
        run = np.maximum.accumulate(x_abs[s:e] * winv)
        out[s:e] = np.exp(logr * t) * np.maximum(run, p * release)
        p = out[e - 1]
    return out


def limit_streaming(x, p0: float = 0.0, *, ceiling: float = 1.0,
                    release_ms: float = 50.0, sample_rate: int = 44100):
    """Block-streaming `limit`: same law, carried follower state.

    Returns (limited_block, p_last). Feeding consecutive blocks with the
    carried p reproduces `limit` over the concatenation exactly (the
    follower recurrence is causal)."""
    x = np.asarray(x, np.float64)
    if len(x) == 0:
        return x.copy(), float(p0)
    release = float(np.exp(-1.0 / (release_ms * 1e-3 * sample_rate)))
    x_abs = np.max(np.abs(x), axis=-1) if x.ndim == 2 else np.abs(x)
    p = _peak_follower_np(x_abs, release, p0)
    gain = np.minimum(1.0, ceiling / np.maximum(p, 1e-12))
    if x.ndim == 2:
        gain = gain[:, None]
    return x * gain, float(p[-1])
