"""Equal-gain crossfades (cpp.algorithms EqualGainXFade, used by the vocoder
at rt.resynth.lib.vocoder.cpp:530-541 and by channel request transitions).

Equal-gain: the two weights sum to 1 at every point (correlated sources);
shapes: LINEAR and SINUSOIDAL (sin^2 / cos^2)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def xfade_weights(n: int, shape: str = "sinusoidal", *,
                  inclusive: bool = False):
    """(w_new, w_old) of length n; w_new rises to 1, w_old = 1 - w_new.

    inclusive=False: x = (k+1)/n — the vocoder's half-window overlap
    convention (rt.resynth.lib.vocoder.cpp:530-541), first weight > 0.
    inclusive=True: x = k/(n-1) — the channel request-transition ladder
    (ratio decremented by 1/(size_xfade-1), include/channel.h:235-238,506):
    endpoints ARE 0 and 1 and an odd n puts the exact 0.5 midpoint sample
    in the middle (why xfade sizes are odd >= 3, channel.h:50-60).
    """
    if inclusive:
        x = np.arange(n) / max(n - 1, 1)
    else:
        x = (np.arange(n) + 1.0) / n
    if shape == "linear":
        w_new = x
    elif shape == "sinusoidal":
        w_new = np.sin(0.5 * np.pi * x) ** 2
    else:
        raise ValueError(shape)
    return w_new, 1.0 - w_new


def crossfade(old, new, n: int | None = None, shape: str = "sinusoidal"):
    """Crossfade old->new over the first n samples (rest = new)."""
    old = jnp.asarray(old)
    new = jnp.asarray(new)
    if n is None:
        n = min(old.shape[0], new.shape[0])
    w_new, w_old = xfade_weights(n, shape)
    w_new = jnp.asarray(w_new, new.dtype)
    w_old = jnp.asarray(w_old, new.dtype)
    if new.ndim == 2:
        w_new = w_new[:, None]
        w_old = w_old[:, None]
    head = new[:n] * w_new + old[:n] * w_old
    return jnp.concatenate([head, new[n:]], axis=0)


def splice(a, b, n_xfade: int, shape: str = "sinusoidal"):
    """Concatenate a then b with an n_xfade overlap crossfade (the channel
    request-transition analog, include/channel.h:410-470)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    n_xfade = min(n_xfade, a.shape[0], b.shape[0])
    body = crossfade(a[a.shape[0] - n_xfade :], b, n_xfade, shape)
    return jnp.concatenate([a[: a.shape[0] - n_xfade], body], axis=0)
