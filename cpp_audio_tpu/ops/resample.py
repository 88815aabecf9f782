"""Sinc resampling (reference cpp.algorithms `resampleSinc` /
InterlacedBuffer, used to match impulse-response sample rates in
useConvolutionReverb, include/audio_context.h:44-71).

Windowed-sinc interpolation evaluated as one batched gather+reduce on the
device: output sample i needs `taps` neighbouring input samples weighted by
a Hann-windowed sinc at fractional offsets — a (n_out, taps) elementwise
product reduced over taps, fully parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_out", "taps"))
def _resample_kernel(x, step, *, n_out: int, taps: int):
    # position of output sample i in input coordinates
    pos = jnp.arange(n_out, dtype=jnp.float64 if x.dtype == jnp.float64 else jnp.float32) * step
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base
    k = jnp.arange(-(taps // 2) + 1, taps // 2 + 1)
    idx = jnp.clip(base[:, None] + k[None, :], 0, x.shape[0] - 1)
    t = k[None, :] - frac[:, None]
    # anti-aliasing: scale the sinc cutoff when downsampling
    cutoff = jnp.minimum(1.0, 1.0 / step)
    s = jnp.sinc(t * cutoff) * cutoff
    w = 0.5 + 0.5 * jnp.cos(jnp.pi * t / (taps // 2 + 1))  # Hann over the support
    return jnp.sum(x[idx] * (s * w), axis=1)


def resample_sinc(x, sr_from: int, sr_to: int, *, taps: int = 64) -> np.ndarray:
    """Resample 1-D or (frames, channels) audio between sample rates."""
    if sr_from == sr_to:
        return np.asarray(x)
    x = np.asarray(x)
    step = sr_from / sr_to
    n_out = int(np.floor((x.shape[0] - 1) / step)) + 1
    if x.ndim == 1:
        return np.asarray(_resample_kernel(jnp.asarray(x), step, n_out=n_out, taps=taps))
    cols = [np.asarray(_resample_kernel(jnp.asarray(x[:, c]), step, n_out=n_out, taps=taps))
            for c in range(x.shape[1])]
    return np.stack(cols, axis=1)
