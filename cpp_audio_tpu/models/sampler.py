"""Sampler: pitched sample playback (reference SamplerAlgo,
include/audioelement.h:3274-3383, and tune's sampler synths,
source/main.tune.cpp:108,1237-1790).

Reference semantics: a note's angle increment selects the mapped sample at
the smallest key >= the increment (lower_bound; samples are pre-pitched), the
sample plays straight through from the press sample (negative progress =
delayed start), wrapped in an AHDSR envelope (TuneSamplerElement).

TPU-native: all selected samples are packed into one flat device buffer;
rendering is a batched gather — row v reads buffer[offset_v + (t - press_v)]
masked to the sample's length, times the closed-form envelope, then the MXU
mixdown. Zero-crossing trimming of loaded WAVs follows tune's
SampleAlgoDetailStats cleanup (main.tune.cpp:1237-1290).
"""

from __future__ import annotations

import functools
from bisect import bisect_left
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.events import Note
from ..ops import envelopes
from ..utils.convert import freq_to_angle_increment
from ..utils.interp import Itp

REDUCE_UNADJUSTED_VOLUMES = 0.1  # SamplerAlgo::baseVolume (audioelement.h:3278)


def trim_sample(data: np.ndarray, threshold: float = 1e-4) -> np.ndarray:
    """Strip leading/trailing silence and cut at zero crossings
    (tune's sample cleanup, main.tune.cpp:1237-1290)."""
    mono = data if data.ndim == 1 else data.mean(axis=1)
    nz = np.nonzero(np.abs(mono) > threshold)[0]
    if len(nz) == 0:
        return data[:0]
    start, end = int(nz[0]), int(nz[-1]) + 1
    # move to the nearest zero crossings (stop at exact zeros too)
    sign = np.signbit(mono)
    while start > 0 and mono[start - 1] != 0 and sign[start] == sign[start - 1]:
        start -= 1
    while end < len(mono) - 1 and mono[end] != 0 and sign[end] == sign[end - 1]:
        end += 1
    return data[start:end]


class SampleMap:
    """increment -> sample buffer map with lower_bound selection."""

    def __init__(self):
        self._incs: list[float] = []
        self._samples: list[np.ndarray] = []

    def add(self, increment: float, sample: np.ndarray) -> None:
        i = bisect_left(self._incs, increment)
        self._incs.insert(i, increment)
        self._samples.insert(i, np.asarray(sample, np.float64).reshape(-1))

    def add_for_frequency(self, freq: float, sample_rate: int, sample) -> None:
        self.add(freq_to_angle_increment(freq, sample_rate), sample)

    def select(self, increment: float) -> np.ndarray | None:
        """lower_bound: smallest key >= increment (audioelement.h:3326-3331)."""
        i = bisect_left(self._incs, increment)
        if i >= len(self._incs):
            return None
        return self._samples[i]

    def select_index(self, increment: float) -> int:
        i = bisect_left(self._incs, increment)
        return i if i < len(self._incs) else -1

    def __len__(self) -> int:
        return len(self._incs)


@dataclass(frozen=True)
class SamplerConfig:
    sample_rate: int = 44100
    ahdsr: envelopes.AHDSR = None  # type: ignore[assignment]
    n_channels: int = 2
    base_volume: float = REDUCE_UNADJUSTED_VOLUMES
    dtype: str = "float32"

    def __post_init__(self):
        if self.ahdsr is None:
            object.__setattr__(
                self, "ahdsr",
                # sampler handles the attack itself -> AllowZeroAttack::Yes
                envelopes.AHDSR(attack=0, hold=0, decay=0, release=4410, sustain=1.0),
            )


@functools.partial(jax.jit, static_argnames=("n_samples", "dtype"))
def _render_sampler(buf, fp, ip, gains, *, n_samples: int, dtype: str):
    """fp: (V, 6) [amp, A, R, sus_len, top?, pad]; ip: (V, 3) int32
    [press, release, buf_offset]; renders (n_samples, C)."""
    wdt = jnp.dtype(dtype)
    t = jnp.arange(n_samples, dtype=jnp.int32)[None, :]
    press = ip[:, 0][:, None]
    release = ip[:, 1][:, None]
    off = ip[:, 2][:, None]
    amp = fp[:, 0][:, None].astype(wdt)
    A = fp[:, 1][:, None].astype(wdt)
    R = fp[:, 2][:, None].astype(wdt)
    slen = fp[:, 3][:, None]

    prog = t - press
    in_range = (prog >= 0) & (prog.astype(wdt) < slen)
    idx = jnp.clip(off + prog, 0, buf.shape[0] - 1)
    sig = jnp.where(in_range, buf[idx].astype(wdt), 0.0)

    tp = prog.astype(wdt)
    trm = (t - release).astype(wdt)
    env_a = jnp.clip((tp + 1.0) / jnp.maximum(A, 1.0), 0.0, 1.0)
    top = jnp.clip(((release - press).astype(wdt)) / jnp.maximum(A, 1.0), 0.0, 1.0)
    env = jnp.where(trm < 0, env_a,
                    top * (1.0 - jnp.clip((trm + 1.0) / jnp.maximum(R, 1.0), 0.0, 1.0)))
    out = amp * env * sig
    return jnp.einsum("vt,vc->tc", out, gains.astype(wdt),
                      precision=jax.lax.Precision.HIGHEST)


def render_notes(notes: list[Note], sample_map: SampleMap, n_samples: int,
                 config: SamplerConfig) -> np.ndarray:
    """Render sampler notes -> (n_samples, C)."""
    sel = []
    for note in notes:
        inc = freq_to_angle_increment(note.frequency, config.sample_rate)
        si = sample_map.select_index(inc)
        # zero-length mapped samples render silence (the reference's imag()
        # range check, audioelement.h:3343) — drop them so the packed
        # buffer gather never sees an empty row
        if si >= 0 and len(sample_map._samples[si]) > 0:
            sel.append((note, si))
    if not sel:
        return np.zeros((n_samples, config.n_channels))

    used = sorted({si for _, si in sel})
    offsets = {}
    parts = []
    pos = 0
    for si in used:
        s = sample_map._samples[si]
        offsets[si] = pos
        parts.append(s)
        pos += len(s)
    buf = np.concatenate(parts)

    V = len(sel)
    fp = np.zeros((V, 6))
    ip = np.zeros((V, 3), np.int64)
    gains = np.zeros((V, config.n_channels))
    a = config.ahdsr
    A = max(float(np.max(np.asarray(a.attack))), 1.0)
    R = max(float(np.max(np.asarray(a.release))), config.sample_rate / 1000.0)
    for v, (note, si) in enumerate(sel):
        s = sample_map._samples[si]
        fp[v] = [config.base_volume * note.velocity, A, R, len(s), 0, 0]
        rel = min(note.release, 2**30)
        ip[v] = [note.press, rel, offsets[si]]
        th = 0.25 * np.pi * (note.pan + 1.0)
        if config.n_channels >= 2:
            gains[v, 0], gains[v, 1] = np.cos(th), np.sin(th)
        else:
            gains[v, 0] = 1.0
    dt = np.dtype(config.dtype)
    out = _render_sampler(
        jnp.asarray(buf, dt), jnp.asarray(fp, dt), jnp.asarray(ip.astype(np.int32)),
        jnp.asarray(gains, dt), n_samples=n_samples, dtype=config.dtype,
    )
    return np.asarray(out)
