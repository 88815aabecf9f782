"""Streaming block engine — the reference's SimpleAudioOutContext + AudioPost.

Reference (include/simple_audio_context.h:5-133, include/out.h:219-248): the
real-time callback drains a oneshot queue, runs every registered compute over
<=16-frame chunks into a double-precision bus, then the post chain (reverb ->
limiter -> clamp/NaN guard) and casts to the output format.

TPU-native: there is no real-time thread to protect, so oneshots are plain
callables drained at block boundaries, and blocks are large (thousands of
frames) so each step is one device dispatch. Post processors carry state
across blocks explicitly (convolution tails, limiter peak), which is the
streaming equivalent of the offline whole-signal operators in ops/.

This is the host wrapper a sounddevice/portaudio callback (or a WASM
AudioWorklet analog) drives for "realtime" playback; the offline renderers
bypass it entirely.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from ..ops import fir as fir_ops


class AudioPost:
    """Ordered post-processing chain (reference out.h:219-248)."""

    def __init__(self):
        self._procs: list = []

    def add(self, proc) -> None:
        self._procs.append(proc)

    def process(self, block: np.ndarray) -> np.ndarray:
        for p in self._procs:
            block = p(block)
        return block


class StreamingConvolver:
    """Block convolution with tail carry — the streaming counterpart of the
    reference's partitioned ConvReverbsByBlockSize (include/out.h:357)."""

    def __init__(self, ir: np.ndarray, wet: float = 1.0, dry: float | None = None):
        self.ir = np.asarray(ir)
        if self.ir.ndim == 1:
            self.ir = self.ir[:, None]
        self.wet = wet
        self.dry = (1.0 - wet) if dry is None else dry
        self._tail: np.ndarray | None = None

    def __call__(self, block: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        n = block.shape[0]
        taps = self.ir.shape[0]
        outs = np.zeros((n + taps - 1, block.shape[1]))
        for c in range(block.shape[1]):
            h = self.ir[:, min(c, self.ir.shape[1] - 1)]
            full = np.convolve(block[:, c], h) if n * taps < 1 << 18 else np.asarray(
                fir_ops.fft_convolve(jnp.asarray(np.concatenate([block[:, c], np.zeros(taps - 1)])),
                                     jnp.asarray(h)))[: n + taps - 1]
            outs[:, c] = full[: n + taps - 1]
        if self._tail is not None:
            m = min(len(self._tail), len(outs))
            outs[:m] += self._tail[:m]
        self._tail = outs[n:]
        return self.wet * outs[:n] + self.dry * block


class StreamingLimiter:
    """Instant-attack / exponential-release limiter with carried peak."""

    def __init__(self, ceiling: float = 1.0, release_ms: float = 50.0,
                 sample_rate: int = 44100):
        self.ceiling = ceiling
        self.r = float(np.exp(-1.0 / (release_ms * 1e-3 * sample_rate)))
        self._peak = 0.0

    def __call__(self, block: np.ndarray) -> np.ndarray:
        x_abs = np.max(np.abs(block), axis=1) if block.ndim == 2 else np.abs(block)
        p = np.empty_like(x_abs)
        prev = self._peak
        # per-block host loop is fine at block granularity; the offline path
        # uses the parallel scan in ops/limiter.py
        for i, v in enumerate(x_abs):
            prev = max(v, self.r * prev)
            p[i] = prev
        self._peak = float(prev)
        gain = np.minimum(1.0, self.ceiling / np.maximum(p, 1e-12))
        return block * (gain[:, None] if block.ndim == 2 else gain)


def clamp_guard(block: np.ndarray) -> np.ndarray:
    """Final clamp + NaN guard (reference out.h:620-646)."""
    block = np.where(np.isfinite(block), block, 0.0)
    return np.clip(block, -1.0, 1.0)


@dataclass
class EngineStats:
    """Observability counters (reference AsyncLogger drop counts, queue
    gauges, per-stage durations — SURVEY §5.5)."""

    blocks_rendered: int = 0
    frames_rendered: int = 0
    oneshots_run: int = 0
    compute_seconds: float = 0.0

    @property
    def cpu_load(self) -> float:
        """Compute time / rendered audio time (Pa_GetStreamCpuLoad analog)."""
        if not self.frames_rendered:
            return 0.0
        return self.compute_seconds / (self.frames_rendered / 44100.0)


class AudioEngine:
    """Block-streaming engine with compute registry + oneshot queue + post."""

    def __init__(self, sample_rate: int = 44100, n_channels: int = 2):
        self.sample_rate = sample_rate
        self.n_channels = n_channels
        self.post = AudioPost()
        self._computes: list = []
        self._oneshots: deque = deque()
        self._t = 0
        self.stats = EngineStats()

    # --- NRT -> engine handoff (reference enqueueOneShot) ---
    def enqueue_oneshot(self, fn) -> None:
        self._oneshots.append(fn)

    def register_compute(self, fn) -> None:
        """fn(t0: int, n: int) -> (n, C) array, or None when finished."""
        self._computes.append(fn)

    @property
    def current_time(self) -> int:
        return self._t

    def step(self, n_frames: int) -> np.ndarray:
        """Render the next block (reference SimpleAudioOutContext::step)."""
        import time as _time

        t0 = _time.perf_counter()
        while self._oneshots:
            self._oneshots.popleft()(self, self._t)
            self.stats.oneshots_run += 1
        bus = np.zeros((n_frames, self.n_channels))
        dead = []
        for fn in self._computes:
            out = fn(self._t, n_frames)
            if out is None:
                dead.append(fn)
            else:
                bus += np.asarray(out)
        for fn in dead:
            self._computes.remove(fn)
        bus = self.post.process(bus)
        self._t += n_frames
        self.stats.blocks_rendered += 1
        self.stats.frames_rendered += n_frames
        self.stats.compute_seconds += _time.perf_counter() - t0
        return bus

    def render(self, n_frames: int, block_size: int = 4096) -> np.ndarray:
        """Drive the engine for n_frames (offline use of the streaming path)."""
        blocks = []
        done = 0
        while done < n_frames:
            n = min(block_size, n_frames - done)
            blocks.append(self.step(n))
            done += n
        return np.concatenate(blocks, axis=0)
