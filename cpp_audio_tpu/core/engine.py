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
    """Uniformly-partitioned zero-latency streaming convolution — the
    reference's ConvReverbsByBlockSize semantics (include/out.h:357): the IR
    is split into FFT partitions so per-block cost is bounded by
    O((n + P) log P + K*P) regardless of IR length, instead of O(n * taps).

    Scheme: the first partition (lags [0, P)) convolves the live block
    directly via one FFT (zero latency); partitions k >= 1 consume a
    frequency-delay line of completed P-sample input frames — frame j's
    spectrum X_j = rfft(frames j-1..j) contributes irfft(X_j * H_k)[P:]
    to output range [(j+k)P, (j+k+1)P), strictly in the future for k >= 1,
    so everything stays causal. All channels and all delay-line taps batch
    into one einsum per completed frame.
    """

    def __init__(self, ir: np.ndarray, wet: float = 1.0,
                 dry: float | None = None, partition: int = 4096):
        ir = np.asarray(ir, np.float64)
        if ir.ndim == 1:
            ir = ir[:, None]
        self.wet = wet
        self.dry = (1.0 - wet) if dry is None else dry
        P = 1 << max(8, int(np.ceil(np.log2(max(partition, 2)))))
        self.partition = P
        taps = ir.shape[0]
        self.n_parts = K = max(1, -(-taps // P))
        self.n_channels = ir.shape[1]
        irp = np.zeros((K * P, ir.shape[1]))
        irp[:taps] = ir
        self._h0 = irp[:P]  # direct partition, (P, C)
        # spectra of partitions 1..K-1 over 2P windows: (K-1, P+1, C)
        if K > 1:
            parts = irp[P:].reshape(K - 1, P, ir.shape[1])
            self._H = np.fft.rfft(parts, n=2 * P, axis=1)
        else:
            self._H = np.zeros((0, P + 1, ir.shape[1]), np.complex128)
        self._h0_spec_cache: dict[int, np.ndarray] = {}
        # _hist: the P input samples BEFORE _inbuf; _inbuf: the partial frame
        # toward the next X_j (so _hist ++ _inbuf ++ block is gap-free)
        self._hist = np.zeros((P, 0))
        self._inbuf = np.zeros((0, 0))
        self._fdl = None                  # (K-1, P+1, C) newest-first spectra
        self._t = 0                       # absolute input samples consumed
        self._sched = np.zeros((0, 0))    # future tail output (absolute pos)
        self._sched_t = 0

    def _ensure_channels(self, c: int) -> None:
        if self._hist.shape[1] != c:
            P = self.partition
            self._hist = np.zeros((P, c))
            self._inbuf = np.zeros((0, c))
            self._fdl = np.zeros((self._H.shape[0], P + 1, c), np.complex128)
            self._sched = np.zeros((0, c))
            if self._h0.shape[1] != c:
                self._h0 = np.broadcast_to(self._h0[:, :1], (P, c)).copy()
                self._H = np.broadcast_to(self._H[:, :, :1],
                                          self._H.shape[:2] + (c,)).copy()
                self._h0_spec_cache.clear()

    def __call__(self, block: np.ndarray) -> np.ndarray:
        P = self.partition
        n, c = block.shape
        self._ensure_channels(c)
        t0 = self._t

        # 1. complete P-frames feed the frequency-delay line FIRST: with
        # n > P, a frame completed mid-block contributes to output inside
        # this very block (its contribution starts at frame_end)
        consumed_before = self._inbuf.shape[0]
        hist2 = np.concatenate([self._hist, self._inbuf, block], axis=0)
        n_buf = consumed_before + n
        pos = 0
        while n_buf - pos >= P:
            frame_end = t0 - consumed_before + pos + P  # absolute time
            if self._H.shape[0]:
                # window = frames (j-1, j): 2P samples ending at the frame end
                window = hist2[pos : pos + 2 * P]
                X = np.fft.rfft(window, axis=0)  # (P+1, C)
                self._fdl = np.roll(self._fdl, 1, axis=0)
                self._fdl[0] = X
                # combined K-1 partitions = the tail of output frame
                # [frame_end, frame_end + P)
                Y = np.einsum("kfc,kfc->fc", self._fdl, self._H)
                y = np.fft.irfft(Y, n=2 * P, axis=0)[P:]
                self._schedule(frame_end, y)
            pos += P
        self._inbuf = hist2[P + pos :]
        self._hist = hist2[pos : pos + P]

        # 2. direct part: conv(hist ++ block, h0) at lags < P, via one FFT
        nfft = 1 << int(np.ceil(np.log2(n + 2 * P)))
        x = hist2[consumed_before : consumed_before + P + n]  # hist + block
        hk = self._h0_spec_cache.get(nfft)
        if hk is None:
            hk = np.fft.rfft(self._h0, n=nfft, axis=0)
            self._h0_spec_cache[nfft] = hk
        full = np.fft.irfft(np.fft.rfft(x, n=nfft, axis=0) * hk,
                            n=nfft, axis=0)
        out = full[P : P + n].copy()

        # 3. overlay scheduled tail contributions, drop what's now past
        if self._sched.shape[0]:
            lo = max(t0, self._sched_t)
            hi = min(t0 + n, self._sched_t + self._sched.shape[0])
            if hi > lo:
                out[lo - t0 : hi - t0] += self._sched[lo - self._sched_t
                                                      : hi - self._sched_t]
            drop = min(max(t0 + n - self._sched_t, 0), self._sched.shape[0])
            self._sched = self._sched[drop:]
            self._sched_t += drop
        if self._sched.shape[0] == 0:
            self._sched_t = t0 + n
        self._t = t0 + n
        return self.wet * out + self.dry * block

    def _schedule(self, at: int, y: np.ndarray) -> None:
        if self._sched.shape[0] == 0:
            self._sched_t = max(self._sched_t, at)
        end = at + y.shape[0]
        cur_end = self._sched_t + self._sched.shape[0]
        if end > cur_end:
            pad = np.zeros((end - cur_end, y.shape[1]))
            self._sched = np.concatenate([self._sched, pad], axis=0)
        self._sched[at - self._sched_t : at - self._sched_t + y.shape[0]] += y


class StreamingLimiter:
    """Instant-attack / exponential-release limiter with carried peak.

    Same recurrence as ops/limiter.peak_follower (p_i = max(v_i, r*p_{i-1})),
    vectorized: p_i = r^i * runmax_j(v_j * r^-j), evaluated in chunks so the
    r^-j weights stay bounded (e^~7 per 16k chunk at 50 ms release)."""

    def __init__(self, ceiling: float = 1.0, release_ms: float = 50.0,
                 sample_rate: int = 44100):
        self.ceiling = ceiling
        self.r = float(np.exp(-1.0 / (release_ms * 1e-3 * sample_rate)))
        self._peak = 0.0

    def _follow(self, v: np.ndarray) -> np.ndarray:
        out = np.empty_like(v)
        prev = self._peak
        r = self.r
        chunk = 16384
        for s in range(0, len(v), chunk):
            seg = v[s : s + chunk].copy()
            seg[0] = max(seg[0], r * prev)
            i = np.arange(len(seg), dtype=np.float64)
            p = (r ** i) * np.maximum.accumulate(seg * r ** (-i))
            out[s : s + len(seg)] = p
            prev = p[-1]
        self._peak = float(prev)
        return out

    def __call__(self, block: np.ndarray) -> np.ndarray:
        x_abs = np.max(np.abs(block), axis=1) if block.ndim == 2 else np.abs(block)
        if len(x_abs) == 0:
            return block
        p = self._follow(np.asarray(x_abs, np.float64))
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
