"""Virtual audio-device contexts — the platform I/O layer (L1) analog.

Reference (include/audio_platforms.h:24-116, audio_platform_pa.h:204-980,
audio_platform_au.h:24-255): `Context<AudioPlatform>` owns an OS output
stream whose RT callback publishes `n_audio_cb_frames`, computes a TimeNanos
from the monotonic frame count, and invokes the registered `PlayF`;
`AudioInput` feeds a `RecordF`; `FullDuplexContext` runs both on one stream.

This environment has no OS audio devices, so the platform layer drives the
same PlayF/RecordF contracts against virtual transports: a clocked pull loop
that renders into a WAV / array (output), a WAV / array that replays in
callback-sized chunks (input), and a full-duplex loop that runs RecordF then
PlayF per block exactly like the reference's single RT thread
(audio_platform_pa.h:478-790). The engine stack above (AudioEngine, synths,
resynth) is device-agnostic behind these lambdas — the property the reference
demonstrates with its offline mode (rt.resynth.lib.cpp:1185-1235).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

# the reference exposes the most recent callback size as a global so NRT
# threads can size their queues (audio_platforms.h:111-116)
n_audio_cb_frames: int = -1


def wait_for_first_n_audio_cb_frames() -> int:
    """In the reference this blocks until the RT callback ran once; the
    virtual contexts publish synchronously, so this just validates state."""
    if n_audio_cb_frames <= 0:
        raise RuntimeError("no context has run a callback yet")
    return n_audio_cb_frames


def frames_to_nanos(frame: int, sample_rate: int) -> int:
    """Monotonic frame count -> TimeNanos (audio_platforms.h:36-98)."""
    return int(frame * 1_000_000_000 // sample_rate)


@dataclass
class StreamStats:
    """CPU-load gauge (Pa_GetStreamCpuLoad analog, audio_platform_pa.h:217)."""

    callbacks: int = 0
    compute_seconds: float = 0.0
    budget_seconds: float = 0.0

    @property
    def cpu_load(self) -> float:
        return (self.compute_seconds / self.budget_seconds
                if self.budget_seconds > 0 else 0.0)


class OutputContext:
    """Output stream: pulls blocks from a PlayF callback
    (reference Context<PortAudio>::audiooutCallback, audio_platform_pa.h:254).

    PlayF signature: play_f(out: (n, n_outs) float array, t_nanos: int) —
    fills `out` in place (the reference's `PlayF` contract).
    """

    def __init__(self, n_outs: int = 2):
        self.n_outs = n_outs
        self._play_f = None
        self._sample_rate = 0
        self._frames = 0
        self._initialized = False
        self.stats = StreamStats()
        self.frames_per_callback = 512  # observed iOS size (audio_platform_au.h:11)

    # -- reference public interface (audio_platforms.h doInit/doTearDown) --
    def do_init(self, min_latency_seconds: float, sample_rate: int,
                n_outs: int, play_f) -> None:
        self.n_outs = n_outs
        self._sample_rate = int(sample_rate)
        self._play_f = play_f
        self._initialized = True
        # latency -> callback size, next power of two like PortAudio tends to
        want = max(1, int(min_latency_seconds * sample_rate))
        self.frames_per_callback = 1 << (want - 1).bit_length()

    def initialized(self) -> bool:
        return self._initialized

    def get_sample_rate(self) -> int:
        return self._sample_rate

    def get_stream_cpu_load(self) -> float:
        return self.stats.cpu_load

    def do_tear_down(self) -> None:
        self._initialized = False
        self._play_f = None

    # -- the virtual device: pull n frames through the callback ------------
    def pull(self, n_frames: int | None = None) -> np.ndarray:
        global n_audio_cb_frames
        if not self._initialized:
            raise RuntimeError("do_init first")
        n = self.frames_per_callback if n_frames is None else n_frames
        n_audio_cb_frames = n
        out = np.zeros((n, self.n_outs))
        t = frames_to_nanos(self._frames, self._sample_rate)
        t0 = time.perf_counter()
        self._play_f(out, t)
        self.stats.callbacks += 1
        self.stats.compute_seconds += time.perf_counter() - t0
        self.stats.budget_seconds += n / self._sample_rate
        self._frames += n
        return out

    def render(self, n_frames: int) -> np.ndarray:
        """Pull callback-sized chunks until n_frames are rendered."""
        parts = []
        left = n_frames
        while left > 0:
            take = min(self.frames_per_callback, left)
            parts.append(self.pull(take))
            left -= take
        return np.concatenate(parts, axis=0)


class InputContext:
    """Input stream: pushes blocks of a source signal into a RecordF
    (reference AudioInput<PortAudio>, audio_platform_pa.h:794-980).

    RecordF signature: record_f(buf: (n,) float array, t_nanos: int).
    """

    def __init__(self, source: np.ndarray, sample_rate: int):
        src = np.asarray(source, np.float64)
        self._source = src.mean(axis=1) if src.ndim == 2 else src
        self._sample_rate = int(sample_rate)
        self._pos = 0
        self._record_f = None
        self.stats = StreamStats()

    def do_init(self, record_f) -> None:
        self._record_f = record_f

    @property
    def exhausted(self) -> bool:
        return self._pos >= len(self._source)

    def push(self, n_frames: int) -> int:
        """Deliver up to n_frames to the RecordF; returns frames delivered."""
        if self._record_f is None:
            raise RuntimeError("do_init first")
        take = min(n_frames, len(self._source) - self._pos)
        if take <= 0:
            return 0
        buf = self._source[self._pos : self._pos + take]
        t = frames_to_nanos(self._pos, self._sample_rate)
        t0 = time.perf_counter()
        self._record_f(buf, t)
        self.stats.callbacks += 1
        self.stats.compute_seconds += time.perf_counter() - t0
        self.stats.budget_seconds += take / self._sample_rate
        self._pos += take
        return take


class FullDuplexContext:
    """In+out on one clock: each block runs RecordF then PlayF, like the
    reference's single-stream duplex callback (audio_platform_pa.h:478-790)."""

    def __init__(self, source: np.ndarray, sample_rate: int, n_outs: int = 2,
                 frames_per_callback: int = 512):
        self.input = InputContext(source, sample_rate)
        self.output = OutputContext(n_outs)
        self.frames_per_callback = frames_per_callback
        self._sample_rate = int(sample_rate)

    def do_init(self, record_f, play_f) -> None:
        self.input.do_init(record_f)
        self.output.do_init(self.frames_per_callback / self._sample_rate,
                            self._sample_rate, self.output.n_outs, play_f)
        self.output.frames_per_callback = self.frames_per_callback

    def run(self, n_frames: int | None = None) -> np.ndarray:
        """Run the duplex loop until the input is exhausted (or n_frames)."""
        total = (len(self.input._source) if n_frames is None else n_frames)
        parts = []
        done = 0
        while done < total:
            take = min(self.frames_per_callback, total - done)
            self.input.push(take)
            parts.append(self.output.pull(take))
            done += take
        return np.concatenate(parts, axis=0) if parts else np.zeros(
            (0, self.output.n_outs))
