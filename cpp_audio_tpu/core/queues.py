"""Sample-stream queues with dropped-frame accounting — the RT/NRT
transport layer (reference rt.resynth.lib.metaqueue.cpp / pubsub.cpp).

Reference components:
- `MetaQueue` (metaqueue.cpp:10-50): an SPSC queue whose items are either
  samples or in-band `CountDroppedFrames` tokens, so consumers observe
  exactly where overruns happened.
- `drain_queue_until_size_smaller` (metaqueue.cpp:54).
- `SampleContinuity` (metaqueue.cpp:70): marks whether a stream resumed
  contiguously after drops.
- `ReadQueuedSampleSource` (metaqueue.cpp:78-158): starts consuming only
  once the queue is half-full, balancing latency against starvation.
- `AudioBufferAggregator`: zips several streams sample-by-sample.
- `AudioBufferPubSub` (pubsub.cpp:12): fans the RT signal out to listener
  queues, dropping (with accounting) when a listener lags.

TPU-native context: these carry audio between the host callback world and
the device-block world (the native SPSC ring in native/ringbuffer.cpp is the
lock-free transport; this module is the bookkeeping layer above it, which is
pure control logic and stays in Python).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np


@dataclass
class DroppedFrames:
    """In-band overrun token (reference CountDroppedFrames)."""

    count: int


class MetaQueue:
    """Bounded FIFO of samples with in-band drop accounting.

    try_push returns False and accumulates a DroppedFrames token instead of
    silently losing samples (reference metaqueue.cpp:10-50).
    """

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._q: deque = deque()
        self._size = 0            # samples currently queued
        self._pending_drops = 0
        self.total_dropped = 0

    def __len__(self) -> int:
        return self._size

    @property
    def fill_ratio(self) -> float:
        return self._size / self.capacity if self.capacity else 0.0

    def try_push(self, block) -> bool:
        block = np.atleast_1d(np.asarray(block, np.float64))
        if self._size + len(block) > self.capacity:
            self._pending_drops += len(block)
            self.total_dropped += len(block)
            return False
        if self._pending_drops:
            self._q.append(DroppedFrames(self._pending_drops))
            self._pending_drops = 0
        self._q.append(block)
        self._size += len(block)
        return True

    def pop(self):
        """Next item: a sample block or a DroppedFrames token (None if empty)."""
        if not self._q:
            if self._pending_drops:
                tok = DroppedFrames(self._pending_drops)
                self._pending_drops = 0
                return tok
            return None
        item = self._q.popleft()
        if isinstance(item, np.ndarray):
            self._size -= len(item)
        return item

    def drain_until_size_smaller(self, target: int) -> int:
        """Discard oldest samples until at most target remain
        (reference drain_queue_until_size_smaller, metaqueue.cpp:54)."""
        dropped = 0
        while self._size > target and self._q:
            item = self._q.popleft()
            if isinstance(item, np.ndarray):
                self._size -= len(item)
                dropped += len(item)
        if dropped:
            self.total_dropped += dropped
            self._q.appendleft(DroppedFrames(dropped))
        return dropped


@dataclass
class SampleContinuity:
    """Whether the consumed stream is gap-free (metaqueue.cpp:70)."""

    contiguous: bool = True

    def on_drop(self) -> None:
        self.contiguous = False


class ReadQueuedSampleSource:
    """Pull-side adapter that starts only at half-full occupancy
    (reference metaqueue.cpp:78-158): waiting for capacity/2 queued samples
    balances added latency against starvation, then reads steadily and
    emits zeros (marking discontinuity) on underrun."""

    def __init__(self, queue: MetaQueue):
        self.queue = queue
        self.started = False
        self.continuity = SampleContinuity()
        self.underruns = 0
        self._buf: np.ndarray | None = None
        self._pos = 0

    def read(self, n: int) -> np.ndarray:
        out = np.zeros(n)
        if not self.started:
            if len(self.queue) * 2 < self.queue.capacity:
                return out  # still pre-rolling
            self.started = True
        filled = 0
        while filled < n:
            if self._buf is None or self._pos >= len(self._buf):
                item = self.queue.pop()
                if item is None:
                    self.underruns += 1
                    self.continuity.on_drop()
                    break
                if isinstance(item, DroppedFrames):
                    self.continuity.on_drop()
                    continue
                self._buf, self._pos = item, 0
            take = min(n - filled, len(self._buf) - self._pos)
            out[filled:filled + take] = self._buf[self._pos:self._pos + take]
            self._pos += take
            filled += take
        return out


class AudioBufferAggregator:
    """Zip several sample streams into one summed stream, halting on the
    shortest (the reference aggregates input + delayed-output feedback)."""

    def __init__(self, *sources):
        self.sources = list(sources)

    def read(self, n: int) -> np.ndarray:
        out = np.zeros(n)
        for s in self.sources:
            out += s.read(n)
        return out


class AudioBufferPubSub:
    """Fan a signal out to listener MetaQueues (reference pubsub.cpp:12):
    publishing never blocks; lagging listeners drop with accounting."""

    def __init__(self):
        self._listeners: list[MetaQueue] = []

    def add_listener(self, capacity: int) -> MetaQueue:
        q = MetaQueue(capacity)
        self._listeners.append(q)
        return q

    def remove_listener(self, q: MetaQueue) -> None:
        if q in self._listeners:
            self._listeners.remove(q)

    def try_publish_buffer(self, block) -> int:
        """Publish to all listeners; returns how many accepted."""
        ok = 0
        for q in self._listeners:
            ok += bool(q.try_push(block))
        return ok
