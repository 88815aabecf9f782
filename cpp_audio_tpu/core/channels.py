"""Channel-based playback queues with equal-gain request crossfades.

The reference's (deprecated but still-used) first-generation engine plays
`Request`s — (buffer, per-output volumes, duration-in-frames) — through
`Channel` queues that crossfade between consecutive requests
(include/request.h:27,177,268,365,412; include/channel.h:88 with xfade
writers around channel.h:410-470, xfade size odd >= 3 per channel.h:50-60),
pooled by `Channels` with auto-close channel reuse (include/channels.h:213-272)
and aggregated per crossfade policy by `ChannelsVecAggregate`
(include/channels_aggregate.h:6-47).

TPU-native design: there is no RT thread, so the queue logic is plain host
control flow, and the per-sample "consume one frame, maybe inside an xfade"
inner loop becomes vectorized block writes: each `Channel.step(n)` emits an
(n, n_outs) block assembled from whole request segments with precomputed
equal-gain crossfade windows at the seams. Buffers loop (the reference's
soundBuffers are periodic tables), so a request longer than its buffer tiles
it — a gather, not a copy. Per-channel volume ramps (channel.h `setVolume`
with a step count) are linear-in-block multiplies.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np

from ..ops.crossfade import xfade_weights


class XfadePolicy(enum.Enum):
    """Reference include/channel.h XfadePolicy (UseXfade / SkipXfade)."""

    USE_XFADE = "use_xfade"
    SKIP_XFADE = "skip_xfade"


class ClosingPolicy(enum.Enum):
    """Reference include/channels.h ChannelClosingPolicy."""

    AUTO_CLOSE = "auto_close"
    EXPLICIT_CLOSE = "explicit_close"


@dataclass(frozen=True)
class Request:
    """A playable item (reference include/request.h:27).

    buffer   : (m,) mono or (m, n_outs) frames; loops if length > m.
    volumes  : scalar or (n_outs,) per-output gains (reference Volumes<n>).
    length   : duration in frames (reference `duration_in_frames`).
    """

    buffer: np.ndarray
    volumes: np.ndarray
    length: int

    @staticmethod
    def make(buffer, volumes=1.0, length: int | None = None,
             n_outs: int = 2) -> "Request":
        buf = np.asarray(buffer, np.float64)
        vol = np.broadcast_to(np.asarray(volumes, np.float64), (n_outs,)).copy()
        if length is None:
            length = buf.shape[0]
        if length <= 0:
            raise ValueError("request length must be positive")
        return Request(buf, vol, int(length))

    def frames(self, start: int, n: int, n_outs: int) -> np.ndarray:
        """Render frames [start, start+n) of this request as (n, n_outs)."""
        m = self.buffer.shape[0]
        idx = (start + np.arange(n)) % m
        seg = self.buffer[idx]
        if seg.ndim == 1:
            seg = seg[:, None]
        if seg.shape[1] < n_outs:
            seg = np.broadcast_to(seg[:, :1], (n, n_outs))
        return seg[:, :n_outs] * self.volumes[None, :n_outs]


def silence(length: int) -> Request:
    """A silent request (reference plays a zeroed soundBuffer for rests)."""
    return Request(np.zeros(1), np.zeros(2), int(length))


class Channel:
    """A playback queue with equal-gain crossfades between consecutive
    requests (reference include/channel.h:88; xfade length odd >= 3)."""

    def __init__(self, n_outs: int = 2, xfade_length: int = 401,
                 xfade_policy: XfadePolicy = XfadePolicy.USE_XFADE,
                 volume: float = 1.0):
        if xfade_policy is XfadePolicy.USE_XFADE:
            if xfade_length < 3:
                xfade_length = 3
            if xfade_length % 2 == 0:  # odd, like the reference asserts
                xfade_length += 1
        self.n_outs = n_outs
        self.xfade_length = xfade_length
        self.xfade_policy = xfade_policy
        self._queue: list[Request] = []
        self._played_any = False   # guards auto-close reuse of fresh channels
        self._pos = 0          # frame position within the current request
        self._vol = float(volume)
        self._vol_target = float(volume)
        self._vol_step = 0.0
        self.closing_policy = ClosingPolicy.EXPLICIT_CLOSE
        self.open = True

    # -- queue API (reference channel.h addRequest) ----------------------
    def add_request(self, req: Request) -> None:
        self._played_any = True
        self._queue.append(req)

    def play(self, *requests: Request) -> None:
        for r in requests:
            self.add_request(r)

    @property
    def done(self) -> bool:
        return not self._queue

    @property
    def reusable(self) -> bool:
        """Finished auto-close channels can be handed out again
        (reference channels.h:213-272 autoclosed-channel reuse)."""
        return (self.closing_policy is ClosingPolicy.AUTO_CLOSE
                and self._played_any and self.done)

    def set_volume(self, target: float, n_steps: int = 0) -> None:
        """Volume ramp over n_steps frames (reference channel.h volume ramps)."""
        self._vol_target = float(target)
        self._vol_step = ((self._vol_target - self._vol) / n_steps
                          if n_steps > 0 else 0.0)
        if n_steps <= 0:
            self._vol = self._vol_target

    # -- rendering --------------------------------------------------------
    def _volume_curve(self, n: int) -> np.ndarray:
        if self._vol == self._vol_target:
            return np.full(n, self._vol)
        steps = self._vol + self._vol_step * (np.arange(n) + 1.0)
        if self._vol_step > 0:
            curve = np.minimum(steps, self._vol_target)
        else:
            curve = np.maximum(steps, self._vol_target)
        self._vol = float(curve[-1])
        return curve

    def _overlap(self, req: Request, nxt: Request | None) -> int:
        if (self.xfade_policy is not XfadePolicy.USE_XFADE) or nxt is None:
            return 0
        return min(self.xfade_length, req.length, nxt.length)

    def step(self, n: int) -> np.ndarray:
        """Emit the next n frames as (n, n_outs), consuming the queue.

        Crossfades overlap the tail of the outgoing request with the head of
        the next: over the last `ov` frames of request A, w_old falls 1->0
        while request B's first `ov` frames rise 0->1 (equal-gain, summing to
        unity — reference channel.h:410-470). B then resumes at frame ov, so
        the spliced length is len(A) + len(B) - ov.
        """
        out = np.zeros((n, self.n_outs))
        filled = 0
        while filled < n and self._queue:
            req = self._queue[0]
            take = min(n - filled, req.length - self._pos)
            seg = req.frames(self._pos, take, self.n_outs)

            nxt = self._queue[1] if len(self._queue) > 1 else None
            ov = self._overlap(req, nxt)
            if ov:
                tail_lo = req.length - ov
                s0, s1 = self._pos, self._pos + take
                if s1 > tail_lo:
                    a = max(s0, tail_lo)
                    # reference ladder: linear ratio, increment
                    # 1/(size_xfade-1), endpoints inclusive so the odd
                    # length puts the 0.5 midpoint in the middle
                    # (channel.h:235-238,506)
                    w_new, w_old = xfade_weights(ov, "linear",
                                                 inclusive=True)
                    gi = slice(a - tail_lo, a - tail_lo + (s1 - a))
                    head = nxt.frames(a - tail_lo, s1 - a, self.n_outs)
                    seg[a - s0:] = (seg[a - s0:] * w_old[gi, None]
                                    + head * w_new[gi, None])

            out[filled:filled + take] = seg
            filled += take
            self._pos += take
            if self._pos >= req.length:
                self._queue.pop(0)
                # the first ov frames of the next request were already
                # emitted inside the crossfade
                self._pos = ov
        return out * self._volume_curve(n)[:, None]


class Channels:
    """Channel pool (reference include/channels.h:10-400): open_channel with
    auto-close reuse, play onto a channel, sum all channels per block."""

    def __init__(self, n_outs: int = 2, n_channels: int = 32,
                 xfade_length: int = 401,
                 xfade_policy: XfadePolicy = XfadePolicy.USE_XFADE):
        self.n_outs = n_outs
        self.xfade_policy = xfade_policy
        self.xfade_length = xfade_length
        self._channels: dict[int, Channel] = {}
        self._next_id = 0
        self.max_channels = n_channels

    def open_channel(self, volume: float = 1.0,
                     closing_policy: ClosingPolicy = ClosingPolicy.AUTO_CLOSE,
                     xfade_length: int | None = None) -> int:
        # reuse a finished auto-close channel before allocating a new one
        for cid, ch in self._channels.items():
            if ch.reusable:
                self._channels[cid] = self._mk(volume, closing_policy,
                                               xfade_length)
                return cid
        if len(self._channels) >= self.max_channels:
            raise RuntimeError("out of channels")
        cid = self._next_id
        self._next_id += 1
        self._channels[cid] = self._mk(volume, closing_policy, xfade_length)
        return cid

    def _mk(self, volume, closing_policy, xfade_length) -> Channel:
        ch = Channel(self.n_outs,
                     self.xfade_length if xfade_length is None else xfade_length,
                     self.xfade_policy, volume)
        ch.closing_policy = closing_policy
        return ch

    def play(self, channel_id: int, *requests: Request) -> None:
        self._channels[channel_id].play(*requests)

    def close(self, channel_id: int) -> None:
        self._channels.pop(channel_id, None)

    def close_with_fadeout(self, channel_id: int, fadeout_frames: int = 5000) -> None:
        """Fade the channel to silence over fadeout_frames instead of cutting
        (reference AudioOutContext xfade_on_close = 5000 samples,
        include/audio_context.h:73)."""
        ch = self._channels.get(channel_id)
        if ch is None:
            return
        ch.set_volume(0.0, fadeout_frames)
        remaining = sum(r.length for r in ch._queue) - ch._pos
        if remaining > fadeout_frames:
            # trim the queue so the channel finishes right after the fade
            keep, acc = [], -ch._pos
            for r in ch._queue:
                keep.append(r if acc + r.length <= fadeout_frames else
                            Request(r.buffer, r.volumes, fadeout_frames - acc))
                acc += keep[-1].length
                if acc >= fadeout_frames:
                    break
            ch._queue[:] = keep
        ch.closing_policy = ClosingPolicy.AUTO_CLOSE

    def channel(self, channel_id: int) -> Channel:
        return self._channels[channel_id]

    def step(self, n: int) -> np.ndarray:
        out = np.zeros((n, self.n_outs))
        for ch in self._channels.values():
            if not ch.done:
                out += ch.step(n)
        return out

    def render(self, n: int, block_size: int = 4096) -> np.ndarray:
        blocks = [self.step(min(block_size, n - i))
                  for i in range(0, n, block_size)]
        return np.concatenate(blocks, axis=0) if blocks else np.zeros((0, self.n_outs))

    @property
    def done(self) -> bool:
        return all(ch.done for ch in self._channels.values())


@dataclass
class ChannelsAggregate:
    """Three channel collections by crossfade flavor (reference
    include/channels_aggregate.h:6-47: XFade / NoXFade / XFadeInfinite)."""

    n_outs: int = 2
    xfade: Channels = field(default=None)        # type: ignore[assignment]
    no_xfade: Channels = field(default=None)     # type: ignore[assignment]
    xfade_infinite: Channels = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.xfade is None:
            self.xfade = Channels(self.n_outs, xfade_policy=XfadePolicy.USE_XFADE)
        if self.no_xfade is None:
            self.no_xfade = Channels(self.n_outs, xfade_policy=XfadePolicy.SKIP_XFADE)
        if self.xfade_infinite is None:
            self.xfade_infinite = Channels(self.n_outs, xfade_length=4001,
                                           xfade_policy=XfadePolicy.USE_XFADE)

    def step(self, n: int) -> np.ndarray:
        return (self.xfade.step(n) + self.no_xfade.step(n)
                + self.xfade_infinite.step(n))
