"""Live (block-streaming) analysis -> resynthesis — the realtime RtResynth
shape, built from the same stages as the offline pipeline.

Reference:
- `PeriodicFFT` (source/rt.resynth.lib.periodicfft.cpp:14-181): `feed()`
  accumulates samples into a sliding window; when the window fills, the FFT
  op runs and the buffer keeps `window - stride` overlap (memmove); negative
  overlap (stride > window) skips input; `on_dropped_frames` resynchronizes.
- `RtResynth` (source/rt.resynth.lib.cpp:389-2148): the live object wiring
  input -> analysis -> the polyphonic synth, one pitch-pipeline step per
  completed window.

TPU-native: windows are batched on the device whenever more than one is
ready (catch-up after large input blocks), and the synth renders through the
block engine; everything here is glue around PitchTracker + StreamingSynth.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import events
from ..models.streaming_synth import StreamingSynth
from ..ops import stft
from .resynth import AnalysisFrameResult, PitchTracker, ResynthConfig


class PeriodicFFT:
    """Sliding-window driver: feed samples, get a callback per full window.

    on_window(window_samples, end_sample): called when a window completes;
    `end_sample` is the absolute index just past the window (analysis results
    become valid there — rt.resynth.lib.periodicfft.cpp:55-180).
    """

    def __init__(self, window_size: int, stride: int, on_window):
        if window_size <= 0 or stride <= 0:
            raise ValueError("window_size and stride must be positive")
        self.window_size = window_size
        self.stride = stride
        self.on_window = on_window
        self._buf = np.zeros(0)
        self._skip = 0            # pending skip for stride > window
        self._t = 0               # absolute sample index of end of _buf

    def feed(self, samples) -> int:
        """Consume a block; returns how many windows completed."""
        samples = np.atleast_1d(np.asarray(samples, np.float64))
        self._t += len(samples)
        if self._skip:
            drop = min(self._skip, len(samples))
            samples = samples[drop:]
            self._skip -= drop
        self._buf = np.concatenate([self._buf, samples])
        fired = 0
        while len(self._buf) >= self.window_size:
            end = self._t - (len(self._buf) - self.window_size)
            self.on_window(self._buf[: self.window_size], end)
            fired += 1
            if self.stride >= self.window_size:
                # negative overlap: drop the window and skip the gap
                self._buf = self._buf[self.window_size:]
                self._skip = self.stride - self.window_size
                if self._skip and len(self._buf):
                    drop = min(self._skip, len(self._buf))
                    self._buf = self._buf[drop:]
                    self._skip -= drop
            else:
                self._buf = self._buf[self.stride:]  # keep the overlap
        return fired

    def on_dropped_frames(self, n: int) -> None:
        """Resync after an input overrun: restart the window
        (periodicfft.cpp:69-78)."""
        self._t += n
        self._buf = np.zeros(0)


@dataclass
class LiveResynthStats:
    windows: int = 0
    note_on: int = 0
    note_off: int = 0
    note_change: int = 0
    dropped_note_on: int = 0


class LiveResynth:
    """Streaming analysis -> resynthesis: feed input blocks, pull output
    blocks (the RtResynth live loop in offline-steppable form).

    Events are applied at the sample where their window completed, exactly
    like the reference's analysis thread publishing into the RT synth.
    """

    def __init__(self, config: ResynthConfig | None = None, n_voices: int = 127):
        self.config = config or ResynthConfig()
        cfg = self.config
        self.tracker = PitchTracker(cfg)
        from ..models import sine_synth
        from ..ops import envelopes

        sr = cfg.sample_rate
        synth_cfg = sine_synth.SineSynthConfig(
            sample_rate=sr,
            ahdsr=envelopes.AHDSR(
                attack=max(1, int(0.5 + cfg.env_attack_seconds * sr)),
                hold=int(0.5 + cfg.env_hold_seconds * sr),
                decay=int(0.5 + cfg.env_decay_seconds * sr),
                release=max(1, int(0.5 + cfg.env_release_seconds * sr)),
                sustain=cfg.env_sustain_level,
            ),
            dtype=cfg.dtype,
        )
        self.synth = StreamingSynth(synth_cfg, n_voices=n_voices)
        self._window = stft.gaussian_window(cfg.window_size, sigmas=4.0)
        self._fft_len = stft.fft_length_for(cfg.window_size)
        self._live: dict[int, int] = {}  # tracker noteid -> last change frame
        self.stats = LiveResynthStats()
        self.periodic_fft = PeriodicFFT(cfg.window_size, cfg.stride,
                                        self._on_window)
        self._t_out = 0

    # -- analysis side ------------------------------------------------------
    def _peaks_of(self, window: np.ndarray):
        sq = stft.stft_sqmag(window.astype(np.float32), self._window,
                             self.config.stride)
        freq, mag = stft.extract_top_peaks(sq, self.config.sample_rate,
                                           self._fft_len,
                                           k=self.config.max_voices + 1)
        return stft.top_peaks_to_lists(freq, mag)[0]

    def _on_window(self, window: np.ndarray, end_sample: int) -> None:
        st: AnalysisFrameResult = self.tracker.step(self._peaks_of(window))
        self.stats.windows += 1
        self.stats.note_on += st.note_on
        self.stats.note_change += st.note_change
        self.stats.note_off += st.note_off
        self.stats.dropped_note_on += st.dropped

        # diff tracker voices -> synth events at end_sample
        frame = st.frame_idx
        for nid, tn in self.tracker.voices.items():
            last_f, freq, vol = tn.frames[-1]
            if nid not in self._live:
                if last_f == frame:
                    if self.synth.on_event(events.Event(
                            events.EventType.NOTE_ON, end_sample, nid,
                            freq, vol, tn.pan)):
                        self._live[nid] = frame
            elif tn.release_frame <= frame:
                self.synth.on_event(events.mk_note_off(end_sample, nid))
                self._live.pop(nid, None)
            elif last_f == frame:
                self.synth.on_event(events.mk_note_change(end_sample, nid,
                                                          freq, vol))
                self._live[nid] = frame

    # -- the duplex surface --------------------------------------------------
    def feed(self, input_block) -> None:
        """Push captured input samples (the RecordF side)."""
        self.periodic_fft.feed(input_block)

    def pull(self, n_frames: int) -> np.ndarray:
        """Render the next output block (the PlayF side)."""
        out = self.synth.compute(self._t_out, n_frames)
        self._t_out += n_frames
        if out is None:
            return np.zeros((n_frames, 2))
        return np.asarray(out)

    def run_duplex(self, signal, block_size: int = 512) -> np.ndarray:
        """Offline-driven duplex loop: feed then pull per block, like the
        reference's offline ctor loop (rt.resynth.lib.cpp:1185-1235)."""
        signal = np.asarray(signal, np.float64)
        parts = []
        for i in range(0, len(signal), block_size):
            blk = signal[i : i + block_size]
            self.feed(blk)
            parts.append(self.pull(len(blk)))
        return np.concatenate(parts, axis=0) if parts else np.zeros((0, 2))
