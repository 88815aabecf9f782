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
from . import vocoder as voc
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
        self._win = np.zeros(window_size)
        self._end = 0             # fill position (reference `end`)
        self._skip = 0            # reference `ignore_frames` (may go <0
        #                           after an uncovered drop — no skipping
        #                           happens then, periodicfft.cpp:55-59,69-78)
        self._t = 0               # absolute source-sample index consumed

    def feed(self, samples) -> int:
        """Consume a block; returns how many windows completed.

        Exact PeriodicFFT::feed/onFullBuffer semantics (periodicfft.cpp:
        55-66,136-180), pinned against the compiled reference by
        tests/test_reference_oracle.py::TestPeriodicFFT."""
        samples = np.atleast_1d(np.asarray(samples, np.float64))
        fired = 0
        i, n = 0, len(samples)
        while i < n:
            if self._skip > 0:
                take = min(self._skip, n - i)
                self._skip -= take
                i += take
                self._t += take
                continue
            take = min(self.window_size - self._end, n - i)
            self._win[self._end:self._end + take] = samples[i:i + take]
            self._end += take
            i += take
            self._t += take
            if self._end == self.window_size:
                self._end = 0
                fired += 1
                self.on_window(self._win.copy(), self._t)
                overlap = self.window_size - self.stride
                if overlap >= 0:
                    self._win[:overlap] = self._win[self.stride:]
                    self._end = overlap
                    self._skip = 0
                else:
                    self._skip = -overlap
        return fired

    def on_dropped_frames(self, n: int | None) -> None:
        """Resync after an input overrun (periodicfft.cpp:69-78): a drop
        fully covered by a pending skip is absorbed; otherwise the window
        CONTENT is zeroed but the fill position (and so the fire cadence)
        is kept, exactly like the reference's reset_samples. n=None means
        an unknown drop count (unconditional zeroing, position kept)."""
        if n is not None:
            self._t += n
            self._skip -= n
            if self._skip >= 0:
                return
        self._win[:] = 0.0

    def samples_until_fire(self) -> int:
        """How many more fed samples complete the next window."""
        return max(0, self._skip) + self.window_size - self._end


class StreamingVocoder:
    """Block-streaming FFT vocoder — the live Vocoder compute
    (source/rt.resynth.lib.vocoder.cpp:396-560,734-860) in feed/pull form.

    Per output sample the reference pulls one (modulator, carrier) pair,
    feeds each into its own PeriodicFFT (modulator window W stride S; carrier
    window 2S stride S), scales carrier bins by the latest per-band modulator
    amplitudes, IFFTs, and equal-gain-crossfades the new half-window against
    the previous one. Here the same machinery runs blockwise with numpy FFTs
    (host streaming path; the offline batch form is analysis/vocoder.vocode).

    The vocoded stream lags the input by 2S - 1 samples (the carrier window
    must fill before its first crossfaded half emerges, and the reference
    emits the first sample inside the completing feed() itself); the offline
    vocode() compensates this latency, so parity holds as
    streaming[t + 2*S - 1] == offline[t] once the first modulator window has
    completed (t >= W): before that the streaming path has no band
    amplitudes yet (silence), while offline clips early frames to the first
    window's amps (vocoder.py `rows` clip) — the same warm-up the reference
    live app exhibits before its first FFT fires. The per-sample emission
    is pinned against the compiled reference FFTModulator/FFTCarrier by
    tests/test_reference_oracle.py::TestVocoderOracle.
    """

    def __init__(self, params: voc.VocoderParams):
        self.params = params
        S = params.stride
        W = params.modulator_window
        self.stride = S
        self._mod_fft = stft.fft_length_for(W)
        self._car_fft = stft.fft_length_for(2 * S)
        sr = params.sample_rate
        edges = params.band_freqs()
        self._bm_mod = voc._band_matrix(edges, self._mod_fft // 2 + 1,
                                        sr / self._mod_fft)
        self._bm_car = voc._band_matrix(edges, self._car_fft // 2 + 1,
                                        sr / self._car_fft)
        # the reference modulator windows with the 4-sigma Gaussian
        # (SqMagFftOperation<Window::Gaussian>, vocoder.cpp:241); scale per
        # vocoder._modulator_band_amps: unit in-band sine -> band amp 1
        self._mod_win = params.modulator_window_array()
        self._mod_scale = 2.0 / float(
            np.sqrt(self._mod_fft * (self._mod_win ** 2).sum()))
        self._amps = np.zeros(params.count_bands)
        self._prev_tail = np.zeros(S)
        self._mod_pfft = PeriodicFFT(W, S, self._on_mod_window)
        self._car_pfft = PeriodicFFT(2 * S, S, self._on_car_window)
        # vocoded samples scheduled at absolute output positions
        # [_q_start, _q_start + len(_queue))
        self._queue = np.zeros(0)
        self._q_start = 0
        self._t_out = 0

    # latest per-band modulator amplitudes (FFTModulator::on_fft_result,
    # vocoder.cpp:109-163)
    def _on_mod_window(self, w: np.ndarray, end: int) -> None:
        spec = np.fft.rfft(w * self._mod_win, n=self._mod_fft)
        sq = (np.abs(spec) * self._mod_scale) ** 2
        self._amps = np.sqrt(sq @ self._bm_mod)

    def _on_car_window(self, w: np.ndarray, end: int) -> None:
        spec = np.fft.rfft(w, n=self._car_fft)
        gains = self._bm_car @ self._amps          # (n_bins,)
        sig = np.fft.irfft(spec * gains, n=self._car_fft)[: 2 * self.stride]
        S = self.stride
        k = np.arange(S)
        w_new = (k + 1.0) / S  # linear equal-gain (vocoder.cpp:538-541)
        out = sig[:S] * w_new + self._prev_tail * (1.0 - w_new)
        self._prev_tail = sig[S:]
        # the reference emits the FIRST crossfaded sample inside the very
        # feed() call that completes the window (periodic_fft.feed then the
        # xfade read, vocoder.cpp:509-527): absolute output samples
        # [end - 1, end - 1 + S). Pinned against the compiled reference
        # sample-for-sample by tests/test_reference_oracle.py::TestVocoder.
        if len(self._queue) == 0:
            self._q_start = end - 1
        self._queue = np.concatenate([self._queue, out])

    def process(self, modulator, carrier) -> np.ndarray:
        """Feed equal-length modulator+carrier blocks; return the output
        block: volume_modulator*mod + volume_carrier*car + volume_vocoded*
        vocoded (Vocoder compute mix, vocoder.cpp:795-805)."""
        modulator = np.atleast_1d(np.asarray(modulator, np.float64))
        carrier = np.atleast_1d(np.asarray(carrier, np.float64))
        n = len(carrier)
        t0 = self._t_out
        self._t_out += n
        # interleave the two feeds at window-fire granularity so every
        # carrier frame sees exactly the modulator amps available at its
        # completion sample (the reference feeds both per sample, modulator
        # first — vocoder.cpp:761-812)
        pos = 0
        while pos < n:
            c = min(self._mod_pfft.samples_until_fire(),
                    self._car_pfft.samples_until_fire(), n - pos)
            self._mod_pfft.feed(modulator[pos : pos + c])
            self._car_pfft.feed(carrier[pos : pos + c])
            pos += c
        vocoded = np.zeros(n)
        lo = max(t0, self._q_start)
        hi = min(t0 + n, self._q_start + len(self._queue))
        if hi > lo:
            vocoded[lo - t0 : hi - t0] = self._queue[lo - self._q_start
                                                     : hi - self._q_start]
        # drop everything at or before the end of this block
        drop = min(max(t0 + n - self._q_start, 0), len(self._queue))
        self._queue = self._queue[drop:]
        self._q_start += drop
        p = self.params
        return (p.volume_vocoded * vocoded
                + p.volume_modulator * modulator[:n]
                + p.volume_carrier * carrier)


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

    def __init__(self, config: ResynthConfig | None = None, n_voices: int = 127,
                 *, vocoder_params: "voc.VocoderParams | None" = None,
                 carrier_synth=None):
        """vocoder_params + carrier_synth enable the live vocoder leg: the
        carrier synth (models/carrier.CarrierSynth, usually driven by MIDI)
        renders per pulled block, and the StreamingVocoder modulates it with
        the live input — the reference's vocoder compute wiring
        (rt.resynth.lib.cpp:1397-1418 get_modulator_carrier_sample +
        vocoder_carrier.compute)."""
        self.config = config or ResynthConfig()
        cfg = self.config
        self.tracker = PitchTracker(cfg)
        self.carrier_synth = carrier_synth
        self.vocoder = (StreamingVocoder(vocoder_params)
                        if vocoder_params is not None else None)
        self._mod_fifo = np.zeros(0)  # input awaiting the vocoder modulator
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

        # diff tracker voices -> synth events at the window's LAST sample:
        # the duplex loop analyzes a completed window before rendering that
        # same sample index, so the events already sound at end_sample - 1
        # (rt.resynth.lib.cpp:1215-1231; assembled rtjob oracle)
        t_ev = end_sample - 1
        frame = st.frame_idx
        for nid, tn in self.tracker.voices.items():
            last_f, freq, vol = tn.frames[-1]
            if nid not in self._live:
                if last_f == frame:
                    if self.synth.on_event(events.Event(
                            events.EventType.NOTE_ON, t_ev, nid,
                            freq, vol, tn.pan)):
                        self._live[nid] = frame
            elif tn.release_frame <= frame:
                self.synth.on_event(events.mk_note_off(t_ev, nid))
                self._live.pop(nid, None)
            elif last_f == frame:
                self.synth.on_event(events.mk_note_change(t_ev, nid,
                                                          freq, vol))
                self._live[nid] = frame

    # -- the duplex surface --------------------------------------------------
    def feed(self, input_block) -> None:
        """Push captured input samples (the RecordF side)."""
        self.periodic_fft.feed(input_block)
        if self.vocoder is not None:
            blk = np.atleast_1d(np.asarray(input_block, np.float64))
            self._mod_fifo = np.concatenate([self._mod_fifo, blk])

    def pull(self, n_frames: int) -> np.ndarray:
        """Render the next output block (the PlayF side)."""
        t0 = self._t_out
        out = self.synth.compute(t0, n_frames)
        self._t_out += n_frames
        out = (np.zeros((n_frames, 2)) if out is None
               else np.asarray(out, np.float64).copy())
        if self.vocoder is not None:
            carrier = (np.asarray(self.carrier_synth.compute(t0, n_frames),
                                  np.float64)
                       if self.carrier_synth is not None
                       else np.zeros(n_frames))
            # modulator samples: the fed input, zero-padded on starvation
            # (the reference's ReadQueuedSampleSource yields silence until
            # the queue has data, rt.resynth.lib.metaqueue.cpp:78-158)
            mod = np.zeros(n_frames)
            take = min(n_frames, len(self._mod_fifo))
            mod[:take] = self._mod_fifo[:take]
            self._mod_fifo = self._mod_fifo[take:]
            out += self.vocoder.process(mod, carrier)[:, None]
        return out

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
