"""Event streams of the `tune` app (reference source/main.tune.cpp).

  - RainEventStream (main.tune.cpp:193-289): random rain-drop notes. Volume is
    sampled as 1/distance of a uniform point in a disc (energy ~ 1/d^2), and
    the pitch rises with volume ("closer" drops are brighter):
    pitch = A + U(0,2) - 25 + 7*volume.
  - Loop (main.tune.cpp:298-467): repeats a finite event list with a
    per-iteration time offset and fresh note ids.
  - Binary sonification (main.tune.cpp:469-1017): streams the bytes of any
    file; byte values map to pitches by frequency rank (FileStats /
    ByteHistogram, :469-540) so the structure of the file becomes melody.
    The reference's full machinery (byte ranges, skip lists, polyphonic
    layering) is condensed to the histogram-ranked scale mapping.

Every stream materializes plain `core.events.Note` lists, rendered by any
synth model.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.events import Note
from .midi import A_PITCH, Midi


def rain_notes(duration_seconds: float, *, sample_rate: int = 44100,
               min_period: float = 0.03, max_period: float = 0.18,
               min_note_duration: float = 0.05, max_note_duration: float = 0.1,
               seed: int = 0) -> list[Note]:
    """RainEventStream.materializeNextEvents (main.tune.cpp:214-239)."""
    rng = np.random.default_rng(seed)
    midi = Midi()
    notes: list[Note] = []
    t = 0.0
    nid = 0
    while t < duration_seconds:
        # sampleVolume: 1/dist of a uniform point in the unit disc, clamped
        # by a minimum distance where volume = 1 (main.tune.cpp:253-288)
        while True:
            x, y = rng.uniform(-1, 1), rng.uniform(-1, 1)
            sq = x * x + y * y
            if 0.05 * 0.05 <= sq <= 1.0:
                break
        volume = 0.05 / np.sqrt(sq)
        pitch = A_PITCH + rng.uniform(0.0, 2.0) - 25.0 + 7.0 * volume
        freq = float(midi.midi_pitch_to_freq(pitch))
        dur = rng.uniform(min_note_duration, max_note_duration)
        nid += 1
        notes.append(Note(nid, int(t * sample_rate),
                          int((t + dur) * sample_rate), freq, float(volume)))
        t += rng.uniform(min_period, max_period)
    return notes


def loop_notes(base: list[Note], n_iterations: int, period_samples: int,
               *, pitch_offset_per_iteration: float = 0.0) -> list[Note]:
    """Loop: repeat a note list with per-iteration offsets (main.tune.cpp:298+)."""
    midi = Midi()
    out: list[Note] = []
    nid = 0
    for it in range(n_iterations):
        shift = it * period_samples
        factor = midi.half_tone_ratio ** (pitch_offset_per_iteration * it)
        for n in base:
            nid += 1
            out.append(Note(nid, n.press + shift, n.release + shift,
                            n.frequency * factor, n.velocity, n.pan))
    return out


@dataclass
class FileStats:
    """Byte frequency + max run length (main.tune.cpp:477-540)."""

    byte_freq: np.ndarray
    max_consecutive: int

    @classmethod
    def from_bytes(cls, data: bytes) -> "FileStats":
        arr = np.frombuffer(data, dtype=np.uint8)
        freq = np.bincount(arr, minlength=256).astype(np.int64)
        max_run = 0
        if len(arr):
            change = np.nonzero(np.diff(arr) != 0)[0]
            bounds = np.concatenate([[-1], change, [len(arr) - 1]])
            max_run = int(np.max(np.diff(bounds)))
        return cls(freq, max_run)

    def histogram(self) -> np.ndarray:
        """Byte values ordered most->least frequent, zeros dropped."""
        order = np.argsort(-self.byte_freq, kind="stable")
        return order[self.byte_freq[order] > 0]


def binary_sonification_notes(data: bytes, *, sample_rate: int = 44100,
                              note_period: float = 0.09,
                              note_duration: float = 0.2,
                              root_pitch: float = 48.0,
                              scale_offsets=(0, 2, 4, 5, 7, 9, 11),
                              max_notes: int | None = 2000) -> list[Note]:
    """Sonify a byte stream: each byte becomes a note whose scale degree is
    the byte's frequency rank (common bytes = low degrees), octave rises with
    rank (MidiPitchStreamFromBinary condensed)."""
    midi = Midi()
    stats = FileStats.from_bytes(data)
    hist = stats.histogram()
    rank = np.full(256, len(hist), dtype=np.int64)
    rank[hist] = np.arange(len(hist))
    scale = np.asarray(scale_offsets, dtype=np.float64)
    notes: list[Note] = []
    arr = np.frombuffer(data, dtype=np.uint8)
    if max_notes is not None:
        arr = arr[:max_notes]
    for i, b in enumerate(arr):
        r = int(rank[b])
        degree = scale[r % len(scale)]
        octave = r // len(scale)
        pitch = root_pitch + degree + 12 * (octave % 4)
        t0 = int(i * note_period * sample_rate)
        notes.append(Note(i + 1, t0, t0 + int(note_duration * sample_rate),
                          float(midi.midi_pitch_to_freq(pitch)), 0.7))
    return notes
