"""Terminal UI dashboard (the wx rt.resynth.ui analog) — rendering helpers."""

import numpy as np

from cpp_audio_tpu.analysis import resynth
from cpp_audio_tpu.apps.resynth_ui import (
    param_panel,
    pitch_roll,
    shade,
    vocoder_bands,
)
from cpp_audio_tpu.models.resynth_bank import TrackedNote


def test_shade_range():
    assert shade(0.0) == " "
    assert shade(1.0) == "@"
    assert shade(2.0) == "@"  # clipped


def test_pitch_roll_renders_notes():
    notes = [
        TrackedNote(frames=[(0, 440.0, 1.0)], release_frame=10),
        TrackedNote(frames=[(10, 880.0, 0.5)], release_frame=20),
    ]
    s = pitch_roll(notes, 20, width=40, height=8)
    lines = s.split("\n")
    assert len(lines) == 9  # height + axis
    body = "".join(lines)
    assert "@" in body  # the loud note at full shade
    assert "69.0" in s or "8" in s  # axis labels present


def test_pitch_roll_ignores_subthreshold_artifacts():
    notes = [
        TrackedNote(frames=[(0, 440.0, 1.0)], release_frame=10),
        TrackedNote(frames=[(0, 8.0, 1e-6)], release_frame=10),  # artifact
    ]
    s = pitch_roll(notes, 10, width=20, height=6)
    # the range must stay near MIDI 69, not stretch to the 8 Hz artifact
    top_label = float(s.split("\n")[0].split("|")[0])
    assert top_label > 60


def test_pitch_roll_empty():
    assert "(no notes)" in pitch_roll([], 0)


def test_vocoder_bands_shape():
    amps = np.zeros((50, 3))
    amps[10:20, 1] = 1.0
    s = vocoder_bands(amps, np.array([100.0, 500.0, 2000.0]), width=25)
    lines = s.split("\n")
    assert len(lines) == 3
    assert "@" in lines[1]          # middle band lit
    assert "@" not in lines[0] and "@" not in lines[2]


def test_param_panel_groups():
    s = param_panel(resynth.ResynthConfig())
    for group in ("analysis", "pitch", "autotune", "envelope", "output"):
        assert f"[{group}]" in s
    assert "window_size_seconds" in s
    assert "PONDERATE_BY_VOLUME" in s
