"""Event stream tests (rain, loops, binary sonification)."""

import numpy as np
import pytest

from cpp_audio_tpu.core.events import Note
from cpp_audio_tpu.utils import event_streams as es


class TestRain:
    def test_density_and_ranges(self):
        notes = es.rain_notes(5.0, seed=0)
        # periods 0.03..0.18 -> ~28-160 drops in 5 s
        assert 25 <= len(notes) <= 170
        for n in notes:
            assert 0.05 <= n.velocity <= 1.0 + 1e-9
            dur = (n.release - n.press) / 44100
            assert 0.05 - 1e-6 <= dur <= 0.1 + 1e-6

    def test_louder_is_higher(self):
        notes = es.rain_notes(30.0, seed=1)
        from cpp_audio_tpu.utils.midi import frequency_to_midi_pitch

        loud = [float(frequency_to_midi_pitch(n.frequency)) for n in notes
                if n.velocity > 0.5]
        soft = [float(frequency_to_midi_pitch(n.frequency)) for n in notes
                if n.velocity < 0.1]
        assert np.mean(loud) > np.mean(soft)

    def test_deterministic(self):
        a = es.rain_notes(2.0, seed=7)
        b = es.rain_notes(2.0, seed=7)
        assert [(n.press, n.frequency) for n in a] == [(n.press, n.frequency) for n in b]


class TestLoop:
    def test_repeats_with_offsets(self):
        base = [Note(1, 0, 100, 440.0, 1.0)]
        out = es.loop_notes(base, 3, 1000)
        assert [n.press for n in out] == [0, 1000, 2000]
        assert len({n.note_id for n in out}) == 3

    def test_pitch_offset_per_iteration(self):
        base = [Note(1, 0, 100, 440.0, 1.0)]
        out = es.loop_notes(base, 2, 1000, pitch_offset_per_iteration=12.0)
        assert out[1].frequency == pytest.approx(880.0)


class TestBinarySonification:
    def test_histogram_rank(self):
        data = bytes([5] * 10 + [9] * 5 + [1])
        stats = es.FileStats.from_bytes(data)
        hist = stats.histogram()
        assert list(hist[:3]) == [5, 9, 1]
        assert stats.max_consecutive == 10

    def test_notes_follow_structure(self):
        data = bytes([65] * 20)  # constant file -> constant pitch
        notes = es.binary_sonification_notes(data)
        freqs = {round(n.frequency, 3) for n in notes}
        assert len(freqs) == 1

    def test_varied_file_varies(self):
        data = bytes(range(64)) * 4
        notes = es.binary_sonification_notes(data)
        assert len({round(n.frequency, 2) for n in notes}) > 10

    def test_renders(self):
        from cpp_audio_tpu.core import voices
        from cpp_audio_tpu.models import sine_synth

        notes = es.binary_sonification_notes(b"hello world!", note_period=0.05)
        sch = voices.schedule_from_notes(notes, pad_to=16)
        out = sine_synth.render_schedule(sch, 44100, sine_synth.SineSynthConfig())
        assert np.max(np.abs(out)) > 1e-4
