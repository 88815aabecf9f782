"""Birds streaming facade, Wrapper harness, note deduction tests."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import notes as notes_mod
from cpp_audio_tpu.apps import birds_stream
from cpp_audio_tpu.core import events
from cpp_audio_tpu.core.wrapper import Wrapper


class TestBirdsStream:
    def test_worklet_quanta(self):
        b = birds_stream.Birds(44100, "birds", render_seconds=0.5)
        b.note_on(440.0)
        q1 = b.process()
        q2 = b.process()
        assert q1.shape == (128, 2) and q2.shape == (128, 2)
        assert np.all(np.isfinite(q1))
        b.teardown()

    def test_program_change(self):
        b = birds_stream.Birds(44100, "birds", render_seconds=0.3)
        assert b.max_count_programs() == 9
        b.use_program(1)
        out = b.process(256)
        assert out.shape == (256, 2)

    def test_looping_rerenders(self):
        b = birds_stream.Birds(44100, "sweep", render_seconds=0.05)
        b.note_on(300.0)
        total = sum(np.sum(np.abs(b.process(2048))) for _ in range(3))
        assert total > 0


class TestWrapper:
    def test_process_with_events(self):
        w = Wrapper()
        evs = [events.mk_note_on(100, 440.0, 1.0, note_id=1)]
        out = w.process(evs, 4096)
        assert out.shape == (4096, 2)
        assert np.max(np.abs(out[200:])) > 1e-4
        out2 = w.process([events.mk_note_off(4096, note_id=1)], 4096)
        assert np.all(np.abs(out2) <= 1.0)
        assert w.stats.blocks_rendered == 2


class TestNoteDeduction:
    def test_deduce_single_note(self):
        sr = 44100
        t = np.arange(sr)
        env = np.clip(np.minimum(t / 1000, (sr - t) / 5000), 0, 1)
        sig = 0.5 * env * np.sin(2 * np.pi * 440 * t / sr)
        notes = notes_mod.deduce_notes(sig, sr)
        assert len(notes) >= 1
        main = max(notes, key=lambda n: n.volume)
        assert main.midi_pitch == pytest.approx(69.0, abs=0.3)
        assert main.start_sample < sr // 2

    def test_db_span_filter(self):
        sr = 44100
        t = np.arange(sr)
        sig = (0.5 * np.sin(2 * np.pi * 440 * t / sr)
               + 0.001 * np.sin(2 * np.pi * 2000 * t / sr))
        strict = notes_mod.deduce_notes(sig, sr, min_db_span=-20.0)
        for n in strict:
            assert n.volume > 0.01

    def test_notes_image_and_bmp(self, tmp_path):
        notes = [
            notes_mod.DeducedNote(69.0, 440.0, 0, 10000, 1.0),
            notes_mod.DeducedNote(72.0, 523.25, 10000, 20000, 0.5),
        ]
        img = notes_mod.notes_image(notes, width=100)
        assert img.max() == 255
        p = tmp_path / "notes.bmp"
        notes_mod.write_bmp(p, img)
        blob = p.read_bytes()
        assert blob[:2] == b"BM"

    def test_resynth_deduced(self):
        notes = [notes_mod.DeducedNote(69.0, 440.0, 0, 20000, 0.08)]
        out = notes_mod.resynth_deduced(notes, 30000)
        assert out.shape == (30000, 1)
        assert np.max(np.abs(out)) > 0.05
