"""Live MIDI input: byte decoding + poll loop + pitch-wheel retuning
(reference rt.resynth.lib.midi.cpp semantics)."""

import numpy as np
import pytest

from cpp_audio_tpu.core import events
from cpp_audio_tpu.utils.midi_input import MidiInput, parse_midi_bytes


class Recorder:
    """Minimal synth double recording on_event calls."""

    def __init__(self):
        self.events = []

    def on_event(self, ev):
        self.events.append(ev)
        return True


class TestParse:
    def test_note_on(self):
        ev = parse_midi_bytes(0x90, 69, 100)
        assert ev.kind == "note_on" and ev.key == 69 and ev.velocity == 100

    def test_note_on_velocity_zero_is_off(self):
        assert parse_midi_bytes(0x90, 69, 0).kind == "note_off"

    def test_note_off(self):
        assert parse_midi_bytes(0x81, 60, 0).kind == "note_off"
        assert parse_midi_bytes(0x81, 60, 0).channel == 1

    def test_pitch_wheel_centered(self):
        ev = parse_midi_bytes(0xE0, 0x00, 0x40)  # 8192
        assert ev.kind == "pitch_wheel" and ev.value == 0.0

    def test_pitch_wheel_extremes(self):
        assert parse_midi_bytes(0xE0, 0x7F, 0x7F).value == pytest.approx(1.0, abs=2e-4)
        assert parse_midi_bytes(0xE0, 0x00, 0x00).value == -1.0

    def test_all_notes_off(self):
        assert parse_midi_bytes(0xB0, 123, 0).kind == "all_notes_off"

    def test_unhandled(self):
        assert parse_midi_bytes(0xB0, 7, 100) is None  # CC volume: unhandled


class TestMidiInput:
    def mk(self, messages):
        queue = [list(messages)]
        rec = Recorder()
        mi = MidiInput(lambda: queue.pop(0) if queue else [], rec,
                       clock=lambda: 100)
        return mi, rec

    def test_note_lifecycle(self):
        mi, rec = self.mk([(0x90, 69, 127), (0x80, 69, 0)])
        assert mi.poll() == 2
        on, off = rec.events
        assert on.type is events.EventType.NOTE_ON
        assert on.frequency == pytest.approx(440.0)
        assert on.velocity == pytest.approx(1.0)
        assert off.type is events.EventType.NOTE_OFF
        assert off.note_id == on.note_id  # multimap pairing

    def test_same_key_twice_gets_distinct_ids(self):
        mi, rec = self.mk([(0x90, 60, 64), (0x90, 60, 64),
                           (0x80, 60, 0), (0x80, 60, 0)])
        mi.poll()
        ons = [e for e in rec.events if e.type is events.EventType.NOTE_ON]
        offs = [e for e in rec.events if e.type is events.EventType.NOTE_OFF]
        assert ons[0].note_id != ons[1].note_id
        # FIFO pairing: first off releases first on
        assert [o.note_id for o in offs] == [o.note_id for o in ons]

    def test_pitch_wheel_retunes_live_notes(self):
        # +2 semitones at full bend (reference wheel -> multiplier)
        mi, rec = self.mk([(0x90, 69, 127), (0xE0, 0x7F, 0x7F)])
        mi.poll()
        change = rec.events[-1]
        assert change.type is events.EventType.NOTE_CHANGE
        assert change.frequency == pytest.approx(440.0 * 2 ** (2 / 12), rel=1e-3)

    def test_pitch_wheel_applies_to_future_notes(self):
        mi, rec = self.mk([(0xE0, 0x7F, 0x7F), (0x90, 69, 127)])
        mi.poll()
        on = rec.events[-1]
        assert on.frequency == pytest.approx(440.0 * 2 ** (2 / 12), rel=1e-3)

    def test_all_notes_off(self):
        mi, rec = self.mk([(0x90, 60, 64), (0x90, 64, 64), (0xB0, 123, 0)])
        mi.poll()
        offs = [e for e in rec.events if e.type is events.EventType.NOTE_OFF]
        assert len(offs) == 2
        assert not list(mi.note_ids.all_ids())

    def test_timestamped_messages(self):
        mi, rec = self.mk([(4410, 0x90, 69, 127)])
        mi.poll()
        assert rec.events[0].time == 4410

    def test_stats(self):
        mi, rec = self.mk([(0x90, 69, 127), (0xB0, 7, 100)])
        mi.poll()
        assert mi.stats.polled == 2
        assert mi.stats.decoded == 1
        assert mi.stats.unhandled == 1

    def test_drives_streaming_synth(self):
        """End to end: raw bytes -> StreamingSynth -> rendered audio."""
        from cpp_audio_tpu.models.streaming_synth import StreamingSynth

        synth = StreamingSynth()
        queue = [[(0, 0x90, 69, 100)], [(2048, 0x80, 69, 0)]]
        mi = MidiInput(lambda: queue.pop(0) if queue else [], synth)
        mi.poll()
        block = synth.compute(0, 2048)
        assert block is not None and np.max(np.abs(block)) > 1e-4
        mi.poll()
