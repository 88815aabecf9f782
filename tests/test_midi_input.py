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


class TestJitterCompensation:
    """MidiJitterCompensator (gen.crtp.h:477-527 semantics, in samples)."""

    def test_first_event_learns_delay(self):
        from cpp_audio_tpu.utils.midi_input import MidiJitterCompensator

        c = MidiJitterCompensator(max_jitter_samples=441)  # 10 ms @ 44.1k
        # midi clock is 1000 samples behind audio clock
        t = c.schedule(0, midi_time=5000, now=6000)
        assert t == 5000 + 441 + 1000  # midi_time + margin + offset

    def test_consistent_latency_preserves_intervals(self):
        from cpp_audio_tpu.utils.midi_input import MidiJitterCompensator

        c = MidiJitterCompensator(max_jitter_samples=441)
        t0 = c.schedule(0, midi_time=5000, now=6000)
        # next event 500 samples later in midi time, with jitter in `now`
        t1 = c.schedule(0, midi_time=5500, now=6700)
        assert t1 - t0 == 500  # inter-note timing preserved exactly

    def test_late_event_plays_now(self):
        from cpp_audio_tpu.utils.midi_input import MidiJitterCompensator

        c = MidiJitterCompensator(max_jitter_samples=10)
        c.schedule(0, midi_time=1000, now=1100)
        # huge extra lateness beyond the margin window would re-learn; a
        # moderate one (inside 2*(margin+4.41)) clamps to now
        t = c.schedule(0, midi_time=2000, now=2125)
        assert t == 2125

    def test_large_deviation_relearns(self):
        from cpp_audio_tpu.utils.midi_input import MidiJitterCompensator

        c = MidiJitterCompensator(max_jitter_samples=10, sample_rate=44100)
        c.schedule(0, midi_time=0, now=100)       # delay = 110
        # clock offset changed by far more than 2*(10+4.41)
        t = c.schedule(0, midi_time=10000, now=10500)  # candidate 510
        assert c.delays[0] == 510
        assert t == 10000 + 510

    def test_per_source_delays(self):
        from cpp_audio_tpu.utils.midi_input import MidiJitterCompensator

        c = MidiJitterCompensator(max_jitter_samples=100)
        a = c.schedule(0, midi_time=1000, now=2000)
        b = c.schedule(1, midi_time=1900, now=2000)
        assert c.delays[0] != c.delays[1]
        assert a == 1000 + 100 + 1000 and b == 1900 + 100 + 100

    def test_midi_input_applies_compensation(self):
        import numpy as np

        from cpp_audio_tpu.models.streaming_synth import StreamingSynth
        from cpp_audio_tpu.utils.midi_input import MidiInput

        msgs = [[(1000, 0x90, 69, 100)], [(1500, 0x80, 69, 0)], []]
        it = iter(msgs)
        synth = StreamingSynth()
        mi = MidiInput(lambda: next(it, []), synth, clock=lambda: 3000,
                       sample_rate=44100, max_jitter_seconds=0.01)
        mi.poll()
        margin = 0.01 * 44100
        (a,) = synth._notes.values()
        assert a.press == int(1000 + margin + 2000)
        mi.poll()
        (f,) = synth._finished
        assert f.release - f.press == 500  # interval preserved
