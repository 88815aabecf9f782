"""MIDI file reader + event semantics tests."""

import struct

import numpy as np
import pytest

from cpp_audio_tpu.utils import midifile


def _varlen(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


def write_test_midi(path, events, ticks_per_quarter=480, tempo_us=500000):
    """events: list of (delta_ticks, bytes)."""
    track = b"\x00\xff\x51\x03" + struct.pack(">I", tempo_us)[1:]
    for delta, msg in events:
        track += _varlen(delta) + msg
    track += b"\x00\xff\x2f\x00"  # end of track
    blob = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, ticks_per_quarter)
            + b"MTrk" + struct.pack(">I", len(track)) + track)
    with open(path, "wb") as f:
        f.write(blob)


class TestMidiFile:
    def test_note_on_off_timing(self, tmp_path):
        p = tmp_path / "t.mid"
        # 120 bpm (500000 us/quarter), 480 tpq: 480 ticks = 0.5 s = 22050 samp
        write_test_midi(p, [
            (0, bytes([0x90, 69, 100])),
            (480, bytes([0x80, 69, 0])),
        ])
        evs = midifile.read_midi_file(p, 44100)
        assert evs[0].kind == "note_on" and evs[0].key == 69
        assert evs[0].time == 0
        assert evs[1].kind == "note_off"
        assert evs[1].time == 22050

    def test_running_status_and_zero_velocity(self, tmp_path):
        p = tmp_path / "t.mid"
        write_test_midi(p, [
            (0, bytes([0x90, 60, 90])),
            (10, bytes([64, 90])),       # running status note_on 64
            (10, bytes([60, 0])),        # vel 0 -> note_off
        ])
        evs = midifile.read_midi_file(p, 44100)
        assert [e.kind for e in evs] == ["note_on", "note_on", "note_off"]

    def test_pitch_wheel_affects_new_notes(self, tmp_path):
        p = tmp_path / "t.mid"
        write_test_midi(p, [
            (0, bytes([0x90, 69, 100])),
            (0, bytes([0xE0, 0x00, 0x60])),  # wheel up: raw 0x3000=12288
            (0, bytes([0x90, 69, 100])),
            (480, bytes([0x80, 69, 0])),
            (0, bytes([0x80, 69, 0])),
        ])
        evs = midifile.read_midi_file(p, 44100)
        notes = midifile.midi_events_to_notes(evs, pitch_wheel_multiplier=2.0)
        assert len(notes) == 2
        f0, f1 = notes[0].frequency, notes[1].frequency
        # wheel (12288-8192)/8192 = 0.5 -> +1 semitone at multiplier 2
        assert f0 == pytest.approx(440.0)
        assert f1 == pytest.approx(440.0 * 2 ** (1 / 12), rel=1e-5)

    def test_all_notes_off(self, tmp_path):
        p = tmp_path / "t.mid"
        write_test_midi(p, [
            (0, bytes([0x90, 60, 80])),
            (0, bytes([0x90, 64, 80])),
            (480, bytes([0xB0, 123, 0])),
        ])
        evs = midifile.read_midi_file(p, 44100)
        notes = midifile.midi_events_to_notes(evs)
        assert len(notes) == 2
        assert all(n.release == 22050 for n in notes)

    def test_render_midi_file(self, tmp_path):
        p = tmp_path / "t.mid"
        write_test_midi(p, [
            (0, bytes([0x90, 69, 100])),
            (960, bytes([0x80, 69, 0])),
        ])
        out, sr = midifile.render_midi_file(p)
        assert sr == 44100
        seg = out[10000:30000, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        assert np.argmax(spec) * sr / len(seg) == pytest.approx(440.0, abs=4)

    def test_noteids_generator(self):
        g = midifile.NoteIdsGenerator()
        a = g.note_on_id(60)
        b = g.note_on_id(60)  # same key twice (multimap semantics)
        assert a != b
        assert g.note_off_id(60) == a  # FIFO per key
        assert g.note_off_id(60) == b
        assert g.note_off_id(60) is None
