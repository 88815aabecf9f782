"""Score parsing, pitch generators, and normalized param plumbing tests."""

import numpy as np
import pytest

from cpp_audio_tpu.core import params
from cpp_audio_tpu.models import voice_presets as vp
from cpp_audio_tpu.utils import pitch_generators as pg
from cpp_audio_tpu.utils import score
from cpp_audio_tpu.utils.midi import Note


class TestScore:
    def test_simple_notes(self):
        specs = score.parse_music("do re mi")
        assert [s.note for s in specs] == [Note.Do, Note.Re, Note.Mi]
        assert all(s.duration == 1 for s in specs)

    def test_accidentals(self):
        specs = score.parse_music("dod reb fa# solb")
        # reb = D-flat = C#; solb = G-flat = F#
        assert [s.note for s in specs] == [Note.Dod, Note.Dod, Note.Fad, Note.Fad]

    def test_wrap_accidentals(self):
        specs = score.parse_music("sid dob")
        assert [s.note for s in specs] == [Note.Do, Note.Si]

    def test_loud_uppercase(self):
        specs = score.parse_music("Do re")
        assert specs[0].loud and not specs[1].loud

    def test_extension_and_rest(self):
        # "do--" = do with duration 3; ". ." alone = rests
        specs = score.parse_music("do-- . mi")
        assert specs[0].note == Note.Do and specs[0].duration == 3
        assert specs[1].note is None and specs[1].duration == 1
        assert specs[2].note == Note.Mi

    def test_dot_after_note_extends_or_rests(self):
        # reference: '.' flushes a pending note then counts silence
        specs = score.parse_music("do.re")
        assert [(s.note, s.duration) for s in specs] == [
            (Note.Do, 1), (None, 1), (Note.Re, 1)]

    def test_full_phrase(self):
        # the reference's scores/*.txt files are binary-sonification inputs,
        # not parseMusic scores; exercise a representative inline phrase
        specs = score.parse_music("do re mi-- Fa . sol la-- si do")
        assert len(specs) == 9
        assert specs[2].duration == 3 and specs[3].loud

    def test_to_notes(self):
        specs = score.parse_music("la")
        notes = score.notespecs_to_notes(specs, octave=4)
        assert notes[0].frequency == pytest.approx(440.0)

    def test_renders_with_synth(self):
        from cpp_audio_tpu.core import voices
        from cpp_audio_tpu.models import sine_synth

        specs = score.parse_music("do mi sol Do")
        notes = score.notespecs_to_notes(specs, time_unit_ms=100.0)
        sch = voices.schedule_from_notes(notes, pad_to=8)
        cfg = sine_synth.SineSynthConfig(dtype="float64")
        out = sine_synth.render_schedule(sch, 44100, cfg)
        assert np.max(np.abs(out)) > 0.01


class TestPitchGenerators:
    def test_multi_octave_sequence(self):
        g = pg.MultiOctave([1.0, 2.0, 3.0], 2)
        got = [g() for _ in range(13)]
        expect = [1, 2, 3, 13, 14, 15, 25, 15, 14, 13, 3, 2, 1]
        assert got == [pytest.approx(e) for e in expect]

    def test_shuffle_pattern(self):
        seq = iter(range(100))
        g = pg.ShufflePattern(lambda: float(next(seq)), [0, 1, 0])
        first_pass = [g() for _ in range(3)]
        assert first_pass == [1.0, 2.0, 1.0]  # rotated once before first use

    def test_pitch_drifter(self):
        d = pg.PitchDrifter(0.01)
        assert d(60.0) == pytest.approx(60.01)
        assert d(60.0) == pytest.approx(60.02)

    def test_smoothed(self):
        s = pg.Smoothed(0.5)
        s.set_target(2.0)
        assert s.step() == 2.0  # first set initializes
        s.set_target(0.0)
        assert s.step() == 1.5
        assert s.step() == 1.0


class TestParamPlumbing:
    def test_normalize_roundtrip_all_modes(self):
        for mode, progs in vp.PROGRAMS.items():
            for p in progs:
                norm = params.voice_program_to_normalized(p)
                back = params.normalized_to_voice_program(mode, norm)
                assert back.name == p.name
                assert back.length_ms == pytest.approx(p.length_ms, rel=1e-5)
                assert back.xfade_seconds == pytest.approx(p.xfade_seconds, rel=1e-4)
                assert back.interpolation == p.interpolation
                if mode is vp.Mode.WIND:
                    assert back.filter_order == p.filter_order
                    assert back.seconds_slow_iter_long == pytest.approx(
                        p.seconds_slow_iter_long, rel=1e-4)
                if mode is vp.Mode.SWEEP:
                    # unclamped like the reference: sub-10Hz lows round-trip
                    # (to within f32 cancellation against the [10,10000]
                    # limit range — the reference's own storage error)
                    assert back.low_freq == pytest.approx(
                        p.low_freq, rel=1e-4, abs=10000 * 1.5e-7)
                if mode is vp.Mode.BIRDS:
                    assert back.xfade_freq == p.xfade_freq
                    assert back.freq_interpolation == p.freq_interpolation

    def test_normalized_values_in_range(self):
        for progs in vp.PROGRAMS.values():
            for p in progs:
                norm = params.voice_program_to_normalized(p)
                order = params.MODE_PARAMS[p.mode]
                for i, pid in enumerate(order):
                    if params.LIMITS[pid].enum_values is not None:
                        continue
                    if pid in params.RAW_STORED or pid in (
                            params.P.ORDER_FILTERS,
                            params.P.HARMONIC_ATTENUATION,
                            params.P.LOW_FREQ, params.P.HIGH_FREQ):
                        # raw/offset storage or unclamped normalize: the
                        # reference stores out-of-[0,1] values here
                        # (negative log-space slow iters, har below its
                        # 0.5 minimum, sub-10Hz sweep lows)
                        continue
                    v = norm.values[i]
                    # the reference's normalize doesn't clamp — e.g. Talkative
                    # bird's xfade 0.05 exceeds Limits<XFADE_LENGTH>::M
                    assert -1e-6 <= v <= 1.2, (p.name, pid.name, v)

    def test_param_specs_counts(self):
        # reference: 32 params for birds and robots (gen.voice.h:55-130)
        assert len(params.MODE_PARAMS[vp.Mode.BIRDS]) == 32
        assert len(params.MODE_PARAMS[vp.Mode.ROBOTS]) == 32
        assert len(params.get_param_specs(vp.Mode.SWEEP)) == len(
            params.MODE_PARAMS[vp.Mode.SWEEP])


class TestPresetAutosaver:
    """Autosave thread analog (rt.resynth.lib.cpp:1124-1161)."""

    def test_save_restore_roundtrip(self, tmp_path):
        from cpp_audio_tpu.analysis.presets_json import (PresetAutosaver,
                                                         ResynthPreset)

        p = ResynthPreset()
        p.pitch_shift_pre_autotune = 3.5
        saver = PresetAutosaver(lambda: p, tmp_path)
        assert saver.restore() is None  # nothing yet
        assert saver.save_once() is True
        assert saver.save_once() is False  # unchanged -> no write
        p.pitch_shift_pre_autotune = -1.0
        assert saver.save_once() is True
        restored = PresetAutosaver(lambda: p, tmp_path).restore()
        assert restored is not None
        assert restored.pitch_shift_pre_autotune == -1.0

    def test_thread_saves_periodically(self, tmp_path):
        import time

        from cpp_audio_tpu.analysis.presets_json import (PresetAutosaver,
                                                         ResynthPreset)

        p = ResynthPreset()
        saver = PresetAutosaver(lambda: p, tmp_path, interval_seconds=0.02)
        saver.start()
        try:
            deadline = time.time() + 2.0
            while saver.saves == 0 and time.time() < deadline:
                time.sleep(0.01)
        finally:
            saver.stop()
        assert saver.saves >= 1
        assert saver.restore() is not None
