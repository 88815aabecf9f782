"""End-to-end tests for the sine synth (BASELINE config 1 path)."""

import numpy as np
import pytest

from cpp_audio_tpu.core import events, voices
from cpp_audio_tpu.models import sine_synth
from cpp_audio_tpu.ops import envelopes
from cpp_audio_tpu.utils import wav
from cpp_audio_tpu.utils.interp import Itp


def simple_config(**kw):
    sr = kw.pop("sample_rate", 44100)
    ahdsr = kw.pop(
        "ahdsr",
        envelopes.AHDSR(attack=441, hold=0, decay=441, release=4410, sustain=0.7),
    )
    return sine_synth.SineSynthConfig(sample_rate=sr, ahdsr=ahdsr, **kw)


def single_note_schedule(freq=440.0, vel=1.0, press=0, release=22050, pan=0.0):
    notes = [events.Note(1, press, release, freq, vel, pan)]
    return voices.schedule_from_notes(notes, pad_to=8)


class TestSineSynth:
    def test_single_note_renders(self):
        cfg = simple_config(dtype="float64")
        sch = single_note_schedule()
        out = sine_synth.render_schedule(sch, 44100, cfg)
        assert out.shape == (44100, 2)
        assert np.all(np.isfinite(out))
        # signal present while pressed, silent after release + R
        # sustain amplitude = baseVolume(0.1) * sustain(0.7) / sqrt(2) = 0.0495
        assert np.max(np.abs(out[1000:22050])) > 0.045
        assert np.max(np.abs(out[22050 + 4410 + 10 :])) == 0.0

    def test_frequency_is_correct(self):
        cfg = simple_config(dtype="float64")
        sch = single_note_schedule(freq=1000.0, release=int(44100 * 0.9))
        out = sine_synth.render_schedule(sch, 44100, cfg)
        seg = out[10000:30000, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak = np.argmax(spec)
        f_peak = peak * 44100 / len(seg)
        assert f_peak == pytest.approx(1000.0, abs=5.0)

    def test_envelope_shape_applied(self):
        cfg = simple_config(
            ahdsr=envelopes.AHDSR(attack=4410, hold=0, decay=1, release=4410, sustain=1.0)
        )
        sch = single_note_schedule(freq=100.0, release=22050)
        out = sine_synth.render_schedule(sch, 44100, cfg)
        mono = np.abs(out[:, 0]) + np.abs(out[:, 1])
        # amplitude grows through attack
        assert mono[:4000].max() < mono[4410:8000].max() + 1e-6

    def test_amplitude_volume_velocity(self):
        cfg = simple_config(dtype="float64")
        s1 = single_note_schedule(vel=1.0)
        s2 = single_note_schedule(vel=0.5)
        o1 = sine_synth.render_schedule(s1, 30000, cfg)
        o2 = sine_synth.render_schedule(s2, 30000, cfg)
        np.testing.assert_allclose(o2, o1 * 0.5, atol=1e-9)
        # base volume 0.1 at vel 1, constant-power center pan = 1/sqrt(2)
        peak = np.max(np.abs(o1[:, 0]))
        assert peak == pytest.approx(0.1 / np.sqrt(2), abs=0.002)

    def test_pan(self):
        cfg = simple_config(dtype="float64")
        left = sine_synth.render_schedule(single_note_schedule(pan=-1.0), 10000, cfg)
        assert np.max(np.abs(left[:, 0])) > 0.01
        assert np.max(np.abs(left[:, 1])) < 1e-12

    def test_blocks_are_seamless(self):
        # no discontinuity at block boundaries: render with two block sizes
        cfg_a = simple_config(block_size=4096, dtype="float64")
        cfg_b = simple_config(block_size=16384, dtype="float64")
        sch = single_note_schedule(freq=777.0)
        oa = sine_synth.render_schedule(sch, 30000, cfg_a)
        ob = sine_synth.render_schedule(sch, 30000, cfg_b)
        np.testing.assert_allclose(oa, ob, atol=1e-9)

    def test_f32_matches_f64_within_80db(self):
        cfg32 = simple_config(dtype="float32")
        cfg64 = simple_config(dtype="float64")
        sch = single_note_schedule(freq=440.0, release=int(44100 * 1.8))
        n = 2 * 44100
        o32 = sine_synth.render_schedule(sch, n, cfg32)
        o64 = sine_synth.render_schedule(sch, n, cfg64)
        err = np.max(np.abs(o32 - o64))
        ref = np.max(np.abs(o64))
        assert 20 * np.log10(err / ref) < -80

    def test_polyphonic_chord(self):
        cfg = simple_config(dtype="float64")
        evts = []
        for i, f in enumerate([261.63, 329.63, 392.0]):
            evts.append(events.mk_note_on(1000 * i, f, 0.8))
        notes = events.events_to_notes(evts)
        for n in notes:
            n.release = 40000
        sch = voices.schedule_from_notes(notes, pad_to=8)
        out = sine_synth.render_schedule(sch, 44100, cfg)
        seg = out[20000:40000, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        for f in [261.63, 329.63, 392.0]:
            b = int(round(f * len(seg) / 44100))
            assert spec[b - 2 : b + 3].max() > spec.mean() * 20

    def test_loudness_compensation_mode(self):
        cfg = simple_config(loudness_compensation=True, dtype="float64")
        lo = sine_synth.render_schedule(single_note_schedule(freq=100.0), 20000, cfg)
        hi = sine_synth.render_schedule(single_note_schedule(freq=3000.0), 20000, cfg)
        # equal-loudness: 3 kHz rendered softer than 100 Hz
        assert np.max(np.abs(hi)) < np.max(np.abs(lo))

    def test_wav_roundtrip(self, tmp_path):
        cfg = simple_config()
        sch = single_note_schedule()
        p = tmp_path / "note.wav"
        out = sine_synth.render_to_wav(sch, 22050, cfg, p)
        back, sr = wav.read_wav(p)
        assert sr == 44100
        np.testing.assert_allclose(back, out, atol=1e-6)


class TestVoiceScheduling:
    def test_events_to_notes(self):
        evts = [
            events.mk_note_on(100, 440.0, 0.9, note_id=7),
            events.mk_note_off(500, note_id=7),
        ]
        notes = events.events_to_notes(evts)
        assert len(notes) == 1
        assert notes[0].press == 100 and notes[0].release == 500

    def test_note_change_recorded(self):
        evts = [
            events.mk_note_on(0, 440.0, 0.9, note_id=1),
            events.mk_note_change(100, 1, 450.0, 0.8),
            events.mk_note_off(200, note_id=1),
        ]
        notes = events.events_to_notes(evts)
        assert len(notes[0].changes) == 2
        assert notes[0].changes[1] == (100, 450.0, 0.8)

    def test_enforce_polyphony(self):
        notes = [events.Note(i, 0, 100, 440.0, 1.0) for i in range(5)]
        kept, dropped = voices.enforce_polyphony(notes, 3)
        assert len(kept) == 3 and dropped == 2

    def test_polyphony_frees_after_release(self):
        notes = [
            events.Note(1, 0, 100, 440.0, 1.0),
            events.Note(2, 200, 300, 440.0, 1.0),
        ]
        kept, dropped = voices.enforce_polyphony(notes, 1)
        assert len(kept) == 2 and dropped == 0

    def test_phase_sync(self):
        notes = [
            events.Note(1, 0, 10000, 440.0, 1.0),
            events.Note(2, 500, 10000, 440.0, 1.0),
        ]
        sch = voices.schedule_from_notes(notes, pad_to=8)
        sch = voices.synchronize_phases(sch, 44100)
        inc = 2 * 440.0 / 44100
        expect = np.mod(500 * inc, 2.0)
        assert sch.phase[1] == pytest.approx(expect)


class TestSparseRender:
    """render_bank_sparse == render_bank (timeline segmentation is exact)."""

    def _random_bank(self, V, n, seed=7):
        from cpp_audio_tpu.models import voicebank

        rng = np.random.default_rng(seed)
        press = rng.uniform(0, n * 0.9, V)
        release = press + rng.uniform(500, n * 0.3, V)
        pan = rng.uniform(-1, 1, V)
        th = 0.25 * np.pi * (pan + 1.0)
        return voicebank.VoiceBank(
            press=press, release=release,
            increment=2.0 * rng.uniform(60, 4000, V) / 44100.0,
            phase0=rng.uniform(0, 2, V), amp=rng.uniform(0.01, 0.1, V),
            gains=np.stack([np.cos(th), np.sin(th)], axis=1),
            attack=np.full(V, 441.0), hold=np.zeros(V),
            decay=np.full(V, 800.0), release_len=np.full(V, 2000.0),
            sustain=np.full(V, 0.7),
        )

    def test_sparse_matches_dense(self):
        from cpp_audio_tpu.models import voicebank

        n = 50_000
        bank = self._random_bank(40, n)
        dense = voicebank.render_bank(bank, n, block_size=4096)
        sparse = voicebank.render_bank_sparse(
            bank, n, segment_size=8192, block_size=4096, dense_rows=2)
        np.testing.assert_allclose(sparse, dense, atol=2e-6)

    def test_sparse_falls_back_for_small_banks(self):
        from cpp_audio_tpu.models import voicebank

        n = 20_000
        bank = self._random_bank(8, n)
        dense = voicebank.render_bank(bank, n, block_size=4096)
        sparse = voicebank.render_bank_sparse(bank, n, block_size=4096)
        np.testing.assert_allclose(sparse, dense, atol=0)


class TestCompactBlockArgs:
    def test_blocked_render_matches_dense(self):
        """Per-block voice compaction (voicebank.compact_block_args) must
        reproduce the dense render — dropped (voice, block) tiles are exact
        envelope zeros; only the mixdown summation order may differ."""
        import jax
        from cpp_audio_tpu.models import voicebank

        rng = np.random.default_rng(3)
        sr = 8000
        n = sr * 2
        notes = []
        for i in range(12):
            press = int(rng.uniform(0, n * 0.8))
            release = press + int(rng.uniform(sr // 16, sr // 4))
            notes.append(events.Note(i, press, release,
                                     float(rng.uniform(80, 2000)),
                                     float(rng.uniform(0.2, 1.0)),
                                     float(rng.uniform(-1, 1))))
        sch = voices.schedule_from_notes(notes, pad_to=16)
        cfg = sine_synth.SineSynthConfig(
            sample_rate=sr,
            ahdsr=envelopes.AHDSR(attack=100, hold=20, decay=300,
                                  release=800, sustain=0.6),
            block_size=2048, dtype="float32")
        bank = sine_synth.bank_from_schedule(sch, cfg)
        args, statics = voicebank.prepare_bank_arrays(bank, n,
                                                      cfg.block_size,
                                                      "float32")
        dense = voicebank.voicebank_blocks_impl(
            *jax.device_put(args), out_dtype="float32", **statics)
        bargs, bstatics = voicebank.compact_block_args(args, statics)
        assert bargs[0].shape[1] < args[0].shape[0]  # actually compacted
        blocked = voicebank.voicebank_blocks_compact_impl(
            *jax.device_put(bargs), out_dtype="float32", **bstatics)
        d, b = np.asarray(dense), np.asarray(blocked)
        assert d.shape == b.shape
        np.testing.assert_allclose(b, d, atol=5e-6, rtol=0)
