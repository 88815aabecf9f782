"""Streaming engine, reverb, resampling, streaming synth tests."""

import numpy as np
import pytest

from cpp_audio_tpu.core import engine as eng
from cpp_audio_tpu.core import events
from cpp_audio_tpu.models import sine_synth, streaming_synth
from cpp_audio_tpu.ops import envelopes, resample, reverb
from cpp_audio_tpu.utils import wav as wavio


class TestResample:
    def test_preserves_tone(self):
        sr1, sr2, f = 44100, 48000, 1000.0
        x = np.sin(2 * np.pi * f * np.arange(sr1) / sr1)
        y = resample.resample_sinc(x, sr1, sr2)
        assert len(y) == pytest.approx(sr2, abs=2)
        seg = y[2000:34768]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        fpk = np.argmax(spec) * sr2 / len(seg)
        assert fpk == pytest.approx(f, abs=3.0)
        # amplitude preserved
        assert np.max(np.abs(seg)) == pytest.approx(1.0, abs=0.02)

    def test_downsample_antialiases(self):
        sr1, sr2 = 48000, 8000
        # 10 kHz is above the 4 kHz target Nyquist -> must disappear
        x = np.sin(2 * np.pi * 10000 * np.arange(sr1) / sr1)
        y = resample.resample_sinc(x, sr1, sr2)
        assert np.max(np.abs(y[500:-500])) < 0.05

    def test_identity(self):
        x = np.random.default_rng(0).standard_normal(1000)
        y = resample.resample_sinc(x, 44100, 44100)
        np.testing.assert_array_equal(x, y)


class TestReverb:
    def test_identity_ir(self):
        x = np.random.default_rng(0).standard_normal((500, 2)) * 0.3
        rv = reverb.Reverb(ir=np.array([[1.0]]), wet=1.0)
        y = reverb.apply_reverb(x, rv)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_delay_ir(self):
        x = np.zeros((100, 1))
        x[10] = 1.0
        ir = np.zeros((5, 1))
        ir[4] = 1.0
        y = reverb.apply_reverb(x, reverb.Reverb(ir=ir, wet=1.0))
        assert y[14, 0] == pytest.approx(1.0, abs=1e-6)

    def test_wet_dry(self):
        x = np.ones((50, 1))
        ir = np.zeros((3, 1))
        ir[2] = 1.0
        y = reverb.apply_reverb(x, reverb.Reverb(ir=ir, wet=0.0))
        np.testing.assert_allclose(y, x, atol=1e-9)

    def test_channel_conversion(self):
        ir4 = np.ones((10, 4))
        assert reverb.convert_channels(ir4, 2).shape == (10, 2)
        ir1 = np.ones((10, 1))
        assert reverb.convert_channels(ir1, 2).shape == (10, 2)

    def test_load_ir_resamples(self, tmp_path):
        ir = np.zeros(480)
        ir[0] = 1.0
        p = tmp_path / "ir.wav"
        wavio.write_wav(p, ir, 48000, bits=64)
        rv = reverb.load_impulse_response(p, 44100, 2)
        assert rv.ir.shape[1] == 2
        assert abs(rv.ir.shape[0] - 441) <= 2


class TestStreamingOps:
    def test_streaming_convolver_matches_offline(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1000, 1)) * 0.2
        ir = rng.standard_normal(64) * 0.1
        sc = eng.StreamingConvolver(ir, wet=1.0, dry=0.0)
        blocks = [sc(x[i : i + 128]) for i in range(0, 1000, 128)]
        streamed = np.concatenate(blocks, axis=0)
        offline = np.convolve(x[:, 0], ir)[:1000]
        np.testing.assert_allclose(streamed[:, 0], offline, atol=1e-9)

    def test_streaming_limiter_carries_state(self):
        x = np.concatenate([3.0 * np.ones(100), np.zeros(100)])[:, None]
        sl = eng.StreamingLimiter(ceiling=1.0, release_ms=100.0)
        b1 = sl(x[:100])
        b2 = sl(x[100:])
        assert np.max(np.abs(b1)) <= 1.0 + 1e-9
        # release continues into the silent block: gain stays < 1 initially
        assert sl._peak < 3.0


class TestEngine:
    def test_compute_and_post(self):
        e = eng.AudioEngine(44100, 2)
        e.register_compute(lambda t0, n: 2.0 * np.ones((n, 2)))
        e.post.add(eng.StreamingLimiter(ceiling=1.0))
        e.post.add(eng.clamp_guard)
        out = e.render(1000, block_size=256)
        assert out.shape == (1000, 2)
        assert np.max(np.abs(out)) <= 1.0

    def test_oneshots_run_at_boundaries(self):
        e = eng.AudioEngine()
        ran = []
        e.enqueue_oneshot(lambda engine, t: ran.append(t))
        e.step(128)
        assert ran == [0]
        assert e.stats.oneshots_run == 1

    def test_finished_computes_removed(self):
        e = eng.AudioEngine()
        e.register_compute(lambda t0, n: None)
        e.step(64)
        assert not e._computes

    def test_stats(self):
        e = eng.AudioEngine()
        e.register_compute(lambda t0, n: np.zeros((n, 2)))
        e.render(4096)
        assert e.stats.frames_rendered == 4096
        assert e.stats.cpu_load >= 0.0


class TestStreamingSynth:
    def test_streamed_matches_offline(self):
        cfg = sine_synth.SineSynthConfig(
            sample_rate=44100,
            ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=441, release=2000,
                                  sustain=0.7),
            dtype="float64",
        )
        synth = streaming_synth.StreamingSynth(cfg)
        e = eng.AudioEngine()
        e.register_compute(synth.compute)
        synth.on_event(events.mk_note_on(0, 440.0, 1.0, note_id=1, pan=0.0))
        blocks = [e.step(4096) for _ in range(4)]
        synth.on_event(events.mk_note_off(4 * 4096, note_id=1))
        blocks += [e.step(4096) for _ in range(3)]
        streamed = np.concatenate(blocks, axis=0)

        from cpp_audio_tpu.core import voices as vmod

        notes = [events.Note(1, 0, 4 * 4096, 440.0, 1.0, 0.0)]
        sch = vmod.schedule_from_notes(notes, pad_to=8)
        offline = sine_synth.render_schedule(sch, 7 * 4096, cfg)
        np.testing.assert_allclose(streamed, offline, atol=1e-9)

    def test_note_change_is_phase_continuous(self):
        """Retunes must not jump phase: the kernel renders phase from the
        press sample, so NOTE_CHANGE compensates through the start angle
        (voicebank.retuned_phase0, exact in the NCO's uint32 arithmetic —
        the reference's setAngleIncrements keeps the accumulated angle,
        audioelement.h:1439-1448). A glide retuned every block must show no
        larger inter-sample step at the retune boundaries than within
        blocks (the old in-place frequency change jumped ~40x)."""
        cfg = sine_synth.SineSynthConfig(
            sample_rate=44100, dtype="float64",
            ahdsr=envelopes.AHDSR(attack=100, hold=0, decay=0, release=1000,
                                  sustain=1.0))
        s = streaming_synth.StreamingSynth(cfg, n_voices=4)
        s.on_event(events.mk_note_on(0, 440.0, 1.0, note_id=1, pan=0.0))
        blocks, t = [], 0
        for k in range(8):
            blocks.append(np.asarray(s.compute(t, 4096))[:, 0])
            t += 4096
            s.on_event(events.mk_note_change(t, 1, 440.0 + 3.0 * (k + 1),
                                             1.0))
        y = np.concatenate(blocks)
        d = np.abs(np.diff(y))
        boundary = max(d[4096 * k - 1] for k in range(1, 8))
        typical = np.median(d)
        assert boundary < 3.0 * typical, (boundary, typical)

    def test_voice_stealing_drops(self):
        """Reference channel-occupancy policy (gen.crtp.h:221-225,398-413):
        the pool holds 2*n_voices channels; held AND still-releasing voices
        occupy; a channel frees only when its envelope reaches Done2."""
        cfg = sine_synth.SineSynthConfig(
            ahdsr=envelopes.AHDSR(attack=10, hold=0, decay=0, release=1000,
                                  sustain=1.0))
        synth = streaming_synth.StreamingSynth(cfg, n_voices=2)
        for i in range(4):  # n_channels = 4
            assert synth.on_event(
                events.mk_note_on(0, 440.0 + 10 * i, 1.0, note_id=i))
        assert not synth.on_event(events.mk_note_on(0, 660.0, 1.0, note_id=9))
        assert synth.dropped_note_on == 1
        # releasing voices still occupy their channel...
        synth.on_event(events.mk_note_off(100, note_id=0))
        assert not synth.on_event(
            events.mk_note_on(101, 770.0, 1.0, note_id=10))
        assert synth.dropped_note_on == 2
        # ... until the envelope finishes (release 1000 > the 2.5-period
        # floor at 440 Hz), after which the channel is reacquirable
        assert synth.on_event(events.mk_note_on(1200, 770.0, 1.0, note_id=11))
        assert synth.dropped_note_on == 2
