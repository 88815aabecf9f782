"""Native (C++) component tests: pitch pipeline parity, ring buffer."""

import numpy as np
import pytest

from cpp_audio_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestNativePitchPipe:
    def _peaks(self, seed=0, frames=40, sr=44100):
        from cpp_audio_tpu.analysis import resynth

        rng = np.random.default_rng(seed)
        t = np.arange(2 * sr)
        sig = sum(a * np.sin(2 * np.pi * f * t / sr)
                  for a, f in [(0.4, 330), (0.3, 495), (0.2, 880)])
        sig += 0.05 * rng.standard_normal(len(t))
        cfg = resynth.ResynthConfig(sample_rate=sr)
        return resynth.analyze(sig, cfg), cfg

    def _note_sig(self, notes):
        return sorted(
            (n.frames[0][0], round(n.frames[0][1], 3), round(n.frames[0][2], 6),
             n.release_frame, tuple((c, round(f, 3), round(v, 6)) for c, f, v in n.frames))
            for n in notes
        )

    def test_matches_python_reference(self):
        from cpp_audio_tpu.analysis import resynth

        peaks, cfg = self._peaks()
        nat, _, d1 = resynth.track_native(peaks, cfg)
        py, _, d2 = resynth.track_python(peaks, cfg)
        assert d1 == d2
        assert self._note_sig(nat) == self._note_sig(py)

    def test_matches_python_with_autotune(self):
        from cpp_audio_tpu.analysis import resynth

        peaks, cfg = self._peaks()
        cfg.use_autotune = True
        nat, _, _ = resynth.track_native(peaks, cfg)
        py, _, _ = resynth.track_python(peaks, cfg)
        assert self._note_sig(nat) == self._note_sig(py)

    def test_matches_python_with_harmonize_shift(self):
        from cpp_audio_tpu.analysis import resynth

        peaks, cfg = self._peaks()
        cfg.pitch_shift_pre_autotune = 3.0
        cfg.pitch_harmonize_post_autotune = 7.0
        nat, _, _ = resynth.track_native(peaks, cfg)
        py, _, _ = resynth.track_python(peaks, cfg)
        assert self._note_sig(nat) == self._note_sig(py)


class TestRingBuffer:
    def test_push_pop(self):
        rb = native.RingBuffer(1024)
        data = np.arange(100, dtype=np.float32)
        assert rb.push(data) == 100
        assert rb.size == 100
        out = rb.pop(100)
        np.testing.assert_array_equal(out, data)
        assert rb.size == 0

    def test_overflow_drops_and_counts(self):
        rb = native.RingBuffer(128)
        cap = rb.capacity
        wrote = rb.push(np.zeros(cap + 50, np.float32))
        assert wrote == cap
        assert rb.dropped == 50

    def test_wraparound(self):
        rb = native.RingBuffer(128)
        for i in range(10):
            d = np.full(100, float(i), np.float32)
            assert rb.push(d) == 100
            out = rb.pop(100)
            np.testing.assert_array_equal(out, d)
