"""Live streaming analysis -> resynthesis (PeriodicFFT + LiveResynth)."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis.resynth import ResynthConfig
from cpp_audio_tpu.analysis.streaming import LiveResynth, PeriodicFFT


class TestPeriodicFFT:
    def test_window_stride_overlap(self):
        got = []
        p = PeriodicFFT(8, 3, lambda w, end: got.append((w.copy(), end)))
        p.feed(np.arange(20.0))
        # windows: [0..8)@8, [3..11)@11, [6..14)@14, [9..17)@17, [12..20)@20
        assert len(got) == 5
        np.testing.assert_allclose(got[0][0], np.arange(8))
        np.testing.assert_allclose(got[1][0], np.arange(3, 11))
        assert [e for _, e in got] == [8, 11, 14, 17, 20]

    def test_sample_by_sample_matches_block(self):
        a, b = [], []
        p1 = PeriodicFFT(8, 3, lambda w, e: a.append((w.copy(), e)))
        p2 = PeriodicFFT(8, 3, lambda w, e: b.append((w.copy(), e)))
        x = np.random.default_rng(0).standard_normal(40)
        p1.feed(x)
        for s in x:
            p2.feed(s)
        assert len(a) == len(b)
        for (wa, ea), (wb, eb) in zip(a, b):
            np.testing.assert_allclose(wa, wb)
            assert ea == eb

    def test_negative_overlap_skips(self):
        got = []
        p = PeriodicFFT(4, 6, lambda w, e: got.append((w.copy(), e)))
        p.feed(np.arange(16.0))
        # windows: [0..4)@4, then skip 2: [6..10)@10, skip 2: [12..16)@16
        assert len(got) == 3
        np.testing.assert_allclose(got[1][0], np.arange(6, 10))
        np.testing.assert_allclose(got[2][0], np.arange(12, 16))

    def test_dropped_frames_resync(self):
        # reference reset_samples zeroes the CONTENT but keeps the fill
        # position, so the fire cadence is preserved (periodicfft.cpp:69-83)
        got = []
        p = PeriodicFFT(4, 4, lambda w, e: got.append((w.copy(), e)))
        p.feed(np.arange(3.0))
        p.on_dropped_frames(5)   # uncovered overrun: zero content, keep pos
        p.feed(np.arange(10.0, 14.0))
        assert [e for _, e in got] == [9]   # 3 fed + 5 dropped + 1 fed
        np.testing.assert_allclose(got[0][0], [0.0, 0.0, 0.0, 10.0])

    def test_dropped_frames_covered_by_pending_skip(self):
        # negative overlap: a drop within the pending skip is absorbed
        # without resetting (periodicfft.cpp:70-75)
        got = []
        p = PeriodicFFT(4, 8, lambda w, e: got.append((w.copy(), e)))
        p.feed(np.arange(4.0))             # fire; skip = 4 pending
        p.on_dropped_frames(3)             # covered: skip 1 remains
        p.feed(np.arange(20.0, 25.0))      # 1 skipped, 4 fill -> fire
        assert [e for _, e in got] == [4, 12]
        np.testing.assert_allclose(got[1][0], [21.0, 22.0, 23.0, 24.0])


class TestLiveResynth:
    def test_tone_resynthesizes_live(self):
        sr = 44100
        cfg = ResynthConfig(sample_rate=sr, window_size_seconds=0.05,
                            window_center_stride_seconds=0.025, seed=1,
                            env_release_seconds=0.02)
        live = LiveResynth(cfg)
        t = np.arange(int(0.9 * sr))
        sig = np.zeros(len(t))
        on = t < int(0.6 * sr)
        sig[on] = 0.4 * np.sin(2 * np.pi * 392.0 * t[on] / sr)
        out = live.run_duplex(sig, block_size=512)

        assert live.stats.windows > 20
        assert live.stats.note_on >= 1
        assert live.stats.note_off >= 1

        mono = out.sum(axis=1)
        # output is silent before the first full window completes
        assert np.max(np.abs(mono[: cfg.window_size // 2])) == 0.0
        # mid-signal: the resynthesized tone is there and is ~392 Hz
        mid = mono[int(0.2 * sr) : int(0.5 * sr)]
        assert np.max(np.abs(mid)) > 1e-3
        spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
        dom = np.argmax(spec) * sr / len(mid)
        assert dom == pytest.approx(392.0, abs=5.0)
        # tail: input stopped at 0.6 s; the voice releases
        tail = mono[int(0.85 * sr):]
        assert np.max(np.abs(tail)) < np.max(np.abs(mid)) * 0.2

    def test_pull_without_input_is_silence(self):
        live = LiveResynth(ResynthConfig(window_size_seconds=0.05,
                                         window_center_stride_seconds=0.025))
        out = live.pull(256)
        np.testing.assert_allclose(out, 0.0)
