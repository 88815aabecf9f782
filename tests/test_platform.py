"""Virtual platform contexts (L1 analog: Context/AudioInput/FullDuplex)."""

import numpy as np
import pytest

from cpp_audio_tpu.core import platform
from cpp_audio_tpu.core.engine import AudioEngine


class TestOutputContext:
    def test_play_callback_contract(self):
        ctx = platform.OutputContext()
        seen_times = []

        def play_f(out, t_nanos):
            out[:] = 0.25
            seen_times.append(t_nanos)

        ctx.do_init(0.008, 48000, 2, play_f)
        assert ctx.initialized()
        assert ctx.get_sample_rate() == 48000
        out = ctx.render(1000)
        assert out.shape == (1000, 2)
        np.testing.assert_allclose(out, 0.25)
        # TimeNanos advances monotonically with the frame clock
        assert seen_times == sorted(seen_times)
        assert seen_times[0] == 0
        assert platform.wait_for_first_n_audio_cb_frames() > 0

    def test_latency_to_callback_size(self):
        ctx = platform.OutputContext()
        ctx.do_init(0.008, 44100, 2, lambda o, t: None)
        # 8ms @ 44.1k = 352.8 -> next pow2 = 512
        assert ctx.frames_per_callback == 512

    def test_cpu_load_gauge(self):
        ctx = platform.OutputContext()
        ctx.do_init(0.01, 44100, 1, lambda o, t: None)
        ctx.render(4410)
        assert 0.0 <= ctx.get_stream_cpu_load() < 1.0

    def test_teardown(self):
        ctx = platform.OutputContext()
        ctx.do_init(0.01, 44100, 1, lambda o, t: None)
        ctx.do_tear_down()
        assert not ctx.initialized()
        with pytest.raises(RuntimeError):
            ctx.pull()


class TestInputContext:
    def test_chunked_delivery(self):
        sig = np.arange(1000, dtype=np.float64)
        ctx = platform.InputContext(sig, 44100)
        got = []
        ctx.do_init(lambda buf, t: got.append(buf.copy()))
        while not ctx.exhausted:
            ctx.push(256)
        np.testing.assert_allclose(np.concatenate(got), sig)

    def test_stereo_source_downmixes(self):
        sig = np.stack([np.ones(10), np.zeros(10)], axis=1)
        ctx = platform.InputContext(sig, 44100)
        got = []
        ctx.do_init(lambda buf, t: got.append(buf.copy()))
        ctx.push(10)
        np.testing.assert_allclose(got[0], 0.5)


class TestFullDuplex:
    def test_record_then_play_same_clock(self):
        """The duplex loop is a passthrough when PlayF replays RecordF."""
        sr = 44100
        sig = np.sin(np.linspace(0, 20, 2000))
        ctx = platform.FullDuplexContext(sig, sr, n_outs=1,
                                         frames_per_callback=128)
        pending = []

        def record_f(buf, t):
            pending.append(buf.copy())

        def play_f(out, t):
            buf = pending.pop(0)
            out[: len(buf), 0] = buf

        ctx.do_init(record_f, play_f)
        out = ctx.run()
        np.testing.assert_allclose(out[:, 0], sig, atol=1e-12)

    def test_engine_behind_play_f(self):
        """AudioEngine steps behind the platform PlayF (the L1->L3 wiring)."""
        eng = AudioEngine(sample_rate=44100, n_channels=2)
        eng.register_compute(lambda t, n: np.full((n, 2), 0.5))
        ctx = platform.OutputContext()
        ctx.do_init(0.005, 44100, 2,
                    lambda out, t: out.__setitem__(slice(None),
                                                   eng.step(out.shape[0])))
        out = ctx.render(777)
        np.testing.assert_allclose(out, 0.5)


class TestLatencyOverride:
    def test_env_override_changes_callback_size(self, monkeypatch):
        """PA_MIN_LATENCY_MSEC overrides the requested latency
        (audio_context.cpp:60-92)."""
        from cpp_audio_tpu.core import platform as plat

        monkeypatch.delenv(plat.PA_MIN_LATENCY_MSEC, raising=False)
        ctx = plat.OutputContext()
        ctx.do_init(0.008, 44100, 2, lambda out, t: None)
        base = ctx.frames_per_callback
        assert plat.override_portaudio_min_latency_millis(64)
        ctx2 = plat.OutputContext()
        ctx2.do_init(0.008, 44100, 2, lambda out, t: None)
        assert ctx2.frames_per_callback > base
        monkeypatch.delenv(plat.PA_MIN_LATENCY_MSEC, raising=False)

    def test_invalid_override_rejected(self, monkeypatch):
        from cpp_audio_tpu.core import platform as plat

        assert not plat.override_portaudio_min_latency_millis(0)
        monkeypatch.setenv(plat.PA_MIN_LATENCY_MSEC, "garbage")
        assert plat.effective_min_latency_seconds(0.02) == 0.02

    def test_factory_falls_back_to_virtual(self):
        """No audio device in this environment: make_output_context returns
        the virtual context (the sounddevice-backed one is import-guarded)."""
        from cpp_audio_tpu.core import platform as plat

        ctx = plat.make_output_context()
        assert isinstance(ctx, plat.OutputContext)


class TestRtDiagnostics:
    """AudioCbTimeStats / AudioOverflow / SignificantTimeDeviation analogs
    (audio_platform_pa.h:31-167)."""

    def test_callback_time_stats(self):
        from cpp_audio_tpu.core import platform as plat

        ctx = plat.OutputContext()
        ctx.do_init(0.008, 44100, 2, lambda out, t: None)
        for _ in range(5):
            ctx.pull(64)
        s = ctx.stats
        assert s.callbacks == 5
        assert 0.0 <= s.min_callback_seconds <= s.max_callback_seconds

    def test_overflow_detection(self):
        import time as _t

        from cpp_audio_tpu.core import platform as plat

        ctx = plat.OutputContext()
        ctx.do_init(0.008, 44100, 2, lambda out, t: _t.sleep(0.002))
        ctx.pull(4)  # budget ~90 us, compute ~2 ms -> overflow
        assert ctx.stats.overflows == 1

    def test_time_deviation(self):
        from cpp_audio_tpu.core.platform import StreamStats

        s = StreamStats()
        assert not s.analyze_time(1_000_000, 2_000_000)  # 1 ms < 10 ms
        assert s.analyze_time(0, 50_000_000)             # 50 ms deviation
        assert s.time_deviations == 1
        assert s.max_time_deviation_seconds >= 0.05


class TestInt16OutputContext:
    """AudioUnit-context analog (audio_platform_au.h:24-255)."""

    def test_int16_quantization_truncates(self):
        ctx = platform.Int16OutputContext(n_outs=2)

        def play_f(out, t_nanos):
            out[:, 0] = 0.5
            out[:, 1] = -0.99997  # quantizes to -32766 by truncation

        ctx.do_init(0.008, 44100, 2, play_f)
        out = ctx.pull_int16(8)
        assert out.dtype == np.int16
        # (SInt16)(0.5f * 32767.f) truncates 16383.5 -> 16383
        np.testing.assert_array_equal(out[:, 0], 16383)
        np.testing.assert_array_equal(out[:, 1], int(-0.99997 * 32767.0))

    def test_variable_os_chosen_callback_sizes(self):
        ctx = platform.Int16OutputContext(n_outs=1)
        sizes_seen = []

        def play_f(out, t_nanos):
            sizes_seen.append(len(out))
            out[:] = 1.0 / 32767.0

        ctx.do_init(0.008, 44100, 1, play_f)
        # the OS may vary the request size mid-stream (au.h:10-13,56-58)
        out = ctx.render_int16(1200, callback_sizes=[512, 256, 100])
        assert out.shape == (1200, 1)
        np.testing.assert_array_equal(out[:, 0], 1)
        assert sizes_seen == [512, 256, 100, 332]
        # staging buffer grew once and is reused (no per-callback allocation)
        assert ctx._staging.shape[0] >= 512

    def test_default_callback_size_is_observed_ios_size(self):
        ctx = platform.Int16OutputContext()
        assert ctx.frames_per_callback == 512
