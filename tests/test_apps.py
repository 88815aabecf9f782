"""CLI apps + WIR tooling tests."""

import numpy as np
import pytest

from cpp_audio_tpu.apps import birds as birds_app
from cpp_audio_tpu.apps import tune as tune_app
from cpp_audio_tpu.apps import wav_tools
from cpp_audio_tpu.utils import wav as wavio
from cpp_audio_tpu.utils import wir as wirio


class TestWavTools:
    def _mk(self, tmp_path, data, sr=44100):
        p = tmp_path / "in.wav"
        wavio.write_wav(p, data, sr, bits=64)
        return p

    def test_count_channels(self, tmp_path):
        p = self._mk(tmp_path, np.zeros((100, 2)))
        assert wav_tools.count_channels(p) == 2

    def test_join_non_zeros(self, tmp_path):
        d = np.zeros((50, 1))
        d[10:20] = 0.3
        p = self._mk(tmp_path, d)
        out = wav_tools.join_non_zeros(p)
        data, _ = wavio.read_wav(out)
        assert data.shape[0] == 10

    def test_mod_wav_smooths(self, tmp_path):
        rng = np.random.default_rng(0)
        d = rng.standard_normal((500, 1)) * 0.5
        p = self._mk(tmp_path, d)
        out = wav_tools.mod_wav(p)
        sm, _ = wavio.read_wav(out)
        assert np.std(np.diff(sm[:, 0])) < np.std(np.diff(d[:, 0]))

    def test_self_convolve_normalized(self, tmp_path):
        rng = np.random.default_rng(1)
        d = rng.standard_normal((256, 1)) * 0.1
        p = self._mk(tmp_path, d)
        out = wav_tools.self_convolve_wav(p)
        sc, _ = wavio.read_wav(out)
        assert np.max(np.abs(sc)) == pytest.approx(1.0, abs=1e-5)

    def test_wir_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        ir = rng.standard_normal((300, 2)).astype(np.float32).astype(np.float64)
        w = tmp_path / "impulse.wir"
        wirio.write_wir(w, ir, 48000)
        data, sr = wirio.read_wir(w)
        assert sr == 48000
        np.testing.assert_allclose(data, ir, atol=1e-7)
        out = wav_tools.wir_2_wav(w)
        back, sr2 = wavio.read_wav(out)
        assert sr2 == 48000
        np.testing.assert_allclose(back, ir, atol=1e-7)


class TestBirdsApp:
    def test_render_and_cli(self, tmp_path):
        out_path = tmp_path / "b.wav"
        rc = birds_app.main(["--mode", "birds", "--program", "0",
                             "--seconds", "0.5", "--seed", "32", str(out_path)])
        assert rc == 0
        data, sr = wavio.read_wav(out_path)
        assert sr == 44100 and data.shape[1] == 2

    def test_list(self, capsys):
        assert birds_app.main(["--list"]) == 0
        out = capsys.readouterr().out
        assert "Standard & Cute bird" in out
        assert "R2D2" in out
        assert "Heavy rain" in out


class TestTuneApp:
    def test_render_score_with_reference_presets(self, tmp_path):
        out, sr = tune_app.render_score(
            "do mi sol", synth_dir="/root/reference/synth", time_unit_ms=80.0
        )
        assert sr == 44100
        assert np.max(np.abs(out)) > 1e-4

    def test_cli(self, tmp_path):
        out_path = tmp_path / "t.wav"
        rc = tune_app.main(["do re", str(out_path), "--time-unit-ms", "60"])
        assert rc == 0
        assert out_path.exists()


class TestResynthLiveApp:
    def test_live_duplex_cli(self, tmp_path, capsys):
        from cpp_audio_tpu.apps import resynth as app
        from cpp_audio_tpu.utils import wav

        sr = 44100
        t = np.arange(int(0.6 * sr))
        sig = 0.4 * np.sin(2 * np.pi * 392.0 * t / sr)
        inp = tmp_path / "in.wav"
        outp = tmp_path / "out.wav"
        wav.write_wav(inp, sig[:, None], sr)
        assert app.main([str(inp), str(outp), "--live",
                         "--block-size", "1024"]) == 0
        assert "live:" in capsys.readouterr().out
        d, sr2 = wav.read_wav(outp)
        assert sr2 == sr and len(d) == len(sig)
        # the tone is reproduced once the first window completes
        mono = d.sum(axis=1)
        assert np.max(np.abs(mono[len(mono) // 2:])) > 1e-3


class TestTuneEventStreamCLI:
    """The tune CLI's event-stream modes (reference main.tune.cpp streams)."""

    def test_rain_mode(self, tmp_path):
        out = tmp_path / "rain.wav"
        assert tune_app.main(["--rain", "0.5", str(out)]) == 0
        data, sr = wavio.read_wav(out)
        assert np.abs(data).max() > 1e-4

    def test_sonify_mode(self, tmp_path):
        src = tmp_path / "blob.bin"
        src.write_bytes(bytes(range(64)) * 4)
        out = tmp_path / "sonified.wav"
        assert tune_app.main(["--sonify", str(src), str(out)]) == 0
        data, sr = wavio.read_wav(out)
        assert np.abs(data).max() > 1e-4

    def test_two_voice_and_loop(self, tmp_path):
        out = tmp_path / "duo.wav"
        assert tune_app.main(["do mi", str(out), "--score2", "sol si",
                              "--octave2", "3", "--loop", "2",
                              "--loop-pitch-offset", "2"]) == 0
        d1, sr = wavio.read_wav(out)
        # the loop doubles the length vs a single pass
        out2 = tmp_path / "single.wav"
        assert tune_app.main(["do mi", str(out2)]) == 0
        d2, _ = wavio.read_wav(out2)
        # one extra loop iteration = one score period (2 notes) longer
        assert len(d1) >= len(d2) + 10000


def test_resynth_vocode_cli(tmp_path):
    """resynth --vocode CARRIER --debug-vocoder DIR (IMJ_DEBUG_VOCODER)."""
    from cpp_audio_tpu.apps import resynth as app

    sr = 44100
    t = np.arange(sr // 2) / sr
    wavio.write_wav(tmp_path / "m.wav",
                    (0.5 * np.sin(2 * np.pi * 392 * t)).astype(np.float32), sr)
    wavio.write_wav(tmp_path / "c.wav",
                    np.sign(np.sin(2 * np.pi * 110 * t)).astype(np.float32), sr)
    taps = tmp_path / "taps"
    assert app.main([str(tmp_path / "m.wav"), str(tmp_path / "o.wav"),
                     "--vocode", str(tmp_path / "c.wav"),
                     "--debug-vocoder", str(taps)]) == 0
    d, _ = wavio.read_wav(tmp_path / "o.wav")
    assert np.abs(d).max() > 1e-3
    assert (taps / "vocoded.wav").exists()


def test_resynth_deduce_cli(tmp_path):
    """resynth --deduce: the main.resynth.cpp scheme (deduce notes, draw the
    piano-roll BMP, re-synthesize via the resynth.hpp pool)."""
    from cpp_audio_tpu.apps import resynth as app

    sr = 44100
    t = np.arange(sr) / sr
    wavio.write_wav(tmp_path / "in.wav",
                    (0.5 * np.sin(2 * np.pi * 392 * t)).astype(np.float32), sr)
    assert app.main([str(tmp_path / "in.wav"), str(tmp_path / "out.wav"),
                     "--deduce"]) == 0
    d, _ = wavio.read_wav(tmp_path / "out.wav")
    mono = d.sum(axis=1) if d.ndim > 1 else d
    spec = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
    dom = np.argmax(spec) * sr / len(mono)
    assert abs(dom - 392.0) < 4.0
    bmp = (tmp_path / "out.notes.bmp").read_bytes()
    assert bmp[:2] == b"BM"


def test_tune_demo_piece(tmp_path):
    out = tmp_path / "demo.wav"
    assert tune_app.main(["--demo", str(out)]) == 0
    d, sr = wavio.read_wav(out)
    assert len(d) > sr * 2 and np.abs(d).max() > 1e-3
