"""Scripted drives of the interactive app surfaces (VERDICT round-1 item 3):
birds stdin loop, tune preset hot reload during streaming playback, and the
resynth_ui live refresh loop with param mutation.
"""

import io

import numpy as np
import pytest

from cpp_audio_tpu.utils import wav as wavio


class TestBirdsInteractive:
    def test_scripted_session(self, tmp_path):
        """number = program change, word = replay (fresh seed), q = quit
        (reference main.birds.cpp:107-187)."""
        from cpp_audio_tpu.apps import birds

        stdin = io.StringIO("1\nx\nq\n")
        stdout = io.StringIO()
        n = birds.interactive(mode="birds", program=0, seconds=0.5,
                              out_dir=tmp_path, stdin=stdin, stdout=stdout,
                              sample_rate=44100, seed=3)
        # initial note + program-change note + replay note
        assert n == 3
        out = stdout.getvalue()
        assert "using program" in out
        assert "quitting" in out
        wavs = sorted(tmp_path.glob("note_*.wav"))
        assert len(wavs) == 3
        for w in wavs:
            d, sr = wavio.read_wav(w)
            assert np.abs(d).max() > 1e-5
        # replay used a different seed: same program (1), different audio
        d2, _ = wavio.read_wav(wavs[1])
        d3, _ = wavio.read_wav(wavs[2])
        assert d2.shape == d3.shape and np.abs(d2 - d3).max() > 1e-6

    def test_not_a_number_replays(self, tmp_path):
        from cpp_audio_tpu.apps import birds

        stdout = io.StringIO()
        n = birds.interactive(mode="robots", seconds=0.3, out_dir=tmp_path,
                              stdin=io.StringIO("zzz\nq\n"), stdout=stdout)
        assert n == 2
        assert "not a number" in stdout.getvalue()

    def test_cli_flag(self, tmp_path):
        from cpp_audio_tpu.apps import birds
        import sys

        old = sys.stdin
        sys.stdin = io.StringIO("q\n")
        try:
            assert birds.main(["--interactive", "--mode", "birds",
                               "--seconds", "0.3",
                               "--out-dir", str(tmp_path)]) == 0
        finally:
            sys.stdin = old
        assert list(tmp_path.glob("note_*.wav"))


class TestTuneHotReload:
    def _synth_dir(self, tmp_path):
        d = tmp_path / "synth"
        d.mkdir()
        (d / "EnvelopeFast.txt").write_text("A.\nH\nD.\nS......\nR..\n")
        (d / "Harmonics.txt").write_text("--------\n----\n--\n")
        (d / "LowPass.txt").write_text("2000\n")
        return d

    def test_reload_changes_tail(self, tmp_path):
        """Editing Harmonics.txt mid-playback reshapes the spectrum of the
        remainder (main.tune.cpp:1941-2031 hot reload)."""
        from cpp_audio_tpu.apps import tune

        d = self._synth_dir(tmp_path)
        sr = 44100
        notes = tune.score_to_notes("do do do do do do", sample_rate=sr,
                                    time_unit_ms=250.0)
        edited = {"done": False}

        def on_block(bi, t):
            if not edited["done"] and t > sr // 2:
                # kill all overtones: fundamental only
                (d / "Harmonics.txt").write_text("--------\n")
                edited["done"] = True

        out = tmp_path / "hot.wav"
        reloads, total = tune.play_streaming(
            notes, out, synth_dir=d, sample_rate=sr,
            block_seconds=0.1, on_block=on_block)
        assert reloads == 1
        data, _ = wavio.read_wav(out)
        assert len(data) == total
        mono = data.sum(axis=1)

        def h2_ratio(seg):
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            f0 = 261.63  # do (C4)
            b = lambda f: int(round(f * len(seg) / sr))
            w = 4
            e1 = spec[b(f0) - w : b(f0) + w].max()
            e2 = spec[b(2 * f0) - w : b(2 * f0) + w].max()
            return e2 / max(e1, 1e-12)

        head = mono[: sr // 2]
        tail = mono[sr : sr + sr // 2]
        assert h2_ratio(head) > 5 * h2_ratio(tail)

    def test_no_edit_no_reload(self, tmp_path):
        from cpp_audio_tpu.apps import tune

        d = self._synth_dir(tmp_path)
        notes = tune.score_to_notes("do mi", sample_rate=44100)
        reloads, _ = tune.play_streaming(notes, tmp_path / "x.wav",
                                         synth_dir=d, block_seconds=0.2)
        assert reloads == 0

    def test_cli_play_flag(self, tmp_path):
        from cpp_audio_tpu.apps import tune

        d = self._synth_dir(tmp_path)
        out = tmp_path / "p.wav"
        assert tune.main(["do mi sol", str(out), "--synth-dir", str(d),
                          "--play"]) == 0
        data, _ = wavio.read_wav(out)
        assert np.abs(data).max() > 1e-4


class TestResynthUiLive:
    def _tone_wav(self, tmp_path, seconds=1.2):
        sr = 44100
        t = np.arange(int(seconds * sr)) / sr
        sig = 0.5 * np.sin(2 * np.pi * 392 * t)
        p = tmp_path / "in.wav"
        wavio.write_wav(p, sig.astype(np.float32), sr)
        return p, sig, sr

    def test_refresh_loop_and_set(self, tmp_path):
        from cpp_audio_tpu.apps import resynth_ui

        _, sig, sr = self._tone_wav(tmp_path)
        stdin = io.StringIO("set analysis_volume 0.5\n"
                            "set min_volume 0.001\nquit\n")
        stdout = io.StringIO()
        stats = resynth_ui.live_dashboard(sig, sr, stdin=stdin, stdout=stdout,
                                          block_size=4096,
                                          blocks_per_refresh=2)
        out = stdout.getvalue()
        assert stats["refreshes"] >= 2
        assert stats["commands"] == 2
        assert "set analysis_volume = 0.5" in out
        assert "pitch window" in out
        assert "windows=" in out

    def test_quit_stops_stream(self, tmp_path):
        from cpp_audio_tpu.apps import resynth_ui

        _, sig, sr = self._tone_wav(tmp_path, seconds=2.0)
        stats = resynth_ui.live_dashboard(
            sig, sr, stdin=io.StringIO("quit\n"), stdout=io.StringIO(),
            block_size=4096, blocks_per_refresh=1)
        assert stats["quit"]
        # stopped after the first refresh: far fewer windows than the stream
        assert stats["windows"] <= 3

    def test_preset_save_load_roundtrip(self, tmp_path):
        from cpp_audio_tpu.apps import resynth_ui
        from cpp_audio_tpu.analysis import resynth as resynth_mod

        _, sig, sr = self._tone_wav(tmp_path)
        p = tmp_path / "p.json"
        cfg = resynth_mod.ResynthConfig(sample_rate=sr)
        stdin = io.StringIO(f"set pitch_shift_post_autotune 5.0\n"
                            f"save {p}\nquit\n")
        resynth_ui.live_dashboard(sig, sr, stdin=stdin, stdout=io.StringIO(),
                                  config=cfg, block_size=4096,
                                  blocks_per_refresh=1)
        assert p.exists()
        cfg2 = resynth_mod.ResynthConfig(sample_rate=sr)
        stdin2 = io.StringIO(f"load {p}\nquit\n")
        out2 = io.StringIO()
        resynth_ui.live_dashboard(sig, sr, stdin=stdin2, stdout=out2,
                                  config=cfg2, block_size=4096,
                                  blocks_per_refresh=1)
        assert cfg2.pitch_shift_post_autotune == 5.0

    def test_set_mutation_affects_tracking(self, tmp_path):
        """Raising min_volume mid-stream stops new notes — the live param
        reaches the running tracker."""
        from cpp_audio_tpu.apps import resynth_ui

        _, sig, sr = self._tone_wav(tmp_path, seconds=2.0)
        stdin = io.StringIO("set min_volume 99.0\n")
        stdout = io.StringIO()
        stats = resynth_ui.live_dashboard(sig, sr, stdin=stdin, stdout=stdout,
                                          block_size=4096,
                                          blocks_per_refresh=1)
        # after the mutation every window drops the tone -> notes turned off
        assert "off=" in stdout.getvalue()
        assert stats["commands"] == 1
