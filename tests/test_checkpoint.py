"""Resumable render-state checkpointing (analysis/checkpoint.py).

SURVEY.md 5.4: the reference checkpoints presets only (autosave thread,
rt.resynth.lib.cpp:1124-1161); the rebuild adds render-state checkpointing
for long offline jobs. The contract under test: a run interrupted at ANY
segment boundary and resumed from its snapshot produces output bit-identical
to an uninterrupted run.
"""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import checkpoint as ckpt
from cpp_audio_tpu.analysis.presets_json import OfflineJobConfig, ResynthPreset
from cpp_audio_tpu.utils import wav as wavio

SR = 11025


def _chirp(seconds, f0=220.0, f1=660.0):
    t = np.arange(int(seconds * SR)) / SR
    f = f0 * (f1 / f0) ** (t / t[-1])
    return (0.5 * np.sin(2 * np.pi * np.cumsum(f) / SR)).astype(np.float64)


def _preset(**kw):
    base = dict(analysis_volume=1.0, vocoder_volume=0.6, carrier_volume=0.0,
                window_size_seconds=0.05, window_center_stride_seconds=0.025,
                vocoder_modulator_window_size_seconds=0.04,
                vocoder_stride_seconds=0.01)
    base.update(kw)
    return ResynthPreset(**base)


class TestResume:
    def test_uninterrupted_has_no_leftover_checkpoint(self, tmp_path):
        voice = _chirp(1.0)
        path = tmp_path / "ck.bin"
        out = ckpt.run_offline_streaming(_preset(), voice, voice, SR,
                                         checkpoint_path=path,
                                         segment_seconds=0.3)
        assert out is not None and out.shape == (len(voice), 2)
        assert np.max(np.abs(out)) > 0
        assert not path.exists()

    @pytest.mark.parametrize("kill_after", [1, 2, 3])
    def test_resume_bit_identical(self, tmp_path, kill_after):
        voice = _chirp(1.4)
        preset = _preset()
        full = ckpt.run_offline_streaming(preset, voice, voice, SR,
                                          segment_seconds=0.3)
        path = tmp_path / "ck.bin"
        # simulated kill after `kill_after` segments...
        first = ckpt.run_offline_streaming(preset, voice, voice, SR,
                                           checkpoint_path=path,
                                           segment_seconds=0.3,
                                           max_segments=kill_after)
        assert first is None
        assert path.exists()
        # ...then resume to completion
        resumed = ckpt.run_offline_streaming(preset, voice, voice, SR,
                                             checkpoint_path=path,
                                             segment_seconds=0.3)
        np.testing.assert_array_equal(resumed, full)
        assert not path.exists()

    def test_resume_bit_identical_with_feedback_and_limit(self, tmp_path):
        # feedback drones exercise the delayed-output feedback carry
        # (rt.resynth.lib.cpp:1629-1651) across the snapshot boundary
        voice = _chirp(1.2)
        preset = _preset(vocoder_volume=0.0,
                         analysis_output_feedback_gain=0.5,
                         output_delay_seconds=0.15)
        full = ckpt.run_offline_streaming(preset, voice, None, SR,
                                          post="limit", segment_seconds=0.25)
        path = tmp_path / "ck.bin"
        assert ckpt.run_offline_streaming(preset, voice, None, SR,
                                          post="limit",
                                          checkpoint_path=path,
                                          segment_seconds=0.25,
                                          max_segments=2) is None
        resumed = ckpt.run_offline_streaming(preset, voice, None, SR,
                                             post="limit",
                                             checkpoint_path=path,
                                             segment_seconds=0.25)
        np.testing.assert_array_equal(resumed, full)

    def test_stale_checkpoint_restarts_from_scratch(self, tmp_path):
        voice = _chirp(1.0)
        path = tmp_path / "ck.bin"
        # leave a snapshot behind from a DIFFERENT config...
        assert ckpt.run_offline_streaming(_preset(analysis_input_gain=0.5),
                                          voice, voice, SR,
                                          checkpoint_path=path,
                                          segment_seconds=0.3,
                                          max_segments=1) is None
        assert path.exists()
        # ...the mismatched fingerprint must be ignored, not resumed
        preset = _preset()
        out = ckpt.run_offline_streaming(preset, voice, voice, SR,
                                         checkpoint_path=path,
                                         segment_seconds=0.3)
        full = ckpt.run_offline_streaming(preset, voice, voice, SR,
                                          segment_seconds=0.3)
        np.testing.assert_array_equal(out, full)

    def test_corrupt_checkpoint_ignored(self, tmp_path):
        path = tmp_path / "ck.bin"
        path.write_bytes(b"not a pickle")
        assert ckpt.load_checkpoint(path, "whatever") is None
        assert ckpt.load_checkpoint(tmp_path / "absent.bin", "x") is None
        # any exception during unpickling must count as unreadable, e.g. a
        # snapshot referencing a class layout that no longer exists
        import pickle
        path.write_bytes(pickle.dumps({"not": "a state"}))
        assert ckpt.load_checkpoint(path, "whatever") is None

    def test_same_length_different_content_restarts(self, tmp_path):
        # the fingerprint hashes input CONTENT: a re-recorded input of equal
        # length must not resume a stale snapshot
        v1 = _chirp(1.0)
        v2 = _chirp(1.0, f0=330.0, f1=990.0)
        preset = _preset(vocoder_volume=0.0)
        path = tmp_path / "ck.bin"
        assert ckpt.run_offline_streaming(preset, v1, None, SR,
                                          checkpoint_path=path,
                                          segment_seconds=0.3,
                                          max_segments=1) is None
        out = ckpt.run_offline_streaming(preset, v2, None, SR,
                                         checkpoint_path=path,
                                         segment_seconds=0.3)
        full = ckpt.run_offline_streaming(preset, v2, None, SR,
                                          segment_seconds=0.3)
        np.testing.assert_array_equal(out, full)

    def test_mismatched_input_lengths(self, tmp_path):
        # shorter input = trailing silence; must render (and resume)
        # without shape errors in the vocoder / feedback legs
        voice = _chirp(0.8)
        carrier = _chirp(1.2)
        preset = _preset()
        full = ckpt.run_offline_streaming(preset, voice, carrier, SR,
                                          segment_seconds=0.25)
        assert full.shape == (len(carrier), 2)
        path = tmp_path / "ck.bin"
        assert ckpt.run_offline_streaming(preset, voice, carrier, SR,
                                          checkpoint_path=path,
                                          segment_seconds=0.25,
                                          max_segments=2) is None
        resumed = ckpt.run_offline_streaming(preset, voice, carrier, SR,
                                             checkpoint_path=path,
                                             segment_seconds=0.25)
        np.testing.assert_array_equal(resumed, full)
        # carrier shorter than voice too
        out2 = ckpt.run_offline_streaming(preset, carrier, voice, SR,
                                          segment_seconds=0.25)
        assert out2.shape == (len(carrier), 2)

    def test_snapshot_size_tracks_progress(self, tmp_path):
        # only the rendered prefix is written, not the preallocated render
        voice = _chirp(2.0)
        preset = _preset(vocoder_volume=0.0)
        p1 = tmp_path / "early.bin"
        p2 = tmp_path / "late.bin"
        ckpt.run_offline_streaming(preset, voice, None, SR,
                                   checkpoint_path=p1, segment_seconds=0.25,
                                   max_segments=1)
        ckpt.run_offline_streaming(preset, voice, None, SR,
                                   checkpoint_path=p2, segment_seconds=0.25,
                                   max_segments=7)
        assert p1.stat().st_size < p2.stat().st_size * 0.5


class TestJob:
    def test_run_job_checkpointed(self, tmp_path):
        voice = _chirp(0.8)
        vf = tmp_path / "v.wav"
        wavio.write_wav(vf, voice[:, None], SR, bits=32,
                        fmt=wavio.WAVE_FORMAT_IEEE_FLOAT)
        pf = tmp_path / "p.json"
        _preset(vocoder_volume=0.0).save(pf)
        cfg = OfflineJobConfig(preset_file=str(pf), input_voice_file=str(vf),
                               output_file=str(tmp_path / "o.wav"),
                               post="limit")
        out = ckpt.run_job_checkpointed(cfg, tmp_path / "ck.bin",
                                        segment_seconds=0.25)
        data, sr = wavio.read_wav(tmp_path / "o.wav")
        assert sr == SR
        np.testing.assert_allclose(data, out, atol=2e-7)

    def test_cli_checkpoint_flag(self, tmp_path):
        from cpp_audio_tpu.apps import resynth as app

        voice = _chirp(0.6)
        vf = tmp_path / "v.wav"
        wavio.write_wav(vf, voice[:, None], SR, bits=32,
                        fmt=wavio.WAVE_FORMAT_IEEE_FLOAT)
        pf = tmp_path / "p.json"
        _preset(vocoder_volume=0.0).save(pf)
        jf = tmp_path / "job.json"
        OfflineJobConfig(preset_file=str(pf), input_voice_file=str(vf),
                         output_file=str(tmp_path / "o.wav")).save(jf)
        assert app.main(["--job", str(jf),
                         "--checkpoint", str(tmp_path / "ck.bin"),
                         "--checkpoint-seconds", "0.25"]) == 0
        data, sr = wavio.read_wav(tmp_path / "o.wav")
        assert sr == SR and len(data) == len(voice)

    def test_cli_checkpoint_requires_job(self, tmp_path):
        from cpp_audio_tpu.apps import resynth as app

        with pytest.raises(SystemExit):
            app.main(["in.wav", "out.wav", "--checkpoint", "ck.bin"])

    def test_cli_carrier_spec_validation(self):
        from cpp_audio_tpu.apps import resynth as app

        with pytest.raises(ValueError):
            app._parse_kv("saw", app._CARRIER_KEYS)       # missing '='
        with pytest.raises(ValueError):
            app._parse_kv("sqare=1", app._CARRIER_KEYS)   # typo key
        with pytest.raises(ValueError):
            app._parse_kv("saw=x", app._CARRIER_KEYS)     # not a number
        assert app._parse_kv("saw=0.5, width=0.01",
                             app._CARRIER_KEYS) == {"saw": 0.5,
                                                    "width": 0.01}
