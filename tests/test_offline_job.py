"""Preset JSON round-trip, limiter, offline job end-to-end."""

import json

import numpy as np
import pytest

from cpp_audio_tpu.analysis import autotune as at
from cpp_audio_tpu.analysis import offline_job, presets_json
from cpp_audio_tpu.ops import limiter
from cpp_audio_tpu.utils import wav as wavio
from cpp_audio_tpu.utils.midi import Note


class TestPresetJson:
    def test_roundtrip(self, tmp_path):
        p = presets_json.ResynthPreset(
            use_autotune=True, autotune_type=at.AutotuneType.CHORD,
            autotune_musical_scale_root_note=Note.Mi, vocoder_count_bands=12,
            analysis_volume=0.7, autotune_bit_chord=0b1010,
        )
        f = tmp_path / "p.json"
        p.save(f)
        q = presets_json.ResynthPreset.load(f)
        assert q.use_autotune is True
        assert q.autotune_type is at.AutotuneType.CHORD
        assert q.autotune_musical_scale_root_note is Note.Mi
        assert q.vocoder_count_bands == 12
        assert q.analysis_volume == pytest.approx(0.7)
        assert q.autotune_bit_chord == 0b1010

    def test_json_schema_matches_reference(self, tmp_path):
        p = presets_json.ResynthPreset()
        f = tmp_path / "p.json"
        p.save(f)
        d = json.loads(f.read_text())
        # the five type buckets of rt.resynth.lib.params.cpp:104-123
        assert set(d.keys()) == {"bool_params", "enum_params", "int32_params",
                                 "uint64_params", "float_params"}
        assert "use_autotune" in d["bool_params"]
        assert "autotune_type" in d["enum_params"]
        assert "autotune_bit_chord" in d["uint64_params"]
        assert "window_size_seconds" in d["float_params"]

    def test_job_config_roundtrip(self, tmp_path):
        c = presets_json.OfflineJobConfig(
            preset_file="a.json", input_voice_file="v.wav",
            input_carrier_file="c.wav", output_file="o.wav", post="limit",
        )
        f = tmp_path / "job.json"
        c.save(f)
        d = presets_json.OfflineJobConfig.load(f)
        assert d == c


class TestLimiter:
    def test_passthrough_below_ceiling(self):
        x = 0.5 * np.sin(np.linspace(0, 50, 4000))
        y = np.asarray(limiter.limit(x[:, None], ceiling=1.0))
        np.testing.assert_allclose(y[:, 0], x, atol=1e-7)

    def test_limits_peaks(self):
        x = 3.0 * np.sin(2 * np.pi * 100 * np.arange(8000) / 44100)
        y = np.asarray(limiter.limit(x[:, None], ceiling=1.0))
        assert np.max(np.abs(y)) <= 1.0 + 1e-6
        assert np.max(np.abs(y)) > 0.9  # still near full scale

    def test_peak_follower_matches_loop(self):
        rng = np.random.default_rng(0)
        x = np.abs(rng.standard_normal(500))
        r = 0.99
        p = np.asarray(limiter.peak_follower(x, r))
        ref = np.empty_like(x)
        prev = 0.0
        for i, v in enumerate(x):
            prev = max(v, r * prev)
            ref[i] = prev
        np.testing.assert_allclose(p, ref, rtol=1e-6)

    def test_clamp_and_guard(self):
        x = np.array([0.5, 2.0, -3.0, np.nan, np.inf])
        y = np.asarray(limiter.clamp_and_guard(x))
        np.testing.assert_array_equal(y, [0.5, 1.0, -1.0, 0.0, 0.0])


class TestOfflineJob:
    def _write_voice(self, tmp_path, f=440.0, seconds=1.0, sr=44100):
        t = np.arange(int(seconds * sr))
        sig = 0.4 * np.sin(2 * np.pi * f * t / sr)
        path = tmp_path / "voice.wav"
        wavio.write_wav(path, sig, sr)
        return path

    def test_resynth_job(self, tmp_path):
        voice = self._write_voice(tmp_path)
        preset = presets_json.ResynthPreset(analysis_volume=1.0)
        pf = tmp_path / "preset.json"
        preset.save(pf)
        out_f = tmp_path / "out.wav"
        cfg = presets_json.OfflineJobConfig(
            preset_file=str(pf), input_voice_file=str(voice),
            input_carrier_file="", output_file=str(out_f), post="none",
        )
        out = offline_job.run_job(cfg)
        assert out_f.exists()
        data, sr = wavio.read_wav(out_f)
        assert sr == 44100 and data.shape[1] == 2
        assert np.max(np.abs(data)) > 0.01

    def test_vocoder_job(self, tmp_path):
        voice = self._write_voice(tmp_path, f=300.0)
        t = np.arange(44100)
        carrier = 0.5 * np.sign(np.sin(2 * np.pi * 200 * t / 44100))  # square
        cf = tmp_path / "carrier.wav"
        wavio.write_wav(cf, carrier, 44100)
        preset = presets_json.ResynthPreset(vocoder_volume=1.0, analysis_volume=0.0)
        pf = tmp_path / "preset.json"
        preset.save(pf)
        out_f = tmp_path / "out.wav"
        cfg = presets_json.OfflineJobConfig(
            preset_file=str(pf), input_voice_file=str(voice),
            input_carrier_file=str(cf), output_file=str(out_f), post="limit",
        )
        out = offline_job.run_job(cfg)
        assert np.max(np.abs(out)) > 1e-4
        assert np.max(np.abs(out)) <= 1.0

    def test_missing_inputs_raise(self, tmp_path):
        cfg = presets_json.OfflineJobConfig(output_file=str(tmp_path / "o.wav"))
        with pytest.raises(ValueError):
            offline_job.run_job(cfg)

    def test_stereo_input_rejected(self, tmp_path):
        path = tmp_path / "st.wav"
        wavio.write_wav(path, np.zeros((100, 2)), 44100)
        cfg = presets_json.OfflineJobConfig(
            input_voice_file=str(path), output_file=str(tmp_path / "o.wav"),
        )
        with pytest.raises(ValueError):
            offline_job.run_job(cfg)
