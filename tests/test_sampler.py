"""Sampler tests."""

import numpy as np
import pytest

from cpp_audio_tpu.core.events import Note
from cpp_audio_tpu.models import sampler
from cpp_audio_tpu.utils.convert import freq_to_angle_increment


class TestSampleMap:
    def test_lower_bound_selection(self):
        m = sampler.SampleMap()
        m.add(0.01, np.ones(10))
        m.add(0.02, 2 * np.ones(10))
        m.add(0.04, 4 * np.ones(10))
        assert m.select(0.005)[0] == 1.0
        assert m.select(0.01)[0] == 1.0
        assert m.select(0.015)[0] == 2.0
        assert m.select(0.05) is None

    def test_trim_sample(self):
        x = np.zeros(100)
        x[40:60] = np.sin(np.linspace(0, 4 * np.pi, 20))
        t = sampler.trim_sample(x)
        assert 15 <= len(t) <= 30
        assert np.max(np.abs(t)) == np.max(np.abs(x))

    def test_trim_silence(self):
        assert len(sampler.trim_sample(np.zeros(50))) == 0


class TestSamplerRender:
    def test_plays_sample_at_press(self):
        m = sampler.SampleMap()
        ramp = np.linspace(0, 1, 1000)
        m.add_for_frequency(440.0, 44100, ramp)
        cfg = sampler.SamplerConfig(dtype="float64")
        notes = [Note(1, 100, 5000, 440.0, 1.0, 0.0)]
        out = sampler.render_notes(notes, m, 2000, cfg)
        assert np.max(np.abs(out[:100])) == 0.0
        # sample content appears scaled by baseVolume/sqrt(2) pan
        expect = 0.1 * ramp[500] / np.sqrt(2)
        assert out[600, 0] == pytest.approx(expect, rel=1e-5)

    def test_release_fades(self):
        m = sampler.SampleMap()
        m.add_for_frequency(440.0, 44100, np.ones(40000))
        cfg = sampler.SamplerConfig(dtype="float64")
        notes = [Note(1, 0, 8000, 440.0, 1.0, 0.0)]
        out = sampler.render_notes(notes, m, 20000, cfg)
        assert np.abs(out[7000, 0]) > 1e-3
        assert np.max(np.abs(out[8000 + 4410 + 50 :])) == 0.0

    def test_note_above_map_is_silent(self):
        m = sampler.SampleMap()
        m.add_for_frequency(440.0, 44100, np.ones(100))
        cfg = sampler.SamplerConfig()
        notes = [Note(1, 0, 1000, 10000.0, 1.0, 0.0)]  # inc > max key
        out = sampler.render_notes(notes, m, 2000, cfg)
        assert np.max(np.abs(out)) == 0.0

    def test_polyphonic(self):
        m = sampler.SampleMap()
        m.add_for_frequency(220.0, 44100, np.ones(5000))
        m.add_for_frequency(880.0, 44100, -np.ones(5000))
        cfg = sampler.SamplerConfig(dtype="float64")
        notes = [Note(1, 0, 30000, 220.0, 1.0, -1.0),
                 Note(2, 0, 30000, 880.0, 1.0, 1.0)]
        out = sampler.render_notes(notes, m, 4000, cfg)
        assert out[1000, 0] > 0  # left = +1 sample
        assert out[1000, 1] < 0  # right = -1 sample
