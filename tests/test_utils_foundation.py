"""Unit tests for the foundation layer: conversions, interp, midi, loudness, scales, wav."""

import numpy as np
import pytest

from cpp_audio_tpu.utils import convert, interp, loudness, midi, scales, wav


class TestConvert:
    def test_freq_angle_roundtrip(self):
        sr = 44100
        for f in [27.5, 440.0, 10000.0]:
            inc = convert.freq_to_angle_increment(f, sr)
            assert convert.angle_increment_to_freq(inc, sr) == pytest.approx(f)

    def test_angle_increment_unit(self):
        # rad/pi: Nyquist freq -> increment 1 (half a period per sample)
        sr = 44100
        assert convert.freq_to_angle_increment(sr / 2, sr) == pytest.approx(1.0)

    def test_ms_to_frames(self):
        assert convert.ms_to_frames(1000.0, 44100) == 44100
        assert convert.ms_to_frames(0.0, 44100) == 0
        # rounds to nearest (reference sound.functions.h:27-33)
        assert convert.ms_to_frames(1.0, 44100) == 44  # 44.1 -> 44

    def test_nyquist(self):
        assert convert.get_nyquist_frequency(96000) == 48000


class TestInterp:
    def test_linear(self):
        out = interp.interpolate(interp.Itp.LINEAR, 5.0, 2.0, 10.0, 10.0)
        assert float(out) == pytest.approx(7.0)

    def test_endpoints_all_curves(self):
        for kind in interp.Itp:
            lo = float(interp.interpolate(kind, 0.0, 1.0, 4.0, 100.0))
            hi = float(interp.interpolate(kind, 100.0, 1.0, 4.0, 100.0))
            assert lo == pytest.approx(1.0, abs=1e-5), kind
            assert hi == pytest.approx(5.0, abs=1e-5), kind

    def test_monotone_ease_curves(self):
        x = np.linspace(0, 1, 101)
        for kind in interp.Itp:
            if kind == interp.Itp.PROPORTIONAL_VALUE_DERIVATIVE:
                continue
            y = np.asarray(interp.ease(kind, x))
            assert np.all(np.diff(y) >= -1e-6), kind

    def test_proportional_value_derivative_is_exponential(self):
        # from 100 to 400 over duration 2: midpoint should be 200 (geometric)
        out = float(
            interp.interpolate(interp.Itp.PROPORTIONAL_VALUE_DERIVATIVE, 1.0, 100.0, 300.0, 2.0)
        )
        assert out == pytest.approx(200.0, rel=1e-6)

    def test_ease_select_matches_scalar(self):
        x = np.linspace(0, 1, 33)
        for kind in [interp.Itp.LINEAR, interp.Itp.EASE_IN_EXPO, interp.Itp.EASE_INOUT_CIRC]:
            sel = np.asarray(interp.ease_select(np.full(x.shape, int(kind)), x))
            direct = np.asarray(interp.ease(kind, x))
            np.testing.assert_allclose(sel, direct, rtol=1e-6)


class TestMidi:
    def test_a440(self):
        m = midi.Midi()
        assert m.midi_pitch_to_freq(69.0) == pytest.approx(440.0)
        assert m.frequency_to_midi_pitch(440.0) == pytest.approx(69.0)

    def test_octave(self):
        m = midi.Midi()
        assert m.midi_pitch_to_freq(81.0) == pytest.approx(880.0)
        assert m.frequency_to_midi_pitch(220.0) == pytest.approx(57.0)

    def test_note_octave_add_dist(self):
        # mirrors reference testAutotune note-math checks (rt.resynth.lib.test.cpp)
        a4 = midi.NoteOctave(midi.Note.La, 4)
        assert a4.add_halftones(3) == midi.NoteOctave(midi.Note.Do, 5)
        assert a4.add_halftones(-9) == midi.NoteOctave(midi.Note.Do, 4)
        assert a4.add_halftones(12) == midi.NoteOctave(midi.Note.La, 5)
        assert a4.dist_halftones(midi.NoteOctave(midi.Note.Do, 5)) == 3
        assert a4.dist_halftones(midi.NoteOctave(midi.Note.La, 3)) == -12

    def test_pitch_to_note_deviation(self):
        no, dev = midi.midi_pitch_to_note_deviation(69.2)
        assert no == midi.NoteOctave(midi.Note.La, 4)
        assert dev == pytest.approx(0.2)

    def test_tuning_stretch(self):
        m = midi.Midi(tuning_stretch=1.01)
        assert m.midi_pitch_to_freq(69.0) == pytest.approx(440.0)
        assert m.midi_pitch_to_freq(81.0) == pytest.approx(440.0 * 2 ** (12 * 1.01 / 12))

    def test_harmonic_pitch_adds(self):
        adds = midi.compute_harmonic_pitch_adds(4)
        # harmonics 1,2,3,4 -> 0, 12, 19, 24 halftones (rounded)
        np.testing.assert_array_equal(adds, [0.0, 12.0, 19.0, 24.0])


class TestLoudness:
    def test_contour_is_minimal_near_reference(self):
        # the 20-phon contour SPL should dip in the 2-5 kHz ear-canal resonance
        spls = loudness.ELVS[0]
        imin = int(np.argmin(spls))
        assert 2000.0 <= loudness.FREQS[imin] <= 5000.0

    def test_known_value_1khz(self):
        # at 1 kHz (index 17, Lu=0, Tf=2.4, alpha=0.25), ISO 226 40-phon SPL
        spl = loudness.compute_equal_loudness_volume(17, 40.0)
        assert spl == pytest.approx(40.0, abs=1.5)  # 1 kHz is the phon anchor

    def test_volume_at_low_index_ref_is_one(self):
        v = float(loudness.equal_loudness_volume_from_freq(20.0, low_index=0))
        assert v == pytest.approx(1.0)

    def test_midrange_attenuated_vs_extremes(self):
        # the ear is most sensitive around 3 kHz, so the equal-loudness
        # multiplier there must be smaller than at 30 Hz
        v_mid = float(loudness.equal_loudness_volume_from_freq(3000.0))
        v_low = float(loudness.equal_loudness_volume_from_freq(30.0))
        assert v_mid < v_low

    def test_vectorized(self):
        freqs = np.array([100.0, 1000.0, 10000.0])
        v = np.asarray(loudness.equal_loudness_volume_from_freq(freqs))
        assert v.shape == (3,)
        assert np.all(v > 0) and np.all(v <= 1.0)

    def test_pitch_vs_freq_paths_agree(self):
        # exact agreement at table points; between points the two paths
        # interpolate on different grids (freq-linear vs pitch-linear), so
        # only loose agreement is expected (same as the reference)
        for f, rel in [(800.0, 1e-9), (700.0, 0.05)]:
            p = midi.frequency_to_midi_pitch(f)
            vf = float(loudness.equal_loudness_volume_from_freq(f))
            vp = float(loudness.equal_loudness_volume_from_pitch(p))
            assert vf == pytest.approx(vp, rel=rel)


class TestScales:
    def test_just_scale_offsets(self):
        offs = scales.just_major_scale_asc()
        assert offs[0] == 0.0
        # perfect fifth 3/2 = 7.02 cents-ish halftones
        assert offs[4] == pytest.approx(7.0195, abs=1e-3)

    def test_pythagorean(self):
        offs = scales.pythagorean_major_scale_asc()
        assert offs[1] == pytest.approx(2.0391, abs=1e-3)  # 9/8 whole tone

    def test_well_tempered(self):
        np.testing.assert_array_equal(
            scales.WELL_TEMPERED_MAJOR_ASC, [0, 2, 4, 5, 7, 9, 11]
        )


class TestWav:
    REF_FIXTURES = "/root/reference/testdata/audio"

    @pytest.mark.parametrize(
        "name,channels",
        [
            ("saw_pcm_16_signed_stereo.wav", 2),
            ("saw_pcm_24_signed_mono.wav", 1),
            ("saw_pcm_24_signed_stereo.wav", 2),
            ("saw_pcm_32_float_stereo.wav", 2),
            ("saw_pcm_32_signed_mono.wav", 1),
            ("saw_pcm_32_signed_stereo.wav", 2),
        ],
    )
    def test_read_reference_fixtures(self, name, channels):
        data, sr = wav.read_wav(f"{self.REF_FIXTURES}/{name}")
        assert sr == 44100
        assert data.shape[1] == channels
        assert data.shape[0] > 1000
        assert np.max(np.abs(data)) <= 1.0
        # fixtures are saw ramps: first samples increase (16-bit file carries
        # ~3 LSB of dither noise, so allow small negative diffs)
        assert np.all(np.diff(data[:100, 0]) >= -4.0 / 32768.0)

    def test_fixtures_encode_same_signal(self):
        d16, _ = wav.read_wav(f"{self.REF_FIXTURES}/saw_pcm_16_signed_stereo.wav")
        d32, _ = wav.read_wav(f"{self.REF_FIXTURES}/saw_pcm_32_signed_stereo.wav")
        df, _ = wav.read_wav(f"{self.REF_FIXTURES}/saw_pcm_32_float_stereo.wav")
        n = min(len(d16), len(d32))
        # 16-bit fixture carries extra quantization/dither noise (~9 LSB)
        np.testing.assert_allclose(d16[:n], d32[:n], atol=3e-4)
        np.testing.assert_allclose(df[:n], d32[:n], atol=1e-9)

    def test_not_audio_rejected(self):
        with pytest.raises(ValueError):
            wav.read_wav(f"{self.REF_FIXTURES}/not_audio.txt")

    @pytest.mark.parametrize(
        "bits,fmt",
        [
            (16, wav.WAVE_FORMAT_PCM),
            (24, wav.WAVE_FORMAT_PCM),
            (32, wav.WAVE_FORMAT_PCM),
            (32, wav.WAVE_FORMAT_IEEE_FLOAT),
            (64, wav.WAVE_FORMAT_IEEE_FLOAT),
        ],
    )
    def test_roundtrip(self, tmp_path, bits, fmt):
        rng = np.random.default_rng(0)
        data = rng.uniform(-0.9, 0.9, size=(1000, 2))
        p = tmp_path / "t.wav"
        wav.write_wav(p, data, 48000, bits=bits, fmt=fmt)
        back, sr = wav.read_wav(p)
        assert sr == 48000
        tol = {16: 1 / 32768, 24: 1 / (1 << 23), 32: 1e-7, 64: 0}[bits]
        if fmt == wav.WAVE_FORMAT_IEEE_FLOAT:
            tol = 1e-7 if bits == 32 else 1e-15
        np.testing.assert_allclose(back, data, atol=tol + 1e-12)

    def test_streaming_writer_matches_oneshot(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.uniform(-1, 1, size=(777, 2)).astype(np.float32).astype(np.float64)
        p1, p2 = tmp_path / "a.wav", tmp_path / "b.wav"
        wav.write_wav(p1, data, 44100)
        with wav.StreamingWavWriter(p2, 44100, 2) as w:
            for i in range(0, len(data), 128):
                w.append(data[i : i + 128])
        assert p1.read_bytes() == p2.read_bytes()

    def test_mono_1d_input(self, tmp_path):
        data = np.sin(np.linspace(0, 10, 500))
        p = tmp_path / "m.wav"
        wav.write_wav(p, data, 44100, bits=64)
        back, _ = wav.read_wav(p)
        assert back.shape == (500, 1)
        np.testing.assert_allclose(back[:, 0], data)

    def test_filter_frames(self, tmp_path):
        data = np.zeros((100, 1))
        data[40:60] = 0.5
        src, dst = tmp_path / "s.wav", tmp_path / "d.wav"
        wav.write_wav(src, data, 44100, bits=64)
        wav.filter_frames(src, dst, lambda fr: np.any(fr != 0))
        out, _ = wav.read_wav(dst)
        assert out.shape[0] == 20
