"""STFT, peak extraction, pitch pipeline, autotune, and offline resynth tests."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import autotune as at
from cpp_audio_tpu.analysis import pitch as pp
from cpp_audio_tpu.analysis import resynth
from cpp_audio_tpu.models import resynth_bank
from cpp_audio_tpu.ops import stft
from cpp_audio_tpu.utils.midi import Midi, Note


class TestStft:
    def test_peak_frequency_and_magnitude(self):
        sr = 44100
        f, amp = 440.0, 0.3
        t = np.arange(sr)
        sig = amp * np.sin(2 * np.pi * f * t / sr)
        w = stft.gaussian_window(8000)
        sq = stft.stft_sqmag(sig, w, 4000)
        fft_len = stft.fft_length_for(8000)
        is_peak, freq, mag = stft.extract_local_max_freqs_mags(sq, sr, fft_len)
        lists = stft.peaks_to_lists(is_peak, freq, mag)
        frame = lists[3]
        assert frame, "no peaks found"
        # strongest peak at 440 Hz with amplitude ~0.3
        best = max(frame, key=lambda fm: fm[1])
        assert best[0] == pytest.approx(440.0, abs=1.0)
        assert stft.db_to_mag(best[1]) == pytest.approx(amp, rel=0.05)

    def test_two_tone_resolution(self):
        sr = 44100
        t = np.arange(sr)
        sig = (0.5 * np.sin(2 * np.pi * 440 * t / sr)
               + 0.25 * np.sin(2 * np.pi * 1000 * t / sr))
        w = stft.gaussian_window(8000)
        sq = stft.stft_sqmag(sig, w, 4000)
        is_peak, freq, mag = stft.extract_local_max_freqs_mags(
            sq, sr, stft.fft_length_for(8000), min_db=-40
        )
        frame = stft.peaks_to_lists(is_peak, freq, mag)[2]
        freqs = sorted(f for f, m in frame if stft.db_to_mag(m) > 0.05)
        assert len(freqs) == 2
        assert freqs[0] == pytest.approx(440, abs=2)
        assert freqs[1] == pytest.approx(1000, abs=2)

    def test_frame_count_and_alignment(self):
        sig = np.zeros(10000)
        w = stft.gaussian_window(4000)
        sq = np.asarray(stft.stft_sqmag(sig, w, 2000))
        assert sq.shape[0] == (10000 - 4000) // 2000 + 1

    def test_radix_top_select_matches_sort_path(self):
        """The f32 radix-select top-k must be BIT-IDENTICAL to the stable
        sort pair it replaces (stable tie-break, -inf padding order)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        R, W, k = 23, 517, 33
        for trial in range(4):
            s2 = np.full((R, W), -np.inf, np.float32)
            f2 = np.sort(rng.uniform(0, 22050, (R, W)).astype(np.float32),
                         axis=-1)
            for r in range(R):
                npk = int(rng.integers(0, W if trial % 2 else 20))
                idx = rng.choice(W, npk, replace=False)
                vals = rng.uniform(-100, 20, npk).astype(np.float32)
                if npk > 4:
                    vals[: npk // 2] = np.round(vals[: npk // 2])  # ties
                s2[r, idx] = vals
            s2j, f2j = jnp.asarray(s2), jnp.asarray(f2)
            s_neg, s_freq = jax.lax.sort((-s2j, f2j), dimension=-1,
                                         num_keys=1)
            top_db, top_freq = -s_neg[:, :k], s_freq[:, :k]
            key = jnp.where(jnp.isfinite(top_db), top_freq, jnp.inf)
            _, ref_f, ref_db = jax.lax.sort((key, top_freq, top_db),
                                            dimension=-1, num_keys=1)
            got_f, got_db = stft._radix_top_select(s2j, f2j, k)
            assert np.array_equal(np.asarray(ref_db), np.asarray(got_db))
            assert np.array_equal(np.asarray(ref_f), np.asarray(got_f))

    def test_gaussian_window_shape(self):
        w = stft.gaussian_window(1000)
        assert len(w) == 1000
        assert w[499] == w[500]  # symmetric
        assert w[0] < 0.001  # 4 sigma at the edge
        assert w.max() <= 1.0


class TestPitchPipeline:
    def test_aggregate_nearby(self):
        pvs = [pp.PitchVolume(60.0, 1.0), pp.PitchVolume(60.2, 0.5),
               pp.PitchVolume(65.0, 0.3)]
        intervals = pp.aggregate_pitches(0.4, pvs)
        assert len(intervals) == 2
        assert intervals[0].sum_volumes == pytest.approx(1.5)

    def test_aggregate_diameter_rule(self):
        # three pitches 0.3 apart: total diameter 0.6 > 0.4 -> splits
        pvs = [pp.PitchVolume(60.0, 1.0), pp.PitchVolume(60.3, 1.0),
               pp.PitchVolume(60.6, 1.0)]
        intervals = pp.aggregate_pitches(0.4, pvs)
        assert len(intervals) == 2

    def test_reduce_methods(self):
        pvs = [pp.PitchVolume(60.0, 1.0), pp.PitchVolume(61.0, 3.0)]
        (iv,) = pp.aggregate_pitches(2.0, pvs)
        assert iv.get_pitch(pp.PitchReductionMethod.INTERVAL_CENTER) == 60.5
        assert iv.get_pitch(pp.PitchReductionMethod.MAX_VOLUME) == 61.0
        assert iv.get_pitch(pp.PitchReductionMethod.PONDERATE_BY_VOLUME) == pytest.approx(
            (60.0 + 61.0 * 3) / 4
        )
        assert iv.get_volume(pp.VolumeReductionMethod.SUM_VOLUMES) == 4.0
        assert iv.get_volume(pp.VolumeReductionMethod.MAX_VOLUME) == 3.0

    def test_min_volume_filter(self):
        pvs = [pp.PitchVolume(60.0, 1e-6)]
        out = pp.reduce_pitches(pp.PitchReductionMethod.MAX_VOLUME,
                                pp.VolumeReductionMethod.MAX_VOLUME, 1e-4,
                                pp.aggregate_pitches(0.4, pvs))
        assert out == []

    def test_harmonize(self):
        pitches = [pp.PitchVolume(60.0, 1.0)]
        out = pp.harmonize_pitches(7.0, pitches)
        assert len(out) == 2
        assert out[1].midipitch == 67.0

    def test_track_matches_within_range(self):
        played = [pp.PlayedNote(0, 1, 60.0, 261.6, 0.5)]
        new = [pp.PitchVolume(60.5, 0.4)]
        changes, cont = pp.track_pitches(1.0, new, played)
        assert changes[0] == 0 and cont[0]

    def test_track_no_match_far(self):
        played = [pp.PlayedNote(0, 1, 60.0, 261.6, 0.5)]
        new = [pp.PitchVolume(63.0, 0.4)]
        changes, cont = pp.track_pitches(1.0, new, played)
        assert changes[0] is None and not cont[0]

    def test_track_monotonic_unique(self):
        played = [pp.PlayedNote(0, 1, 60.0, 0, 0), pp.PlayedNote(0, 2, 60.5, 0, 0)]
        new = [pp.PitchVolume(60.1, 1.0), pp.PitchVolume(60.6, 1.0)]
        changes, cont = pp.track_pitches(1.0, new, played)
        assert changes == [0, 1] and cont == [True, True]


class TestAutotune:
    def test_disabled_identity(self):
        f = at.mk_autotune_function(use_autotune=False)
        assert f(61.3) == 61.3

    def test_major_scale_snap(self):
        f = at.mk_autotune_function(
            use_autotune=True, autotune_type=at.AutotuneType.MUSICAL_SCALE,
            musical_scale_mode=at.MusicalScaleMode.MAJOR,
            musical_scale_root_note=Note.Do,
        )
        # root = A(69) + dist(La->Do) = 69 - 9 = 60 (C major)
        assert f(60.0) == pytest.approx(60.0)  # C stays
        assert f(61.0) in (pytest.approx(60.0), pytest.approx(62.0))  # C# snaps
        assert f(64.4) == pytest.approx(64.0)  # near E snaps to E
        # octave folding
        assert f(72.4) == pytest.approx(72.0)
        assert f(48.6) == pytest.approx(48.0 + 1.0) or f(48.6) == pytest.approx(48.0)

    def test_minor_scales_differ(self):
        fmaj = at.mk_autotune_function(
            use_autotune=True, musical_scale_mode=at.MusicalScaleMode.MAJOR)
        fmin = at.mk_autotune_function(
            use_autotune=True, musical_scale_mode=at.MusicalScaleMode.MINOR_NATURAL)
        # E (64) is in C major but not C natural minor (Eb=63)
        assert fmaj(63.9) == pytest.approx(64.0)
        assert fmin(63.4) == pytest.approx(63.0)

    def test_fixed_intervals(self):
        f = at.mk_autotune_function(
            use_autotune=True, autotune_type=at.AutotuneType.FIXED_SIZE_INTERVALS,
            intervals_size=2,
        )
        out = f(61.3)
        assert out is not None
        assert out % 2 == pytest.approx(0.0)

    def test_chord_single(self):
        f = at.mk_autotune_function(
            use_autotune=True, autotune_type=at.AutotuneType.CHORD,
            chord_frequencies=at.AutotuneChordFrequencies.SINGLE_FREQ,
            bit_chord=0b1,  # only root: C4+12... = pitch 72
        )
        assert f(100.0) == pytest.approx(72.0)

    def test_scale_snapping_matches_reference_test(self):
        # port of testAutotune (source/rt.resynth.lib.test.cpp): every pitch
        # snaps to a scale member, and scale members are fixed points
        f = at.mk_autotune_function(use_autotune=True)
        scale_members = {0, 2, 4, 5, 7, 9, 11}
        for p in np.arange(30.0, 100.0, 0.25):
            out = f(p)
            rel = round((out - 60.0) % 12.0, 6) % 12
            assert rel in {float(m) for m in scale_members}, (p, out)
            assert abs(out - p) <= 1.0 + 1e-9


class TestTrackedRender:
    def test_constant_note(self):
        cfg = resynth_bank.TrackedRenderConfig(sample_rate=44100, stride=4000,
                                               dtype="float64")
        note = resynth_bank.TrackedNote(frames=[(0, 440.0, 0.5)], release_frame=5)
        out = resynth_bank.render_tracked([note], 6, cfg)
        assert np.all(np.isfinite(out))
        seg = out[8000:16000, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        fpk = np.argmax(spec) * 44100 / len(seg)
        assert fpk == pytest.approx(440.0, abs=8.0)

    def test_freq_glide_is_continuous(self):
        cfg = resynth_bank.TrackedRenderConfig(sample_rate=44100, stride=4000,
                                               dtype="float64")
        note = resynth_bank.TrackedNote(
            frames=[(0, 440.0, 0.5), (2, 880.0, 0.5)], release_frame=6
        )
        out = resynth_bank.render_tracked([note], 7, cfg)
        x = out[:, 0] + out[:, 1]
        # no sample-to-sample discontinuity beyond what a 880 Hz sine can do
        max_step = 2 * np.pi * 900 / 44100 * 1.0  # slope bound * amplitude 1
        assert np.max(np.abs(np.diff(x[1000:30000]))) < max_step

    def test_glide_reaches_target(self):
        cfg = resynth_bank.TrackedRenderConfig(sample_rate=44100, stride=4000,
                                               dtype="float64")
        note = resynth_bank.TrackedNote(
            frames=[(0, 440.0, 0.5), (1, 660.0, 0.5)], release_frame=8
        )
        out = resynth_bank.render_tracked([note], 9, cfg)
        seg = out[20000:32000, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        fpk = np.argmax(spec) * 44100 / len(seg)
        assert fpk == pytest.approx(660.0, abs=8.0)

    def test_volume_change_smoothed(self):
        cfg = resynth_bank.TrackedRenderConfig(sample_rate=44100, stride=4000,
                                               dtype="float64")
        note = resynth_bank.TrackedNote(
            frames=[(0, 440.0, 0.8), (2, 440.0, 0.1)], release_frame=8
        )
        out = resynth_bank.render_tracked([note], 9, cfg)
        x = np.abs(out[:, 0]) + np.abs(out[:, 1])
        env = np.array([x[i : i + 400].max() for i in range(0, 36000, 400)])
        # monotonic-ish decay between the loud and quiet plateaus
        assert env[15] < env[18] * 10  # reached low region
        assert env[-5] == pytest.approx(env[-6], rel=0.2)  # settled


class TestOfflineResynth:
    def test_sine_is_resynthesized(self):
        sr = 44100
        t = np.arange(int(1.5 * sr))
        sig = 0.4 * np.sin(2 * np.pi * 440 * t / sr)
        cfg = resynth.ResynthConfig(sample_rate=sr, dtype="float64")
        out = resynth.resynthesize(sig, cfg)
        assert np.all(np.isfinite(out))
        # analyze the output: should contain 440 Hz
        seg = out[sr // 2 : sr, 0] + out[sr // 2 : sr, 1]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        fpk = np.argmax(spec) * sr / len(seg)
        assert fpk == pytest.approx(440.0, abs=4.0)
        # amplitude in the right ballpark (volume tracking /
        # reduceUnadjustedVolumes compensation)
        assert 0.05 < np.max(np.abs(out)) < 1.5

    def test_silence_produces_silence(self):
        cfg = resynth.ResynthConfig(dtype="float64")
        out = resynth.resynthesize(np.zeros(44100), cfg)
        assert np.max(np.abs(out)) < 1e-6

    def test_chord_resynthesis_tracks_both(self):
        sr = 44100
        t = np.arange(sr)
        sig = 0.3 * np.sin(2 * np.pi * 440 * t / sr) + 0.3 * np.sin(2 * np.pi * 660 * t / sr)
        cfg = resynth.ResynthConfig(sample_rate=sr, dtype="float64")
        peaks = resynth.analyze(sig, cfg)
        notes, stats, dropped = resynth.track(peaks, cfg)
        assert dropped == 0
        freqs = sorted(n.frames[0][1] for n in notes)
        assert any(abs(f - 440) < 5 for f in freqs)
        assert any(abs(f - 660) < 5 for f in freqs)

    def test_autotuned_resynthesis(self):
        sr = 44100
        t = np.arange(sr)
        sig = 0.4 * np.sin(2 * np.pi * 450 * t / sr)  # ~A4 + 39 cents
        cfg = resynth.ResynthConfig(sample_rate=sr, use_autotune=True, dtype="float64")
        peaks = resynth.analyze(sig, cfg)
        notes, _, _ = resynth.track(peaks, cfg)
        m = Midi()
        for n in notes:
            p = float(m.frequency_to_midi_pitch(n.frames[0][1]))
            assert abs(p - round(p)) < 0.02  # snapped to scale

    def test_wav_roundtrip(self, tmp_path):
        sr = 44100
        t = np.arange(sr)
        sig = 0.4 * np.sin(2 * np.pi * 523.25 * t / sr)
        src = tmp_path / "in.wav"
        dst = tmp_path / "out.wav"
        from cpp_audio_tpu.utils import wav as wavio

        wavio.write_wav(src, sig, sr)
        out = resynth.resynth_wav(src, dst)
        assert dst.exists()
        back, _ = wavio.read_wav(dst)
        assert back.shape[1] == 2


class TestFeedbackResynthesis:
    """Delayed-output feedback into the analysis stream
    (rt.resynth.lib.cpp:1629-1651 feedback drones)."""

    def _tone(self, sr, secs=1.2, f=392.0, amp=0.3):
        t = np.arange(int(sr * secs))
        sig = np.zeros(len(t))
        m = t < sr // 2  # tone only in the first half
        sig[m] = amp * np.sin(2 * np.pi * f * t[m] / sr)
        return sig

    def test_zero_gain_matches_plain(self):
        sr = 44100
        cfg = resynth.ResynthConfig(sample_rate=sr, seed=3)
        sig = self._tone(sr)
        a = resynth.resynthesize(sig, cfg)
        b = resynth.resynthesize_feedback(sig, cfg, feedback_gain=0.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_feedback_sustains_past_input(self):
        sr = 44100
        cfg = resynth.ResynthConfig(sample_rate=sr, seed=3)
        sig = self._tone(sr)
        plain = np.asarray(resynth.resynthesize(sig, cfg)).sum(axis=1)
        fb = np.asarray(resynth.resynthesize_feedback(
            sig, cfg, feedback_gain=1.0, delay_seconds=0.25)).sum(axis=1)
        # the tone dies in the plain render's tail; feedback keeps it ringing
        tail = slice(int(0.9 * sr), int(1.1 * sr))
        e_plain = float(np.sqrt(np.mean(plain[tail] ** 2)))
        e_fb = float(np.sqrt(np.mean(fb[tail] ** 2)))
        assert e_fb > 2.0 * max(e_plain, 1e-9)


class TestFusedNativeTables:
    """The fused C++ tracking+table path (pitchpipe_run_offline) must be
    bit-equivalent to track_python + _build_slot_tables."""

    def _signal(self, sr):
        n = sr * 2
        t = np.arange(n) / sr
        sig = np.zeros(n)
        for f0, s0, s1 in [(220, 0.1, 1.0), (440, 0.4, 1.6), (660, 0.8, 1.9)]:
            i0, i1 = int(s0 * sr), int(s1 * sr)
            env = np.hanning(i1 - i0)
            sig[i0:i1] += 0.2 * env * np.sin(2 * np.pi * f0 * t[: i1 - i0])
        return sig

    def test_table_parity_with_python(self):
        from cpp_audio_tpu import native as nat

        if not nat.available():
            pytest.skip("native library unavailable")
        sr = 44100
        cfg = resynth.ResynthConfig(sample_rate=sr, seed=5)
        rcfg = resynth._render_config(cfg)
        sig = self._signal(sr)
        freq, mag = resynth.analyze_arrays(sig, cfg)
        freq, mag = np.asarray(freq), np.asarray(mag)
        n_frames = freq.shape[0]
        peaks = resynth.analyze(sig, cfg)
        notes, _, _ = resynth.track_python(peaks, cfg)
        table_py = resynth_bank._build_slot_tables(
            notes, n_frames + 8, rcfg).astype(np.float32)
        table_c = resynth.build_tables_native(freq, mag, cfg, n_frames + 8, rcfg)
        np.testing.assert_allclose(table_c, table_py, atol=1e-12)

    def test_resynthesize_native_matches_python(self):
        from cpp_audio_tpu import native as nat

        if not nat.available():
            pytest.skip("native library unavailable")
        sr = 44100
        cfg = resynth.ResynthConfig(sample_rate=sr, seed=5)
        sig = self._signal(sr)
        a = np.asarray(resynth.resynthesize(sig, cfg, implementation="native"))
        b = np.asarray(resynth.resynthesize(sig, cfg, implementation="python"))
        np.testing.assert_allclose(a, b, atol=1e-6)
        # the default (device single-dispatch) path agrees to f32 recurrence
        # tolerance
        c = np.asarray(resynth.resynthesize(sig, cfg))
        peak = max(np.abs(a).max(), 1e-9)
        assert np.abs(c - a).max() < 2e-3 * peak
