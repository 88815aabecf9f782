"""Device-resident tracker (analysis/device_tracker.py) vs the host pipeline.

Same peaks, same RNG draw pools -> the rendered audio must match the host
tracker + table builder to f32 recurrence tolerance.
"""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import device_tracker, resynth
from cpp_audio_tpu.models import resynth_bank
from cpp_audio_tpu.utils import loudness


def _signal(sr, kind="tones"):
    n = sr * 2
    t = np.arange(n) / sr
    sig = np.zeros(n)
    if kind == "tones":
        events = [(220, 0.1, 1.0), (440, 0.4, 1.6), (660, 0.8, 1.9),
                  (330, 0.2, 0.9), (550, 1.2, 1.9)]
    else:  # gliding chirp + tone
        i0, i1 = int(0.1 * sr), int(1.8 * sr)
        f = np.linspace(200, 800, i1 - i0)
        ph = 2 * np.pi * np.cumsum(f) / sr
        sig[i0:i1] += 0.3 * np.hanning(i1 - i0) * np.sin(ph)
        events = [(1200, 0.5, 1.5)]
    for f0, s0, s1 in events:
        i0, i1 = int(s0 * sr), int(s1 * sr)
        env = np.hanning(i1 - i0)
        sig[i0:i1] += 0.2 * env * np.sin(2 * np.pi * f0 * t[: i1 - i0])
    return sig


def _device_table(freq, mag, cfg, rcfg, total_frames):
    li = loudness.phons_to_index(60.0)
    cap = freq.shape[0] * cfg.max_voices + 16
    pan = np.random.default_rng(cfg.seed).uniform(-1.0, 1.0, cap)
    phase = np.random.default_rng(0).uniform(0.0, 2.0, cap)
    a = rcfg.ahdsr
    table, dropped = device_tracker.build_tables_device(
        np.asarray(freq), np.asarray(mag),
        np.asarray(loudness.PITCHES, np.float64),
        np.asarray(loudness.ELVS[li], np.float64),
        pan, phase,
        total_frames=total_frames, stride=rcfg.stride,
        sample_rate=rcfg.sample_rate, max_voices=cfg.max_voices,
        n_slots=rcfg.n_slots,
        nearby_distance=cfg.nearby_distance_tones, min_volume=cfg.min_volume,
        max_track_pitches=cfg.max_track_pitches,
        pitch_method=2, volume_method=1,
        analysis_volume=cfg.analysis_volume,
        shift_pre=cfg.pitch_shift_pre_autotune,
        shift_post=cfg.pitch_shift_post_autotune,
        stereo_spread=cfg.stereo_spread,
        attack=float(np.max(np.asarray(a.attack))),
        hold=float(np.max(np.asarray(a.hold))),
        decay=float(np.max(np.asarray(a.decay))),
        sustain=float(np.asarray(a.sustain)),
        release=float(np.max(np.asarray(a.release))),
    )
    return np.asarray(table), int(dropped)


@pytest.mark.parametrize("kind", ["tones", "chirp"])
def test_device_tracker_matches_host_render(kind):
    sr = 44100
    cfg = resynth.ResynthConfig(sample_rate=sr, seed=5)
    rcfg = resynth._render_config(cfg)
    sig = _signal(sr, kind)
    freq, mag = resynth.analyze_arrays(sig, cfg)
    freq, mag = np.asarray(freq), np.asarray(mag)
    n_frames = freq.shape[0]
    total = n_frames + 8

    peaks = resynth.analyze(sig, cfg)
    notes, _, _ = resynth.track_python(peaks, cfg)
    table_host = resynth_bank._build_slot_tables(notes, total, rcfg)
    audio_host = np.asarray(resynth_bank.render_table(table_host, rcfg))

    table_dev, _dropped = _device_table(freq, mag, cfg, rcfg, total)
    audio_dev = np.asarray(resynth_bank.render_table(table_dev, rcfg))

    assert audio_dev.shape == audio_host.shape
    peak = max(float(np.max(np.abs(audio_host))), 1e-9)
    assert peak > 1e-3  # the test actually rendered something
    err = float(np.max(np.abs(audio_dev - audio_host))) / peak
    assert err < 2e-3, f"relative error {err}"


def test_device_tracker_with_shift():
    sr = 44100
    cfg = resynth.ResynthConfig(sample_rate=sr, seed=5,
                                pitch_shift_pre_autotune=3.0,
                                pitch_shift_post_autotune=-1.0)
    rcfg = resynth._render_config(cfg)
    sig = _signal(sr)
    freq, mag = resynth.analyze_arrays(sig, cfg)
    freq, mag = np.asarray(freq), np.asarray(mag)
    total = freq.shape[0] + 8

    peaks = resynth.analyze(sig, cfg)
    notes, _, _ = resynth.track_python(peaks, cfg)
    audio_host = np.asarray(resynth_bank.render_table(
        resynth_bank._build_slot_tables(notes, total, rcfg), rcfg))
    table_dev, _ = _device_table(freq, mag, cfg, rcfg, total)
    audio_dev = np.asarray(resynth_bank.render_table(table_dev, rcfg))
    peak = max(float(np.max(np.abs(audio_host))), 1e-9)
    assert peak > 1e-3
    assert float(np.max(np.abs(audio_dev - audio_host))) / peak < 2e-3


class TestParallelTracker:
    """The frame-parallel tracker must render identically to the scan path."""

    def _peaks(self, seed=0, F=40, k=16, n_tones=6):
        rng = np.random.default_rng(seed)
        freq = np.full((F, k), np.nan)
        mag = np.full((F, k), -np.inf)
        for _ in range(n_tones):
            f0 = rng.uniform(100, 2000)
            s = rng.integers(0, F - 4)
            e = s + rng.integers(2, F - s)
            drift = rng.uniform(-0.3, 0.3)
            for fr in range(s, e):
                j = int(rng.integers(0, k))
                freq[fr, j] = f0 * (1 + 0.001 * drift * (fr - s))
                mag[fr, j] = rng.uniform(-40, -10)
        # sort each frame by frequency (contract of top_peaks)
        order = np.argsort(np.where(np.isfinite(freq), freq, np.inf), axis=1)
        return (np.take_along_axis(freq, order, 1),
                np.take_along_axis(mag, order, 1))

    def _tables(self, freq, mag, min_volume, max_voices=12):
        import jax

        from cpp_audio_tpu.utils import loudness as ld

        F = freq.shape[0]
        total = F + 6
        li = ld.phons_to_index(60.0)
        cap = F * max_voices + 16
        pan = np.random.default_rng(1).uniform(-1, 1, cap)
        phase = np.random.default_rng(2).uniform(0, 2, cap)
        kw = dict(total_frames=total, stride=512, sample_rate=44100.0,
                  max_voices=max_voices, n_slots=32, nearby_distance=0.5,
                  min_volume=min_volume, max_track_pitches=1.0,
                  pitch_method=2, volume_method=1, analysis_volume=1.0,
                  shift_pre=0.0, shift_post=0.0, stereo_spread=0.8,
                  attack=441.0, hold=0.0, decay=800.0, sustain=0.7,
                  release=2000.0)
        args = (np.asarray(freq), np.asarray(mag),
                np.asarray(ld.PITCHES, np.float64),
                np.asarray(ld.ELVS[li], np.float64), pan, phase)
        t_par, d_par = device_tracker.build_tables_device(*args, **kw)
        # min_volume=0 statically disables the parallel path -> pure scan
        kw_scan = dict(kw, min_volume=0.0)
        t_scan, d_scan = device_tracker.build_tables_device(*args, **kw_scan)
        return np.asarray(t_par), np.asarray(t_scan), int(d_par), int(d_scan)

    def _render(self, table):
        from cpp_audio_tpu.models import resynth_bank
        import jax.numpy as jnp

        out = resynth_bank._render_slots(jnp.asarray(table, jnp.float32),
                                         stride=512, n_channels=2,
                                         dtype="float32")
        return np.asarray(out).reshape(-1, 2)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 5, 7, 11, 13])
    def test_parallel_matches_scan_render(self, seed):
        freq, mag = self._peaks(seed=seed)
        # min_volume tiny but >0: identical keep-set, parallel path eligible
        t_par, t_scan, d_par, d_scan = self._tables(freq, mag, 1e-6)
        assert d_par == d_scan == 0
        a = self._render(t_par)
        b = self._render(t_scan)
        peak = max(np.max(np.abs(b)), 1e-9)
        assert np.max(np.abs(a - b)) < 1e-4 * peak + 1e-7

    def test_cap_violation_falls_back_to_scan(self):
        freq, mag = self._peaks(seed=5, F=20, k=16, n_tones=4)
        # every frame saturated with peaks > max_voices -> violation -> the
        # cond must take the scan path and give identical tables
        freq = np.tile(np.linspace(100, 3000, 16), (20, 1))
        mag = np.full((20, 16), -20.0)
        import jax

        from cpp_audio_tpu.utils import loudness as ld

        li = ld.phons_to_index(60.0)
        cap = 20 * 4 + 16
        pan = np.random.default_rng(1).uniform(-1, 1, cap)
        phase = np.random.default_rng(2).uniform(0, 2, cap)
        kw = dict(total_frames=26, stride=512, sample_rate=44100.0,
                  max_voices=4, n_slots=8, nearby_distance=0.5,
                  min_volume=1e-6, max_track_pitches=1.0,
                  pitch_method=2, volume_method=1, analysis_volume=1.0,
                  shift_pre=0.0, shift_post=0.0, stereo_spread=0.8,
                  attack=441.0, hold=0.0, decay=800.0, sustain=0.7,
                  release=2000.0)
        args = (freq, mag, np.asarray(ld.PITCHES, np.float64),
                np.asarray(ld.ELVS[li], np.float64), pan, phase)
        t_a, d_a = device_tracker.build_tables_device(*args, **kw)
        t_b, d_b = device_tracker.build_tables_device(
            *args, **dict(kw, min_volume=0.0))
        assert int(d_a) == int(d_b) > 0  # drops happened -> scan path used
        np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b))


def test_batched_tracker_matches_single():
    """build_tables_device_batch == per-job build_tables_device."""
    from cpp_audio_tpu.utils import loudness as ld

    rng = np.random.default_rng(11)
    B, F, k = 3, 30, 16
    freqs, mags = [], []
    for b in range(B):
        freq = np.full((F, k), np.nan)
        mag = np.full((F, k), -np.inf)
        for _ in range(5):
            f0 = rng.uniform(100, 2000)
            s = int(rng.integers(0, F - 4)); e = s + int(rng.integers(2, F - s))
            for fr in range(s, e):
                j = int(rng.integers(0, k))
                freq[fr, j] = f0
                mag[fr, j] = rng.uniform(-40, -10)
        order = np.argsort(np.where(np.isfinite(freq), freq, np.inf), axis=1)
        freqs.append(np.take_along_axis(freq, order, 1))
        mags.append(np.take_along_axis(mag, order, 1))
    li = ld.phons_to_index(60.0)
    cap = F * 12 + 16
    pan = np.random.default_rng(1).uniform(-1, 1, cap)
    phase = np.random.default_rng(2).uniform(0, 2, cap)
    kw = dict(total_frames=F + 6, stride=512, sample_rate=44100.0,
              max_voices=12, n_slots=32, nearby_distance=0.5,
              min_volume=1e-6, max_track_pitches=1.0, pitch_method=2,
              volume_method=1, analysis_volume=1.0, shift_pre=0.0,
              shift_post=0.0, stereo_spread=0.8, attack=441.0, hold=0.0,
              decay=800.0, sustain=0.7, release=2000.0)
    lp = np.asarray(ld.PITCHES, np.float64)
    ls = np.asarray(ld.ELVS[li], np.float64)
    tb, db = device_tracker.build_tables_device_batch(
        np.stack(freqs), np.stack(mags), lp, ls, pan, phase, **kw)
    for b in range(B):
        ts, ds = device_tracker.build_tables_device(
            freqs[b], mags[b], lp, ls, pan, phase, **kw)
        np.testing.assert_allclose(np.asarray(tb)[b], np.asarray(ts),
                                   atol=1e-6)
        assert int(db[b]) == int(ds)


def test_parallel_tracker_crossing_glides():
    """Two gliding tones that CROSS in pitch: the two-pointer matching and
    chain identity must agree between the parallel and scan paths."""
    from cpp_audio_tpu.models import resynth_bank
    from cpp_audio_tpu.utils import loudness as ld
    import jax.numpy as jnp

    F, k = 60, 16
    freq = np.full((F, k), np.nan)
    mag = np.full((F, k), -np.inf)
    for fr in range(F):
        a = 300.0 * 2 ** (fr / 60.0)     # rising
        b = 600.0 * 2 ** (-fr / 60.0)    # falling (crosses near fr=30)
        pair = sorted([(a, -15.0), (b, -18.0)])
        for j, (f0, m0) in enumerate(pair):
            freq[fr, j] = f0
            mag[fr, j] = m0
    li = ld.phons_to_index(60.0)
    cap = F * 12 + 16
    pan = np.random.default_rng(1).uniform(-1, 1, cap)
    phase = np.random.default_rng(2).uniform(0, 2, cap)
    kw = dict(total_frames=F + 6, stride=512, sample_rate=44100.0,
              max_voices=12, n_slots=32, nearby_distance=0.1,
              min_volume=1e-6, max_track_pitches=2.0, pitch_method=2,
              volume_method=1, analysis_volume=1.0, shift_pre=0.0,
              shift_post=0.0, stereo_spread=0.8, attack=441.0, hold=0.0,
              decay=800.0, sustain=0.7, release=2000.0)
    lp = np.asarray(ld.PITCHES, np.float64)
    ls = np.asarray(ld.ELVS[li], np.float64)
    t_par, d_par = device_tracker.build_tables_device(freq, mag, lp, ls,
                                                      pan, phase, **kw)
    t_scan, d_scan = device_tracker.build_tables_device(
        freq, mag, lp, ls, pan, phase, _force_scan=True, **kw)
    assert int(d_par) == int(d_scan) == 0
    ra = np.asarray(resynth_bank._render_slots(
        jnp.asarray(t_par, jnp.float32), stride=512, n_channels=2,
        dtype="float32")).reshape(-1, 2)
    rb = np.asarray(resynth_bank._render_slots(
        jnp.asarray(t_scan, jnp.float32), stride=512, n_channels=2,
        dtype="float32")).reshape(-1, 2)
    peak = max(np.abs(rb).max(), 1e-9)
    assert peak > 1e-4
    assert np.abs(ra - rb).max() < 2e-3 * peak


def test_tracker_silence_and_empty_frames():
    """All-silent input: no notes, a default (silent) table, no crash."""
    from cpp_audio_tpu.models import resynth_bank
    from cpp_audio_tpu.utils import loudness as ld
    import jax.numpy as jnp

    F, k = 20, 16
    freq = np.full((F, k), np.nan)
    mag = np.full((F, k), -np.inf)
    li = ld.phons_to_index(60.0)
    pan = np.zeros(64)
    phase = np.zeros(64)
    kw = dict(total_frames=F + 6, stride=512, sample_rate=44100.0,
              max_voices=12, n_slots=32, nearby_distance=0.5,
              min_volume=1e-6, max_track_pitches=1.0, pitch_method=2,
              volume_method=1, analysis_volume=1.0, shift_pre=0.0,
              shift_post=0.0, stereo_spread=0.8, attack=441.0, hold=0.0,
              decay=800.0, sustain=0.7, release=2000.0)
    t, d = device_tracker.build_tables_device(
        freq, mag, np.asarray(ld.PITCHES, np.float64),
        np.asarray(ld.ELVS[li], np.float64), pan, phase, **kw)
    assert int(d) == 0
    out = np.asarray(resynth_bank._render_slots(
        jnp.asarray(t, jnp.float32), stride=512, n_channels=2,
        dtype="float32"))
    assert np.abs(out).max() == 0.0


def _random_peaks(rng, F, k):
    """Random track-structured peak arrays: births/deaths + pitch drift so
    tracking, note-change, polyphony caps and loudness ordering all engage.
    Lanes are freq-sorted, NaN/-inf padded (the analyze_arrays layout)."""
    events = [[] for _ in range(F)]
    for _ in range(int(rng.integers(2, 8))):
        f0 = float(rng.uniform(80, 4000))
        start = int(rng.integers(0, F - 2))
        length = int(rng.integers(2, F - start))
        drift = rng.normal(0.0, float(rng.uniform(0.001, 0.04)), length)
        fr = f0 * np.exp(np.cumsum(drift))
        db = float(rng.uniform(-50, -12)) + np.cumsum(
            rng.normal(0.0, 1.0, length))
        for i in range(length):
            events[start + i].append((float(fr[i]), float(db[i])))
    freq = np.full((F, k), np.nan)
    mag = np.full((F, k), -np.inf)
    for f, evs in enumerate(events):
        evs.sort()
        kept = []
        for fv, dv in evs:
            if kept and fv - kept[-1][0] < 1e-6:  # strictly increasing
                continue
            kept.append((fv, dv))
        for j, (fv, dv) in enumerate(kept[:k]):
            freq[f, j] = fv
            mag[f, j] = dv
    return freq, mag


@pytest.mark.parametrize("seed", range(8))
def test_device_tracker_random_configs_f64_exact(seed):
    """Randomized differential campaign: random peak tracks + random tracker
    configs (reduction methods, shifts, harmonize, autotune scale/chord,
    polyphony caps) — the f64 device tracker's per-frame note multisets must
    equal the host tracker's EXACTLY for every config."""
    import jax.numpy as jnp

    from cpp_audio_tpu.analysis import autotune as at
    from cpp_audio_tpu.analysis import pitch as pp
    from cpp_audio_tpu.analysis.chain import (autotune_device_arrays,
                                              tracker_config_kwargs)

    rng = np.random.default_rng(1000 + seed)
    at_kwargs = {}
    if rng.random() < 0.5:
        if rng.random() < 0.5:
            at_kwargs = dict(
                autotune_type=at.AutotuneType.MUSICAL_SCALE,
                musical_scale_mode=list(at.MusicalScaleMode)[
                    int(rng.integers(0, 3))],
                root_note_halftones_transpose=int(rng.integers(-6, 7)))
        else:
            at_kwargs = dict(autotune_type=at.AutotuneType.CHORD,
                             bit_chord=int(rng.integers(1, 255)))
    cfg = resynth.ResynthConfig(
        sample_rate=44100, dtype="float64", seed=int(rng.integers(1000)),
        nearby_distance_tones=float(rng.uniform(0.1, 1.0)),
        min_volume=float(rng.uniform(1e-5, 3e-3)),
        max_track_pitches=float(rng.uniform(0.5, 3.0)),
        pitch_shift_pre_autotune=float(rng.choice([0.0, 2.0, -3.5])),
        pitch_shift_post_autotune=float(rng.choice([0.0, -1.0, 4.0])),
        pitch_harmonize_pre_autotune=float(rng.choice([0.0, 7.0, 12.5])),
        pitch_harmonize_post_autotune=float(rng.choice([0.0, 5.0])),
        use_autotune=bool(at_kwargs),
        autotune_kwargs=at_kwargs,
        autotune_tolerance_pitches=float(rng.choice([100.0, 3.0])),
        max_voices=int(rng.integers(3, 20)),
        pitch_method=list(pp.PitchReductionMethod)[int(rng.integers(0, 3))],
        volume_method=list(pp.VolumeReductionMethod)[int(rng.integers(0, 2))],
        stereo_spread=float(rng.uniform(0.0, 1.0)),
        env_attack_seconds=float(rng.uniform(0.0, 0.02)),
        env_decay_seconds=float(rng.uniform(0.0, 0.02)),
        env_sustain_level=float(rng.uniform(0.3, 1.0)),
        env_release_seconds=float(rng.uniform(0.0, 0.1)),
        # reference probe semantics (the config default): the device
        # kernel's sequential probe scan must reproduce the host's
        # duplicate-producing lower_bound law exactly
        # (device_tracker._harmonize_lanes_reference)
        harmonize_semantics="reference",
    )
    rcfg = resynth._render_config(cfg)
    F = 40
    freq, mag = _random_peaks(rng, F, cfg.max_voices + 1)
    total = F + 8

    peaks = [[(f, m) for f, m in zip(fr, mr) if np.isfinite(f)]
             for fr, mr in zip(freq, mag)]
    notes, _, dropped_h = resynth.track_python(peaks, cfg)
    table_host = np.asarray(
        resynth_bank._build_slot_tables(notes, total, rcfg))

    li = loudness.phons_to_index(60.0)
    cap = F * cfg.max_voices + 16
    pan = np.random.default_rng(cfg.seed).uniform(-1.0, 1.0, cap)
    phase = np.random.default_rng(0).uniform(0.0, 2.0, cap)
    _kind, at_arrays = autotune_device_arrays(cfg, jnp.float64)
    kw = tracker_config_kwargs(cfg, rcfg)
    table_dev, dropped_d = device_tracker.build_tables_device(
        np.asarray(freq, np.float64), np.asarray(mag, np.float64),
        np.asarray(loudness.PITCHES, np.float64),
        np.asarray(loudness.ELVS[li], np.float64), pan, phase,
        total_frames=total, stride=rcfg.stride,
        sample_rate=float(cfg.sample_rate), autotune_arrays=at_arrays, **kw)
    table_dev = np.asarray(table_dev)

    assert int(dropped_d) == int(dropped_h), "dropped NoteOn counts differ"
    F_VTGT, F_VB, F_INC = (resynth_bank._F_VTGT, resynth_bank._F_VB,
                           resynth_bank._F_INC)
    act_h = (table_host[:, :, F_VTGT] != 0) | (table_host[:, :, F_VB] != 0)
    act_d = (table_dev[:, :, F_VTGT] != 0) | (table_dev[:, :, F_VB] != 0)
    for f in range(act_h.shape[0]):
        hs, ds = np.nonzero(act_h[f])[0], np.nonzero(act_d[f])[0]
        assert hs.size == ds.size, f"frame {f}: {hs.size} vs {ds.size} notes"
        h = np.stack([table_host[f, hs, c] for c in (F_INC, F_VTGT, F_VB)],
                     axis=-1)
        d = np.stack([table_dev[f, ds, c] for c in (F_INC, F_VTGT, F_VB)],
                     axis=-1)
        h = h[np.lexsort(h.T)]
        d = d[np.lexsort(d.T)]
        np.testing.assert_allclose(
            np.float32(d), np.float32(h), rtol=3e-6, atol=1e-12,
            err_msg=f"frame {f} note multiset differs (seed {seed})")


def test_harmonize_semantics_modes():
    """The two harmonize semantics on a case where they genuinely diverge
    (integer-grid pitches + integer harmonize — exactly what autotune
    produces, so this is an everyday configuration, not a corner):

    "reference" (probe semantics, oracle-pinned): the lower_bound over the
    growing vector misses the true-closest original 93 for the copy of 81
    (earlier appends broke its sorted precondition), leaving DUPLICATE
    eps-equal pitches — the reference's own post-merge debug Assert of
    strict ordering (algo.cpp:361-370) fires on these, so NDEBUG builds
    play them ~3 dB hot; and copies read their source's CURRENT volume, so
    a copy of a merged-into pitch carries the post-merge sum (aliasing).

    "merged" (intent semantics == the device tracker kernel,
    device_tracker._harmonize_lanes): every copy merges into the true
    closest original within epsilon, and all copies carry pre-harmonize
    volumes."""
    from cpp_audio_tpu.analysis import pitch as pp2

    def run(sem):
        base = [45.0, 57.0, 72.0, 81.0, 82.0, 93.0]
        lst = [pp2.PitchVolume(p, 0.1 * (i + 1)) for i, p in enumerate(base)]
        out = pp2.harmonize_pitches(12.0, lst, sem)
        return [(round(p.midipitch, 6), round(p.volume, 6)) for p in out]

    ref = run("reference")
    mer = run("merged")
    assert ref == [(45.0, 0.1), (57.0, 0.3), (69.0, 0.3), (72.0, 0.3),
                   (81.0, 0.4), (82.0, 0.5), (84.0, 0.3), (93.0, 0.6),
                   (93.0, 0.4), (94.0, 0.5), (105.0, 0.6)]
    assert mer == [(45.0, 0.1), (57.0, 0.3), (69.0, 0.2), (72.0, 0.3),
                   (81.0, 0.4), (82.0, 0.5), (84.0, 0.3), (93.0, 1.0),
                   (94.0, 0.5), (105.0, 0.6)]


@pytest.mark.parametrize("kind", ["tones", "chirp"])
def test_device_tracker_f64_sets_match_host_exactly(kind):
    """Verification mode: with float64 peaks, the device tracker's per-frame
    ACTIVE NOTE SETS (slot occupancy + frequencies + volumes) equal the host
    f64 tracker's exactly — demonstrating that the serving path's documented
    f32 set flips (docs/PERF_NOTES.md) are precision-only, not semantic.

    Set-determining quantities (aggregation boundaries, min_volume compares,
    matching windows, loudness order) all follow the input dtype in
    device_tracker; only table payload values are cast to f32 at emission.
    """
    sr = 44100
    cfg = resynth.ResynthConfig(sample_rate=sr, seed=5, dtype="float64")
    rcfg = resynth._render_config(cfg)
    sig = _signal(sr, kind)
    freq, mag = resynth.analyze_arrays(sig, cfg)
    freq = np.asarray(freq, np.float64)
    mag = np.asarray(mag, np.float64)
    total = freq.shape[0] + 8

    peaks = resynth.analyze(sig, cfg)
    notes, _, _ = resynth.track_python(peaks, cfg)
    table_host = np.asarray(
        resynth_bank._build_slot_tables(notes, total, rcfg))

    table_dev, _ = _device_table(freq, mag, cfg, rcfg, total)

    F_VTGT, F_VB, F_INC = (resynth_bank._F_VTGT, resynth_bank._F_VB,
                           resynth_bank._F_INC)
    act_h = (table_host[:, :, F_VTGT] != 0) | (table_host[:, :, F_VB] != 0)
    act_d = (table_dev[:, :, F_VTGT] != 0) | (table_dev[:, :, F_VB] != 0)
    assert act_h.sum() > 20  # workload produced real notes
    # slot NUMBERING is packing-order dependent (the host leaves gaps when a
    # freed slot is reused, the device packs low) and render-equivalent
    # (slots are summed); the semantic set is the per-frame MULTISET of
    # (frequency inc, volume target, volume state) notes
    for f in range(act_h.shape[0]):
        hs, ds = np.nonzero(act_h[f])[0], np.nonzero(act_d[f])[0]
        assert hs.size == ds.size, f"frame {f}: {hs.size} vs {ds.size} notes"
        h = np.stack([table_host[f, hs, c] for c in (F_INC, F_VTGT, F_VB)],
                     axis=-1)
        d = np.stack([table_dev[f, ds, c] for c in (F_INC, F_VTGT, F_VB)],
                     axis=-1)
        h = h[np.lexsort(h.T)]
        d = d[np.lexsort(d.T)]
        np.testing.assert_allclose(
            np.float32(d), np.float32(h), rtol=3e-6, atol=1e-12,
            err_msg=f"frame {f} note multiset differs")


def test_stable_draw_indexing_host_device_scan_agree():
    """draw_indexing="stable" keys pan/phase by (frame*max_voices + on-rank)
    so a flipped note decision perturbs only its own note instead of
    shifting every later draw (the round-4 TPU-vs-host decorrelation,
    docs/PERF_NOTES.md). Host python, device parallel, and device scan
    paths must produce identical note multisets INCLUDING pan gains and
    start phases."""
    import jax.numpy as jnp

    from cpp_audio_tpu.analysis.chain import (autotune_device_arrays,
                                              tracker_config_kwargs)

    rng = np.random.default_rng(7)
    F, k = 30, 13
    freq = np.full((F, k), np.nan)
    mag = np.full((F, k), -np.inf)
    for f in range(F):
        nv = rng.integers(0, 6)
        fs = np.sort(rng.uniform(80, 2000, nv))
        for j, fv in enumerate(fs):
            freq[f, j] = fv
            mag[f, j] = rng.uniform(-40, -5)
    cfg = resynth.ResynthConfig(sample_rate=44100, dtype="float64",
                                analysis_volume=1.0, max_voices=12,
                                min_volume=1e-3, draw_indexing="stable")
    rcfg = resynth._render_config(cfg)
    total = F + 8

    peaks = [[(fv, mv) for fv, mv in zip(fr, mr) if np.isfinite(fv)]
             for fr, mr in zip(freq, mag)]
    notes, _, _ = resynth.track_python(peaks, cfg)
    th = np.asarray(resynth_bank._build_slot_tables(notes, total, rcfg))

    li = loudness.phons_to_index(60.0)
    cap = F * cfg.max_voices + 16
    pan, phase = resynth.draw_pools(cfg, cap)
    _kind, at_arrays = autotune_device_arrays(cfg, jnp.float64)
    kw = tracker_config_kwargs(cfg, rcfg)

    def dev_tables(force_scan):
        td, _ = device_tracker.build_tables_device(
            np.asarray(freq, np.float64), np.asarray(mag, np.float64),
            np.asarray(loudness.PITCHES, np.float64),
            np.asarray(loudness.ELVS[li], np.float64), pan, phase,
            total_frames=total, stride=rcfg.stride,
            sample_rate=float(cfg.sample_rate), autotune_arrays=at_arrays,
            _force_scan=force_scan, **kw)
        return np.asarray(td)

    C = (resynth_bank._F_INC, resynth_bank._F_VTGT, resynth_bank._F_VB,
         resynth_bank._F_PHB, resynth_bank._F_GL, resynth_bank._F_GR)

    def msets(t):
        out = []
        for f in range(t.shape[0]):
            act = (t[f, :, C[1]] != 0) | (t[f, :, C[2]] != 0)
            rows = np.stack([t[f, np.nonzero(act)[0], c] for c in C], -1)
            out.append(rows[np.lexsort(rows.T)])
        return out

    mh = msets(th)
    for force_scan in (False, True):
        md = msets(dev_tables(force_scan))
        for f, (a, b) in enumerate(zip(mh, md)):
            assert a.shape == b.shape, f"frame {f}: {a.shape} vs {b.shape}"
            np.testing.assert_allclose(
                np.float32(b), np.float32(a), rtol=3e-6, atol=1e-12,
                err_msg=f"frame {f} (force_scan={force_scan})")
