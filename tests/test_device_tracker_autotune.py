"""Device tracker autotune + harmonize configs vs the host pipeline.

The reference's default live pipeline includes autotune
(rt.resynth.lib.cpp:1676-1727, rt.resynth.lib.autotune.cpp:89-142) and
harmonize (rt.resynth.lib.algo.cpp:318-371); the single-dispatch device
chain must cover them (VERDICT round-1 item 2).
"""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import autotune as at
from cpp_audio_tpu.analysis import pitch as pp
from cpp_audio_tpu.analysis import resynth
from cpp_audio_tpu.analysis.resynth import ResynthConfig, resynthesize


def _signal(sr):
    n = sr * 2
    t = np.arange(n) / sr
    sig = np.zeros(n)
    for f0, s0, s1, a in [(441.3, 0.1, 1.2, 0.4), (333.7, 0.3, 1.8, 0.3),
                          (552.1, 0.8, 1.9, 0.25), (221.9, 0.0, 0.7, 0.3)]:
        i0, i1 = int(s0 * sr), int(s1 * sr)
        sig[i0:i1] += a * np.hanning(i1 - i0) * np.sin(
            2 * np.pi * f0 * t[: i1 - i0])
    return sig


CONFIGS = {
    "scale_major": dict(use_autotune=True),
    "scale_minor_root_mi": dict(
        use_autotune=True,
        autotune_kwargs=dict(
            musical_scale_mode=at.MusicalScaleMode.MINOR_HARMONIC,
            musical_scale_root_note=__import__(
                "cpp_audio_tpu.utils.midi", fromlist=["Note"]).Note.Mi)),
    "chord": dict(use_autotune=True,
                  autotune_kwargs=dict(autotune_type=at.AutotuneType.CHORD)),
    "intervals": dict(
        use_autotune=True,
        autotune_kwargs=dict(
            autotune_type=at.AutotuneType.FIXED_SIZE_INTERVALS,
            intervals_size=3)),
    "harmonize_pre": dict(pitch_harmonize_pre_autotune=7.0),
    "harmonize_post": dict(pitch_harmonize_post_autotune=12.0),
    "autotune_plus_harmonize": dict(use_autotune=True,
                                    pitch_harmonize_pre_autotune=7.0,
                                    pitch_harmonize_post_autotune=-12.0),
    "tolerance_drop": dict(use_autotune=True,
                           autotune_tolerance_pitches=0.3),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_device_matches_python(name):
    sr = 44100
    cfg = ResynthConfig(sample_rate=sr, seed=5, **CONFIGS[name])
    sig = _signal(sr)
    dev = np.asarray(resynthesize(sig, cfg, implementation="device"))
    py = np.asarray(resynthesize(sig, cfg, implementation="python"))
    n = min(len(dev), len(py))
    peak = max(float(np.abs(py).max()), 1e-9)
    if name != "tolerance_drop":
        assert peak > 1e-3
    err = float(np.abs(dev[:n] - py[:n]).max()) / peak
    assert err < 2e-3, f"{name}: relative error {err}"


def test_autotune_lanes_match_python_transform():
    """_autotune_lanes against the scalar autotune_pitches + transform for
    random pitch lists (both scale-fold and allowed-set kinds)."""
    import jax.numpy as jnp

    from cpp_audio_tpu.analysis import device_tracker as dt

    rng = np.random.default_rng(7)
    for kind_i in range(2):
        for trial in range(6):
            m = rng.integers(1, 12)
            pitches = np.sort(rng.uniform(30, 120, m))
            # keep them separated like reduced groups
            pitches = pitches + np.arange(m) * 0.5
            vols = rng.uniform(0.1, 1.0, m)
            k = 16
            tp = np.full((1, k), np.inf)
            tv = np.zeros((1, k))
            tp[0, :m] = pitches
            tv[0, :m] = vols

            if kind_i == 0:
                kw = dict(use_autotune=True)
                tables = at.autotune_tables(**kw)
                arrays = (jnp.asarray(tables["root_pitch"]),
                          jnp.asarray(tables["scale"]),
                          jnp.asarray(tables["equidistant"]),
                          jnp.zeros((0,)))
                kind = "scale"
            else:
                kw = dict(use_autotune=True,
                          autotune_kwargs=dict(
                              autotune_type=at.AutotuneType.CHORD))
                tables = at.autotune_tables(
                    use_autotune=True, autotune_type=at.AutotuneType.CHORD)
                arrays = (jnp.zeros(()), jnp.zeros((8,)), jnp.zeros((7,)),
                          jnp.asarray(tables["allowed"]))
                kind = "allowed"
            got_p, got_v = dt._autotune_lanes(
                jnp.asarray(tp), jnp.asarray(tv), *arrays, kind=kind,
                max_pitch=150.0, tolerance=100.0)
            got_p, got_v = np.asarray(got_p)[0], np.asarray(got_v)[0]

            fn = at.mk_autotune_function(
                use_autotune=True,
                **(dict(autotune_type=at.AutotuneType.CHORD)
                   if kind_i else {}))
            pvs = [pp.PitchVolume(p, v) for p, v in zip(pitches, vols)]
            want = pp.autotune_pitches(150.0, 100.0, fn, pvs)
            wm = len(want)
            assert np.isfinite(got_p).sum() == wm, (trial, kind)
            np.testing.assert_allclose(got_p[:wm],
                                       [w.midipitch for w in want],
                                       atol=1e-9)
            np.testing.assert_allclose(got_v[:wm],
                                       [w.volume for w in want], atol=1e-12)


def test_harmonize_lanes_match_python():
    import jax.numpy as jnp

    from cpp_audio_tpu.analysis import device_tracker as dt

    rng = np.random.default_rng(11)
    for h in (7.0, -5.0, 12.0):
        for trial in range(6):
            m = rng.integers(1, 10)
            pitches = np.sort(rng.uniform(40, 100, m)) + np.arange(m) * 0.45
            vols = rng.uniform(0.1, 1.0, m)
            k = 16
            tp = np.full((1, k), np.inf)
            tv = np.zeros((1, k))
            tp[0, :m] = pitches
            tv[0, :m] = vols
            got_p, got_v = dt._harmonize_lanes(jnp.asarray(tp),
                                               jnp.asarray(tv), h)
            got_p, got_v = np.asarray(got_p)[0], np.asarray(got_v)[0]
            pvs = [pp.PitchVolume(p, v) for p, v in zip(pitches, vols)]
            want = pp.harmonize_pitches(h, pvs)
            wm = len(want)
            assert np.isfinite(got_p).sum() == wm
            np.testing.assert_allclose(got_p[:wm],
                                       [w.midipitch for w in want],
                                       atol=1e-9)
            np.testing.assert_allclose(got_v[:wm],
                                       [w.volume for w in want], atol=1e-12)


def test_harmonize_merges_coincident_copy():
    """A +h copy landing exactly on an existing pitch merges volumes
    (algo.cpp:338-352)."""
    import jax.numpy as jnp

    from cpp_audio_tpu.analysis import device_tracker as dt

    tp = np.full((1, 8), np.inf)
    tv = np.zeros((1, 8))
    tp[0, :2] = [60.0, 67.0]
    tv[0, :2] = [0.5, 0.25]
    got_p, got_v = dt._harmonize_lanes(jnp.asarray(tp), jnp.asarray(tv), 7.0)
    got_p, got_v = np.asarray(got_p)[0], np.asarray(got_v)[0]
    # 60+7 merges into 67; 67+7=74 appended
    assert np.isfinite(got_p).sum() == 3
    np.testing.assert_allclose(got_p[:3], [60.0, 67.0, 74.0])
    np.testing.assert_allclose(got_v[:3], [0.5, 0.75, 0.25])


def test_batch_chain_min_volume_zero():
    """min_volume=0 routes the batched tracker down the scan path instead of
    raising (VERDICT round-1: lift the min_volume>0 restriction)."""
    from cpp_audio_tpu.analysis import chain, vocoder
    from cpp_audio_tpu.core import events, voices
    from cpp_audio_tpu.models import sine_synth
    from cpp_audio_tpu.ops import envelopes

    sr = 44100
    n = sr
    rng = np.random.default_rng(3)
    notes = [events.Note(i, int(rng.uniform(0, n * 0.3)),
                         int(rng.uniform(n * 0.5, n * 0.8)),
                         float(rng.uniform(220, 880)),
                         float(rng.uniform(0.3, 1.0)),
                         float(rng.uniform(-1, 1))) for i in range(4)]
    sch = voices.schedule_from_notes(notes, pad_to=8)
    scfg = sine_synth.SineSynthConfig(
        sample_rate=sr, block_size=4096, dtype="float32",
        ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=1000,
                              release=2205, sustain=0.7))
    bank = sine_synth.bank_from_schedule(sch, scfg)
    rcfg = resynth.ResynthConfig(sample_rate=sr, min_volume=0.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))
    step, _ = chain.prepare_offline_chain_device_batch(
        [bank, bank], n, rcfg, vparams, carrier, block_size=4096)
    stereo, _voc, _dropped = step()
    single = chain.run_offline_chain_device(bank, n, rcfg, vparams, carrier,
                                            block_size=4096)
    a = np.asarray(single.resynth)
    b = np.asarray(stereo[0])[: len(a)]
    peak = max(np.abs(a).max(), 1e-9)
    assert peak > 1e-3
    assert np.abs(a - b).max() < 1e-3 * peak + 1e-7
