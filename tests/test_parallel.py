"""Sharded rendering on the 8-device virtual CPU mesh must match single-device."""

import jax
import numpy as np

from cpp_audio_tpu.core import events, voices
from cpp_audio_tpu.models import sine_synth
from cpp_audio_tpu.ops import envelopes
from cpp_audio_tpu.parallel import mesh as pmesh


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    cfg = sine_synth.SineSynthConfig(
        sample_rate=44100,
        ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=441, release=2000, sustain=0.6),
        block_size=4096,
        dtype="float64",
    )
    notes = [
        events.Note(i, press=i * 500, release=20000 + i * 300,
                    frequency=220.0 * (1 + 0.25 * i), velocity=0.5 + 0.03 * i,
                    pan=-1.0 + 0.125 * i)
        for i in range(16)
    ]
    sch = voices.schedule_from_notes(notes, pad_to=16)
    n = 30000
    single = sine_synth.render_schedule(sch, n, cfg)
    m = pmesh.default_mesh()
    sharded = pmesh.render_schedule_sharded(sch, n, cfg, mesh=m)
    np.testing.assert_allclose(sharded, single, atol=1e-9)


def test_sharded_pads_uneven_voices():
    cfg = sine_synth.SineSynthConfig(sample_rate=44100, block_size=4096, dtype="float64")
    notes = [events.Note(1, 0, 8000, 440.0, 1.0)]
    sch = voices.schedule_from_notes(notes, pad_to=4)  # 4 rows, mesh has 8
    out = pmesh.render_schedule_sharded(sch, 10000, cfg)
    single = sine_synth.render_schedule(sch, 10000, cfg)
    np.testing.assert_allclose(out, single, atol=1e-9)


def test_sharded_stft_matches_single():
    import numpy as np

    from cpp_audio_tpu.ops import stft as stft_ops

    sr = 44100
    sig = np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)
    w = stft_ops.gaussian_window(2000)
    single = np.asarray(stft_ops.stft_sqmag(sig, w, 1000))
    sharded = np.asarray(pmesh.stft_sqmag_sharded(sig, w, 1000))
    np.testing.assert_allclose(sharded, single[: len(sharded)], rtol=2e-4, atol=1e-8)


def test_sharded_full_chain_matches_single_device():
    """Voice-sharded synth + frame-sharded STFT/render + replicated tracker
    must reproduce the single-device fused chain."""
    from cpp_audio_tpu.analysis import chain, resynth, vocoder

    sr = 44100
    n = sr * 2
    rng = np.random.default_rng(3)
    notes = []
    for i in range(8):
        press = int(rng.uniform(0, n * 0.4))
        release = press + int(rng.uniform(sr // 4, n // 2))
        notes.append(events.Note(i, press, release,
                                 float(rng.uniform(110, 1760)),
                                 float(rng.uniform(0.3, 1.0)),
                                 float(rng.uniform(-1, 1))))
    sch = voices.schedule_from_notes(notes, pad_to=8)
    cfg = sine_synth.SineSynthConfig(
        sample_rate=sr, block_size=4096, dtype="float32",
        ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=1000,
                              release=2205, sustain=0.7))
    bank = sine_synth.bank_from_schedule(sch, cfg)
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))

    single = chain.run_offline_chain_device(bank, n, rcfg, vparams, carrier,
                                            block_size=cfg.block_size)
    m = pmesh.default_mesh()
    build = pmesh.make_sharded_chain(m, n, rcfg, vparams,
                                     block_size=cfg.block_size)
    stereo, voc, dropped = build(bank, carrier)()

    a = np.asarray(single.resynth)
    b = np.asarray(stereo)[: a.shape[0]]
    peak = max(np.abs(a).max(), 1e-9)
    assert np.abs(a - b[: len(a)]).max() < 1e-3 * peak + 1e-6
    va = np.asarray(single.vocoded)
    vb = np.asarray(voc)[: len(va)]
    vpeak = max(np.abs(va).max(), 1e-9)
    assert np.abs(va - vb[: len(va)]).max() < 1e-3 * vpeak + 1e-6
    assert int(dropped) == int(single.dropped)


def _chain_workload(sr, n, n_voices=8):
    rng = np.random.default_rng(3)
    notes = []
    for i in range(n_voices):
        press = int(rng.uniform(0, n * 0.4))
        release = press + int(rng.uniform(sr // 4, n // 2))
        notes.append(events.Note(i, press, release,
                                 float(rng.uniform(110, 1760)),
                                 float(rng.uniform(0.3, 1.0)),
                                 float(rng.uniform(-1, 1))))
    sch = voices.schedule_from_notes(notes, pad_to=n_voices)
    cfg = sine_synth.SineSynthConfig(
        sample_rate=sr, block_size=4096, dtype="float32",
        ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=1000,
                              release=2205, sustain=0.7))
    return sine_synth.bank_from_schedule(sch, cfg), cfg


def test_sharded_chain_2d_matches_single_device():
    """(voices x time) 2-D mesh: voice-DP synth with time-sharded blocks
    (psum over 'v' + all_gather over 'f'), frames/render over the flattened
    product — must reproduce the single-device fused chain."""
    from cpp_audio_tpu.analysis import chain, resynth, vocoder

    sr = 44100
    n = sr * 2
    bank, cfg = _chain_workload(sr, n)
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))

    single = chain.run_offline_chain_device(bank, n, rcfg, vparams, carrier,
                                            block_size=cfg.block_size)
    m2 = pmesh.default_mesh_2d(2, 4)
    build = pmesh.make_sharded_chain_2d(m2, n, rcfg, vparams,
                                        block_size=cfg.block_size)
    stereo, voc, dropped = build(bank, carrier)()

    a = np.asarray(single.resynth)
    b = np.asarray(stereo)[: a.shape[0]]
    peak = max(np.abs(a).max(), 1e-9)
    assert np.abs(a - b[: len(a)]).max() < 1e-3 * peak + 1e-6
    va = np.asarray(single.vocoded)
    vb = np.asarray(voc)[: len(va)]
    vpeak = max(np.abs(va).max(), 1e-9)
    assert np.abs(va - vb[: len(va)]).max() < 1e-3 * vpeak + 1e-6
    assert int(dropped) == int(single.dropped)


def test_render_jobs_farm_matches_per_job():
    """Two independent jobs over two 4-device sub-meshes must each match
    their single-device render (job-level parallelism, no cross-group
    collectives)."""
    from cpp_audio_tpu.analysis import chain, resynth, vocoder

    sr = 44100
    n = sr
    bank, cfg = _chain_workload(sr, n, n_voices=8)
    rng = np.random.default_rng(9)
    # second job: different carrier
    carriers = [np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr)),
                np.sign(np.sin(2 * np.pi * 220.0 * np.arange(n) / sr))]
    banks = [bank, bank]
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    outs = pmesh.render_jobs_farm(banks, n, rcfg, vparams, carriers,
                                  n_groups=2, block_size=cfg.block_size)
    assert len(outs) == 2
    for (stereo, voc, dropped), car in zip(outs, carriers):
        single = chain.run_offline_chain_device(bank, n, rcfg, vparams, car,
                                                block_size=cfg.block_size)
        a = np.asarray(single.resynth)
        b = np.asarray(stereo)[: a.shape[0]]
        peak = max(np.abs(a).max(), 1e-9)
        assert np.abs(a - b[: len(a)]).max() < 1e-3 * peak + 1e-6
        va = np.asarray(single.vocoded)
        vb = np.asarray(voc)[: len(va)]
        vpeak = max(np.abs(va).max(), 1e-9)
        assert np.abs(va - vb[: len(va)]).max() < 1e-3 * vpeak + 1e-6


def test_render_jobs_pipelined_matches_single():
    """Two-stage pipeline (synth/analysis group -> tracker/render group,
    peak lists crossing the boundary) must match the single-device chain."""
    from cpp_audio_tpu.analysis import chain, resynth, vocoder

    sr = 44100
    n = sr
    bank, cfg = _chain_workload(sr, n, n_voices=8)
    carriers = [np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr)),
                np.sign(np.sin(2 * np.pi * 220.0 * np.arange(n) / sr))]
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    outs = pmesh.render_jobs_pipelined([bank, bank], n, rcfg, vparams,
                                       carriers, block_size=cfg.block_size)
    assert len(outs) == 2
    for (stereo, voc, dropped), car in zip(outs, carriers):
        single = chain.run_offline_chain_device(bank, n, rcfg, vparams, car,
                                                block_size=cfg.block_size)
        a = np.asarray(single.resynth)
        b = np.asarray(stereo)[: a.shape[0]]
        peak = max(np.abs(a).max(), 1e-9)
        assert np.abs(a - b[: len(a)]).max() < 1e-3 * peak + 1e-6
        va = np.asarray(single.vocoded)
        vb = np.asarray(voc)[: len(va)]
        vpeak = max(np.abs(va).max(), 1e-9)
        assert np.abs(va - vb[: len(va)]).max() < 1e-3 * vpeak + 1e-6
        assert int(dropped) == int(single.dropped)


def test_sharded_stft_halo_matches_single():
    """Time-sharded-signal STFT with ppermute halos must match the
    replicated-signal STFT exactly (one-window boundary exchange)."""
    from cpp_audio_tpu.ops import stft as stft_ops

    sr = 44100
    rng = np.random.default_rng(2)
    sig = (np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)
           + 0.1 * rng.standard_normal(sr // 2))
    w = stft_ops.gaussian_window(2000)
    single = np.asarray(stft_ops.stft_sqmag(sig, w, 777))
    halo = np.asarray(pmesh.stft_sqmag_sharded_halo(sig, w, 777))
    assert halo.shape == single.shape
    np.testing.assert_allclose(halo, single, rtol=2e-4, atol=1e-8)
