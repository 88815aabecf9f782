"""The fused offline chain must match the separate-stage pipeline exactly."""

import numpy as np
import pytest

from cpp_audio_tpu.analysis import chain, resynth, vocoder
from cpp_audio_tpu.core import events, voices
from cpp_audio_tpu.models import sine_synth, voicebank
from cpp_audio_tpu.ops import envelopes


def _workload(sr, n):
    rng = np.random.default_rng(7)
    notes = []
    for i in range(8):
        press = int(rng.uniform(0, n * 0.4))
        release = press + int(rng.uniform(sr // 4, n // 2))
        notes.append(events.Note(i, press, release, float(rng.uniform(110, 1760)),
                                 float(rng.uniform(0.3, 1.0)),
                                 float(rng.uniform(-1, 1))))
    sch = voices.schedule_from_notes(notes, pad_to=8)
    cfg = sine_synth.SineSynthConfig(
        sample_rate=sr,
        ahdsr=envelopes.AHDSR(attack=441, hold=100, decay=2000, release=4410,
                              sustain=0.7),
        block_size=1 << 13,
        dtype="float32",
    )
    return sine_synth.bank_from_schedule(sch, cfg), cfg


def test_fused_chain_matches_separate_stages():
    import jax

    sr = 44100
    n = sr * 2
    bank, cfg = _workload(sr, n)
    rcfg = resynth.ResynthConfig(sample_rate=sr, dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    t = np.arange(n)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * t / sr)).astype(np.float64)

    res = chain.run_offline_chain(bank, n, rcfg, vparams, carrier,
                                  block_size=cfg.block_size)

    # separate stages
    out = voicebank.render_bank(bank, n, block_size=cfg.block_size,
                                dtype="float32", use_pallas="never")
    mono = out[:n].sum(axis=1)
    r_sep = np.asarray(resynth.resynthesize(mono, rcfg,
                                            implementation="native"))
    v_sep = np.asarray(vocoder.vocode(mono, carrier, vparams))

    r_fused = np.asarray(res.resynth)
    v_fused = np.asarray(res.vocoded)
    assert r_fused.shape == r_sep.shape
    np.testing.assert_allclose(r_fused, r_sep, atol=2e-5)
    np.testing.assert_allclose(v_fused, v_sep, atol=2e-5)
    # sanity: the chain actually produced sound
    assert float(np.max(np.abs(r_fused))) > 1e-3
    assert float(np.max(np.abs(v_fused))) > 1e-3


def test_single_dispatch_chain_matches_host_chain():
    sr = 44100
    n = sr * 2
    bank, cfg = _workload(sr, n)
    rcfg = resynth.ResynthConfig(sample_rate=sr, dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    t = np.arange(n)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * t / sr)).astype(np.float64)

    host = chain.run_offline_chain(bank, n, rcfg, vparams, carrier,
                                   block_size=cfg.block_size)
    dev = chain.run_offline_chain_device(bank, n, rcfg, vparams, carrier,
                                         block_size=cfg.block_size)
    r_h, r_d = np.asarray(host.resynth), np.asarray(dev.resynth)
    v_h, v_d = np.asarray(host.vocoded), np.asarray(dev.vocoded)
    assert r_d.shape == r_h.shape
    np.testing.assert_allclose(v_d, v_h, atol=2e-5)
    peak = max(float(np.max(np.abs(r_h))), 1e-9)
    assert peak > 1e-3
    assert float(np.max(np.abs(r_d - r_h))) / peak < 2e-3


def test_resynthesize_signal_device_matches_host():
    """Single-dispatch WAV-input resynthesis == native/host tracker path."""
    import numpy as np

    from cpp_audio_tpu.analysis import chain, resynth

    sr = 44100
    n = sr * 2
    t = np.arange(n) / sr
    sig = np.zeros(n)
    for f0, s0, s1 in [(220, 0.1, 0.9), (440, 0.4, 1.6), (660, 1.0, 1.9)]:
        i0, i1 = int(s0 * sr), int(s1 * sr)
        sig[i0:i1] += 0.2 * np.hanning(i1 - i0) * np.sin(
            2 * np.pi * f0 * t[: i1 - i0])
    cfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="float32")
    dev = np.asarray(chain.resynthesize_signal_device(sig, cfg))
    host = resynth.resynthesize(sig, cfg, prefer_native=False)
    m = min(len(dev), len(host))
    peak = max(np.abs(host).max(), 1e-9)
    assert np.abs(dev[:m] - host[:m]).max() < 2e-3 * peak


def test_batched_chain_matches_single():
    """prepare_offline_chain_device_batch == per-job single-dispatch chain."""
    import numpy as np

    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.core import events, voices
    from cpp_audio_tpu.models import sine_synth
    from cpp_audio_tpu.ops import envelopes

    sr = 44100
    n = sr * 2
    banks = []
    for seed in (1, 2):
        rng = np.random.default_rng(seed)
        notes = [events.Note(i, int(rng.uniform(0, n * 0.4)),
                             int(rng.uniform(n * 0.5, n * 0.9)),
                             float(rng.uniform(110, 1760)),
                             float(rng.uniform(0.3, 1.0)),
                             float(rng.uniform(-1, 1))) for i in range(6)]
        sch = voices.schedule_from_notes(notes, pad_to=8)
        cfg = sine_synth.SineSynthConfig(
            sample_rate=sr, block_size=4096, dtype="float32",
            ahdsr=envelopes.AHDSR(attack=441, hold=0, decay=1000,
                                  release=2205, sustain=0.7))
        banks.append(sine_synth.bank_from_schedule(sch, cfg))
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))

    step, _ = chain.prepare_offline_chain_device_batch(
        banks, n, rcfg, vparams, carrier, block_size=4096)
    stereo, voc, dropped = step()
    for b, bank in enumerate(banks):
        single = chain.run_offline_chain_device(bank, n, rcfg, vparams,
                                                carrier, block_size=4096)
        a = np.asarray(single.resynth)
        bb = np.asarray(stereo[b])[: len(a)]
        peak = max(np.abs(a).max(), 1e-9)
        # cross-implementation f32 tolerance (vmap reassociates einsums)
        assert np.abs(a - bb).max() < 1e-3 * peak + 1e-7
        va = np.asarray(single.vocoded)
        vb = np.asarray(voc[b])[: len(va)]
        # f32 FFT reassociation under vmap on multi-million-point transforms;
        # the decimated modulator's widest-band subtraction amplifies that
        # noise on near-silence tails (observed ~1.4e-3 of peak at -60 dB
        # sample levels)
        assert np.abs(va - vb).max() < 3e-3 * max(np.abs(va).max(), 1e-9) + 1e-7
        assert int(dropped[b]) == int(single.dropped)
