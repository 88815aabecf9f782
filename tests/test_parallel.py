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
