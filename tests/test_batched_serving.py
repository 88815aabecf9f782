"""Batched L5a serving (VERDICT r4 weak #4): N independent SoundEngine /
wind renders per device dispatch match their single-render counterparts."""

import numpy as np

from cpp_audio_tpu.models import soundengine as se
from cpp_audio_tpu.models import voice_presets, wind as wind_mod

SR = 44100


class TestBirdsBatch:
    def test_batch_matches_single_renders(self):
        prog = voice_presets.PROGRAMS[voice_presets.Mode.BIRDS][0]
        n = SR // 2
        seeds = [2, 5, 9]
        batch = se.render_program_batch(prog, 440.0, n, SR, seeds=seeds)
        assert batch.shape[0] == len(seeds) and batch.shape[2] == 2
        t_out = batch.shape[1]
        for bi, seed in enumerate(seeds):
            single = se.render_program(prog, 440.0, n, SR, seed=seed)
            ref = np.asarray(single)[:t_out]
            got = batch[bi]
            peak = max(np.abs(ref).max(), 1e-9)
            # chunk-boundary roundoff in the phase cumsum / loudness EMA
            assert np.abs(got - ref).max() / peak < 2e-4, (bi, seed)
            # beyond the batch's padded span the single render is silent
            tail = np.asarray(single)[t_out:]
            assert tail.size == 0 or np.abs(tail).max() <= peak * 1e-6

    def test_padding_jobs_silent(self):
        prog = voice_presets.PROGRAMS[voice_presets.Mode.BIRDS][0]
        n = SR // 4
        batch = se.render_program_batch(prog, 440.0, n, SR, seeds=[3, 3])
        np.testing.assert_allclose(batch[0], batch[1], rtol=0, atol=0)


class TestWindBatch:
    def test_batch_matches_single_device_controls(self):
        prog = voice_presets.get_program(voice_presets.Mode.WIND,
                                         "Heavy rain")
        n = SR // 4
        seeds = [2, 7]
        batch = wind_mod.render_program_batch(prog, n, SR, seeds=seeds)
        assert batch.shape == (2, n, 2)
        for bi, seed in enumerate(seeds):
            single = np.asarray(wind_mod.render_program(
                prog, n, SR, seed=seed, device_controls=True))
            peak = max(np.abs(single).max(), 1e-9)
            assert np.abs(batch[bi] - single).max() / peak < 1e-5, seed

    def test_distinct_seeds_differ(self):
        prog = voice_presets.get_program(voice_presets.Mode.WIND,
                                         "Heavy rain")
        n = SR // 8
        batch = wind_mod.render_program_batch(prog, n, SR, seeds=[1, 2])
        assert np.abs(batch[0] - batch[1]).max() > 1e-6
