"""bench.py bitrot guard.

The driver runs bench.py unattended at the end of every round on the real
TPU; a broken import or a stale call into the chain API there would silently
cost the round's perf record. This smoke test executes bench's EXACT
workload-construction and measurement path (make_synth_workload ->
bank_from_schedule -> prepare_offline_chain_device -> step -> sync -> the
secondary STFT metric) on CPU at a reduced duration.
"""

import functools

import numpy as np


def test_bench_workload_path_runs():
    import jax
    import jax.numpy as jnp

    import bench
    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import sine_synth
    from cpp_audio_tpu.ops import stft as stft_ops

    sr = 44100
    n = int(sr * 2.0)  # bench uses 60 s; 2 s exercises the same program

    sch, cfg = bench.make_synth_workload(sr, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                 dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    t = np.arange(n)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * t / sr)).astype(np.float64)
    carrier_dev = jax.device_put(jnp.asarray(carrier, jnp.float32))

    n_frames = max(0, (n - rcfg.window_size) // rcfg.stride + 1)
    cap = n_frames * rcfg.max_voices + 16
    draws = (
        jax.device_put(np.random.default_rng(rcfg.seed).uniform(-1, 1, cap)
                       .astype(np.float32)),
        jax.device_put(np.random.default_rng(0).uniform(0, 2, cap)
                       .astype(np.float32)),
    )
    step, _ = chain.prepare_offline_chain_device(
        bank, n, rcfg, vparams, carrier_dev, block_size=cfg.block_size,
        draws=draws)
    stereo, mix, dropped = step()
    s = float(jnp.sum(stereo[-1]) + jnp.sum(mix[-1]) + dropped)
    assert np.isfinite(s)
    assert float(jnp.max(jnp.abs(stereo))) > 0

    # the secondary STFT metric path
    window = jnp.asarray(stft_ops.gaussian_window(rcfg.window_size,
                                                  sigmas=4.0), jnp.float32)
    fft_len = stft_ops.fft_length_for(rcfg.window_size)
    sig_dev = jax.device_put(jnp.asarray(carrier, jnp.float32))

    @functools.partial(jax.jit, static_argnames=())
    def stft_step(sig):
        sq = stft_ops._stft_sqmag(
            sig, window, window_size=rcfg.window_size, stride=rcfg.stride,
            fft_length=fft_len,
            use_matmul_dft=stft_ops.use_matmul_dft_default(jnp.float32))
        return stft_ops._top_peaks(sq, sample_rate=sr, fft_length=fft_len,
                                   k=rcfg.max_voices + 1)

    freq, mag = jax.block_until_ready(stft_step(sig_dev))
    assert freq.shape[0] == n_frames


def test_bench_new_rows_paths_run():
    """The round-4 bench additions: df32 headline candidate, the fidelity
    helper script, and the slope-timing helper — same program shapes on CPU
    at tiny durations."""
    import py_compile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    import bench
    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import sine_synth

    repo = Path(bench.__file__).resolve().parent
    py_compile.compile(str(repo / "tools" / "bench_fidelity_host.py"),
                       doraise=True)

    sr = 44100
    n = int(sr * 2.0)  # make_synth_workload needs n*0.5 >= sr
    sch, cfg = bench.make_synth_workload(sr, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    rdf = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="df32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))
    carrier_dev = jax.device_put(jnp.asarray(carrier, jnp.float32))
    draws = bench._mk_draws(rdf, n, jax)
    # prepare-only: EXECUTING the fused df32 chain costs ~45 min of XLA-CPU
    # compile on this 1-core rig (the TPU bench run itself exercises it;
    # compiles there are remote). This still catches stale call signatures
    # and the arg staging.
    step, n_frames = chain.prepare_offline_chain_device(
        bank, n, rdf, vparams, carrier_dev, block_size=cfg.block_size,
        draws=draws)
    assert callable(step) and n_frames > 0
    # the slope-timing helper itself, on a trivial closure
    acc = []
    per = bench._slope_time(lambda: acc.append(1) or jnp.zeros(()),
                            jax.block_until_ready, k_lo=1, k_hi=2, reps=1)
    assert per > 0
    # the 127-voice workload constructor used by the breadth row
    sch127, _ = bench.make_synth_workload(sr, n, n_voices=127)
    assert sch127 is not None
