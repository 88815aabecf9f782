"""Floor check: f64 analysis+tracker+render of the F32 synth mixdown vs the
all-f64 host path. Bounds what a perfect-precision device analysis of the f32
signal could achieve."""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import pathlib as _p; import sys as _s; _s.path.insert(0, str(_p.Path(__file__).resolve().parent))
import toolenv
jax.config.update("jax_compilation_cache_dir", toolenv.machine_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp  # noqa: E402


def rms_db(err, ref):
    r = float(np.sqrt(np.mean(np.square(np.asarray(ref, np.float64)))))
    e = float(np.sqrt(np.mean(np.square(np.asarray(err, np.float64)))))
    return 20.0 * np.log10(max(e, 1e-30) / max(r, 1e-30))


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    sr = 44100
    n = int(sr * seconds)
    sys.path.insert(0, "/root/repo")
    import bench
    from cpp_audio_tpu.analysis import resynth
    from cpp_audio_tpu.models import resynth_bank, sine_synth, voicebank
    from cpp_audio_tpu.ops import stft as stft_ops

    sch, cfg = bench.make_synth_workload(sr, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    r64 = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="float64")
    rcfg64 = resynth._render_config(r64)
    window = stft_ops.gaussian_window(r64.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(r64.window_size)
    k = r64.max_voices + 1

    def analyze_render(mono64):
        sq = stft_ops._stft_sqmag(
            mono64, jnp.asarray(window, jnp.float64),
            window_size=r64.window_size, stride=r64.stride,
            fft_length=fft_len,
            use_matmul_dft=stft_ops.use_matmul_dft_default(jnp.float64))
        freq, mag = stft_ops._top_peaks(sq, sample_rate=sr,
                                        fft_length=fft_len, k=k)
        freq_h = np.asarray(freq, np.float64)
        mag_h = np.asarray(mag, np.float64)
        n_frames = int(freq_h.shape[0])
        table = resynth.build_tables_native(freq_h, mag_h, r64, n_frames + 8,
                                            rcfg64)
        return resynth_bank.render_table(table, rcfg64), (freq_h, mag_h)

    out64 = voicebank.render_bank(bank, n, block_size=cfg.block_size,
                                  dtype="float64", use_pallas="never")
    mono64 = jnp.asarray(out64[:n].sum(axis=1), jnp.float64)
    ref, (fq64, mg64) = analyze_render(mono64)

    out32 = voicebank.render_bank(bank, n, block_size=cfg.block_size,
                                  dtype="float32", use_pallas="never")
    mono32u = jnp.asarray(np.asarray(out32[:n].sum(axis=1), np.float64))
    test, (fq32, mg32) = analyze_render(mono32u)

    m = min(len(ref), len(test))
    print(f"f64-analysis of f32 signal vs all-f64: "
          f"{rms_db(test[:m] - ref[:m], ref[:m]):.1f} dB")
    v32, v64 = np.isfinite(mg32), np.isfinite(mg64)
    print("peak count mismatch frames:",
          int(np.sum(v32.sum(1) != v64.sum(1))), "/", fq32.shape[0])
    both = v32 & v64
    df = np.abs(fq32 - fq64)[both]
    print("freq diff: median", np.median(df), "p99",
          np.percentile(df, 99), "max", df.max())

    # also: direct f32 signal delta
    print("signal diff:", rms_db(np.asarray(mono32u) - np.asarray(mono64),
                                 np.asarray(mono64)), "dB")


if __name__ == "__main__":
    main()
