"""Compare f32 vs f64 STFT peak arrays on the bench workload."""

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


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    sr = 44100
    n = int(sr * seconds)
    sys.path.insert(0, "/root/repo")
    import bench
    from cpp_audio_tpu.analysis import resynth
    from cpp_audio_tpu.models import sine_synth, voicebank
    from cpp_audio_tpu.ops import stft as stft_ops

    sch, cfg = bench.make_synth_workload(sr, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    r32 = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="float32")

    window = stft_ops.gaussian_window(r32.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(r32.window_size)
    k = r32.max_voices + 1

    outs = {}
    for dt in ("float32", "float64"):
        jdt = jnp.float32 if dt == "float32" else jnp.float64
        out = voicebank.render_bank(bank, n, block_size=cfg.block_size,
                                    dtype=dt, use_pallas="never")
        mono = jnp.asarray(out[:n].sum(axis=1), jdt)
        sq = stft_ops._stft_sqmag(
            mono, jnp.asarray(window, jdt), window_size=r32.window_size,
            stride=r32.stride, fft_length=fft_len,
            use_matmul_dft=stft_ops.use_matmul_dft_default(jdt))
        freq, mag = stft_ops._top_peaks(sq, sample_rate=sr,
                                        fft_length=fft_len, k=k)
        outs[dt] = (np.asarray(freq, np.float64), np.asarray(mag, np.float64))
        print(dt, "use_matmul_dft:", stft_ops.use_matmul_dft_default(jdt))

    f32, m32 = outs["float32"]
    f64, m64 = outs["float64"]
    v32 = np.isfinite(m32)
    v64 = np.isfinite(m64)
    print("valid peak count per frame: f32", v32.sum(1)[:10], "f64",
          v64.sum(1)[:10])
    print("count mismatch frames:", int(np.sum(v32.sum(1) != v64.sum(1))),
          "/", f32.shape[0])
    both = v32 & v64
    df = np.abs(f32 - f64)[both]
    print("freq diff (matched lanes): median", np.median(df), "p90",
          np.percentile(df, 90), "max", df.max())
    dm = np.abs(m32 - m64)[both]
    print("mag dB diff: median", np.median(dm), "p90", np.percentile(dm, 90),
          "max", dm.max())
    # where are the big freq diffs?
    bigmask = np.zeros_like(f32, bool)
    bigmask[both.nonzero()[0][np.argsort(-df)[:10]],
            both.nonzero()[1][np.argsort(-df)[:10]]] = True
    fr, ln = both.nonzero()
    order = np.argsort(-df)
    for i in order[:10]:
        f, l = fr[i], ln[i]
        print(f"  frame {f} lane {l}: f32 {f32[f, l]:.4f} Hz ({m32[f, l]:.2f} dB)"
              f" vs f64 {f64[f, l]:.4f} Hz ({m64[f, l]:.2f} dB)")


if __name__ == "__main__":
    main()
