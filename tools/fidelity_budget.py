"""Fidelity error-budget decomposition: device f32 chain vs host f64 render.

Runs the bench workload (scaled duration) through
  A. the host f64 path  (f64 synth -> f64 STFT/peaks -> host tracker -> f64
     render)  == the oracle-pinned verification path
  B. the single-dispatch device-style chain at f32 (same program bench.py
     times)
and reports RMS error in dB of the resynth and vocoded legs, plus hybrid
runs that isolate stages (f64 peaks into the f32 tracker, f32 peaks into the
f64 tracker, ...) so the dominant error term is identifiable.

CPU-only (run with JAX_PLATFORMS=cpu). Usage:
    JAX_PLATFORMS=cpu python tools/fidelity_budget.py [seconds]
"""

import sys

import numpy as np

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent))
import toolenv  # noqa: E402

toolenv.setup_cpu()

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
    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import resynth_bank, sine_synth, voicebank
    from cpp_audio_tpu.ops import stft as stft_ops

    sch, cfg = bench.make_synth_workload(sr, n)
    bank32 = sine_synth.bank_from_schedule(sch, cfg)
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))

    # ---- A. host f64 path ----
    r64 = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="float64")
    host = chain.run_offline_chain(bank32, n, r64, vparams, carrier,
                                   block_size=cfg.block_size)
    ref_stereo = np.asarray(host.resynth)
    ref_voc = np.asarray(host.vocoded)

    # ---- G. device df32 chain (the fidelity-at-speed program) ----
    rdf = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="df32")
    devdf = chain.run_offline_chain_device(bank32, n, rdf, vparams, carrier,
                                           block_size=cfg.block_size)
    df_stereo = np.asarray(devdf.resynth)
    df_voc = np.asarray(devdf.vocoded)
    mg = min(len(ref_stereo), len(df_stereo))
    mgv = min(len(ref_voc), len(df_voc))
    print(f"[G] device df32 chain vs host f64:")
    print(f"    resynth RMS err: {rms_db(df_stereo[:mg] - ref_stereo[:mg], ref_stereo[:mg]):.1f} dB")
    print(f"    vocoded RMS err: {rms_db(df_voc[:mgv] - ref_voc[:mgv], ref_voc[:mgv]):.1f} dB")

    # ---- B. device f32 chain (the benched program) ----
    r32 = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="float32")
    dev = chain.run_offline_chain_device(bank32, n, r32, vparams, carrier,
                                         block_size=cfg.block_size)
    dev_stereo = np.asarray(dev.resynth)
    dev_voc = np.asarray(dev.vocoded)

    m = min(len(ref_stereo), len(dev_stereo))
    mv = min(len(ref_voc), len(dev_voc))
    print(f"[B] device f32 chain vs host f64:")
    print(f"    resynth RMS err: {rms_db(dev_stereo[:m] - ref_stereo[:m], ref_stereo[:m]):.1f} dB")
    print(f"    vocoded RMS err: {rms_db(dev_voc[:mv] - ref_voc[:mv], ref_voc[:mv]):.1f} dB")

    # ---- C. hybrid: f64 peaks -> f64 device tracker -> f64 device render
    # (isolates device-tracker SEMANTICS from f32 rounding: should be ~exact)
    dev64 = chain.run_offline_chain_device(bank32, n, r64, vparams, carrier,
                                           block_size=cfg.block_size)
    d64 = np.asarray(dev64.resynth)
    print(f"[C] device chain at f64 vs host f64:")
    print(f"    resynth RMS err: {rms_db(d64[:m] - ref_stereo[:m], ref_stereo[:m]):.1f} dB")

    # ---- D. f32 peaks -> f64 tracker+render (isolates peak precision) ----
    # f32 synth+STFT+peaks exactly as the device chain computes them
    args, statics = voicebank.prepare_bank_arrays(bank32, n, cfg.block_size,
                                                  "float32")
    args, statics = voicebank.compact_block_args(args, statics)
    window = stft_ops.gaussian_window(r32.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(r32.window_size)
    k = r32.max_voices + 1
    S = vparams.stride
    W = vparams.modulator_window
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = vparams.band_freqs()
    bm_car = vocoder._band_matrix(edges, car_fft // 2 + 1, sr / car_fft)
    n_mod_frames = max(0, (n - W) // S + 1)
    n_car_frames = max(0, (n - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0,
                   max(n_mod_frames - 1, 0))
    freq32, mag32, _mix32 = chain._fused_analyze_vocode(
        *args, jnp.asarray(window, jnp.float32),
        jnp.asarray(carrier, jnp.float32)[:n], jnp.asarray(edges, jnp.float32),
        jnp.asarray(bm_car, jnp.float32), jnp.asarray(rows),
        n=n, dtype="float32", window_size=r32.window_size, stride=r32.stride,
        fft_len=fft_len, k=k, sample_rate=sr, mod_window=W, voc_stride=S,
        car_fft=car_fft, n_mod_frames=n_mod_frames,
        vol_mod=float(vparams.volume_modulator),
        vol_car=float(vparams.volume_carrier),
        vol_voc=float(vparams.volume_vocoded),
        use_matmul_dft=stft_ops.use_matmul_dft_default(jnp.float32),
        edges_t=tuple(float(e) for e in edges),
        mod_shape=vparams.modulator_window_shape, **statics)

    # host tracker + f64 render from the F32 peaks
    from cpp_audio_tpu import native as nat
    freq_h = np.asarray(freq32, np.float64)
    mag_h = np.asarray(mag32, np.float64)
    n_frames = int(freq_h.shape[0])
    rcfg64 = resynth._render_config(r64)
    table = resynth.build_tables_native(freq_h, mag_h, r64, n_frames + 8,
                                        rcfg64)
    st_d = resynth_bank.render_table(table, rcfg64)
    md = min(len(st_d), m)
    print(f"[D] f32 peaks -> host f64 tracker+render vs host f64:")
    print(f"    resynth RMS err: {rms_db(st_d[:md] - ref_stereo[:md], ref_stereo[:md]):.1f} dB")

    # ---- E. f64 peaks -> f32 device tracker+render (isolates tracker+render
    # f32 rounding) ----
    args64, statics64 = voicebank.prepare_bank_arrays(bank32, n,
                                                      cfg.block_size,
                                                      "float64")
    args64, statics64 = voicebank.compact_block_args(args64, statics64)
    freq64, mag64, _ = chain._fused_analyze_vocode(
        *args64, jnp.asarray(window, jnp.float64),
        jnp.asarray(carrier, jnp.float64)[:n], jnp.asarray(edges, jnp.float64),
        jnp.asarray(bm_car, jnp.float64), jnp.asarray(rows),
        n=n, dtype="float64", window_size=r32.window_size, stride=r32.stride,
        fft_len=fft_len, k=k, sample_rate=sr, mod_window=W, voc_stride=S,
        car_fft=car_fft, n_mod_frames=n_mod_frames,
        vol_mod=float(vparams.volume_modulator),
        vol_car=float(vparams.volume_carrier),
        vol_voc=float(vparams.volume_vocoded),
        use_matmul_dft=stft_ops.use_matmul_dft_default(jnp.float64),
        edges_t=tuple(float(e) for e in edges),
        mod_shape=vparams.modulator_window_shape, **statics64)

    from cpp_audio_tpu.analysis import device_tracker
    from cpp_audio_tpu.utils import loudness

    total_frames = n_frames + 8
    li = loudness.phons_to_index(60.0)
    cap = n_frames * r32.max_voices + 16
    pan = np.random.default_rng(r32.seed).uniform(-1.0, 1.0, cap)
    phase = np.random.default_rng(0).uniform(0.0, 2.0, cap)
    tk = chain.tracker_config_kwargs(r32, resynth._render_config(r32))

    def dev_tracker_render(fq, mg, fdt):
        table_d, _dropped = device_tracker.build_tables_device(
            jnp.asarray(fq, fdt), jnp.asarray(mg, fdt),
            jnp.asarray(np.asarray(loudness.PITCHES), fdt),
            jnp.asarray(np.asarray(loudness.ELVS[li]), fdt),
            jnp.asarray(pan, fdt), jnp.asarray(phase, fdt),
            total_frames=total_frames, stride=rcfg64.stride,
            sample_rate=float(sr),
            autotune_arrays=device_tracker.default_autotune_arrays(fdt),
            **{kk: tk[kk] for kk in tk if kk != "autotune_kind"},
            autotune_kind=tk["autotune_kind"])
        dt_name = "float64" if fdt == jnp.float64 else "float32"
        out = resynth_bank._render_slots(table_d, stride=rcfg64.stride,
                                         n_channels=2, dtype=dt_name)
        body = np.asarray(out.reshape(total_frames * rcfg64.stride, -1))
        return np.concatenate(
            [np.zeros((rcfg64.start_sample, 2), body.dtype), body], axis=0)

    st_e = dev_tracker_render(np.asarray(freq64), np.asarray(mag64),
                              jnp.float32)
    me = min(len(st_e), m)
    print(f"[E] f64 peaks -> f32 device tracker+render vs host f64:")
    print(f"    resynth RMS err: {rms_db(st_e[:me] - ref_stereo[:me], ref_stereo[:me]):.1f} dB")

    # ---- F. f64 peaks -> f64 device tracker -> f32 render ----
    table_f, _ = device_tracker.build_tables_device(
        jnp.asarray(freq64, jnp.float64), jnp.asarray(mag64, jnp.float64),
        jnp.asarray(np.asarray(loudness.PITCHES), jnp.float64),
        jnp.asarray(np.asarray(loudness.ELVS[li]), jnp.float64),
        jnp.asarray(pan, jnp.float64), jnp.asarray(phase, jnp.float64),
        total_frames=total_frames, stride=rcfg64.stride,
        sample_rate=float(sr),
        autotune_arrays=device_tracker.default_autotune_arrays(jnp.float64),
        **tk)
    out_f = resynth_bank._render_slots(jnp.asarray(table_f, jnp.float32),
                                       stride=rcfg64.stride, n_channels=2,
                                       dtype="float32")
    body_f = np.asarray(out_f.reshape(total_frames * rcfg64.stride, -1))
    st_f = np.concatenate(
        [np.zeros((rcfg64.start_sample, 2), body_f.dtype), body_f], axis=0)
    mf = min(len(st_f), m)
    print(f"[F] f64 peaks+tracker -> f32 table -> f32 render vs host f64:")
    print(f"    resynth RMS err: {rms_db(st_f[:mf] - ref_stereo[:mf], ref_stereo[:mf]):.1f} dB")


if __name__ == "__main__":
    main()
