"""Host f64 reference renders for bench.py's fidelity rows — CPU-only
subprocess (the TPU process must not flip its own backend/x64 config).

Two modes:

  python tools/bench_fidelity_host.py chain <seconds> <out.npz>
      End-to-end host f64 pipeline (synth -> analysis -> track -> render)
      on the bench workload. Informational: the end-to-end TPU-vs-CPU
      comparison is dominated by backend-chaotic noise-floor local maxima
      (which bin wins as a local max in flat spectral regions flips on
      ~1e-7 signal differences — the reference itself on two machines
      churns the same way), so this number is reported but is NOT the
      acceptance bar.

  python tools/bench_fidelity_host.py peaks <peaks.npz> <out.npz>
      The acceptance path: render the TPU-EXTRACTED peaks (freq/mag f64
      arrays in <peaks.npz>) through the oracle-pinned host f64 tracker +
      table builder + renderer. Identical peaks -> identical decisions ->
      the comparison measures exactly what the framework controls
      (tracking + rendering numerics).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import toolenv  # noqa: E402

toolenv.setup_cpu()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 44100


def run_chain(seconds: float, out_path: str) -> None:
    import bench
    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import sine_synth

    n = int(SR * seconds)
    sch, cfg = bench.make_synth_workload(SR, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    r64 = resynth.ResynthConfig(sample_rate=SR, analysis_volume=1.0,
                                dtype="float64")
    vparams = vocoder.VocoderParams(sample_rate=SR)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / SR))
    host = chain.run_offline_chain(bank, n, r64, vparams, carrier,
                                   block_size=cfg.block_size)
    np.savez(out_path, resynth=np.asarray(host.resynth),
             vocoded=np.asarray(host.vocoded))


def run_peaks(peaks_path: str, out_path: str) -> None:
    from cpp_audio_tpu.analysis import resynth
    from cpp_audio_tpu.models import resynth_bank

    d = np.load(peaks_path)
    freq = np.asarray(d["freq"], np.float64)
    mag = np.asarray(d["mag"], np.float64)
    cfg = resynth.ResynthConfig(sample_rate=SR, analysis_volume=1.0,
                                dtype="float64")
    rcfg = resynth._render_config(cfg)
    n_frames = int(freq.shape[0])
    table = resynth.build_tables_native(freq, mag, cfg, n_frames + 8, rcfg)
    stereo = resynth_bank.render_table(table, rcfg)
    np.savez(out_path, resynth=np.asarray(stereo))


def run_table(seconds: float, out_path: str) -> None:
    """Host f64 pipeline's slot control table on the bench workload (the
    note-level e2e reference for tools/note_metrics.py)."""
    import bench
    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import sine_synth

    n = int(SR * seconds)
    sch, cfg = bench.make_synth_workload(SR, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    r64 = resynth.ResynthConfig(sample_rate=SR, analysis_volume=1.0,
                                dtype="float64")
    vparams = vocoder.VocoderParams(sample_rate=SR)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / SR))
    table = chain.host_chain_table(bank, n, r64, vparams, carrier,
                                   block_size=cfg.block_size)
    np.savez(out_path, table=table)


def main():
    mode = sys.argv[1]
    if mode == "chain":
        run_chain(float(sys.argv[2]), sys.argv[3])
    elif mode == "peaks":
        run_peaks(sys.argv[2], sys.argv[3])
    elif mode == "table":
        run_table(float(sys.argv[2]), sys.argv[3])
    else:  # backwards compatible: bare "<seconds> <out>" = chain mode
        run_chain(float(sys.argv[1]), sys.argv[2])


if __name__ == "__main__":
    main()
