"""Host f64 reference render of the bench workload — CPU-only subprocess
spawned by bench.py's fidelity row (the TPU process must not flip its own
backend/x64 config mid-run).

Usage: JAX_PLATFORMS=cpu python tools/bench_fidelity_host.py <seconds> <out.npz>
Writes resynth (n,2) and vocoded (m,) f64 arrays of the oracle-pinned host
pipeline (chain.run_offline_chain at dtype=float64) on the exact bench
workload.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
import toolenv  # noqa: E402

toolenv.setup_cpu()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    seconds = float(sys.argv[1])
    out_path = sys.argv[2]
    sr = 44100
    n = int(sr * seconds)

    import bench
    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import sine_synth

    sch, cfg = bench.make_synth_workload(sr, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    r64 = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0,
                                dtype="float64")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * np.arange(n) / sr))
    host = chain.run_offline_chain(bank, n, r64, vparams, carrier,
                                   block_size=cfg.block_size)
    np.savez(out_path, resynth=np.asarray(host.resynth),
             vocoded=np.asarray(host.vocoded))


if __name__ == "__main__":
    main()
