"""Benchmark: offline realtime factor of the full chain on one chip.

Workload (BASELINE.md): 60 s @ 44.1 kHz of
  1. 64-voice polyphonic synth render (voice-bank kernel)
  2. full analysis -> resynthesis chain on the mixdown (sliding Gaussian STFT,
     peak extraction, pitch tracking, tracked-voice re-render)
  3. FFT vocoder (synth as modulator, square carrier)

Serving shape: single-job dispatches back to back (batched serving via
prepare_offline_chain_device_batch measured slightly LOWER throughput — the
chain is compute-bound, so vmapping grows work linearly while de-optimizing
some fusions). Slope timing (k_hi vs k_lo back-to-back renders, one sync)
cancels the test rig's debug-tunnel fetch — constant per sync, not per
render; production hosts drain outputs asynchronously over PCIe.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}. The
reference's implied baseline is 1x realtime on one CPU core, so vs_baseline
equals the realtime factor.
"""

import json
import time

import numpy as np


def make_synth_workload(sr, n, seed=42):
    from cpp_audio_tpu.core import events, voices
    from cpp_audio_tpu.models import sine_synth
    from cpp_audio_tpu.ops import envelopes

    rng = np.random.default_rng(seed)
    notes = []
    for i in range(64):
        press = int(rng.uniform(0, n * 0.5))
        release = press + int(rng.uniform(sr, n * 0.5))
        notes.append(
            events.Note(i, press, release, float(rng.uniform(55, 3520)),
                        float(rng.uniform(0.3, 1.0)), float(rng.uniform(-1, 1)))
        )
    sch = voices.schedule_from_notes(notes, pad_to=64)
    cfg = sine_synth.SineSynthConfig(
        sample_rate=sr,
        ahdsr=envelopes.AHDSR(attack=441, hold=100, decay=2000, release=8820,
                              sustain=0.7),
        block_size=1 << 18,  # 11 blocks for 60 s: sweep-tuned (1.81 ms vs
        # 2.19 at 2^16 and 2.67 at 2^19 for the synth leg on a v5e)
        dtype="float32",
    )
    return sch, cfg


def _subprocess_probe(timeout_s: float = 120.0) -> str | None:
    """Probe the backend in a THROWAWAY process: during tunnel outages
    backend init doesn't raise, it HANGS — an in-process attempt would wedge
    the bench run permanently, but a hung child can be killed.

    Returns None on success, else a diagnosis string ('timeout' for the
    outage signature, or the child's stderr tail for a real failure like a
    broken install — which deserves its own error, not outage retries)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.arange(4.0))))"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return "timeout"
    if r.returncode == 0:
        return None
    return f"exit {r.returncode}: {r.stderr.strip()[-500:]}"


def _wait_for_backend(tries: int = 20, delay_s: float = 45.0):
    """The test rig reaches its TPU through a tunnel that has outage
    windows; retry backend init instead of failing the whole bench run."""
    import jax

    for i in range(tries):
        # only touch the in-process backend once a killable child proves the
        # tunnel is answering (a hung init cannot be recovered in-process)
        diag = _subprocess_probe()
        if diag is not None:
            if diag != "timeout":
                # not the outage signature: a broken install / plugin error
                # would fail identically on every retry — surface it now
                raise RuntimeError(f"backend probe failed ({diag})")
            if i == tries - 1:
                raise RuntimeError(
                    "TPU backend unreachable (tunnel outage): every probe "
                    "timed out")
            print(f"# backend probe timed out; retry {i + 1}/{tries} in "
                  f"{delay_s:.0f}s", flush=True)
            time.sleep(delay_s)
            continue
        try:
            devs = jax.devices()
            float(jax.numpy.sum(jax.numpy.arange(4.0)))  # probe a dispatch
            return devs
        except Exception as e:  # backend unavailable / tunnel down
            if i == tries - 1:
                raise
            print(f"# backend unavailable ({type(e).__name__}); "
                  f"retry {i + 1}/{tries} in {delay_s:.0f}s", flush=True)
            try:  # jax memoizes failed backend init; drop the cache
                from jax._src import xla_bridge as _xb

                _xb.backends.cache_clear()
            except Exception:
                pass
            time.sleep(delay_s)


def main():
    import jax

    # persist compiled executables across bench invocations (first compile of
    # the big programs is expensive, especially via remote-compile tunnels).
    # The dir is keyed by a host CPU fingerprint: loading an XLA:CPU AOT
    # entry cached by a DIFFERENT machine can SIGILL (see tests/conftest.py).
    try:
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
            tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
        except OSError:
            tag = "nocpuinfo"
        jax.config.update("jax_compilation_cache_dir",
                          f"/tmp/jax_cache_bench_{tag}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    _wait_for_backend()

    from cpp_audio_tpu.analysis import chain, resynth, vocoder
    from cpp_audio_tpu.models import sine_synth

    sr = 44100
    seconds = 60.0
    n = int(sr * seconds)

    sch, cfg = make_synth_workload(sr, n)
    bank = sine_synth.bank_from_schedule(sch, cfg)
    rcfg = resynth.ResynthConfig(sample_rate=sr, analysis_volume=1.0, dtype="float32")
    vparams = vocoder.VocoderParams(sample_rate=sr)
    t_carrier = np.arange(n)
    carrier = np.sign(np.sin(2 * np.pi * 110.0 * t_carrier / sr)).astype(np.float64)

    import jax.numpy as jnp

    carrier_dev = jax.device_put(jnp.asarray(carrier, jnp.float32))

    # RNG draw pools are render constants: resident on device across reps
    n_frames = max(0, (n - rcfg.window_size) // rcfg.stride + 1)
    cap = n_frames * rcfg.max_voices + 16
    draws = (
        jax.device_put(np.random.default_rng(rcfg.seed).uniform(-1, 1, cap)
                       .astype(np.float32)),
        jax.device_put(np.random.default_rng(0).uniform(0, 2, cap)
                       .astype(np.float32)),
    )

    # single-dispatch chain: synth -> STFT/peaks -> device-resident pitch
    # tracker -> tracked-note render + vocoder, all ONE device program.
    # Inputs are prestaged on device; step() enqueues one render.
    step, _n_frames = chain.prepare_offline_chain_device(
        bank, n, rcfg, vparams, carrier_dev, block_size=cfg.block_size,
        draws=draws)

    def sync(out):
        stereo, mix, dropped = out
        return float(jnp.sum(stereo[-1]) + jnp.sum(mix[-1]) + dropped)

    sync(step())  # warmup/compile

    def timed(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = step()
        sync(out)
        return time.perf_counter() - t0

    # Difference timing: the test rig reaches its chip through a debug tunnel
    # whose result fetch costs ~100 ms — constant per batch, not per render.
    # Timing k_lo and k_hi back-to-back renders with ONE final sync and
    # taking the slope measures the steady-state per-render device time (the
    # production metric: farm hosts drain outputs asynchronously over PCIe).
    k_lo, k_hi = 2, 8
    timed(1)
    raw_wall = timed(1)  # one render incl. the rig's dispatch+fetch overhead
    per = min(max((timed(k_hi) - timed(k_lo)) / (k_hi - k_lo), 1e-6)
              for _ in range(3))

    # secondary metric (BASELINE.md): STFT frames/sec of the analysis front
    # end alone (sliding Gaussian STFT + device top-k peaks), slope-timed
    from cpp_audio_tpu.ops import stft as stft_ops

    window = jnp.asarray(stft_ops.gaussian_window(rcfg.window_size, sigmas=4.0),
                         jnp.float32)
    fft_len = stft_ops.fft_length_for(rcfg.window_size)
    sig_dev = jax.device_put(jnp.asarray(carrier, jnp.float32))

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def stft_step(sig):
        sq = stft_ops._stft_sqmag(
            sig, window, window_size=rcfg.window_size, stride=rcfg.stride,
            fft_length=fft_len,
            use_matmul_dft=stft_ops.use_matmul_dft_default(jnp.float32))
        return stft_ops._top_peaks(sq, sample_rate=sr, fft_length=fft_len,
                                   k=rcfg.max_voices + 1)

    def stft_timed(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = stft_step(sig_dev)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    stft_timed(1)  # compile
    stft_per = min(max((stft_timed(k_hi) - stft_timed(k_lo)) / (k_hi - k_lo),
                       1e-9) for _ in range(3))
    stft_fps = n_frames / stft_per

    rtf = seconds / per
    print(json.dumps({
        "metric": "offline_realtime_factor_64voice_synth_resynth_vocoder",
        "value": round(rtf, 1),
        "unit": "audio_sec/wall_sec/chip",
        "vs_baseline": round(rtf, 1),
        "stft_frames_per_sec": round(stft_fps, 0),
        "raw_wall_seconds_per_render": round(raw_wall, 4),
        "device_seconds_per_render": round(per, 4),
    }))


if __name__ == "__main__":
    main()
