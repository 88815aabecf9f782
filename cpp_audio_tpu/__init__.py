"""cpp_audio_tpu — a TPU-native audio DSP framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of OlivierSohn/cpp.audio
(a C++17 real-time audio library): additive/subtractive synthesis with AHDSR
envelopes and equal-loudness compensation, a Markov-chain procedural sound engine
(birds / robots / wind / sweeps), a sliding-STFT pitch-tracking resynthesizer with
autotune + harmonizer, an FFT vocoder, score/preset languages, and WAV tooling.

Architecture (TPU-first, not a port):
  - A voice is a row in SoA state arrays; rendering is parallel over voices AND
    time (phase accumulation via cumsum, envelopes in closed form, one-pole
    recurrences via associative scan). No per-sample object graphs.
  - Mixdown is a matmul: (time, voices) @ (voices, channels) rides the MXU.
  - Data-dependent control flow (Markov chains, voice allocation, pitch tracking)
    runs on the host and emits dense schedules that the device renders.
  - Multi-chip scaling shards the voice/frame axis over a jax.sharding.Mesh.

Subpackages:
  utils     — midi math, ISO-226 loudness, scales, interpolation, WAV/WIR IO,
              score parsing, presets (reference L0 / cpp.algorithms equivalents)
  ops       — DSP primitives: oscillators, envelopes, filters, noise, STFT,
              convolution, resampling, crossfades, limiter (reference L2)
  core      — engine/render loop, voice pools, events, params (reference L3/L4)
  models    — synths: sine, harmonics, soundengine (birds…), sampler (L4/L5a)
  analysis  — periodic FFT, pitch pipeline, autotune, vocoder, resynth (L5b)
  parallel  — device-mesh sharding of voices/frames
"""

__version__ = "0.1.0"


def _honor_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu python -m cpp_audio_tpu...` actually work.

    This environment's sitecustomize imports jax at interpreter start and
    registers the remote TPU plugin, so jax reads its config defaults before
    the user's environment variable can take effect the normal way. Re-apply
    the env var through jax.config (safe: backends are not initialized until
    first use, and apps import this package before any computation).
    """
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        # sitecustomize's TPU plugin registration sets jax_platforms itself
        # (e.g. "axon,cpu"), eating the user's env var; re-apply the env
        # over that — but never override an explicit earlier
        # jax.config.update by the user (e.g. a script forcing cpu under an
        # env that pins the TPU tunnel)
        cur = getattr(jax.config, "jax_platforms", None)
        if cur != plat and (cur is None or "axon" in str(cur)):
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_honor_platform_env()
