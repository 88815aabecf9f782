"""Shared CPU-only jax setup for the tools/ scripts.

Forces the CPU backend, f64, and a persistent compile cache keyed by a host
CPU-feature fingerprint — loading an XLA:CPU AOT executable compiled on a
machine with different CPU features can SIGILL (see tests/conftest.py).
"""

import hashlib
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def machine_cache_dir(base: str = "/tmp/jax_cache") -> str:
    import jaxlib

    # salt with the jaxlib build: cross-build AOT entries carry LLVM tuning
    # attrs the loader may mis-handle (SIGILL class; see tests/conftest.py)
    salt = getattr(jaxlib, "__version__", "?")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1((salt + line).encode()).hexdigest()
                    return f"{base}_{tag[:10]}"
        return f"{base}_noflags{salt}"
    except OSError:
        return f"{base}_nocpuinfo{salt}"


def setup_cpu(x64: bool = True) -> None:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", x64)
    jax.config.update("jax_compilation_cache_dir", machine_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
