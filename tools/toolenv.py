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
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return f"{base}_{hashlib.sha1(line.encode()).hexdigest()[:10]}"
        return f"{base}_noflags"
    except OSError:
        return f"{base}_nocpuinfo"


def setup_cpu(x64: bool = True) -> None:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", x64)
    jax.config.update("jax_compilation_cache_dir", machine_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
