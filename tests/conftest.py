"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (the real
environment has one TPU chip); bench.py runs on the real chip instead.

Note: this environment's sitecustomize imports jax at interpreter start (to
register the axon TPU plugin), so env vars set here are too late for jax's
config defaults — we must use jax.config.update directly.
"""

import os

# platform + virtual device count must still go through env for XLA flags
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# verification-grade precision for golden tests (the library defaults to f32)
jax.config.update("jax_enable_x64", True)
# XLA compiles are slow in this environment (~0.4s per tiny op); persist them.
# min_compile_time 0.1 (not 0): serializing certain tiny executables
# segfaults jaxlib's cache writer deep in a full-suite run (reproducible at
# ~test 280 with an empty cache; standalone files pass) — skipping the
# near-instant compiles avoids the crash and loses almost no caching value.
#
# The cache dir is keyed by a HOST CPU-FEATURE FINGERPRINT: the test rig
# moves between machines, and loading an XLA:CPU AOT executable compiled on
# a host with different CPU features SEGFAULTS/SIGILLs inside
# compilation_cache.get_executable_and_time (cpu_aot_loader warns
# "+prefer-no-scatter is not supported on the host machine ... could lead
# to execution errors such as SIGILL" right before the crash). This was the
# round-2 "xdist worker crash": full-suite runs crashed at whichever test
# first loaded a stale-machine entry; fresh-cache runs passed.
#
# ROUND-4 RESIDUAL: even with the cache key salted by jaxlib build (below)
# and a freshly wiped cache, rare paired worker crashes remain — and they
# CORRELATE WITH AXON TUNNEL OUTAGE WINDOWS (both observed full-suite
# crashes happened while a concurrent bench run was logging backend-probe
# timeouts; the same tests pass standalone immediately after). The
# environment's sitecustomize imports jax (registering the axon plugin) at
# every worker interpreter start, and plain `python -c` startup is known to
# hang intermittently during outages (CLAUDE.md) — an environmental hazard,
# not a logic failure. Workers inherit JAX_PLATFORMS=cpu from this master
# process, which minimizes but does not eliminate the exposure.


def _machine_cache_dir(base: str) -> str:
    import hashlib

    import jaxlib

    # key by CPU flags AND the jaxlib build: entries compiled by a
    # different jaxlib carry LLVM tuning attrs (+prefer-no-gather/scatter)
    # the loader rejects with "could lead to ... SIGILL" — and sometimes
    # doesn't reject (the residual random xdist worker segfaults)
    salt = getattr(jaxlib, "__version__", "?")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1((salt + line).encode()
                                       ).hexdigest()[:10]
                    break
            else:
                tag = "noflags" + salt
    except OSError:
        tag = "nocpuinfo" + salt
    return f"{base}_{tag}"


jax.config.update("jax_compilation_cache_dir",
                  _machine_cache_dir("/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---------------------------------------------------------------------------
# compiled-reference oracle (shared by test_reference_oracle.py and
# test_rtjob_oracle.py): builds tests/oracle/oracle.cpp, which #includes the
# reference's own headers from /root/reference (read-only) behind the shims.
# ---------------------------------------------------------------------------
import subprocess  # noqa: E402
from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_REF = Path("/root/reference")
_ORACLE_DIR = Path(__file__).parent / "oracle"


@pytest.fixture(scope="session")
def oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("oracle") / "oracle"
    subprocess.run(
        # -fpermissive: request.h/channel.h use the `using X = X<...>`
        # member-alias pattern that GCC rejects as changes-meaning by default
        ["g++", "-std=c++17", "-O1", "-DNDEBUG", "-fpermissive",
         "-I", str(_ORACLE_DIR),
         "-I", str(_REF / "include"), "-I", str(_REF / "source"),
         str(_ORACLE_DIR / "oracle.cpp"), "-o", str(exe)],
        check=True, capture_output=True)

    def run(*args, input_text=None, raw=False, env=None):
        run_env = None
        if env:
            run_env = dict(os.environ)
            run_env.update(env)
        out = subprocess.run([str(exe), *args], check=True, input=input_text,
                             capture_output=True, text=True,
                             env=run_env).stdout
        if raw:
            return out
        table: dict[str, list[list[float]]] = {}
        for line in out.splitlines():
            key, *vals = line.split()
            table.setdefault(key, []).append([float(v) for v in vals])
        return {k: np.array(v) for k, v in table.items()}

    run.exe = exe
    return run
