"""Multichip depth sweep: run dryrun_multichip at 8, 16 and 32 virtual
devices (VERDICT r4 next #9), each in a fresh subprocess with its own
`xla_force_host_platform_device_count`, and record a JSON artifact.

Usage: python tools/multichip_depth.py [out.json] [n_devices ...]

Each subprocess runs the FULL production-shape dryrun including the numeric
parity assertions and the collective-schedule guard (__graft_entry__.py).
Expect minutes per depth on the 1-core builder VM (XLA-CPU compiles).
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_depth(n: int, timeout_s: float = 3600.0) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}")
    code = (
        "import jax; jax.config.update('jax_compilation_cache_dir',"
        "'/tmp/jax_cache_multichip');"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',0.0);"
        "import __graft_entry__ as g;"
        f"g.dryrun_multichip({n}); print('DEPTH_OK')"
    )
    t0 = time.monotonic()
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                           env=env, capture_output=True, text=True,
                           timeout=timeout_s)
        ok = r.returncode == 0 and "DEPTH_OK" in r.stdout
        return {"n_devices": n, "ok": ok,
                "seconds": round(time.monotonic() - t0, 1),
                "error": None if ok else r.stderr.strip()[-500:]}
    except subprocess.TimeoutExpired:
        return {"n_devices": n, "ok": False,
                "seconds": round(time.monotonic() - t0, 1),
                "error": "timeout"}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MULTICHIP_DEPTH.json"
    depths = [int(a) for a in sys.argv[2:]] or [8, 16, 32]
    results = []
    for n in depths:
        print(f"# depth {n} ...", flush=True)
        res = run_depth(n)
        print(f"#   -> {res}", flush=True)
        results.append(res)
    with open(out_path, "w") as f:
        json.dump({"results": results,
                   "all_ok": all(r["ok"] for r in results)}, f, indent=1)
    print(json.dumps({"all_ok": all(r["ok"] for r in results)}))


if __name__ == "__main__":
    main()
