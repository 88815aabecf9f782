#!/bin/bash
# CPU-only python runner that is immune to axon-tunnel outages.
#
# /root/.axon_site/sitecustomize.py registers the axon PJRT plugin at
# INTERPRETER START whenever PALLAS_AXON_POOL_IPS is set; during tunnel
# outages register() HANGS (not fails), so every `python ...` — even pure-CPU
# work — hangs before the first line of user code. Unsetting the var makes
# sitecustomize skip registration entirely: clean CPU-only jax, no tunnel
# round trip. (TPU runs must NOT use this wrapper.)
# Usage: tools/pyrun.sh [-t seconds] <script.py> [args...]
T=0
if [ "$1" = "-t" ]; then T=$2; shift 2; fi
unset PALLAS_AXON_POOL_IPS
export JAX_PLATFORMS=cpu
if [ "$T" -gt 0 ]; then
  exec timeout -k 10 "$T" python -u "$@"
fi
exec python -u "$@"
