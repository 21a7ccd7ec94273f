#!/usr/bin/env bash
# Fast hermetic test run: bypass the axon remote-compile relay (tests force
# JAX_PLATFORMS=cpu in conftest; the relay would add >1s per XLA compile).
# The multichip driver contract is covered in-suite (tests/test_multichip.py
# spawns dryrun_multichip in a fresh 1-device child; the dryrun self-
# provisions its virtual mesh and retries transient collective stalls).
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then
    set -- tests/ -q
fi
env PALLAS_AXON_POOL_IPS= python -m pytest "$@"
