#!/usr/bin/env bash
# Fast hermetic test run: bypass the axon remote-compile relay (tests force
# JAX_PLATFORMS=cpu in conftest; the relay would add >1s per XLA compile).
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then
    set -- tests/ -q
fi
exec env PALLAS_AXON_POOL_IPS= python -m pytest "$@"
