#!/usr/bin/env bash
# Fast hermetic test run: bypass the axon remote-compile relay (tests force
# JAX_PLATFORMS=cpu in conftest; the relay would add >1s per XLA compile).
# The multichip dryrun contract runs standalone afterwards — inside pytest
# the parent process's XLA thread pools starve it on this 1-core host — and
# retries: under external machine load the 8-virtual-device collective
# rendezvous can spuriously exceed its termination window.
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then
    set -- tests/ -q
    RUN_DRYRUN=1
fi
env PALLAS_AXON_POOL_IPS= python -m pytest "$@"
if [ "${RUN_DRYRUN:-0}" = "1" ]; then
    echo "--- standalone dryrun_multichip(8) ---"
    for attempt in 1 2 3; do
        if env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
            XLA_FLAGS="--xla_force_host_platform_device_count=8" \
            timeout 300 python __graft_entry__.py; then
            exit 0
        fi
        echo "dryrun attempt ${attempt} failed (transient collective stall?); retrying"
    done
    echo "dryrun_multichip failed after 3 attempts" >&2
    exit 1
fi
