#!/bin/bash
# Fast test runner: disables the axon remote-compile relay (sitecustomize),
# which otherwise adds >1s latency to every XLA compile. Must be done via env
# before the interpreter starts; see tests/conftest.py.
exec env PALLAS_AXON_POOL_IPS= python -m pytest "${@:-tests/ -q}"
