"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax is imported anywhere in the test process.
"""

import os

# force CPU: the ambient env selects the remote TPU (JAX_PLATFORMS=axon),
# which would turn every test dispatch into a network roundtrip
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
