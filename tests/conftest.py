"""Test env: force CPU and disable the axon TPU relay.

Must run before jax is imported anywhere in the test process.

Speed note: the ambient environment routes XLA compiles through a remote
compile relay (sitecustomize + PALLAS_AXON_POOL_IPS), adding >1 s per compile
(measured 26 s vs 580 s+ for one compile-heavy file). Tests still pass through
the relay, just slower; for fast local iteration run `scripts/test.sh`, which
launches pytest with the relay disabled.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compilation cache: compiles amortize across test runs
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/fluidaudio/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
