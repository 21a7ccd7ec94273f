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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 1-core host: the thunk runtime's concurrency-optimized scheduler can issue
# independent collective thunks in different orders across partitions and
# live-lock the 8-virtual-device rendezvous (F-abort in rendezvous.cc).
# `xla_cpu_use_thunk_runtime=false` is a NO-OP in this XLA ("no longer
# supported" per its own warning); the live flag that serializes thunk issue
# order is the scheduler one. Keep a raised timeout as extra margin.
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compilation cache: compiles amortize across test runs. The dir
# is keyed on the host CPU flags — XLA:CPU AOT artifacts embed the compile
# machine's features and spam cpu_aot_loader warnings (or SIGILL) when loaded
# on a different host, so each host gets its own cache.
import hashlib  # noqa: E402
import platform  # noqa: E402

import jax  # noqa: E402

try:
    _flags = next(
        (ln for ln in open("/proc/cpuinfo") if ln.startswith("flags")), ""
    )
except OSError:
    _flags = platform.processor()
# key on local cpuinfo AND the jax version. Note the remote-compile relay
# (PALLAS_AXON_REMOTE_COMPILE) builds AOT artifacts on ITS host, so entries
# cached in one round can mismatch the relay of a later round (cpu_aot_loader
# warns about feature mismatches and numerics may differ per compile host) —
# differential tests must therefore never compare results across *different*
# compiled programs, only within one program (see
# test_chunked_merge_invariant_to_completion_grouping).
_cpu_key = hashlib.sha256(
    (_flags + jax.__version__).encode()
).hexdigest()[:12]
jax.config.update(
    "jax_compilation_cache_dir",
    f"/root/.cache/fluidaudio/jax_cache_cpu_{_cpu_key}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
