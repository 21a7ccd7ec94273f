"""Tracing/profiling helpers.

Behavioral parity: reference os.signpost intervals + per-stage wall timings +
ANE profiling script (SURVEY §5). TPU analogs: `jax.profiler` trace capture,
blocking stage timers, and device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

from fluidaudio_tpu.utils.logging import get_logger
from fluidaudio_tpu.utils.timing import StageTimer

logger = get_logger("profiling")


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/fluidaudio_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", log_dir)


@contextlib.contextmanager
def signpost(timer: StageTimer, name: str, block: bool = True):
    """Stage interval that blocks on device completion (signpost analog)."""
    import jax

    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block:
            # flush async dispatch so the interval reflects device time
            (jax.device_put(0.0) + 0).block_until_ready()
        timer.add(name, time.perf_counter() - t0)


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = {}
    return out
