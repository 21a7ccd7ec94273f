"""Per-stage wall timing, performance metrics, and progress emission.

Behavioral parity: reference `Shared/PerformanceMetrics.swift:4-25`
(ASR timing struct), `Core/DiarizerTypes.swift:92-107` (`PipelineTimings` incl.
`bottleneckStage`), `Shared/ProgressEmitter.swift:3-55` (per-session progress
stream). On TPU, stage timers bracket `jax.block_until_ready` so async dispatch
doesn't hide device time.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable, Iterator


class StageTimer:
    """Accumulates named stage durations; `.measure("enc")` is a context manager."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}

    @contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    @property
    def bottleneck_stage(self) -> str | None:
        if not self.stages:
            return None
        return max(self.stages, key=self.stages.get)

    def summary(self) -> dict[str, float]:
        return dict(sorted(self.stages.items(), key=lambda kv: -kv[1]))


@dataclass
class PerformanceMetrics:
    """End-to-end timing for one inference call (reference ASRPerformanceMetrics)."""

    audio_seconds: float = 0.0
    preprocess_seconds: float = 0.0
    encode_seconds: float = 0.0
    decode_seconds: float = 0.0
    total_seconds: float = 0.0
    stages: dict[str, float] = field(default_factory=dict)

    @property
    def rtfx(self) -> float:
        """Real-time factor: audio seconds processed per wall second."""
        return self.audio_seconds / self.total_seconds if self.total_seconds > 0 else 0.0


class ProgressEmitter:
    """Callback-based progress fan-out (0.0 → 1.0) for long-running jobs."""

    def __init__(self) -> None:
        self._subscribers: list[Callable[[float], None]] = []

    def subscribe(self, fn: Callable[[float], None]) -> None:
        self._subscribers.append(fn)

    def emit(self, fraction: float) -> None:
        f = min(1.0, max(0.0, fraction))
        for fn in self._subscribers:
            fn(f)
