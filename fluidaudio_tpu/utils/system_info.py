"""Host/accelerator info + peak RSS (reference `Shared/SystemInfo.swift:11`)."""

from __future__ import annotations

import os
import platform
from dataclasses import dataclass, field

from fluidaudio_tpu.native.sysinfo import current_rss_bytes, peak_rss_bytes


@dataclass
class SystemInfo:
    os_name: str = field(default_factory=platform.system)
    os_version: str = field(default_factory=platform.release)
    python_version: str = field(default_factory=platform.python_version)
    cpu_count: int = field(default_factory=lambda: os.cpu_count() or 1)

    @staticmethod
    def accelerators() -> list[str]:
        try:
            import jax

            return [str(d) for d in jax.devices()]
        except Exception:
            return []

    @staticmethod
    def peak_memory_mb() -> float:
        return peak_rss_bytes() / (1024 * 1024)

    @staticmethod
    def current_memory_mb() -> float:
        return current_rss_bytes() / (1024 * 1024)

    def summary(self) -> str:
        return (
            f"{self.os_name} {self.os_version} · python {self.python_version} · "
            f"{self.cpu_count} cpus · peak {self.peak_memory_mb():.0f} MB"
        )
