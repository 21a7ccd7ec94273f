"""Peak/current RSS via the native shim (reference MachTaskSelfWrapper analog)."""

from __future__ import annotations

import ctypes

from fluidaudio_tpu.native import load_native


def peak_rss_bytes() -> int:
    lib = load_native()
    if lib is not None and hasattr(lib, "fluidaudio_peak_rss_bytes"):
        lib.fluidaudio_peak_rss_bytes.restype = ctypes.c_longlong
        return int(lib.fluidaudio_peak_rss_bytes())
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


def current_rss_bytes() -> int:
    lib = load_native()
    if lib is not None and hasattr(lib, "fluidaudio_current_rss_bytes"):
        lib.fluidaudio_current_rss_bytes.restype = ctypes.c_longlong
        return int(lib.fluidaudio_current_rss_bytes())
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * 4096
    except OSError:
        return 0
