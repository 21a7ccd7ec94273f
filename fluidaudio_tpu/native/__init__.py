"""ctypes loader for the compiled native library (libfluidaudio_native.so)."""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

_LIB: ctypes.CDLL | None = None
_SEARCHED = False


def _candidates() -> list[Path]:
    repo_root = Path(__file__).resolve().parents[2]
    out = []
    env = os.environ.get("FLUID_NATIVE_LIB")
    if env:
        out.append(Path(env))
    out += [
        repo_root / "native" / "build" / "libfluidaudio_native.so",
        Path(__file__).parent / "libfluidaudio_native.so",
    ]
    return out


def load_native() -> ctypes.CDLL | None:
    """Load the native library; None when unavailable (callers degrade)."""
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    for path in _candidates():
        if path.exists():
            try:
                _LIB = ctypes.CDLL(str(path))
                break
            except OSError:
                continue
    return _LIB
