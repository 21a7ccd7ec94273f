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


def _build_from_source() -> Path | None:
    """Build libfluidaudio_native.so with cmake+ninja when it is absent.

    Build artifacts are not committed; the first process that needs the
    library compiles it (seconds) into native/build. Returns the built .so
    path, or None when the toolchain or sources are unavailable.
    """
    import subprocess

    repo_root = Path(__file__).resolve().parents[2]
    src = repo_root / "native"
    if not (src / "CMakeLists.txt").exists():
        return None
    build = src / "build"
    build.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release", ".."],
            cwd=build, check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            ["ninja"], cwd=build, check=True, capture_output=True, timeout=300
        )
    except (OSError, subprocess.SubprocessError):
        return None
    so = build / "libfluidaudio_native.so"
    return so if so.exists() else None


def load_native() -> ctypes.CDLL | None:
    """Load the native library; None when unavailable (callers degrade)."""
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    paths = [p for p in _candidates() if p.exists()]
    if not paths:
        built = _build_from_source()
        if built is not None:
            paths = [built]
    for path in paths:
        try:
            _LIB = ctypes.CDLL(str(path))
            break
        except OSError:
            continue
    return _LIB
