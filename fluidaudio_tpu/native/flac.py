"""Native FLAC decoder binding (C++), int16 output.

Behavioral parity: the reference reads FLAC through the OS decoder inside
`Shared/AudioConverter.swift:60-124` (AVAudioFile handles wav/flac/mp4
transparently). This environment has no system FLAC decoder, so the
framework ships its own (`native/flac/flac.cpp`, written from RFC 9639).
Output is interleaved int16, which rides the int16 PCM device-transfer path
(`utils/audio_source.py`) unchanged — half the host->device bytes.

LibriSpeech / MLS / OpenSLR corpora distribute FLAC; this unblocks
`registry/datasets.py` staging without a pre-conversion step.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from fluidaudio_tpu.native import load_native

_ERRORS = {
    1: "not a FLAC stream",
    2: "truncated stream",
    3: "unsupported FLAC feature",
    4: "corrupt stream",
    5: "allocation failure",
}


class FlacError(ValueError):
    pass


def native_available() -> bool:
    lib = load_native()
    return lib is not None and hasattr(lib, "flac_decode_int16")


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an in-memory FLAC stream -> (int16 [n, channels], sample_rate).

    Sources wider than 16 bits are rounded down to 16; narrower are shifted
    up. Raises FlacError on malformed input, RuntimeError when the native
    library is unavailable.
    """
    lib = load_native()
    if lib is None or not hasattr(lib, "flac_decode_int16"):
        raise RuntimeError(
            "native FLAC decoder unavailable (libfluidaudio_native.so not built)"
        )
    fn = lib.flac_decode_int16
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.flac_free.restype = None
    lib.flac_free.argtypes = [ctypes.c_void_p]

    out_ptr = ctypes.POINTER(ctypes.c_int16)()
    frames = ctypes.c_uint64()
    rate = ctypes.c_uint32()
    channels = ctypes.c_uint32()
    bits = ctypes.c_uint32()
    rc = fn(
        data,
        len(data),
        ctypes.byref(out_ptr),
        ctypes.byref(frames),
        ctypes.byref(rate),
        ctypes.byref(channels),
        ctypes.byref(bits),
    )
    if rc != 0:
        raise FlacError(f"FLAC decode failed: {_ERRORS.get(rc, rc)}")
    try:
        n = int(frames.value) * int(channels.value)
        pcm = np.ctypeslib.as_array(out_ptr, shape=(n,)).copy()
    finally:
        lib.flac_free(out_ptr)
    return pcm.reshape(int(frames.value), int(channels.value)), int(rate.value)


def read_flac_raw(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a FLAC file -> (int16 [n, channels], sample_rate)."""
    return decode_flac(Path(path).read_bytes())
