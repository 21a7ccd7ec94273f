"""WAV/FLAC read and WAV write without external audio deps.

Behavioral parity: reference `Shared/AudioConverter.swift:458-517` (`AudioWAV.data`
writer) and the AVAudioFile read paths (which handle wav AND flac through the
OS decoder). Supports PCM 8/16/24/32-bit int and 32/64-bit float WAV, mono or
multichannel; FLAC decodes via the native library (`native/flac/flac.cpp`).
Float reads return float32 in [-1, 1]; `read_audio_raw` preserves int16 for
the half-bytes device-transfer path.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (samples float32 [n, channels], sample_rate)."""
    x, sample_rate = read_wav_raw(path)
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    return x, sample_rate


def read_audio_raw(path: str | Path) -> tuple[np.ndarray, int]:
    """Dtype-preserving reader for WAV and FLAC (dispatch by magic bytes).

    PCM16 WAV and FLAC return int16 [n, channels] (FLAC sources wider than
    16 bits round down); other WAV formats return float32 in [-1, 1].
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from fluidaudio_tpu.native.flac import read_flac_raw

        return read_flac_raw(path)
    return read_wav_raw(path)


def read_audio(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a WAV or FLAC file -> (samples float32 [n, channels], rate)."""
    x, sample_rate = read_audio_raw(path)
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    return x, sample_rate


def read_wav_raw(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a WAV file dtype-preservingly for PCM16.

    PCM16 payloads come back as int16 [n, channels] (half the memory and —
    when shipped to the device raw — half the host->device transfer bytes;
    scale 1/32768 applied on-device). Every other format returns float32 in
    [-1, 1] exactly like `read_wav`.
    """
    data = Path(path).read_bytes()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")

    fmt = None
    payload = None
    pos = 12
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif chunk_id == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned

    if fmt is None or payload is None:
        raise ValueError(f"missing fmt/data chunk: {path}")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 2:  # WAVE_FORMAT_EXTENSIBLE
        # subformat GUID's first two bytes carry the real format tag
        ext = data
        idx = ext.find(b"fmt ")
        (audio_format,) = struct.unpack_from("<H", ext, idx + 8 + 24)

    if audio_format == 1:  # PCM int
        if bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.int16)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth: {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag: {audio_format}")

    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, sample_rate


def write_wav(
    path: str | Path,
    samples: np.ndarray,
    sample_rate: int,
    *,
    dtype: str = "int16",
) -> None:
    """Write samples [n] or [n, channels] as a PCM16 or float32 WAV.

    int16 input with dtype="int16" is written verbatim (no scale/clip), so a
    PCM16 payload round-trips bit-exactly through write_wav -> read_wav_raw.
    Float input is clipped and scaled by 32767 as before.
    """
    x = np.asarray(samples)
    if x.dtype == np.int16:
        if dtype != "int16":
            x = x.astype(np.float32) / 32768.0
    else:
        x = x.astype(np.float32)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]

    if dtype == "int16":
        if x.dtype == np.int16:
            body = x.astype("<i2").tobytes()
        else:
            body = (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        audio_format, bits = 1, 16
    elif dtype == "float32":
        body = x.astype("<f4").tobytes()
        audio_format, bits = 3, 32
    else:
        raise ValueError(f"unsupported dtype: {dtype}")

    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    header = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    header += b"fmt " + struct.pack(
        "<IHHIIHH", 16, audio_format, channels, sample_rate, byte_rate, block_align, bits
    )
    header += b"data" + struct.pack("<I", len(body))
    Path(path).write_bytes(header + body)
