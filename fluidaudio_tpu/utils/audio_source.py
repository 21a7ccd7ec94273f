"""Constant-memory audio sample sources.

Behavioral parity: reference `Shared/AudioSampleSource.swift:3-80` (protocol with
`sampleCount`/`copySamples`) and `Shared/AudioSourceFactory.swift:12-60`
(array-backed + mmap disk-backed f32 implementations). The disk-backed source
lets hour-scale files be windowed without holding them in RAM.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path
from typing import Protocol

import numpy as np

from fluidaudio_tpu.utils.converter import AudioConverter, TARGET_SAMPLE_RATE


class AudioSampleSource(Protocol):
    @property
    def sample_count(self) -> int: ...

    def copy_samples(self, start: int, count: int) -> np.ndarray:
        """Return float32 [count]; out-of-range tail is zero-filled."""
        ...


class ArrayAudioSource:
    def __init__(self, samples: np.ndarray):
        self._samples = np.asarray(samples, dtype=np.float32).reshape(-1)

    @property
    def sample_count(self) -> int:
        return int(self._samples.size)

    def copy_samples(self, start: int, count: int) -> np.ndarray:
        out = np.zeros(count, dtype=np.float32)
        lo = max(0, start)
        hi = min(self._samples.size, start + count)
        if hi > lo:
            out[lo - start : hi - start] = self._samples[lo:hi]
        return out


class DiskBackedAudioSampleSource:
    """mmap view over a raw little-endian f32 file at 16 kHz.

    With `owns_file=True` the backing temp file is unlinked on close()/GC
    (make_audio_source creates one full-size temp file per long input; a
    batch over many hour-scale files would otherwise fill /tmp)."""

    def __init__(self, path: str | Path, sample_count: int | None = None,
                 *, owns_file: bool = False):
        self._path = Path(path)
        self._mmap = np.memmap(self._path, dtype="<f4", mode="r")
        self._count = int(sample_count if sample_count is not None else self._mmap.size)
        self._finalizer = None
        if owns_file:
            import weakref

            path_str = str(self._path)

            def _cleanup(p=path_str):
                try:
                    os.unlink(p)
                except OSError:
                    pass

            self._finalizer = weakref.finalize(self, _cleanup)

    def close(self) -> None:
        """Release the mmap and delete the backing temp file (if owned)."""
        self._mmap = None
        if self._finalizer is not None:
            self._finalizer()

    @property
    def sample_count(self) -> int:
        return self._count

    def copy_samples(self, start: int, count: int) -> np.ndarray:
        out = np.zeros(count, dtype=np.float32)
        lo = max(0, start)
        hi = min(self._count, start + count)
        if hi > lo:
            out[lo - start : hi - start] = np.asarray(self._mmap[lo:hi], dtype=np.float32)
        return out


def make_audio_source(
    path: str | Path,
    *,
    disk_backed_threshold: int = 480_000,
    converter: AudioConverter | None = None,
) -> AudioSampleSource:
    """File -> source; switches to a mmap temp f32 file above the threshold.

    Threshold default mirrors the reference's `streamingThreshold` (480k samples
    = 30 s @16 kHz, `Parakeet/AsrTypes.swift:5-101`).
    """
    conv = converter or AudioConverter(TARGET_SAMPLE_RATE)
    samples = conv.resample_file(path)
    if samples.size <= disk_backed_threshold:
        return ArrayAudioSource(samples)
    tmp = tempfile.NamedTemporaryFile(prefix="fluidaudio_", suffix=".f32", delete=False)
    tmp.write(samples.astype("<f4").tobytes())
    tmp.close()
    return DiskBackedAudioSampleSource(tmp.name, samples.size, owns_file=True)
