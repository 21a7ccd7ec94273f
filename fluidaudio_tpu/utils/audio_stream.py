"""Ring buffer with absolute-time indexing and gap zero-fill.

Behavioral parity: reference `Shared/AudioStream.swift:5,139-480`: append
samples at absolute positions (gaps zero-filled), read fixed or sliding
chunks, bound memory by capacity.
"""

from __future__ import annotations

import numpy as np


class AudioStream:
    def __init__(self, capacity_samples: int = 16_000 * 120, sample_rate: int = 16_000):
        self.capacity = capacity_samples
        self.sample_rate = sample_rate
        self._buf = np.zeros(capacity_samples, np.float32)
        self._start = 0  # absolute index of _buf position 0's logical sample
        self._end = 0  # absolute index one past the last written sample

    @property
    def start_index(self) -> int:
        return self._start

    @property
    def end_index(self) -> int:
        return self._end

    @property
    def available(self) -> int:
        return self._end - self._start

    def append(self, samples: np.ndarray, at_index: int | None = None) -> None:
        """Append at the stream end, or at an absolute index (gap zero-filled)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        pos = self._end if at_index is None else at_index
        if pos > self._end:
            # zero-fill the gap
            self._write(np.zeros(pos - self._end, np.float32), self._end)
        self._write(samples, pos)

    def _write(self, samples: np.ndarray, pos: int) -> None:
        n = samples.size
        if n == 0:
            return
        end = pos + n
        # advance the window if we exceed capacity
        if end - self._start > self.capacity:
            self._start = end - self.capacity
        if n >= self.capacity:
            self._buf[(np.arange(end - self.capacity, end)) % self.capacity] = samples[
                -self.capacity :
            ]
            self._end = end
            return
        idx = (np.arange(pos, end)) % self.capacity
        self._buf[idx] = samples
        self._end = max(self._end, end)

    def read(self, start: int, count: int) -> np.ndarray:
        """Read absolute range [start, start+count); out-of-window is zeros."""
        out = np.zeros(count, np.float32)
        lo = max(start, self._start)
        hi = min(start + count, self._end)
        if hi > lo:
            idx = np.arange(lo, hi) % self.capacity
            out[lo - start : hi - start] = self._buf[idx]
        return out

    def read_latest(self, count: int) -> np.ndarray:
        return self.read(max(self._start, self._end - count), count)

    def chunks(self, chunk_size: int, hop: int | None = None):
        """Iterate fixed/sliding windows over the available range."""
        hop = hop or chunk_size
        pos = self._start
        while pos + chunk_size <= self._end:
            yield pos, self.read(pos, chunk_size)
            pos += hop
