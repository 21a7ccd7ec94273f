"""Offline segmentation: overlapping 10 s windows -> per-speaker weights.

Behavioral parity: reference `Offline/Segmentation/OfflineSegmentationProcessor`
(560 LoC): 10 s windows at stepRatio 0.2, powerset softmax -> per-speaker
probabilities used as embedding weights (not hard argmax like the online path).

TPU re-design: ALL windows stack on the batch axis for one jitted segmentation
call instead of the reference's sequential CoreML predictions (this is the
2-stage pipeline's producer collapsed into a single batched program).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.diarizer.offline.types import SegmentationOptions
from fluidaudio_tpu.models.pyannote_seg import (
    NUM_FRAMES,
    NUM_SPEAKERS,
    POWERSET_TABLE,
    WINDOW_SAMPLES,
    PyannoteSegmentation,
)

SAMPLE_RATE = 16_000


@dataclass
class SegmentationChunk:
    start_seconds: float
    weights: np.ndarray  # [589, 3] per-speaker soft activity
    binary: np.ndarray  # [589, 3] hard activity (argmax powerset)


class OfflineSegmentationProcessor:
    def __init__(self, model: PyannoteSegmentation, params, options: SegmentationOptions):
        self.model = model
        self.params = params
        self.options = options
        self._fn = jax.jit(self._forward)

    def _forward(self, params, windows):
        logits = self.model.apply(params, windows)  # [B, 589, 7]
        probs = jax.nn.softmax(logits, axis=-1)
        table = jnp.asarray(POWERSET_TABLE)  # [7, 3]
        weights = jnp.einsum("btc,cs->bts", probs, table)
        binary = table[jnp.argmax(logits, axis=-1)]
        return weights, binary

    def window_starts(self, total_samples: int) -> list[int]:
        win = WINDOW_SAMPLES
        step = max(1, int(win * self.options.step_ratio))
        if total_samples <= win:
            return [0]
        starts = list(range(0, total_samples - win + 1, step))
        if starts[-1] + win < total_samples:
            starts.append(total_samples - win)
        return starts

    def process(self, samples: np.ndarray, batch_size: int = 16,
                progress=None) -> list[SegmentationChunk]:
        """`progress(chunks_processed, total_chunks)` fires after every
        device batch, monotone non-decreasing, ending at total
        (OfflineDiarizerManagerProgressTests contract)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        starts = self.window_starts(samples.size)
        chunks: list[SegmentationChunk] = []
        for i in range(0, len(starts), batch_size):
            group = starts[i : i + batch_size]
            batch = np.zeros((batch_size, WINDOW_SAMPLES), np.float32)
            for r, s in enumerate(group):
                seg = samples[s : s + WINDOW_SAMPLES]
                batch[r, : seg.size] = seg
            weights, binary = self._fn(self.params, jnp.asarray(batch))
            weights, binary = np.asarray(weights), np.asarray(binary)
            for r, s in enumerate(group):
                chunks.append(
                    SegmentationChunk(
                        start_seconds=s / SAMPLE_RATE,
                        weights=weights[r],
                        binary=binary[r],
                    )
                )
            if progress is not None:
                progress(len(chunks), len(starts))
        return chunks
