"""Offline embedding extraction with scipy-zoom weight interpolation.

Behavioral parity: reference `Offline/Extraction/OfflineEmbeddingExtractor`
(963 LoC) + `WeightInterpolation` (147: reimplements scipy.ndimage.zoom
half-pixel alignment) — per (window, speaker) masked embeddings, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.diarizer.offline.segmentation import SegmentationChunk
from fluidaudio_tpu.diarizer.offline.types import EmbeddingOptions
from fluidaudio_tpu.models.pyannote_seg import NUM_SPEAKERS, WINDOW_SAMPLES
from fluidaudio_tpu.models.wespeaker import WeSpeakerEmbedder
from fluidaudio_tpu.ops.mel import MelFrontend


def interpolate_weights(weights: np.ndarray, target_len: int) -> np.ndarray:
    """[T] -> [target_len] linear interpolation with half-pixel alignment
    (scipy.ndimage.zoom mode='nearest' alignment, reference WeightInterpolation)."""
    src_len = weights.shape[0]
    if src_len == target_len:
        return weights.astype(np.float32)
    if target_len <= 0 or src_len == 0:  # reference returns empty
        return np.zeros(max(target_len, 0), np.float32)
    scale = src_len / target_len
    # half-pixel centers: out i samples src at (i + 0.5) * scale - 0.5
    pos = (np.arange(target_len) + 0.5) * scale - 0.5
    pos = np.clip(pos, 0, src_len - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src_len - 1)
    frac = (pos - lo).astype(np.float32)
    return (weights[lo] * (1 - frac) + weights[hi] * frac).astype(np.float32)


class OfflineEmbeddingExtractor:
    def __init__(
        self,
        embedder: WeSpeakerEmbedder,
        params,
        fbank: MelFrontend,
        options: EmbeddingOptions,
    ):
        self.embedder = embedder
        self.params = params
        self.fbank = fbank
        self.options = options
        self._fn = jax.jit(self._forward)

    def _forward(self, params, windows, masks):
        """windows [B, W], masks [B, T_mel] -> [B, 256]."""
        mel, _ = self.fbank(windows)  # [B, 80, T]
        mel_t = jnp.transpose(mel, (0, 2, 1))
        return self.embedder.apply(params, mel_t, masks)

    def extract(
        self, samples: np.ndarray, chunks: list[SegmentationChunk]
    ) -> tuple[np.ndarray, list[tuple[int, int]]]:
        """Returns (embeddings [M, 256], index [(chunk_idx, speaker_idx)]).

        Skips (window, speaker) pairs under the activity floor (reference skip
        strategies, OfflineEmbeddingExtractor.swift:177-545).
        """
        samples = np.asarray(samples, np.float32).reshape(-1)
        mel_frames = self.fbank.num_frames(WINDOW_SAMPLES)

        jobs: list[tuple[int, int, np.ndarray]] = []
        for ci, chunk in enumerate(chunks):
            # clean-frame weighting: suppress overlap frames
            overlap = chunk.binary.sum(axis=1) >= 2
            for s in range(NUM_SPEAKERS):
                w = chunk.weights[:, s] * (~overlap)
                if w.sum() < self.options.min_active_frames:
                    continue
                jobs.append((ci, s, interpolate_weights(w, mel_frames)))

        if not jobs:
            return np.zeros((0, 256), np.float32), []

        B = self.options.batch_size
        embeddings = []
        index: list[tuple[int, int]] = []
        for i in range(0, len(jobs), B):
            group = jobs[i : i + B]
            win = np.zeros((B, WINDOW_SAMPLES), np.float32)
            mask = np.zeros((B, mel_frames), np.float32)
            for r, (ci, s, w) in enumerate(group):
                start = int(chunks[ci].start_seconds * 16000)
                seg = samples[start : start + WINDOW_SAMPLES]
                win[r, : seg.size] = seg
                mask[r] = w
            emb = np.asarray(self._fn(self.params, jnp.asarray(win), jnp.asarray(mask)))
            for r, (ci, s, _) in enumerate(group):
                embeddings.append(emb[r])
                index.append((ci, s))
        return np.stack(embeddings), index
