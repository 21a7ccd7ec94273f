"""SortformerDiarizer: streaming + offline end-to-end diarization managers.

Behavioral parity: reference `Sortformer/SortformerDiarizer.swift:12`,
`SortformerStateUpdater` (cache compression), offline fused variant
(`Offline/OfflineSortformerDiarizer.swift:215`: one pass per 30.72 s window,
mel [1,128,3072] -> speaker_preds) + `SortformerSpeakerStitcher` (identity
matching across windows).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from fluidaudio_tpu.diarizer.types import DiarizationResult, PipelineTimings, TimedSpeakerSegment
from fluidaudio_tpu.models.sortformer import (
    FRAME_SECONDS,
    NUM_SPEAKERS,
    SORTFORMER_V2,
    SortformerConfig,
    SortformerModel,
    SortformerState,
    init_state,
    streaming_step,
)
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("diarizer.sortformer")

SAMPLE_RATE = 16_000
OFFLINE_WINDOW_MEL = 3072  # 30.72 s per fused window


class SortformerDiarizer:
    def __init__(
        self,
        config: SortformerConfig | None = None,
        *,
        threshold: float = 0.5,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or SORTFORMER_V2
        self.threshold = threshold
        self.model = SortformerModel(self.cfg)
        self.mel = MelFrontend(MelConfig(n_mels=self.cfg.n_mels, normalize=None))
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.SORTFORMER)
        dummy_mel = jnp.zeros((1, self.cfg.n_mels, self.cfg.chunk_frames * 8), jnp.float32)
        self.params = jax.jit(self.model.init)(jax.random.PRNGKey(rng_seed), dummy_mel)
        ckpt = base / "encoder.npz"
        if ckpt.exists():
            self.params = load_params(ckpt, self.params)
        else:
            logger.warning("sortformer: no checkpoint at %s — seeded random init", ckpt)
        self._step = jax.jit(
            lambda p, mel, st: streaming_step(self.model, p, mel, st, self.cfg)
        )
        self._offline = jax.jit(self.model.apply)

    # -------------------------------------------------------------- streaming

    def make_state(self, batch: int = 1) -> SortformerState:
        return init_state(self.cfg, batch)

    def process_chunk(
        self, samples: np.ndarray, state: SortformerState
    ) -> tuple[np.ndarray, SortformerState]:
        """samples [chunk_frames*1280] -> (preds [chunk_frames, 4], state')."""
        need = self.cfg.chunk_frames * 1280
        buf = np.zeros(need, np.float32)
        buf[: min(len(samples), need)] = samples[:need]
        mel, _ = self.mel(jnp.asarray(buf)[None, :])
        mel = mel[:, :, : self.cfg.chunk_frames * 8]
        preds, state = self._step(self.params, mel, state)
        return np.asarray(preds[0]), state

    def process(self, samples: np.ndarray) -> DiarizationResult:
        """Streaming pass over a whole recording."""
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        chunk_samples = self.cfg.chunk_frames * 1280
        state = self.make_state()
        all_preds = []
        for start in range(0, samples.size, chunk_samples):
            preds, state = self.process_chunk(samples[start : start + chunk_samples], state)
            all_preds.append(preds)
        preds = np.concatenate(all_preds) if all_preds else np.zeros((0, NUM_SPEAKERS))
        n_frames = min(len(preds), int(np.ceil(samples.size / 1280)))
        segments = self._preds_to_segments(preds[:n_frames])
        timings = PipelineTimings(total_seconds=time.perf_counter() - t0)
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=timings,
        )

    # ---------------------------------------------------------------- offline

    def process_offline(self, samples: np.ndarray) -> DiarizationResult:
        """Fused 30.72 s windows + speaker stitching across windows."""
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        window_samples = OFFLINE_WINDOW_MEL * 160
        overlap_frames = 64  # ~5 s of 80 ms frames for identity matching
        step = window_samples - overlap_frames * 1280

        windows = []
        for start in range(0, max(1, samples.size), max(1, step)):
            buf = np.zeros(window_samples, np.float32)
            seg = samples[start : start + window_samples]
            if seg.size < 16000 and windows:
                break
            buf[: seg.size] = seg
            mel, _ = self.mel(jnp.asarray(buf)[None, :])
            mel = mel[:, :, :OFFLINE_WINDOW_MEL]
            preds = np.asarray(self._offline(self.params, mel))[0]  # [384, 4]
            n_valid = min(preds.shape[0], int(np.ceil(seg.size / 1280)))
            windows.append((start // 1280, preds[:n_valid]))
            if start + window_samples >= samples.size:
                break

        stitched = self._stitch(windows)
        segments = self._preds_to_segments(stitched)
        timings = PipelineTimings(total_seconds=time.perf_counter() - t0)
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=timings,
        )

    def _stitch(self, windows: list[tuple[int, np.ndarray]]) -> np.ndarray:
        """Permute each window's speaker slots to match the accumulated
        timeline via overlap correlation + Hungarian (SpeakerStitcher)."""
        if not windows:
            return np.zeros((0, NUM_SPEAKERS), np.float32)
        total_frames = max(off + len(p) for off, p in windows)
        acc = np.zeros((total_frames, NUM_SPEAKERS), np.float32)
        count = np.zeros(total_frames, np.float32)
        for off, preds in windows:
            end = off + len(preds)
            overlap = count[off:end] > 0
            if overlap.any():
                a = acc[off:end][overlap] / count[off:end][overlap][:, None]
                b = preds[overlap]
                corr = a.T @ b  # [4, 4]
                rows, cols = linear_sum_assignment(-corr)
                perm = np.zeros(NUM_SPEAKERS, np.int64)
                perm[rows] = cols
                preds = preds[:, perm]
            acc[off:end] += preds
            count[off:end] += 1.0
        return acc / np.maximum(count[:, None], 1.0)

    # ------------------------------------------------------------------ utils

    def _preds_to_segments(self, preds: np.ndarray) -> list[TimedSpeakerSegment]:
        segments: list[TimedSpeakerSegment] = []
        T = len(preds)
        for s in range(NUM_SPEAKERS):
            active = preds[:, s] >= self.threshold
            start = None
            for f in range(T + 1):
                on = f < T and active[f]
                if on and start is None:
                    start = f
                elif not on and start is not None:
                    segments.append(
                        TimedSpeakerSegment(
                            speaker_id=f"spk{s}",
                            start_time=start * FRAME_SECONDS,
                            end_time=f * FRAME_SECONDS,
                        )
                    )
                    start = None
        segments.sort(key=lambda x: x.start_time)
        return segments
