"""LSEENDDiarizer: streaming manager (8 kHz, 100 ms frames).

Behavioral parity: reference `LS-EEND/LSEENDDiarizer.swift:17` — resample to
8 kHz, log10-mel + CMN, subsample+context, recurrent inference with step
sizes 100-500 ms, 900 ms warmup, up to 10 speakers.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.diarizer.types import DiarizationResult, PipelineTimings, TimedSpeakerSegment
from fluidaudio_tpu.models.lseend import (
    FRAME_SECONDS,
    LSEEND_BASE,
    LSEEND_SAMPLE_RATE,
    MAX_SPEAKERS,
    LsEendConfig,
    LsEendModel,
    LsEendState,
    init_state,
    subsample_with_context,
)
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue
from fluidaudio_tpu.utils.converter import resample
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("diarizer.lseend")


class LSEENDDiarizer:
    def __init__(
        self,
        config: LsEendConfig | None = None,
        *,
        step_ms: int = 500,
        threshold: float = 0.5,
        variant: str = "dih3",
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        """`variant` selects one of the 4 upstream fine-tunes
        (ami/ch/dih2/dih3, reference ModelNames.swift:49-52); each ships
        per-step-size weights."""
        assert 100 <= step_ms <= 500 and step_ms % 100 == 0
        from fluidaudio_tpu.convert.lseend import LSEEND_VARIANTS

        assert variant in LSEEND_VARIANTS, f"variant must be one of {LSEEND_VARIANTS}"
        self.variant = variant
        self.cfg = config or LSEEND_BASE
        self.step_frames = step_ms // 100
        self.threshold = threshold
        self.model = LsEendModel(self.cfg)
        # 8 kHz mel: 10 ms hop, 25 ms window, log10 + CMN handled below
        self.mel = MelFrontend(
            MelConfig(
                sample_rate=LSEEND_SAMPLE_RATE, n_mels=self.cfg.n_mels,
                n_fft=256, hop_length=80, win_length=200, normalize="per_feature",
            )
        )
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.LS_EEND)
        dummy = jnp.zeros((1, self.step_frames, self.cfg.feat_dim), jnp.float32)
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(rng_seed), dummy, init_state(self.cfg, 1)
        )
        # per-variant/step asset layout mirrors the reference repo subfolders
        candidates = [
            base / variant / f"model_{step_ms}ms.npz",
            base / variant / "model.npz",
            base / "model.npz",
        ]
        ckpt = next((c for c in candidates if c.exists()), candidates[-1])
        if ckpt.exists():
            self.params = load_params(ckpt, self.params)
        else:
            logger.warning("ls-eend: no checkpoint at %s — seeded random init", ckpt)
        self._step = jax.jit(self.model.apply)
        # persistent streaming session: the recurrent state carries enrolled
        # identity across calls (ref `LSEENDDiarizer` enrollSpeaker,
        # exercised by SpeakerEnrollmentTests.swift:366-556)
        self._session_state = init_state(self.cfg, 1)
        self._session_frames = 0
        self._session_queue = StreamingChunkQueue(
            self.step_frames * LSEEND_SAMPLE_RATE // 10
        )
        self._slot_names: dict[int, str] = {}

    def make_state(self) -> LsEendState:
        return init_state(self.cfg, 1)

    # ------------------------------------------------------------- enrollment

    @property
    def speaker_names(self) -> dict[int, str]:
        return dict(self._slot_names)

    def reset_session(self) -> None:
        self._session_state = init_state(self.cfg, 1)
        self._session_frames = 0
        self._slot_names = {}
        self._session_queue.reset()

    def enroll_speaker(
        self,
        samples: np.ndarray,
        sample_rate: int = 16_000,
        name: str | None = None,
        overwrite_assigned_name: bool = True,
    ) -> str | None:
        """Warm the recurrent session with a known speaker's audio and name
        the track the model assigns it. The frame clock resets so subsequent
        streaming starts at frame zero (enrollment does not offset the
        timeline — ref SpeakerEnrollmentTests :409-480)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        audio8k = resample(samples, sample_rate, LSEEND_SAMPLE_RATE)
        step_samples = self.step_frames * LSEEND_SAMPLE_RATE // 10
        if audio8k.size < step_samples:
            logger.warning(
                "enroll: need >= %d ms of audio", self.step_frames * 100
            )
            return None
        speech_frames = np.zeros(MAX_SPEAKERS, np.int64)
        for start in range(0, audio8k.size - step_samples + 1, step_samples):
            acts, self._session_state = self.process_step(
                audio8k[start : start + step_samples], self._session_state
            )
            speech_frames += (acts >= self.threshold).sum(axis=0)
        best = int(np.argmax(speech_frames))
        if speech_frames[best] == 0:
            logger.warning("enroll: no speech detected — speaker not enrolled")
            self._session_frames = 0
            return None
        if best in self._slot_names and not overwrite_assigned_name:
            logger.warning(
                "enroll: matched existing speaker %r at track %d and "
                "overwrite_assigned_name=False", self._slot_names[best], best,
            )
            self._session_frames = 0
            return None
        assigned = name or f"Speaker {best + 1}"
        self._slot_names[best] = assigned
        self._session_frames = 0
        return assigned

    def process_stream(
        self, samples: np.ndarray, sample_rate: int = 16_000
    ) -> DiarizationResult:
        """Streaming pass continuing the persistent session (state + names +
        frame clock). Partial trailing steps are QUEUED, not zero-padded:
        they complete on the next call (or `finish_stream`) — reference
        `StreamingChunkQueue` semantics (`LSEENDQueueTests.swift`)."""
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        audio8k = resample(samples, sample_rate, LSEEND_SAMPLE_RATE)
        self._session_queue.append(audio8k)
        step_samples = self.step_frames * LSEEND_SAMPLE_RATE // 10
        preds = []
        while self._session_queue.has_chunk:
            acts, self._session_state = self.process_step(
                self._session_queue.pop_next_chunk(), self._session_state
            )
            preds.append(acts)
        activities = np.concatenate(preds) if preds else np.zeros((0, MAX_SPEAKERS))
        n_frames = len(activities)
        segments = self._to_segments(
            activities[:n_frames],
            names=self._slot_names,
            frame_offset=self._session_frames,
        )
        self._session_frames += n_frames
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=PipelineTimings(total_seconds=time.perf_counter() - t0),
        )

    def finish_stream(self) -> DiarizationResult:
        """Finalize the session: drain the queued partial tail (zero-padded
        to one full step — the ONLY place padding is allowed) and emit its
        segments. Idempotent once drained (reference
        `testFinalizeSessionDrainsUnprocessedAudioAndMelFeatures` /
        `testFinalizeSessionIsIdempotent`)."""
        t0 = time.perf_counter()
        tail = self._session_queue.pop_tail()
        frame_samples = LSEEND_SAMPLE_RATE // 10
        if tail.size == 0:
            return DiarizationResult(
                segments=[], speaker_count=0,
                timings=PipelineTimings(total_seconds=time.perf_counter() - t0),
            )
        acts, self._session_state = self.process_step(tail, self._session_state)
        n_frames = min(len(acts), -(-tail.size // frame_samples))
        segments = self._to_segments(
            acts[:n_frames], names=self._slot_names,
            frame_offset=self._session_frames,
        )
        self._session_frames += n_frames
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=PipelineTimings(total_seconds=time.perf_counter() - t0),
        )

    def process_step(
        self, samples_8k: np.ndarray, state: LsEendState
    ) -> tuple[np.ndarray, LsEendState]:
        """One step of `step_frames` x 100 ms of 8 kHz audio."""
        need = self.step_frames * LSEEND_SAMPLE_RATE // 10
        buf = np.zeros(need, np.float32)
        buf[: min(len(samples_8k), need)] = samples_8k[:need]
        mel, _ = self.mel(jnp.asarray(buf)[None, :])
        mel = mel[:, :, : self.step_frames * self.cfg.subsample]
        feats = subsample_with_context(mel, self.cfg)
        acts, state = self._step(self.params, feats, state)
        return np.asarray(acts[0]), state

    def process(self, samples: np.ndarray, sample_rate: int = 16_000) -> DiarizationResult:
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        audio8k = resample(samples, sample_rate, LSEEND_SAMPLE_RATE)
        step_samples = self.step_frames * LSEEND_SAMPLE_RATE // 10
        state = self.make_state()
        preds = []
        for start in range(0, audio8k.size, step_samples):
            acts, state = self.process_step(audio8k[start : start + step_samples], state)
            preds.append(acts)
        activities = np.concatenate(preds) if preds else np.zeros((0, MAX_SPEAKERS))
        n_frames = min(len(activities), int(audio8k.size / (LSEEND_SAMPLE_RATE // 10)))
        segments = self._to_segments(activities[:n_frames])
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=PipelineTimings(total_seconds=time.perf_counter() - t0),
        )

    def _to_segments(
        self,
        activities: np.ndarray,
        names: dict[int, str] | None = None,
        frame_offset: int = 0,
    ) -> list[TimedSpeakerSegment]:
        segments = []
        names = names or {}
        T = len(activities)
        for s in range(MAX_SPEAKERS):
            active = activities[:, s] >= self.threshold
            start = None
            for f in range(T + 1):
                on = f < T and active[f]
                if on and start is None:
                    start = f
                elif not on and start is not None:
                    segments.append(
                        TimedSpeakerSegment(
                            speaker_id=names.get(s, f"spk{s}"),
                            start_time=(frame_offset + start) * FRAME_SECONDS,
                            end_time=(frame_offset + f) * FRAME_SECONDS,
                        )
                    )
                    start = None
        segments.sort(key=lambda x: x.start_time)
        return segments
