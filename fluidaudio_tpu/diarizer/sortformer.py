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
    streaming_scan_program,
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
        # fused single-dispatch programs (mel folded in; cached per shape)
        self._scan_cache: dict[int, object] = {}
        self._offline_fused_cache: dict[int, object] = {}
        # persistent streaming session: the spkcache/FIFO state carries
        # enrolled-speaker identity across calls (ref enrollSpeaker,
        # `SortformerDiarizer.swift:225-380`)
        self._session_state = init_state(self.cfg, 1)
        self._session_frames = 0
        self._slot_names: dict[int, str] = {}
        # multichip serving: offline window batches shard over the mesh
        # 'data' axis (SURVEY §2.10 batch-axis-as-worker-pool)
        self._mesh = None
        self._sharded_params = None

    def set_mesh(self, mesh) -> None:
        """Enable (or with None disable) mesh-sharded offline diarization:
        the fused windows program constrains its on-device window axis to
        the mesh 'data' axis, so mel + encoder + transformer run SPMD across
        chips; stitching/segments are bit-identical to single-device
        (tests/test_multichip.py). Mirrors AsrManager.set_mesh."""
        if mesh is None:
            self._mesh = None
            self._sharded_params = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            self._mesh = mesh
            self._sharded_params = jax.device_put(
                self.params, NamedSharding(mesh, PartitionSpec())
            )
        # fused programs bake the sharding constraint in: rebuild
        self._offline_fused_cache.clear()

    def _stream_scan(self, n_chunks: int):
        """One jit for a whole recording: raw chunk buffers [N, chunk_samples]
        -> batched mel -> batched encoder -> lax.scan transformer/state."""
        if n_chunks not in self._scan_cache:
            mel_frames = self.cfg.chunk_frames * 8

            def run(params, chunk_audio, state):
                mel, _ = self.mel(chunk_audio)  # [N, n_mels, T] rows independent
                mel = mel[:, :, :mel_frames]
                return streaming_scan_program(self.model, params, mel, state, self.cfg)

            self._scan_cache[n_chunks] = jax.jit(run)
        return self._scan_cache[n_chunks]

    def _offline_fused(self, n_windows: int, step: int, window_samples: int):
        """One jit for all of a recording's 30.72 s windows: FLAT audio
        [(n_windows+1)*step] -> on-device overlapped windowing (pure
        reshape/slice, no gather) -> batched mel -> one fused
        encoder+transformer pass -> preds [W, 384, 4].

        Shipping the flat waveform instead of pre-cut windows avoids the
        ~17% overlap duplication and the host packing loop; int16 input is
        upcast on device, halving the host->device transfer for PCM sources
        (the dominant end-to-end cost through a remote link)."""
        key = (n_windows, step, window_samples)
        if key not in self._offline_fused_cache:
            overlap = window_samples - step

            mesh = self._mesh

            def run(params, flat):
                x = flat.astype(jnp.float32)
                if jnp.issubdtype(flat.dtype, jnp.integer):  # trace-time branch
                    x = x / 32768.0
                base = x[: n_windows * step].reshape(n_windows, step)
                tails = x[step : (n_windows + 1) * step].reshape(n_windows, step)[
                    :, :overlap
                ]
                windows = jnp.concatenate([base, tails], axis=1)
                if mesh is not None:
                    # shard the on-device window axis over the mesh: mel +
                    # encoder + transformer run SPMD, one window group/chip
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    windows = jax.lax.with_sharding_constraint(
                        windows, NamedSharding(mesh, P("data", None)))
                mel, _ = self.mel(windows)
                mel = mel[:, :, :OFFLINE_WINDOW_MEL]
                return self.model.apply(params, mel)

            self._offline_fused_cache[key] = jax.jit(run)
        return self._offline_fused_cache[key]

    # -------------------------------------------------------------- streaming

    def make_state(self, batch: int = 1) -> SortformerState:
        return init_state(self.cfg, batch)

    # ------------------------------------------------------------- enrollment

    @property
    def speaker_names(self) -> dict[int, str]:
        return dict(self._slot_names)

    def reset_session(self) -> None:
        """Clear the persistent streaming state AND enrolled identities."""
        self._session_state = init_state(self.cfg, 1)
        self._session_frames = 0
        self._slot_names = {}

    def enroll_speaker(
        self,
        samples: np.ndarray,
        name: str | None = None,
        overwrite_assigned_name: bool = True,
    ) -> str | None:
        """Prime the spkcache with a known speaker's audio and name the slot
        the model assigns it (ref `SortformerDiarizer.swift:225-380`).

        The enrollment audio flows through the normal streaming path so the
        speaker cache retains the identity; the frame clock resets so
        subsequent streaming starts at time zero. Returns the assigned name,
        or None when there isn't at least one full chunk of audio, no slot
        shows speech, or the best slot is already named and
        `overwrite_assigned_name` is False.
        """
        samples = np.asarray(samples, np.float32).reshape(-1)
        chunk_samples = self.cfg.chunk_frames * 1280
        if samples.size < chunk_samples:
            logger.warning(
                "enroll: need >= %.2f s of audio, got %.2f s",
                chunk_samples / SAMPLE_RATE, samples.size / SAMPLE_RATE,
            )
            return None
        speech_frames = np.zeros(NUM_SPEAKERS, np.int64)
        for start in range(0, samples.size - chunk_samples + 1, chunk_samples):
            preds, self._session_state = self.process_chunk(
                samples[start : start + chunk_samples], self._session_state
            )
            speech_frames += (preds >= self.threshold).sum(axis=0)
        best = int(np.argmax(speech_frames))
        if speech_frames[best] == 0:
            logger.warning("enroll: no speech detected — speaker not enrolled")
            self._session_frames = 0
            return None
        if best in self._slot_names and not overwrite_assigned_name:
            logger.warning(
                "enroll: diarizer matched existing speaker %r at slot %d and "
                "overwrite_assigned_name=False", self._slot_names[best], best,
            )
            self._session_frames = 0
            return None
        assigned = name or f"Speaker {best + 1}"
        self._slot_names[best] = assigned
        self._session_frames = 0
        return assigned

    def process_stream(self, samples: np.ndarray) -> DiarizationResult:
        """Streaming pass that CONTINUES the persistent session (state +
        enrolled names + frame clock), unlike `process` which is
        one-shot-per-recording."""
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        chunk_samples = self.cfg.chunk_frames * 1280
        preds_list = []
        for start in range(0, max(1, samples.size), chunk_samples):
            preds, self._session_state = self.process_chunk(
                samples[start : start + chunk_samples], self._session_state
            )
            preds_list.append(preds)
            if start + chunk_samples >= samples.size:
                break
        preds = (
            np.concatenate(preds_list)
            if preds_list
            else np.zeros((0, NUM_SPEAKERS), np.float32)
        )
        n_frames = min(len(preds), int(np.ceil(samples.size / 1280)))
        segments = self._preds_to_segments(
            preds[:n_frames],
            names=self._slot_names,
            frame_offset=self._session_frames,
        )
        self._session_frames += n_frames
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=PipelineTimings(total_seconds=time.perf_counter() - t0),
        )

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
        """Streaming-semantics pass over a whole recording as ONE device
        dispatch: all chunks' mel + encoder run batched, the stateful
        transformer/cache updates run in `lax.scan` (chunk counts bucketed
        to powers of two for jit-cache reuse; the causal scan makes pad
        chunks harmless)."""
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        chunk_samples = self.cfg.chunk_frames * 1280
        n_chunks = max(1, -(-samples.size // chunk_samples))
        bucket = 1 << (n_chunks - 1).bit_length()
        buf = np.zeros((bucket, chunk_samples), np.float32)
        flat = buf.reshape(-1)
        flat[: samples.size] = samples
        fn = self._stream_scan(bucket)
        preds, _ = fn(self.params, jnp.asarray(buf), self.make_state())
        preds = np.asarray(preds).reshape(-1, NUM_SPEAKERS)
        n_frames = min(n_chunks * self.cfg.chunk_frames,
                       int(np.ceil(samples.size / 1280)))
        segments = self._preds_to_segments(preds[:n_frames])
        timings = PipelineTimings(total_seconds=time.perf_counter() - t0)
        return DiarizationResult(
            segments=segments,
            speaker_count=len({s.speaker_id for s in segments}),
            timings=timings,
        )

    # ---------------------------------------------------------------- offline

    def process_offline(self, samples: np.ndarray) -> DiarizationResult:
        """Fused 30.72 s windows + speaker stitching across windows.

        ALL of a recording's windows run as one batched device call (window
        count bucketed to powers of two) — mel, encoder, and transformer in a
        single jit — instead of the reference's two CoreML dispatches per
        window (`OfflineSortformerDiarizer.swift:215`)."""
        t0 = time.perf_counter()
        samples = np.asarray(samples).reshape(-1)
        if samples.dtype not in (np.float32, np.int16):
            samples = samples.astype(np.float32)
        window_samples = OFFLINE_WINDOW_MEL * 160
        overlap_frames = 64  # ~5 s of 80 ms frames for identity matching
        step = window_samples - overlap_frames * 1280

        starts: list[int] = []
        sizes: list[int] = []
        for start in range(0, max(1, samples.size), max(1, step)):
            seg_size = max(0, min(samples.size - start, window_samples))
            if seg_size < 16000 and starts:
                break
            starts.append(start)
            sizes.append(seg_size)
            if start + window_samples >= samples.size:
                break

        W = len(starts)
        bucket = 1 << (W - 1).bit_length()
        flat = np.zeros((bucket + 1) * step, samples.dtype)
        flat[: min(samples.size, flat.size)] = samples[: flat.size]
        fn = self._offline_fused(bucket, step, window_samples)
        params = self._sharded_params if self._mesh is not None else self.params
        preds_all = np.asarray(fn(params, jnp.asarray(flat)))

        windows = []
        for i, (start, size) in enumerate(zip(starts, sizes)):
            n_valid = min(preds_all.shape[1], int(np.ceil(size / 1280)))
            windows.append((start // 1280, preds_all[i, :n_valid]))

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

    def _preds_to_segments(
        self,
        preds: np.ndarray,
        names: dict[int, str] | None = None,
        frame_offset: int = 0,
    ) -> list[TimedSpeakerSegment]:
        segments: list[TimedSpeakerSegment] = []
        names = names or {}
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
                            speaker_id=names.get(s, f"spk{s}"),
                            start_time=(frame_offset + start) * FRAME_SECONDS,
                            end_time=(frame_offset + f) * FRAME_SECONDS,
                        )
                    )
                    start = None
        segments.sort(key=lambda x: x.start_time)
        return segments
