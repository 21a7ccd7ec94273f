"""AsrManager: public batch transcription API (Parakeet TDT family).

Behavioral parity: reference `TDT/AsrManager.swift:6,353-501` (transcribe from
array/URL with disk-backed auto-switch over `streamingThreshold`),
`AsrManager+Pipeline.swift:6-91` (mel -> encoder -> TDT decode), and
`ChunkProcessor.process` (long-form windows + merge). TPU re-design: the
reference's worker pool of 4 cloned managers becomes a window batch axis in
ONE jitted pipeline; per-token CoreML round-trips become a single
`lax.while_loop` (ops/tdt_decode.py).

Static-shape discipline: audio is padded into a small set of sample-width
buckets so jit caches stay warm; per-row valid lengths mask the padding.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.chunk import (
    ChunkProcessor,
    TokenWindow,
    case_variant_canonical_ids,
    splice_safe_token_ids,
)
from fluidaudio_tpu.asr.config import ASRConfig, ASRResult, TokenTiming
from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.asr.sequence_matcher import remove_duplicate_token_sequence
from fluidaudio_tpu.models.zoo import AsrModels
from fluidaudio_tpu.ops.tdt_decode import (
    TdtDecodeConfig,
    TdtDecodeState,
    make_initial_state,
    tdt_greedy_decode,
)
from fluidaudio_tpu.utils.audio_source import ArrayAudioSource, AudioSampleSource, make_audio_source
from fluidaudio_tpu.utils.converter import AudioConverter
from fluidaudio_tpu.utils.logging import get_logger
from fluidaudio_tpu.utils.timing import PerformanceMetrics, ProgressEmitter

logger = get_logger("asr")

# short-audio sample-width buckets (seconds: 1, 2, 4, 8, 15)
_BUCKETS = (16_000, 32_000, 64_000, 128_000, 240_000)


def _copy_raw(source: AudioSampleSource, start: int, count: int) -> np.ndarray:
    """Dtype-preserving read; falls back to the f32 contract for custom
    sources that predate `copy_samples_raw`."""
    fn = getattr(source, "copy_samples_raw", None)
    return fn(start, count) if fn is not None else source.copy_samples(start, count)


class AsrManager:
    def __init__(self, models: AsrModels, config: ASRConfig | None = None):
        self.models = models
        self.config = config or ASRConfig()
        self.converter = AudioConverter()
        self._pipeline_cache: dict[tuple, Any] = {}
        self._language_masks: dict[str, np.ndarray] = {}
        vocab = models.tokenizer.vocabulary
        self._splice_safe = splice_safe_token_ids(vocab)
        self._case_canon = case_variant_canonical_ids(vocab)
        # per-session progress stream for long transcriptions (reference
        # ProgressEmitter wiring, AsrManager.swift:101-107)
        self.progress = ProgressEmitter()
        # multichip serving: long-form window batches shard over this mesh's
        # 'data' axis (SURVEY §2.10: the reference's worker pool of cloned
        # managers, ChunkProcessor.swift:397-632, becomes a sharded batch
        # dimension — XLA partitions one program over the chips)
        self._mesh = None
        self._sharded_params = None

    def set_mesh(self, mesh) -> None:
        """Enable (or with None disable) mesh-sharded long-form decoding.

        Each window group is device_put with the batch row sharded over the
        mesh's 'data' axis and params replicated; the SAME jitted pipeline
        then runs SPMD across chips and the merge is bit-identical to the
        single-device path (guarded by tests/test_multichip.py).
        """
        if mesh is None:
            self._mesh = None
            self._sharded_params = None
            return
        from jax.sharding import NamedSharding, PartitionSpec

        n_data = mesh.shape["data"]
        if self.config.parallel_chunk_batch % n_data:
            raise ValueError(
                f"parallel_chunk_batch={self.config.parallel_chunk_batch} "
                f"must be a multiple of the mesh data axis ({n_data})"
            )
        self._mesh = mesh
        self._sharded_params = jax.device_put(
            self.models.params, NamedSharding(mesh, PartitionSpec())
        )

    # ------------------------------------------------------------- pipeline

    @property
    def _decode_cfg(self) -> TdtDecodeConfig:
        tdt = self.config.tdt
        return TdtDecodeConfig(
            blank_id=self.models.blank_id,
            durations=tdt.durations,
            max_symbols_per_step=tdt.max_symbols_per_step,
            max_tokens=tdt.max_tokens_per_chunk,
            consecutive_blank_limit=tdt.consecutive_blank_limit,
        )

    def build_pipeline(self, batch: int, language: str | None = None,
                       stateful: bool = False):
        """Raw (unjitted) pipeline fn(params, audio [B,W], lengths [B],
        finalize=None) — with `stateful=True`, fn(params, audio, lengths,
        decoder_state, finalize=None) so a caller-held carry continues
        across calls (reference `AsrManager.transcribe(decoderState:)`).
        `finalize` is an optional [B] bool mask of rows decoding their
        utterance's LAST chunk; those run the reference's last-chunk
        finalization flush (`TdtDecoderV3.swift:469-578`).

        `language` enables decode-time script filtering + English blocklist
        (reference `TdtDecoderV3.swift:33-78`): the vocab mask is baked into
        the compiled program as a constant.
        """
        models = self.models
        dcfg = self._decode_cfg
        pcfg = models.spec.predictor
        allowed_mask = (
            jnp.asarray(self._language_mask(language)) if language else None
        )

        def run(params, audio, lengths, state, finalize=None):
            if jnp.issubdtype(audio.dtype, jnp.integer):
                # int16 PCM shipped raw; upcast on device (half the
                # host->device bytes — same contract as VAD/sortformer)
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            mel, mel_len = models.mel(audio, lengths)
            enc_out, enc_len = models.encoder.apply(params["encoder"], mel, mel_len)

            def predictor_step(tokens, h, c):
                return models.predictor.apply(params["predictor"], tokens, h, c)

            def joint_logits(f, g):
                return models.joint.apply(params["joint"], f, g)

            result = tdt_greedy_decode(
                dcfg, predictor_step, joint_logits, enc_out, enc_len, state,
                allowed_mask=allowed_mask, finalize_mask=finalize,
            )
            return result, enc_len

        if stateful:
            return run

        def pipeline(params, audio, lengths, finalize=None):
            state = make_initial_state(dcfg, pcfg.n_layers, pcfg.pred_hidden, batch)
            return run(params, audio, lengths, state, finalize)

        return pipeline

    def _language_mask(self, language: str) -> np.ndarray:
        """[vocab+1] bool: tokens allowed for `language` (script match minus
        English blocklist; blank allowed slot is ignored by the filter)."""
        if language not in self._language_masks:
            from fluidaudio_tpu.utils.language import TokenLanguageFilter

            vocab = dict(self.models.tokenizer.vocabulary)  # {id: piece}
            filt = TokenLanguageFilter(language, vocab)
            n = self.models.blank_id + 1
            mask = np.zeros((n,), bool)
            for tid in filt.allowed:
                if tid < n:
                    mask[tid] = True
            self._language_masks[language] = mask
        return self._language_masks[language]

    def _get_pipeline(self, batch: int, window_samples: int,
                      language: str | None = None):
        key = (batch, window_samples, language)
        if key not in self._pipeline_cache:
            self._pipeline_cache[key] = jax.jit(self.build_pipeline(batch, language))
            logger.info("jit ASR pipeline batch=%d window=%d lang=%s",
                        batch, window_samples, language)
        return self._pipeline_cache[key]

    def warmup(self, batch: int | None = None, window_samples: int | None = None) -> None:
        """Pre-compile the long-form pipeline (reference ModelWarmup analog)."""
        b = batch or self.config.parallel_chunk_batch
        cp = ChunkProcessor(ArrayAudioSource(np.zeros(1, np.float32)))
        w = window_samples or cp.chunk_layout(self.config.mel_chunk_context).window_samples
        fn = self._get_pipeline(b, w)
        audio = jnp.zeros((b, w), jnp.float32)
        lengths = jnp.full((b,), w, jnp.int32)
        res, _ = fn(self.models.params, audio, lengths, jnp.zeros((b,), bool))
        jax.block_until_ready(res.tokens)

    # ------------------------------------------------------------ transcribe

    def transcribe(
        self,
        audio: np.ndarray | str | Path,
        sample_rate: int | None = None,
        language: str | None = None,
        decoder_state=None,
        previous_tokens: list[int] | None = None,
        finalize: bool = True,
    ) -> ASRResult:
        """Transcribe an array or file.

        `finalize=True` (the default — reference single-chunk calls are
        "always first and last", `AsrManager+Transcription.swift:23`) runs
        the decoder's last-chunk flush; streaming callers decoding an
        intermediate window pass False (reference
        `SlidingWindowAsrManager.swift:409` `isLastChunk: isLastWindow`).

        `language` enables decode-time script filtering (reference
        `AsrManager.transcribe(..., language:)`); `decoder_state` lets the
        caller carry TDT decoder state across calls (reference
        `decoderState:` parameter) — the updated state is returned on
        `ASRResult.decoder_state`. `previous_tokens` are the tail token IDs
        of the preceding sequential chunk: boundary-duplicated tokens are
        dropped from this result's head (reference
        `AsrManager+Transcription.swift:79-88` / `previousTokens:`).
        """
        t_start = time.perf_counter()
        if isinstance(audio, (str, Path)):
            source = make_audio_source(
                audio, disk_backed_threshold=self.config.streaming_threshold
            )
        else:
            samples = np.asarray(audio)
            if samples.dtype != np.int16:  # int16 PCM rides raw to the device
                samples = samples.astype(np.float32)
            samples = samples.reshape(-1)
            if sample_rate and sample_rate != self.config.sample_rate:
                if samples.dtype == np.int16:
                    samples = samples.astype(np.float32) / 32768.0
                samples = self.converter.resample_buffer(samples, sample_rate)
            source = ArrayAudioSource(samples)

        n = source.sample_count
        duration = n / self.config.sample_rate
        if n < ASRConstants.minimum_required_samples():
            # echo the caller's carry unchanged — nothing was decoded
            result = ASRResult("", 0.0, duration, time.perf_counter() - t_start)
            result.decoder_state = decoder_state
            return result

        if n <= ASRConstants.MAX_MODEL_SAMPLES:
            tokens, final_state = self._transcribe_single(
                source, language, decoder_state, finalize
            )
        else:
            if decoder_state is not None:
                # parallel chunked windows have no sequential carry to thread
                # the state through (reference `decoderState:` applies to the
                # single-window path). The reference never accepts-then-resets
                # a carry; doing so silently would corrupt a caller's
                # cross-call continuity assumption, so refuse loudly.
                raise ValueError(
                    "decoder_state cannot be carried through the chunked "
                    f"long-form path (>{ASRConstants.MAX_MODEL_SAMPLES} "
                    "samples): windows decode in parallel with no sequential "
                    "carry. Split the audio yourself or drop decoder_state."
                )
            tokens, final_state = self._transcribe_chunked(source, language, finalize)

        if previous_tokens:
            _, removed = self.remove_duplicate_token_sequence(
                previous_tokens, [t.token for t in tokens]
            )
            tokens = tokens[removed:]
        tokens = ChunkProcessor(source).collapse_seam_word_duplicates(
            tokens, self.models.tokenizer.vocabulary
        )
        result = self._assemble_result(tokens, duration, t_start)
        result.decoder_state = final_state
        return result

    def _transcribe_single(
        self, source: AudioSampleSource, language: str | None = None,
        decoder_state=None, finalize: bool = True,
    ) -> tuple[list[TokenWindow], Any]:
        n = source.sample_count
        width = next((b for b in _BUCKETS if b >= n), ASRConstants.MAX_MODEL_SAMPLES)
        if decoder_state is None:
            fn = self._get_pipeline(1, width, language)
        else:
            # caller-held state: decode continues from the provided carry
            fn = self._get_stateful_pipeline(1, width, language)
        audio = jnp.asarray(_copy_raw(source, 0, width))[None, :]
        lengths = jnp.array([n], jnp.int32)
        # single-chunk: always first and last (reference
        # `AsrManager+Transcription.swift:23`) -> run the finalization flush
        # unless a streaming caller marked this an intermediate window
        finalize = jnp.array([finalize], bool)
        if decoder_state is None:
            result, _ = fn(self.models.params, audio, lengths, finalize)
        else:
            result, _ = fn(self.models.params, audio, lengths, decoder_state,
                           finalize)
        return self._extract_tokens(result, row=0, frame_offset=0), result.state

    def _get_stateful_pipeline(self, batch: int, window_samples: int,
                               language: str | None = None):
        key = ("stateful", batch, window_samples, language)
        if key not in self._pipeline_cache:
            self._pipeline_cache[key] = jax.jit(
                self.build_pipeline(batch, language, stateful=True)
            )
        return self._pipeline_cache[key]

    def _transcribe_chunked(
        self, source: AudioSampleSource, language: str | None = None,
        finalize: bool = True,
    ) -> tuple[list[TokenWindow], Any]:
        cp = ChunkProcessor(source)
        layout, windows = cp.plan_windows(
            mel_chunk_context=self.config.mel_chunk_context,
            model_version=self.models.spec.name,
            prefer_silence_alignment=self.config.prefer_silence_alignment,
        )
        B = self.config.parallel_chunk_batch
        W = layout.window_samples
        fn = self._get_pipeline(B, W, language)

        merged: list[TokenWindow] = []
        n_groups = -(-len(windows) // B)
        pack_dtype = _copy_raw(source, 0, 0).dtype
        for i in range(0, len(windows), B):
            group = windows[i : i + B]
            audio = np.zeros((B, W), pack_dtype)
            lengths = np.zeros((B,), np.int32)
            fin_row = np.zeros((B,), bool)
            for r, w in enumerate(group):
                audio[r, : w.read_count] = _copy_raw(source, w.read_start, w.read_count)
                lengths[r] = w.read_count
                fin_row[r] = w.is_last and finalize  # last window runs the flush
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                row = NamedSharding(self._mesh, P("data"))
                result, _ = fn(
                    self._sharded_params,
                    jax.device_put(audio, NamedSharding(self._mesh, P("data", None))),
                    jax.device_put(lengths, row),
                    jax.device_put(fin_row, row),
                )
            else:
                result, _ = fn(self.models.params, jnp.asarray(audio),
                               jnp.asarray(lengths), jnp.asarray(fin_row))
            for r, w in enumerate(group):
                window_tokens = self._extract_tokens(result, row=r, frame_offset=w.frame_offset)
                merged = cp.merge_chunks(
                    merged, window_tokens, self._splice_safe, self._case_canon
                )
            self.progress.emit((i // B + 1) / n_groups)
        self.progress.finish_session()
        return merged, None

    def remove_duplicate_token_sequence(
        self, previous: list[int], current: list[int], max_overlap: int = 12
    ) -> tuple[list[int], int]:
        """Boundary dedup between sequential chunks (reference
        `AsrManager+TokenProcessing.swift:110-165`); see
        `sequence_matcher.remove_duplicate_token_sequence`."""
        return remove_duplicate_token_sequence(
            previous,
            current,
            punctuation_tokens=ASRConstants.PUNCTUATION_TOKENS,
            boundary_search_frames=self.config.tdt.boundary_search_frames,
            max_overlap=max_overlap,
        )

    def _extract_tokens(self, result, row: int, frame_offset: int) -> list[TokenWindow]:
        count = int(result.counts[row])
        ids = np.asarray(result.tokens[row][:count])
        times = np.asarray(result.token_times[row][:count])
        confs = np.asarray(result.confidences[row][:count])
        durs = (
            np.asarray(result.durations[row][:count])
            if result.durations is not None
            else np.zeros(count, np.int32)
        )
        return [
            TokenWindow(int(t), int(ts) + frame_offset, float(c), int(d))
            for t, ts, c, d in zip(ids, times, confs, durs)
        ]

    def _assemble_result(
        self, tokens: list[TokenWindow], duration: float, t_start: float
    ) -> ASRResult:
        tok = self.models.tokenizer
        text = tok.decode([t.token for t in tokens])
        confidence = float(np.mean([t.confidence for t in tokens])) if tokens else 0.0
        spf = ASRConstants.SECONDS_PER_ENCODER_FRAME
        # TDT emission-delay correction: tokens surface ~1 encoder frame
        # after the acoustic event (reference
        # `AsrManager+TokenProcessing.swift:55-70`, median +1 frame on
        # earnings22); TDT_EMISSION_DELAY_FRAMES overrides for sweeps
        delay = int(os.environ.get("TDT_EMISSION_DELAY_FRAMES", "1"))
        ordered = sorted(tokens, key=lambda t: t.timestamp)
        timings = []
        for i, t in enumerate(ordered):
            start = max(0, t.timestamp - delay) * spf
            if t.duration > 0:
                end = start + max(t.duration * spf, spf)
            elif i < len(ordered) - 1:
                nxt = max(0, ordered[i + 1].timestamp - delay) * spf
                end = max(nxt, start + spf)
            else:
                end = start + spf
            timings.append(
                TokenTiming(
                    token=tok.piece(t.token).replace(
                        ASRConstants.SENTENCEPIECE_WORD_BOUNDARY, " "
                    ),
                    token_id=t.token,
                    start_time=start,
                    end_time=max(end, start + 0.001),
                    confidence=t.confidence,
                )
            )
        return ASRResult(
            text=text,
            confidence=confidence,
            duration=duration,
            processing_time=time.perf_counter() - t_start,
            token_timings=timings,
        )
