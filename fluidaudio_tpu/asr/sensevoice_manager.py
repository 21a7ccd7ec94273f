"""SenseVoiceManager: non-autoregressive multilingual ASR (50+ languages).

Behavioral parity: reference `SenseVoice/SenseVoiceManager.swift:4-40`:
fp32 preprocessor -> 560-d LFR feats -> SANM encoder+CTC (enumerated shape
buckets) -> greedy CTC -> strip `<|lang|>...<|task|>` tags. TPU re-design:
mel + LFR + encoder + vectorized greedy-CTC collapse are ONE jitted call per
(batch, bucket); the host only detokenizes and strips tags.
"""

from __future__ import annotations

import re
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.config import ASRResult, TokenTiming
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.models.sensevoice import (
    LFR_N,
    PROMPT_LEN,
    SENSEVOICE_SMALL,
    SenseVoiceConfig,
    SenseVoiceEncoder,
    lfr_stack,
)
from fluidaudio_tpu.models.zoo import _placeholder_vocab
from fluidaudio_tpu.ops.ctc_decode import ctc_greedy_decode
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("asr.sensevoice")

LANGUAGES = {"auto": 0, "zh": 1, "en": 2, "yue": 3, "ja": 4, "ko": 5}
_TAG_RE = re.compile(r"<\|[^|]*\|>")

# audio-length buckets in seconds (enumerated shapes, reference's buckets)
_BUCKETS_S = (5, 10, 20, 30)


class SenseVoiceManager:
    def __init__(
        self,
        config: SenseVoiceConfig | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or SENSEVOICE_SMALL
        self.encoder = SenseVoiceEncoder(self.cfg)
        # FunASR fbank: 80 mel, no normalization in-model (CMVN applied here)
        self.mel = MelFrontend(MelConfig(n_mels=80, normalize="per_feature"))
        self._fn_cache: dict[tuple[int, int], object] = {}

        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.SENSEVOICE)
        dummy_lfr = jnp.zeros((1, 16, 560), jnp.float32)
        self.params = jax.jit(self.encoder.init)(
            jax.random.PRNGKey(rng_seed), dummy_lfr,
            jnp.array([16], jnp.int32), jnp.zeros((1,), jnp.int32),
        )
        ckpt = base / "encoder.npz"
        if ckpt.exists():
            self.params = load_params(ckpt, self.params)
        else:
            logger.warning("SenseVoice: no checkpoint at %s — seeded random init", ckpt)
        vocab_file = base / "vocab.json"
        self.tokenizer = (
            Tokenizer.from_json(vocab_file)
            if vocab_file.exists()
            else Tokenizer(_placeholder_vocab(self.cfg.vocab_size))
        )

    def _pipeline(self, batch: int, n_samples: int):
        key = (batch, n_samples)
        if key not in self._fn_cache:
            def run(params, audio, lengths, lang_ids):
                mel, mel_len = self.mel(audio, lengths)
                lfr, lfr_len = lfr_stack(mel, mel_len)
                log_probs = self.encoder.apply(params, lfr, lfr_len, lang_ids)
                total_len = lfr_len + PROMPT_LEN
                tokens, frames, counts = ctc_greedy_decode(
                    log_probs, total_len, self.cfg.blank_id
                )
                return tokens, frames, counts

            self._fn_cache[key] = jax.jit(run)
        return self._fn_cache[key]

    def transcribe(
        self, audio: np.ndarray, language: str = "auto", sample_rate: int = 16_000
    ) -> ASRResult:
        t0 = time.perf_counter()
        samples = np.asarray(audio, np.float32).reshape(-1)
        duration = samples.size / sample_rate
        max_window = _BUCKETS_S[-1] * 16000
        if samples.size > max_window:
            # long-form: sequential max-bucket windows, concatenated text
            # (the non-autoregressive decode carries no cross-window state;
            # truncating silently was data loss)
            texts, timings_all = [], []
            for w0 in range(0, samples.size, max_window):
                part = self.transcribe(
                    samples[w0 : w0 + max_window], language, sample_rate
                )
                texts.append(part.text)
                shift = w0 / sample_rate
                from dataclasses import replace as _dc_replace

                timings_all.extend(
                    _dc_replace(t, start_time=t.start_time + shift,
                                end_time=t.end_time + shift)
                    for t in part.token_timings
                )
            return ASRResult(
                text=" ".join(x for x in texts if x).strip(),
                confidence=1.0,
                duration=duration,
                processing_time=time.perf_counter() - t0,
                token_timings=timings_all,
            )
        bucket_s = next((b for b in _BUCKETS_S if b * 16000 >= samples.size), _BUCKETS_S[-1])
        width = bucket_s * 16000
        padded = np.zeros(width, np.float32)
        padded[: min(samples.size, width)] = samples[:width]

        fn = self._pipeline(1, width)
        lang = LANGUAGES.get(language, 0)
        tokens, frames, counts = fn(
            self.params,
            jnp.asarray(padded)[None, :],
            jnp.array([min(samples.size, width)], jnp.int32),
            jnp.array([lang], jnp.int32),
        )
        n = int(counts[0])
        ids = [int(t) for t in np.asarray(tokens[0][:n])]
        frame_idx = np.asarray(frames[0][:n])
        raw_text = self.tokenizer.decode(ids)
        text = _TAG_RE.sub("", raw_text).strip()

        spf = LFR_N * 0.01  # seconds per LFR frame
        timings = [
            TokenTiming(
                token=self.tokenizer.piece(tid),
                token_id=tid,
                start_time=max(0.0, (int(f) - PROMPT_LEN)) * spf,
                end_time=(max(0.0, int(f) - PROMPT_LEN) + 1) * spf,
                confidence=1.0,
            )
            for tid, f in zip(ids, frame_idx)
            # keep timings aligned with the returned text: the <|lang|>/
            # <|event|>/... prompt-slot tags are stripped from it
            if not _TAG_RE.fullmatch(self.tokenizer.piece(tid) or "")
        ]
        return ASRResult(
            text=text,
            confidence=1.0,
            duration=duration,
            processing_time=time.perf_counter() - t0,
            token_timings=timings,
        )
