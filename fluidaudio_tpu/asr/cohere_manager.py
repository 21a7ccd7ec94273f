"""CoherePipeline: encoder-decoder multilingual ASR manager (14 languages).

Behavioral parity: reference `Cohere/CoherePipeline.swift:5-80`: own mel
(natural log + CMVN ddof=1), 35 s per-call cap, external-KV-cache greedy
decode with repetition penalty + no-repeat-ngram, byte-fallback detokenize.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.config import ASRResult
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.models.cohere_asr import (
    COHERE_BASE,
    CohereConfig,
    CohereDecoderStep,
    CohereEncoder,
    cohere_greedy_decode,
)
from fluidaudio_tpu.models.zoo import _placeholder_vocab
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("asr.cohere")

MAX_CALL_SECONDS = 35.0
OVERLAP_SECONDS = 5.0  # CohereAsrConfig.chunkOverlapSeconds (hop = 30 s)


class CoherePipeline:
    def __init__(
        self,
        config: CohereConfig | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or COHERE_BASE
        self.encoder = CohereEncoder(self.cfg)
        self.decoder = CohereDecoderStep(self.cfg)
        # natural-log mel with per-feature CMVN (ddof=1) and fmax 8000
        # (reference CohereMelSpectrogram, CohereAsrConfig.MelSpec)
        self.mel = MelFrontend(MelConfig(
            n_mels=self.cfg.n_mels, normalize="per_feature", f_max=8000.0))
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.COHERE)

        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        T0 = 32
        mel0 = jnp.zeros((1, self.cfg.n_mels, T0), jnp.float32)
        self.enc_params = jax.jit(self.encoder.init)(k1, mel0, jnp.array([T0], jnp.int32))
        enc0, mask0 = self.encoder.apply(self.enc_params, mel0, jnp.array([T0], jnp.int32))
        L, H, Dh = self.cfg.n_decoder_layers, self.cfg.n_heads, self.cfg.head_dim
        M = self.cfg.max_decode_tokens
        self.dec_params = jax.jit(self.decoder.init)(
            k2,
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((L, 1, M, H, Dh), self.cfg.compute_dtype),
            jnp.zeros((L, 1, M, H, Dh), self.cfg.compute_dtype),
            enc0,
            mask0,
        )
        for name, attr in (("encoder", "enc_params"), ("decoder", "dec_params")):
            f = base / f"{name}.npz"
            if f.exists():
                setattr(self, attr, load_params(f, getattr(self, attr)))
        vocab_file = base / "vocab.json"
        self.tokenizer = (
            Tokenizer.from_json(vocab_file)
            if vocab_file.exists()
            else Tokenizer(_placeholder_vocab(self.cfg.vocab_size))
        )
        self._fn_cache: dict[int, object] = {}

    def _pipeline(self, n_samples: int):
        if n_samples not in self._fn_cache:
            def run(enc_params, dec_params, audio, lengths):
                mel, mel_len = self.mel(audio, lengths)
                mel = mel[:, :, : self.cfg.max_audio_frames]
                mel_len = jnp.minimum(mel_len, self.cfg.max_audio_frames)
                enc, enc_mask = self.encoder.apply(enc_params, mel, mel_len)

                def step(token, pos, k, v, e, m):
                    return self.decoder.apply(dec_params, token, pos, k, v, e, m)

                return cohere_greedy_decode(self.cfg, step, enc, enc_mask)

            self._fn_cache[n_samples] = jax.jit(run)
        return self._fn_cache[n_samples]

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16_000) -> ASRResult:
        t0 = time.perf_counter()
        samples = np.asarray(audio, np.float32).reshape(-1)
        duration = samples.size / sample_rate
        # per-call cap: min(35 s, the model's max audio frames)
        cap = min(
            int(MAX_CALL_SECONDS * sample_rate), (self.cfg.max_audio_frames - 1) * 160
        )
        width = min(cap, max(16_000, 1 << int(np.ceil(np.log2(max(1, samples.size))))))
        width = min(width, cap)
        fn = self._pipeline(width)
        # long-form: 35 s windows with 5 s overlap (hop 30 s), token-level
        # overlap dedup at the seams (reference CoherePipeline.swift:541-574)
        hop = max(1, cap - int(OVERLAP_SECONDS * sample_rate))
        merged: list[int] = []
        for start in range(0, max(1, samples.size - int(samples.size > cap)), hop):
            seg = samples[start : start + cap]
            if seg.size == 0:
                break
            padded = np.zeros(width, np.float32)
            padded[: min(seg.size, width)] = seg[:width]
            result = fn(
                self.enc_params,
                self.dec_params,
                jnp.asarray(padded)[None, :],
                jnp.array([min(seg.size, width)], jnp.int32),
            )
            n = int(result.counts[0])
            ids = [int(t) for t in np.asarray(result.tokens[0][:n])
                   if int(t) not in (self.cfg.bos_id, self.cfg.eos_id,
                                     self.cfg.pad_id)]
            merged = self._merge_tokens(merged, ids)
            if start + cap >= samples.size:
                break
        return ASRResult(
            text=self.tokenizer.decode(merged).strip(),
            confidence=1.0,
            duration=duration,
            processing_time=time.perf_counter() - t0,
        )

    @staticmethod
    def _merge_tokens(prev: list[int], new: list[int]) -> list[int]:
        return merge_token_streams(prev, new)


def merge_token_streams(
    prefix: list[int],
    suffix: list[int],
    window_tokens: int = 32,
    min_match: int = 4,
) -> list[int]:
    """Merge adjacent chunk token streams by longest common substring.

    Both chunks re-decode ~5 s of identical seam audio; search a bounded
    window (last/first `window_tokens`) for the longest common run. On a hit
    of length >= `min_match`, keep the prefix as-is and drop the suffix's
    matched head; on a miss concatenate plainly — better to duplicate a few
    tokens than to lose content (ref `CoherePipeline.swift:592-634`).
    """
    if not prefix:
        return list(suffix)
    if not suffix:
        return list(prefix)
    p_tail = prefix[-window_tokens:]
    s_head = suffix[:window_tokens]
    m, n = len(p_tail), len(s_head)
    dp = [0] * (n + 1)
    best_len = 0
    best_s_end = 0  # exclusive end index in s_head
    for i in range(1, m + 1):
        prev_diag = 0
        for j in range(1, n + 1):
            temp = dp[j]
            if p_tail[i - 1] == s_head[j - 1]:
                dp[j] = prev_diag + 1
                if dp[j] > best_len:
                    best_len = dp[j]
                    best_s_end = j
            else:
                dp[j] = 0
            prev_diag = temp
    if best_len < min_match:
        return list(prefix) + list(suffix)
    return list(prefix) + list(suffix[best_s_end:])
