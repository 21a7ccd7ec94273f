"""ParaformerManager: non-autoregressive Mandarin ASR.

Behavioral parity: reference `Paraformer/ParaformerManager.swift:10` +
`ParaformerCif.swift`. One jitted program: mel -> LFR -> SANM encoder -> CIF
-> parallel decoder -> argmax tokens.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.config import ASRResult
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.models.paraformer import PARAFORMER_LARGE, Paraformer, ParaformerConfig
from fluidaudio_tpu.models.sensevoice import lfr_stack
from fluidaudio_tpu.models.zoo import _placeholder_vocab
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("asr.paraformer")

_BUCKETS_S = (5, 10, 20, 30)


class ParaformerManager:
    def __init__(
        self,
        config: ParaformerConfig | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or PARAFORMER_LARGE
        self.model = Paraformer(self.cfg)
        self.mel = MelFrontend(MelConfig(n_mels=80, normalize="per_feature"))
        self._fn_cache: dict[int, object] = {}

        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.PARAFORMER)
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, 16, 560), jnp.float32),
            jnp.array([16], jnp.int32),
        )
        ckpt = base / "model.npz"
        if ckpt.exists():
            self.params = load_params(ckpt, self.params)
        else:
            logger.warning("Paraformer: no checkpoint at %s — seeded random init", ckpt)
        vocab_file = base / "vocab.json"
        self.tokenizer = (
            Tokenizer.from_json(vocab_file)
            if vocab_file.exists()
            else Tokenizer(_placeholder_vocab(self.cfg.vocab_size))
        )

    def _pipeline(self, n_samples: int):
        if n_samples not in self._fn_cache:
            def run(params, audio, lengths):
                mel, mel_len = self.mel(audio, lengths)
                lfr, lfr_len = lfr_stack(mel, mel_len)
                logits, counts = self.model.apply(params, lfr, lfr_len)
                tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tokens, counts

            self._fn_cache[n_samples] = jax.jit(run)
        return self._fn_cache[n_samples]

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16_000) -> ASRResult:
        t0 = time.perf_counter()
        samples = np.asarray(audio, np.float32).reshape(-1)
        duration = samples.size / sample_rate
        max_window = _BUCKETS_S[-1] * 16000
        if samples.size > max_window:
            # long-form: sequential max-bucket windows, concatenated text
            # (CIF decode carries no cross-window state; truncating silently
            # was data loss)
            texts = [
                self.transcribe(samples[w0 : w0 + max_window], sample_rate).text
                for w0 in range(0, samples.size, max_window)
            ]
            return ASRResult(
                text="".join(texts).strip(),
                confidence=1.0,
                duration=duration,
                processing_time=time.perf_counter() - t0,
            )
        bucket_s = next((b for b in _BUCKETS_S if b * 16000 >= samples.size), _BUCKETS_S[-1])
        width = bucket_s * 16000
        padded = np.zeros(width, np.float32)
        padded[: min(samples.size, width)] = samples[:width]
        fn = self._pipeline(width)
        tokens, counts = fn(
            self.params,
            jnp.asarray(padded)[None, :],
            jnp.array([min(samples.size, width)], jnp.int32),
        )
        n = int(counts[0])
        ids = [int(t) for t in np.asarray(tokens[0][:n])]
        text = self.tokenizer.decode(ids)
        return ASRResult(
            text=text,
            confidence=1.0,
            duration=duration,
            processing_time=time.perf_counter() - t0,
        )
