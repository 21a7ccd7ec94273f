"""Supertonic3Manager: 31-language 44.1 kHz TTS with flow matching + CFG.

Behavioral parity: reference `Supertonic3/Supertonic3Manager.swift:36` +
Synthesizer/LatentSampler/TextChunker/UnicodeProcessor: 4 stages, unicode
tokenization, per-voice style JSON, sentence chunking for long text.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.kokoro import expand_durations
from fluidaudio_tpu.models.supertonic3 import (
    HOP,
    LATENT_DIM,
    SAMPLE_RATE,
    SUPERTONIC3_BASE,
    Supertonic3Config,
    Supertonic3Estimator,
    Supertonic3Text,
    Supertonic3Vocoder,
    unicode_tokenize,
)
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("tts.supertonic3")


@dataclass
class Supertonic3Result:
    samples: np.ndarray
    sample_rate: int


def chunk_text(text: str, max_chars: int) -> list[str]:
    """TextChunker: sentence-boundary packing."""
    parts = re.split(r"(?<=[.!?;])\s+", text.strip())
    chunks, cur = [], ""
    for p in parts:
        if cur and len(cur) + len(p) + 1 > max_chars:
            chunks.append(cur)
            cur = p
        else:
            cur = f"{cur} {p}".strip()
    if cur:
        chunks.append(cur)
    return chunks


class Supertonic3Manager:
    def __init__(
        self,
        config: Supertonic3Config | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or SUPERTONIC3_BASE
        cfg = self.cfg
        self.text_model = Supertonic3Text(cfg)
        self.estimator = Supertonic3Estimator(cfg)
        self.vocoder = Supertonic3Vocoder(cfg)

        k = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        self.params = {
            "text": jax.jit(self.text_model.init)(
                k[0], jnp.zeros((1, cfg.max_tokens), jnp.int32),
                jnp.zeros((1, cfg.style_dim)), jnp.array([cfg.max_tokens], jnp.int32),
            ),
            "estimator": jax.jit(self.estimator.init)(
                k[1], jnp.zeros((1, cfg.max_tokens, cfg.d_model)),
                jnp.zeros((1, cfg.max_frames), jnp.int32),
                jnp.zeros((1, cfg.style_dim)),
                jnp.zeros((1, cfg.max_frames, LATENT_DIM)),
            ),
            "vocoder": jax.jit(self.vocoder.init)(
                k[2], jnp.zeros((1, cfg.max_frames, LATENT_DIM)),
                jnp.array([cfg.max_frames], jnp.int32),
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.SUPERTONIC3)
        for part in self.params:
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
        self.voices = self._load_voices(base)
        self._text_fn = jax.jit(self.text_model.apply)
        self._est_fn = jax.jit(self.estimator.apply)
        self._voc_fn = jax.jit(self.vocoder.apply)

    def _load_voices(self, base: Path) -> dict[str, np.ndarray]:
        f = base / "voices.json"
        if f.exists():
            raw = json.loads(f.read_text())
            return {k: np.asarray(v, np.float32) for k, v in raw.items()}
        rng = np.random.RandomState(11)
        return {
            name: rng.randn(self.cfg.style_dim).astype(np.float32) * 0.1
            for name in ("sara", "marcus")
        }

    @property
    def available_voices(self) -> list[str]:
        return sorted(self.voices)

    def synthesize(self, text: str, voice: str = "sara", seed: int = 0
                   ) -> Supertonic3Result:
        style = self.voices.get(voice)
        if style is None:
            raise KeyError(f"unknown voice {voice!r}; available {self.available_voices}")
        style = style[None, :]
        pieces = []
        for ci, chunk in enumerate(chunk_text(text, self.cfg.max_tokens - 2)):
            ids = unicode_tokenize(chunk, self.cfg.vocab_size, self.cfg.max_tokens)
            n = max(1, len(ids))
            tokens = np.zeros((1, self.cfg.max_tokens), np.int32)
            tokens[0, : len(ids)] = ids
            log_dur, latents = self._text_fn(
                self.params["text"], jnp.asarray(tokens), jnp.asarray(style),
                jnp.asarray([n], jnp.int32),
            )
            durations = np.exp(np.asarray(log_dur[0][:n]))
            frame_tokens, total = expand_durations(durations, self.cfg.max_frames)
            noise = jax.random.normal(
                jax.random.PRNGKey(seed + ci), (1, self.cfg.max_frames, LATENT_DIM)
            )
            z = self._est_fn(
                self.params["estimator"], latents, jnp.asarray(frame_tokens)[None],
                jnp.asarray(style), noise,
            )
            audio = self._voc_fn(self.params["vocoder"], z, jnp.asarray([total], jnp.int32))
            pieces.append(np.asarray(audio[0][: total * HOP]))
        samples = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        return Supertonic3Result(samples=samples, sample_rate=SAMPLE_RATE)
