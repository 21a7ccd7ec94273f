"""KokoroManager: parallel TTS public API.

Behavioral parity: reference `KokoroAne/KokoroAneManager.swift:1-110` +
`Pipeline/KokoroAneSynthesizer.swift:17-160`: text -> phonemizer -> vocab
encode -> voice-pack style slice (by token count) -> staged synthesis ->
24 kHz WAV; <=512 IPA tokens per call with auto-chunking; per-stage timings
(`KokoroAneStageTimings`). The 7 device stages collapse into 2 jitted
programs; duration rounding stays host-side like the reference.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.kokoro import (
    HOP,
    MAX_TOKENS,
    SAMPLE_RATE,
    STYLE_DIM,
    KokoroAudioProgram,
    KokoroConfig,
    KokoroTextProgram,
    expand_durations,
)
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.tts.audio_post import AudioPostProcessor
from fluidaudio_tpu.tts.g2p import EnglishG2P
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("tts.kokoro")

# IPA character vocabulary (index 0 = pad)
_IPA_CHARS = (
    " abcdefghijklmnopqrstuvwxyz"
    "ɑæʌɔəɛɝɪʊʉθðʃʒŋɹɾdʒtʃeɪaʊoʊɔɪˈˌː"
    ".,!?;:'- "
)


@dataclass
class KokoroStageTimings:
    g2p_seconds: float = 0.0
    text_seconds: float = 0.0
    audio_seconds: float = 0.0
    post_seconds: float = 0.0


@dataclass
class KokoroSynthesisResult:
    samples: np.ndarray  # f32 @ 24 kHz
    sample_rate: int
    timings: KokoroStageTimings = field(default_factory=KokoroStageTimings)

    @property
    def duration(self) -> float:
        return self.samples.size / self.sample_rate


class KokoroManager:
    def __init__(
        self,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
        speed: float = 1.0,
    ):
        self.cfg = KokoroConfig()
        self.speed = speed
        self.text_program = KokoroTextProgram(self.cfg)
        self.audio_program = KokoroAudioProgram(self.cfg)
        self.g2p = EnglishG2P()
        self.post = AudioPostProcessor(SAMPLE_RATE)
        self._vocab = {c: i + 1 for i, c in enumerate(dict.fromkeys(_IPA_CHARS))}

        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        tokens = jnp.zeros((1, MAX_TOKENS), jnp.int32)
        style = jnp.zeros((1, STYLE_DIM), jnp.float32)
        lengths = jnp.array([MAX_TOKENS], jnp.int32)
        self.params = {
            "text": jax.jit(self.text_program.init)(k1, tokens, style, lengths),
            "audio": jax.jit(self.audio_program.init)(
                k2,
                jnp.zeros((1, MAX_TOKENS, self.cfg.d_model), jnp.float32),
                jnp.zeros((1, self.cfg.max_frames), jnp.int32),
                style,
                jnp.array([self.cfg.max_frames], jnp.int32),
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.KOKORO_ANE)
        for part in ("text", "audio"):
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
        self.voices = self._load_voices(base)
        self._text_fn = jax.jit(self.text_program.apply)
        self._audio_fn = jax.jit(self.audio_program.apply)

    def _load_voices(self, base: Path) -> dict[str, np.ndarray]:
        """Voice packs: [MAX_TOKENS, 256] style rows sliced by token count
        (reference VoicePack)."""
        f = base / "voices.npz"
        if f.exists():
            data = np.load(f)
            return {k: data[k] for k in data.files}
        rng = np.random.RandomState(7)
        return {
            name: rng.randn(MAX_TOKENS, STYLE_DIM).astype(np.float32) * 0.1
            for name in ("af_heart", "af_bella", "am_adam")
        }

    @property
    def available_voices(self) -> list[str]:
        return sorted(self.voices)

    def encode_phonemes(self, phonemes: str) -> list[int]:
        return [self._vocab.get(c, 0) for c in phonemes][: MAX_TOKENS - 2]

    def synthesize(self, text: str, voice: str = "af_heart") -> KokoroSynthesisResult:
        timings = KokoroStageTimings()
        t0 = time.perf_counter()
        phonemes = self.g2p.phonemize(text)
        timings.g2p_seconds = time.perf_counter() - t0

        chunks = self._chunk_phonemes(phonemes)
        pieces = []
        for chunk in chunks:
            pieces.append(self._synthesize_chunk(chunk, voice, timings))
        t0 = time.perf_counter()
        audio = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        audio = self.post.process(audio)
        timings.post_seconds = time.perf_counter() - t0
        return KokoroSynthesisResult(samples=audio, sample_rate=SAMPLE_RATE, timings=timings)

    def _chunk_phonemes(self, phonemes: str) -> list[str]:
        if len(phonemes) <= MAX_TOKENS - 2:
            return [phonemes] if phonemes else []
        # split on sentence punctuation, pack greedily (reference auto-chunking)
        parts = re.split(r"(?<=[.!?;])\s*", phonemes)
        chunks, cur = [], ""
        for p in parts:
            if len(cur) + len(p) + 1 > MAX_TOKENS - 2 and cur:
                chunks.append(cur)
                cur = p
            else:
                cur = (cur + " " + p).strip() if cur else p
        if cur:
            chunks.append(cur)
        return chunks

    def _synthesize_chunk(
        self, phonemes: str, voice: str, timings: KokoroStageTimings
    ) -> np.ndarray:
        ids = self.encode_phonemes(phonemes)
        n = len(ids)
        if n == 0:
            return np.zeros(0, np.float32)
        tokens = np.zeros((1, MAX_TOKENS), np.int32)
        tokens[0, :n] = ids
        pack = self.voices.get(voice)
        if pack is None:
            raise KeyError(f"unknown voice {voice!r}; available: {self.available_voices}")
        style = pack[min(n, pack.shape[0] - 1)][None, :]  # style row by token count

        t0 = time.perf_counter()
        log_dur, latents = self._text_fn(
            self.params["text"],
            jnp.asarray(tokens),
            jnp.asarray(style),
            jnp.asarray([n], jnp.int32),
        )
        durations = np.exp(np.asarray(log_dur[0][:n])) / self.speed
        timings.text_seconds += time.perf_counter() - t0

        frame_tokens, total_frames = expand_durations(durations, self.cfg.max_frames)

        t0 = time.perf_counter()
        audio = self._audio_fn(
            self.params["audio"],
            latents,
            jnp.asarray(frame_tokens)[None, :],
            jnp.asarray(style),
            jnp.asarray([total_frames], jnp.int32),
        )
        out = np.asarray(audio[0][: total_frames * HOP])
        timings.audio_seconds += time.perf_counter() - t0
        return out
