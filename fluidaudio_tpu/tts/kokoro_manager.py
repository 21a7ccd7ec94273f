"""KokoroManager: parallel TTS public API over the real Kokoro-82M graph.

Behavioral parity: reference `KokoroAne/KokoroAneManager.swift:1-110` +
`Pipeline/KokoroAneSynthesizer.swift:17-160`: text -> phonemizer -> vocab
encode (178-symbol StyleTTS2 IPA table, ids wrapped [0, *ids, 0]) ->
voice-pack style row by token count (style_timbre = ref[:128] feeds the
decoder/vocoder stages, style_s = ref[128:] the duration/prosody stages,
matching the reference VoicePack slices) -> staged synthesis -> 24 kHz WAV;
<=512 IPA tokens per call with auto-chunking; per-stage timings
(`KokoroAneStageTimings`). The reference's 7 CoreML stages collapse into 2
jitted programs; duration rounding stays host-side like the reference.
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

# StyleTTS2/Kokoro 178-symbol table: pad + punctuation + letters + IPA.
_PAD = "$"
_PUNCT = ';:,.!?¡¿—…"«»“” '
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_LETTERS_IPA = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"
)
SYMBOLS = [_PAD] + list(_PUNCT) + list(_LETTERS) + list(_LETTERS_IPA)
VOCAB = {s: i for i, s in enumerate(SYMBOLS)}

# voice packs index style rows by phoneme count: ref_s = pack[len(ps) - 1]
VOICE_PACK_ROWS = 510


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
        config: KokoroConfig | None = None,
    ):
        self.cfg = config or KokoroConfig()
        self.speed = speed
        self.text_program = KokoroTextProgram(self.cfg)
        self.audio_program = KokoroAudioProgram(self.cfg)
        # full Misaki lexicon + converted BART fallback when the kokoro
        # asset cache holds them (us_lexicon_cache.json / bart.npz —
        # reference LexiconAssetCache.swift:35, G2PModel.swift:6)
        from fluidaudio_tpu.tts.g2p import load_bart_fallback

        lex_base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.KOKORO_ANE)
        self.g2p = EnglishG2P(fallback=load_bart_fallback(lex_base))
        if self.g2p.load_misaki_cache(lex_base):
            logger.info("loaded Misaki lexicon cache (%d entries)",
                        len(self.g2p.misaki_lower))
        self.post = AudioPostProcessor(SAMPLE_RATE)

        cfg = self.cfg
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        ids = jnp.zeros((1, 8), jnp.int32)
        lengths = jnp.array([8], jnp.int32)
        s128 = jnp.zeros((1, cfg.style_dim), jnp.float32)
        self.params = {
            "text": jax.jit(self.text_program.init)(k1, ids, lengths, s128),
            "audio": jax.jit(self.audio_program.init)(
                {"params": k2, "noise": k3},
                jnp.zeros((1, 8, cfg.d_model + cfg.style_dim), jnp.float32),
                jnp.zeros((1, 8, cfg.d_model), jnp.float32),
                jnp.zeros((1, 16), jnp.int32),
                jnp.array([16], jnp.int32),
                s128,
                s128,
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.KOKORO_ANE)
        self.has_real_weights = False
        for part in ("text", "audio"):
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
                self.has_real_weights = True
        self.voices = self._load_voices(base)
        self._noise_key = jax.random.PRNGKey(rng_seed + 1)
        self._text_fn = jax.jit(self.text_program.apply)
        self._audio_fn = jax.jit(
            lambda p, *a, key: self.audio_program.apply(p, *a, rngs={"noise": key})
        )

    def _load_voices(self, base: Path) -> dict[str, np.ndarray]:
        """Voice packs: [510, 256] style rows indexed by phoneme count
        (reference VoicePack; upstream packs are [510, 1, 256])."""
        f = base / "voices.npz"
        if f.exists():
            data = np.load(f)
            return {k: data[k].reshape(-1, STYLE_DIM) for k in data.files}
        rng = np.random.RandomState(7)
        return {
            name: rng.randn(VOICE_PACK_ROWS, STYLE_DIM).astype(np.float32) * 0.1
            for name in ("af_heart", "af_bella", "am_adam")
        }

    @property
    def available_voices(self) -> list[str]:
        return sorted(self.voices)

    def encode_phonemes(self, phonemes: str) -> list[int]:
        ids = [VOCAB[c] for c in phonemes if c in VOCAB]
        return ids[: MAX_TOKENS - 2]

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
        # shared PhonemeChunker semantics (reference TTS/Shared/PhonemeChunker.swift)
        from fluidaudio_tpu.tts.phoneme_chunker import chunk_phonemes

        return chunk_phonemes(phonemes, MAX_TOKENS - 2)

    # static shape buckets: token count and frame count round up to these so
    # repeated calls reuse compiled programs (the jit cache plays the role of
    # the reference's enumerated CoreML shapes)
    _TOKEN_BUCKETS = (64, 128, 256, MAX_TOKENS)

    def _bucket(self, n: int, buckets) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def _synthesize_chunk(
        self, phonemes: str, voice: str, timings: KokoroStageTimings
    ) -> np.ndarray:
        ids = self.encode_phonemes(phonemes)
        if not ids:
            return np.zeros(0, np.float32)
        pack = self.voices.get(voice)
        if pack is None:
            raise KeyError(f"unknown voice {voice!r}; available: {self.available_voices}")
        ref_s = pack[min(len(ids) - 1, pack.shape[0] - 1)]
        half = ref_s.shape[0] // 2  # [timbre | prosody] halves (ref VoicePack)
        sd = self.cfg.style_dim
        style_timbre = jnp.asarray(ref_s[None, :sd].astype(np.float32))
        style_s = jnp.asarray(ref_s[None, half : half + sd].astype(np.float32))

        wrapped = [0, *ids, 0]  # kokoro pads both ends with symbol 0 ('$')
        n = len(wrapped)
        bt = self._bucket(n, self._TOKEN_BUCKETS)
        tokens = np.zeros((1, bt), np.int32)
        tokens[0, :n] = wrapped

        t0 = time.perf_counter()
        duration, d, t_en = self._text_fn(
            self.params["text"],
            jnp.asarray(tokens),
            jnp.asarray([n], jnp.int32),
            style_s,
            jnp.float32(self.speed),
        )
        duration = np.asarray(duration[0][:n])
        timings.text_seconds += time.perf_counter() - t0

        max_f = self.cfg.max_frames
        frame_idx, total_frames = expand_durations(duration, max_f)
        bf = self._bucket(
            total_frames, tuple(max_f // 8 * k for k in (1, 2, 4, 8))
        )
        t0 = time.perf_counter()
        audio = self._audio_fn(
            self.params["audio"],
            d,
            t_en,
            jnp.asarray(frame_idx[:bf])[None, :],
            jnp.asarray([total_frames], jnp.int32),
            style_s,
            style_timbre,
            key=self._noise_key,
        )
        out = np.asarray(audio[0][: total_frames * HOP])
        timings.audio_seconds += time.perf_counter() - t0
        return out
