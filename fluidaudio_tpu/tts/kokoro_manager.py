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
VOICE_PACK_COLS = 256  # [timbre | prosody] halves of 128


class InvalidVoicePackError(ValueError):
    """Malformed voice-pack payload (`KokoroAneError.invalidVoicePack`)."""


def load_voice_pack(path) -> np.ndarray:
    """Load a flat fp32 `<voice>.bin` into [510, 256]
    (`KokoroAneVoicePack.load`): missing file -> FileNotFoundError; a byte
    count not divisible by 4 or an element count != 510*256 -> typed error."""
    from pathlib import Path as _Path

    p = _Path(path)
    if not p.exists():
        raise FileNotFoundError(f"voice pack missing: {p}")
    data = p.read_bytes()
    if len(data) % 4 != 0:
        raise InvalidVoicePackError(
            f"file size {len(data)} is not a multiple of sizeof(float32)=4"
        )
    storage = np.frombuffer(data, dtype="<f4")
    expected = VOICE_PACK_ROWS * VOICE_PACK_COLS
    if storage.size != expected:
        raise InvalidVoicePackError(
            f"expected {expected} fp32 elements, got {storage.size}"
        )
    return storage.reshape(VOICE_PACK_ROWS, VOICE_PACK_COLS).copy()


def slice_voice_pack(pack: np.ndarray, phoneme_count: int) -> tuple[np.ndarray, np.ndarray]:
    """Row for the phoneme-length bucket, clamped into [0, 509]; returns
    (style_s, style_timbre), the [128:256] and [0:128] column halves
    (`KokoroAneVoicePack.slice`)."""
    row = max(min(phoneme_count - 1, pack.shape[0] - 1), 0)
    half = pack.shape[1] // 2
    return pack[row, half:], pack[row, :half]

# Variant contract (reference KokoroAneConstants.swift:131-163): per-variant
# HF repo, default voice, and text frontend. `mandarin` routes Hanzi through
# MandarinG2P -> bopomofo; `japanese` ships no text frontend (phoneme input
# only) and writes audio at native level (no peak normalization,
# KokoroAneManager.swift:380-387).
VARIANTS = ("english", "mandarin", "japanese")
_VARIANT_REPO = {
    "english": Repo.KOKORO_ANE,
    "mandarin": Repo.KOKORO_ANE_ZH,
    "japanese": Repo.KOKORO_ANE_JA,
}
_VARIANT_DEFAULT_VOICE = {
    "english": "af_heart",
    "mandarin": "zf_001",
    "japanese": "jf_alpha",
}


def _seed_zh_vocab() -> dict[str, int]:
    """Built-in stand-in for `ANE-zh/vocab.json` (bopomofo initials/finals,
    special hanzi finals, tone digits, punctuation). A real vocab.json in
    the asset cache always takes precedence."""
    from fluidaudio_tpu.tts.mandarin_g2p import (
        _FINAL_MAP,
        _INITIAL_MAP,
        ALLOWED_PUNCTUATION,
    )

    symbols = [_PAD] + sorted(ALLOWED_PUNCTUATION) + list("12345")
    symbols += list(dict.fromkeys(_INITIAL_MAP.values()))
    symbols += list(dict.fromkeys(_FINAL_MAP.values()))
    return {s: i for i, s in enumerate(symbols)}


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
    # False for the japanese variant: output stays at the model's native
    # level instead of being peak-scaled to 0 dBFS (ref KokoroAneManager
    # wavData(from:), issue #698)
    peak_normalized: bool = True

    @property
    def duration(self) -> float:
        return self.samples.size / self.sample_rate


class KokoroManager:
    def __init__(
        self,
        *,
        variant: str = "english",
        default_voice: str | None = None,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
        speed: float = 1.0,
        config: KokoroConfig | None = None,
    ):
        if variant not in VARIANTS:
            raise ValueError(f"unknown variant {variant!r}; one of {VARIANTS}")
        self.variant = variant
        self.default_voice = default_voice or _VARIANT_DEFAULT_VOICE[variant]
        self.cfg = config or KokoroConfig()
        self.speed = speed
        lex_base = (
            Path(checkpoint_dir)
            if checkpoint_dir
            else DownloadUtils.repo_dir(_VARIANT_REPO[variant])
        )
        self.g2p = None
        self.mandarin_g2p = None
        self.vocab = dict(VOCAB)
        if variant == "english":
            # full Misaki lexicon + converted BART fallback when the kokoro
            # asset cache holds them (us_lexicon_cache.json / bart.npz —
            # reference LexiconAssetCache.swift:35, G2PModel.swift:6)
            from fluidaudio_tpu.tts.g2p import load_bart_fallback

            self.g2p = EnglishG2P(fallback=load_bart_fallback(lex_base))
            if self.g2p.load_misaki_cache(lex_base):
                logger.info("loaded Misaki lexicon cache (%d entries)",
                            len(self.g2p.misaki_lower))
        elif variant == "mandarin":
            from fluidaudio_tpu.tts.mandarin_g2p import (
                MandarinG2P,
                MandarinG2pw,
                MandarinJiebaHmm,
            )

            g2pw = MandarinG2pw.load(lex_base / "g2pw") or MandarinG2pw.load(lex_base)
            self.mandarin_g2p = MandarinG2P(
                lexicon_path=lex_base / "mandarin_lexicon.json", g2pw=g2pw,
                jieba_hmm=MandarinJiebaHmm.load(lex_base / "jieba_hmm.json"),
            )
            self.vocab = self._load_vocab(lex_base) or _seed_zh_vocab()
        else:  # japanese: phoneme input only, IPA vocab like english
            self.vocab = self._load_vocab(lex_base) or dict(VOCAB)
        if config is None and self.vocab:
            import dataclasses

            need = max(self.vocab.values()) + 1
            if need > self.cfg.vocab_size:
                self.cfg = dataclasses.replace(self.cfg, vocab_size=need)
        self.text_program = KokoroTextProgram(self.cfg)
        self.audio_program = KokoroAudioProgram(self.cfg)
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
        base = lex_base
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

    def _load_vocab(self, base: Path) -> dict[str, int] | None:
        """Per-variant `vocab.json` from the asset bundle ({symbol: id},
        reference KokoroAneVocab); None when not cached."""
        f = base / "vocab.json"
        if not f.exists():
            return None
        import json

        payload = json.loads(f.read_text(encoding="utf-8"))
        return {str(k): int(v) for k, v in payload.items()}

    # seeded fallback voices per variant (real packs come from voices.npz)
    _FALLBACK_VOICES = {
        "english": ("af_heart", "af_bella", "am_adam"),
        "mandarin": ("zf_001", "zm_010"),
        "japanese": ("jf_alpha", "jm_kumo"),
    }

    def _load_voices(self, base: Path) -> dict[str, np.ndarray]:
        """Voice packs: [510, 256] style rows indexed by phoneme count
        (reference VoicePack; upstream packs are [510, 1, 256]). Mandarin/
        Japanese bundles keep packs under voices/ (useVoicesSubdir,
        KokoroAneConstants.swift:148-153) — the converter flattens them
        into one voices.npz either way."""
        for f in (base / "voices.npz", base / "voices" / "voices.npz"):
            if f.exists():
                data = np.load(f)
                return {k: data[k].reshape(-1, STYLE_DIM) for k in data.files}
        # release layout: one flat fp32 `<voice>.bin` per voice
        # (KokoroAneVoicePack.load), at the repo root or under voices/
        for d in (base / "voices", base):
            if d.is_dir():
                packs = {p.stem: p for p in sorted(d.glob("*.bin"))}
                if packs:
                    return {name: load_voice_pack(p) for name, p in packs.items()}
        rng = np.random.RandomState(7)
        return {
            name: rng.randn(VOICE_PACK_ROWS, STYLE_DIM).astype(np.float32) * 0.1
            for name in self._FALLBACK_VOICES[self.variant]
        }

    @property
    def available_voices(self) -> list[str]:
        return sorted(self.voices)

    def encode_phonemes(self, phonemes: str) -> list[int]:
        ids = [self.vocab[c] for c in phonemes if c in self.vocab]
        return ids[: MAX_TOKENS - 2]

    def set_english_custom_lexicon(self, entries: dict[str, str]) -> None:
        """User word -> Misaki-IPA overrides, checked before the bundled
        lexicon (ref KokoroAneManager.setEnglishCustomLexicon). Only
        meaningful for the english variant; a no-op store otherwise."""
        if self.g2p is not None:
            self.g2p.custom_lexicon = dict(entries)

    def set_mandarin_custom_lexicon(self, entries: dict[str, list[str]]) -> None:
        """User word -> pinyin/@bopomofo token overrides, slotted at the
        front of the MandarinG2P cascade (ref setMandarinCustomLexicon).
        Only meaningful for the mandarin variant."""
        if self.mandarin_g2p is not None:
            self.mandarin_g2p.set_custom_lexicon(entries)

    def phonemes_for(self, text: str) -> str:
        """Resolve the exact phoneme string `synthesize` would feed the
        chain (reference `phonemes(for:)`, KokoroAneManager.swift:237-261).

        English: Misaki-lexicon-first with BART fallback. Mandarin: the
        MandarinG2P bopomofo pipeline for Hanzi input, pass-through for
        strings already in phoneme form. Japanese: no text frontend —
        raises; feed pre-computed IPA via `synthesize_from_phonemes`."""
        if self.variant == "english":
            return self.g2p.phonemize(text)
        if self.variant == "mandarin":
            from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P

            if MandarinG2P.looks_like_hanzi(text):
                return self.mandarin_g2p.phonemize_bopomofo(text)
            # no Hanzi -> caller already supplied bopomofo; pass through so
            # power users can override pronunciation manually
            return text
        raise ValueError(
            "japanese variant has no text G2P frontend; call "
            "synthesize_from_phonemes() with pre-computed IPA"
        )

    def synthesize(self, text: str, voice: str | None = None) -> KokoroSynthesisResult:
        timings = KokoroStageTimings()
        t0 = time.perf_counter()
        phonemes = self.phonemes_for(text)
        timings.g2p_seconds = time.perf_counter() - t0
        return self._synthesize_resolved(phonemes, voice, timings)

    def synthesize_from_phonemes(
        self, phonemes: str, voice: str | None = None
    ) -> KokoroSynthesisResult:
        """Bypass G2P; feed an already-resolved phoneme string. Strict:
        raises past the 510-token cap instead of auto-chunking (reference
        synthesizeFromPhonemes contract)."""
        n = sum(1 for c in phonemes if c in self.vocab)
        if n > MAX_TOKENS - 2:
            raise ValueError(
                f"phoneme sequence too long: {n} > {MAX_TOKENS - 2} tokens"
            )
        return self._synthesize_resolved(phonemes, voice, KokoroStageTimings())

    def _synthesize_resolved(
        self, phonemes: str, voice: str | None, timings: KokoroStageTimings
    ) -> KokoroSynthesisResult:
        voice = voice or self.default_voice
        chunks = self._chunk_phonemes(phonemes)
        pieces = []
        for chunk in chunks:
            pieces.append(self._synthesize_chunk(chunk, voice, timings))
        t0 = time.perf_counter()
        audio = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        audio = self.post.process(audio)
        # Peak-scale once over the full concatenation so levels stay
        # consistent across chunk joins; japanese writes at the model's
        # native level (ref KokoroAneManager wavData(from:))
        normalize = self.variant != "japanese"
        if normalize and audio.size:
            peak = float(np.abs(audio).max())
            if peak > 0:
                audio = audio / peak
        timings.post_seconds = time.perf_counter() - t0
        return KokoroSynthesisResult(
            samples=audio,
            sample_rate=SAMPLE_RATE,
            timings=timings,
            peak_normalized=normalize,
        )

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
        # row = raw phoneme-string length, BOS/EOS not counted, clamped into
        # [0, 509] (reference KokoroAneVoicePack.slice)
        sd = self.cfg.style_dim
        s_half, t_half = slice_voice_pack(pack, len(phonemes))
        style_timbre = jnp.asarray(t_half[None, :sd].astype(np.float32))
        style_s = jnp.asarray(s_half[None, :sd].astype(np.float32))

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
            total_frames,
            self.cfg.frame_buckets
            or tuple(max_f // 8 * k for k in (1, 2, 4, 8)),
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
