"""Supertonic3Manager: 31-language 44.1 kHz TTS (step-fed flow matching).

Behavioral parity with the reference pipeline
(`Supertonic3/Supertonic3Manager.swift:36`, `Supertonic3Synthesizer.swift:33-216`):
  - UnicodeProcessor text normalization: NFKD, emoji strip, symbol/abbrev
    replacement tables, spacing cleanup, sentence-final period, <lang> tags,
    unicode_indexer.json codepoint lookup (-1 for unknown)
    (`Supertonic3UnicodeProcessor.swift:81-195`)
  - chunking: 70 Latin / 57 CJK chars, 0.05 s silence between chunks
    (`Supertonic3Constants.swift:79-94`)
  - per-chunk: duration_predictor -> speed-scaled duration (floor 0.05 s) ->
    Box-Muller noisy latent + mask (`Supertonic3LatentSampler.swift:24-71`) ->
    8 vector_estimator steps -> vocoder -> trim to duration*sr samples
  - styles: per-voice (ttl [50,256], dp [8,16]) tensors from the voice JSON

TPU re-design: the reference's 8 fed-back CoreML dispatches become ONE jitted
program that unrolls the denoise loop on device; latent lengths live in
static buckets (the reference's ANE buckets 128/256/512 play the same role,
`Supertonic3Types.swift:75-95`).
"""

from __future__ import annotations

import json
import re
import unicodedata
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.supertonic3 import (
    DEFAULT_TOTAL_STEPS,
    DP_STYLE_DIM,
    DP_STYLE_TOKENS,
    SAMPLE_RATE,
    SAMPLES_PER_LATENT,
    SUPERTONIC3_BASE,
    TTL_STYLE_DIM,
    TTL_STYLE_TOKENS,
    Supertonic3Config,
    Supertonic3DurationPredictor,
    Supertonic3TextEncoder,
    Supertonic3VectorEstimator,
    Supertonic3Vocoder,
    sample_noisy_latent,
)
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("tts.supertonic3")

AVAILABLE_LANGUAGES = {
    "en", "ko", "ja", "ar", "bg", "cs", "da", "de", "el", "es", "et", "fi",
    "fr", "hi", "hr", "hu", "id", "it", "lt", "lv", "nl", "pl", "pt", "ro",
    "ru", "sk", "sl", "sv", "tr", "uk", "vi", "na",
}
CJK_LANGUAGES = {"ko", "ja"}
MAX_CHUNK_LATIN = 70
MAX_CHUNK_CJK = 57
DEFAULT_SPEED = 1.05
DEFAULT_SILENCE_S = 0.05

# The 10 built-in voice styles published at
# FluidInference/supertonic-3-coreml/voice_styles/ (Supertonic3Types.swift:
# 120-150): female F1-F5, male M1-M5; M1 shipped first and is the default.
SUPERTONIC3_VOICES = ("F1", "F2", "F3", "F4", "F5", "M1", "M2", "M3", "M4", "M5")
DEFAULT_VOICE = "M1"


def parse_voice(name: str) -> str | None:
    """Case-insensitive voice-name parse; None for unknown names so callers
    (e.g. a CLI passing a Kokoro-style voice id) can fall back to the
    default (`Supertonic3Voice.init?(name:)`)."""
    up = name.upper()
    return up if up in SUPERTONIC3_VOICES else None


def voice_style_filename(name: str) -> str:
    """Repo-relative style JSON path, e.g. `voice_styles/F3.json`."""
    return f"voice_styles/{name}.json"


def load_voice_style(path: str | Path) -> dict[str, np.ndarray]:
    """Decode a voice style JSON (`Supertonic3VoiceStyle.load`):
    {"style_ttl": {data, dims, type}, "style_dp": {...}} with dims validated
    against the model contract; returns {"ttl": [50,256], "dp": [8,16]}."""
    path = Path(path)
    try:
        raw = json.loads(path.read_text())
    except (OSError, ValueError) as e:
        raise ValueError(f"voice style load failed: {path}: {e}") from e
    out = {}
    for key, short, dims in (
        ("style_ttl", "ttl", [1, TTL_STYLE_TOKENS, TTL_STYLE_DIM]),
        ("style_dp", "dp", [1, DP_STYLE_TOKENS, DP_STYLE_DIM]),
    ):
        comp = raw.get(key)
        if comp is None:
            raise ValueError(f"voice style {path.name} missing {key}")
        if list(comp.get("dims", [])) != dims:
            raise ValueError(
                f"voice style shape mismatch for {key}: "
                f"expected {dims}, got {comp.get('dims')}"
            )
        out[short] = np.asarray(comp["data"], np.float32).reshape(dims[1], dims[2])
    return out

_SYMBOL_REPLACEMENTS = [
    ("–", "-"), ("‑", "-"), ("—", "-"), ("_", " "),
    ("“", '"'), ("”", '"'), ("‘", "'"), ("’", "'"),
    ("´", "'"), ("`", "'"), ("[", " "), ("]", " "), ("|", " "),
    ("/", " "), ("#", " "), ("→", " "), ("←", " "),
]
_DECORATIVE = ["♥", "☆", "♡", "©", "\\"]
_EXPRESSIONS = [("@", " at "), ("e.g.,", "for example, "), ("i.e.,", "that is, ")]
_EMOJI_RANGES = (
    (0x1F600, 0x1F64F), (0x1F300, 0x1F5FF), (0x1F680, 0x1F6FF),
    (0x1F700, 0x1F77F), (0x1F780, 0x1F7FF), (0x1F800, 0x1F8FF),
    (0x1F900, 0x1F9FF), (0x1FA00, 0x1FA6F), (0x1FA70, 0x1FAFF),
    (0x2600, 0x26FF), (0x2700, 0x27BF), (0x1F1E6, 0x1F1FF),
)
_SENT_END = re.compile(
    "[.!?;:,'\"“”‘’)\\]}…。」』】〉》›»]$"
)


def preprocess_text(raw: str, lang: str) -> str:
    """`Supertonic3UnicodeProcessor.preprocess` parity."""
    text = unicodedata.normalize("NFKD", raw)
    text = "".join(
        c for c in text
        if not any(lo <= ord(c) <= hi for lo, hi in _EMOJI_RANGES)
    )
    for old, new in _SYMBOL_REPLACEMENTS:
        text = text.replace(old, new)
    for sym in _DECORATIVE:
        text = text.replace(sym, "")
    for old, new in _EXPRESSIONS:
        text = text.replace(old, new)
    for old in (" ,", " .", " !", " ?", " ;", " :", " '"):
        text = text.replace(old, old[1:])
    for rep, single in (('""', '"'), ("''", "'"), ("``", "`")):
        while rep in text:
            text = text.replace(rep, single)
    text = re.sub(r"\s+", " ", text).strip()
    if text and not _SENT_END.search(text):
        text += "."
    return f"<{lang}>{text}</{lang}>"


# sentence terminators that are actually abbreviations — do not split after
# (reference `Supertonic3TextChunker.abbreviations`)
_ABBREVIATIONS = (
    "Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "Sr.", "Jr.",
    "St.", "Ave.", "Rd.", "Blvd.", "Dept.", "Inc.", "Ltd.",
    "Co.", "Corp.", "etc.", "vs.", "i.e.", "e.g.", "Ph.D.",
)


def _split_sentences(text: str) -> list[str]:
    """Abbreviation-aware sentence split on `[.!?]` + whitespace."""
    sentences: list[str] = []
    last = 0
    for m in re.finditer(r"[.!?]\s+", text):
        combined = text[last : m.start() + 1].strip()
        if any(combined.endswith(a) for a in _ABBREVIATIONS):
            continue
        sentences.append(text[last : m.end()])
        last = m.end()
    if last < len(text):
        sentences.append(text[last:])
    return sentences or [text]


def _pack(parts: list[str], max_chars: int, sep: str, overflow) -> list[str]:
    """Greedy packing of `parts` into chunks <= max_chars, recursing into
    `overflow` for parts that alone exceed the cap."""
    chunks: list[str] = []
    cur = ""
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if len(part) > max_chars:
            if cur:
                chunks.append(cur)
                cur = ""
            chunks.extend(overflow(part))
            continue
        if cur and len(cur) + len(part) + len(sep) > max_chars:
            chunks.append(cur)
            cur = ""
        cur = part if not cur else f"{cur}{sep}{part}"
    if cur:
        chunks.append(cur)
    return chunks


def chunk_text(text: str, max_chars: int) -> list[str]:
    """`Supertonic3TextChunker.chunk` parity (upstream `Helper.chunkText`):
    split on blank-line paragraph boundaries first (each short paragraph is
    its own chunk), then pack abbreviation-aware sentences, falling back to
    comma boundaries and finally whitespace so no chunk ever exceeds
    `max_chars` — text past the encoder's fixed char buffer would otherwise
    be silently dropped."""
    text = text.strip()
    if not text:
        return []

    def pack_words(phrase: str) -> list[str]:
        out, cur = [], ""
        for w in phrase.split():
            if len(w) > max_chars:  # single over-long word: hard cut
                if cur:
                    out.append(cur)
                    cur = ""
                out.extend(w[i : i + max_chars] for i in range(0, len(w), max_chars))
                continue
            if cur and len(cur) + len(w) + 1 > max_chars:
                out.append(cur)
                cur = ""
            cur = w if not cur else f"{cur} {w}"
        if cur:
            out.append(cur)
        return out

    def pack_commas(sentence: str) -> list[str]:
        return _pack(sentence.split(","), max_chars, ", ", pack_words)

    chunks: list[str] = []
    for para in re.split(r"\n\s*\n", text):
        para = para.strip()
        if not para:
            continue
        if len(para) <= max_chars:
            chunks.append(para)
            continue
        chunks.extend(_pack(_split_sentences(para), max_chars, " ", pack_commas))
    return chunks


class UnicodeIndexer:
    """unicode_indexer.json: flat codepoint -> id list; -1 for unknown.

    Without the downloaded asset a deterministic fallback maps codepoints
    into the configured vocab (stable across runs; replaced verbatim once
    the real indexer is cached)."""

    def __init__(self, table: list[int] | None, vocab_size: int):
        self.table = table
        self.vocab_size = vocab_size

    def encode(self, text: str, max_len: int) -> tuple[np.ndarray, int]:
        ids = np.zeros((max_len,), np.int64)
        n = min(len(text), max_len)
        for j, ch in enumerate(text[:max_len]):
            cp = ord(ch)
            if self.table is not None:
                ids[j] = self.table[cp] if cp < len(self.table) else -1
            else:
                ids[j] = 1 + (cp % (self.vocab_size - 2))
        return ids, n


@dataclass
class Supertonic3Result:
    samples: np.ndarray
    sample_rate: int
    duration: float


class Supertonic3Manager:
    def __init__(
        self,
        config: Supertonic3Config | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
        total_steps: int = DEFAULT_TOTAL_STEPS,
    ):
        self.cfg = cfg = config or SUPERTONIC3_BASE
        self.total_steps = total_steps
        self.text_enc = Supertonic3TextEncoder(cfg)
        self.dur_pred = Supertonic3DurationPredictor(cfg)
        self.estimator = Supertonic3VectorEstimator(cfg)
        self.vocoder = Supertonic3Vocoder(cfg)

        T, L = cfg.text_t, cfg.max_latent
        k = jax.random.split(jax.random.PRNGKey(rng_seed), 4)
        ids0 = jnp.zeros((1, T), jnp.int32)
        tm0 = jnp.ones((1, T))
        ttl0 = jnp.zeros((1, TTL_STYLE_TOKENS, TTL_STYLE_DIM))
        dp0 = jnp.zeros((1, DP_STYLE_TOKENS, DP_STYLE_DIM))
        from fluidaudio_tpu.models.supertonic3 import LATENT_CH

        self.params = {
            "text_encoder": self.text_enc.init(k[0], ids0, tm0, ttl0),
            "duration_predictor": self.dur_pred.init(k[1], ids0, tm0, dp0),
            "vector_estimator": self.estimator.init(
                k[2], jnp.zeros((1, LATENT_CH, L)), jnp.zeros((1, 256, T)),
                ttl0, jnp.ones((1, 1, L)), tm0[:, None, :],
                jnp.zeros((1,)), jnp.ones((1,)),
            ),
            "vocoder": self.vocoder.init(k[3], jnp.zeros((1, LATENT_CH, L))),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.SUPERTONIC3)
        if all((base / f"{part}.onnx").exists() for part in self.params) and not any(
            (base / f"{part}.npz").exists() for part in self.params
        ):
            # staged upstream ONNX release, not yet converted: run the
            # topology-based converter in place (convert/supertonic3.py)
            from fluidaudio_tpu.convert.supertonic3 import convert_supertonic3
            from fluidaudio_tpu.utils.checkpoint import save_params

            for part, tree in convert_supertonic3(base, self.cfg).items():
                save_params(base / f"{part}.npz", tree)
        for part in self.params:
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
        self.indexer = self._load_indexer(base)
        self.voices = self._load_voices(base)

        self._text_fn = jax.jit(self.text_enc.apply)
        self._dur_fn = jax.jit(self.dur_pred.apply)
        self._voc_fn = jax.jit(self.vocoder.apply)

        self._denoise_cache: dict[int, object] = {}

    def _get_denoise(self, steps: int):
        """Jitted unrolled denoise loop per step count (synthesize's
        `total_steps=` override selects a different compiled program)."""
        if steps not in self._denoise_cache:
            est = self.estimator

            @jax.jit
            def denoise(params, z, text_emb, style_ttl, latent_mask, text_mask):
                total = jnp.full((z.shape[0],), float(steps))
                for step in range(steps):
                    cur = jnp.full((z.shape[0],), float(step))
                    z = est.apply(params, z, text_emb, style_ttl, latent_mask,
                                  text_mask, cur, total)
                return z

            self._denoise_cache[steps] = denoise
        return self._denoise_cache[steps]

    # ---------------------------------------------------------------- assets

    def _load_indexer(self, base: Path) -> UnicodeIndexer:
        f = base / "unicode_indexer.json"
        if f.exists():
            return UnicodeIndexer(json.loads(f.read_text()), self.cfg.vocab_size)
        return UnicodeIndexer(None, self.cfg.vocab_size)

    def _load_voices(self, base: Path) -> dict[str, dict[str, np.ndarray]]:
        """Voice styles keyed by canonical name.

        Preference order: the real release layout `voice_styles/{NAME}.json`
        (Supertonic3Voice.fileName), then a legacy combined `voices.json`,
        then a seeded random catalog over the full 10-voice set so every
        published voice name resolves pre-assets.
        """
        styles_dir = base / "voice_styles"
        if styles_dir.is_dir():
            loaded = {}
            for name in SUPERTONIC3_VOICES:
                f = styles_dir / f"{name}.json"
                if f.exists():
                    loaded[name] = load_voice_style(f)
            if loaded:
                return loaded
        f = base / "voices.json"
        if f.exists():
            raw = json.loads(f.read_text())
            return {
                k: {"ttl": np.asarray(v["ttl"], np.float32).reshape(
                        TTL_STYLE_TOKENS, TTL_STYLE_DIM),
                    "dp": np.asarray(v["dp"], np.float32).reshape(
                        DP_STYLE_TOKENS, DP_STYLE_DIM)}
                for k, v in raw.items()
            }
        rng = np.random.RandomState(11)
        return {
            name: {"ttl": rng.randn(TTL_STYLE_TOKENS, TTL_STYLE_DIM).astype(np.float32) * 0.1,
                   "dp": rng.randn(DP_STYLE_TOKENS, DP_STYLE_DIM).astype(np.float32) * 0.1}
            for name in SUPERTONIC3_VOICES
        }

    @property
    def available_voices(self) -> list[str]:
        return sorted(self.voices)

    # ------------------------------------------------------------------- api

    def synthesize(
        self,
        text: str,
        voice: str = DEFAULT_VOICE,
        language: str = "en",
        *,
        speed: float = DEFAULT_SPEED,
        total_steps: int | None = None,
        silence_duration: float = DEFAULT_SILENCE_S,
        seed: int = 0,
    ) -> Supertonic3Result:
        if language not in AVAILABLE_LANGUAGES:
            raise ValueError(f"unsupported language {language!r}")
        # exact key first (custom styles keep their case), then the
        # case-insensitive built-in parse (Supertonic3Voice.init?(name:))
        style = self.voices.get(voice)
        if style is None:
            canonical = parse_voice(voice)
            if canonical is not None:
                style = self.voices.get(canonical)
        if style is None:
            raise KeyError(f"unknown voice {voice!r}; available {self.available_voices}")
        max_len = MAX_CHUNK_CJK if language in CJK_LANGUAGES else MAX_CHUNK_LATIN
        chunks = chunk_text(text, max_len)
        if not chunks:
            raise ValueError("empty text")

        silence = np.zeros(max(0, int(silence_duration * SAMPLE_RATE)), np.float32)
        pieces: list[np.ndarray] = []
        duration_total = 0.0
        for ci, chunk in enumerate(chunks):
            samples, dur = self._infer(chunk, language, style, speed, seed + ci,
                                       total_steps or self.total_steps)
            if ci:
                pieces.append(silence)
                duration_total += silence_duration
            pieces.append(samples)
            duration_total += dur
        return Supertonic3Result(
            samples=np.concatenate(pieces), sample_rate=SAMPLE_RATE,
            duration=duration_total,
        )

    def _infer(self, chunk: str, language: str, style, speed: float,
               seed: int, steps: int | None = None):
        cfg = self.cfg
        cleaned = preprocess_text(chunk, language)
        ids, n = self.indexer.encode(cleaned, cfg.text_t)
        tokens = jnp.asarray(ids, jnp.int32)[None]
        tmask = jnp.asarray(
            (np.arange(cfg.text_t) < n).astype(np.float32)
        )[None]
        ttl = jnp.asarray(style["ttl"])[None]
        dp = jnp.asarray(style["dp"])[None]

        dur = float(np.asarray(
            self._dur_fn(self.params["duration_predictor"], tokens, tmask, dp)
        )[0])
        dur = max(0.05, dur / max(speed, 0.05))
        # cap to the latent bucket
        max_dur = cfg.max_latent * SAMPLES_PER_LATENT / SAMPLE_RATE
        dur = min(dur, max_dur)

        text_emb = self._text_fn(self.params["text_encoder"], tokens, tmask, ttl)

        rng = np.random.RandomState(seed)
        z, lmask, true_len = sample_noisy_latent(
            np.array([dur]), cfg.max_latent, rng
        )
        z = self._get_denoise(steps or self.total_steps)(
            self.params["vector_estimator"], jnp.asarray(z), text_emb, ttl,
            jnp.asarray(lmask), tmask[:, None, :],
        )
        wav = np.asarray(self._voc_fn(self.params["vocoder"], z))[0]
        trim = min(wav.size, int(SAMPLE_RATE * dur))
        return (wav[:trim] if trim else wav), dur
