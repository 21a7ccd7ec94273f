"""StyleTTS2Manager: reference-audio-styled TTS (LibriTTS iteration_3).

Behavioral parity: reference `StyleTTS2/StyleTTS2Manager.swift:37` driving the
8-stage synthesizer (`StyleTTS2Synthesizer.swift:33-133`), TextCleaner symbol
table (`StyleTTS2TextCleaner.swift:9-71`), reference-mel extractor quirk
(`StyleTTS2MelExtractor.swift` / `StyleTTS2Constants.swift:37-52`: 16 kHz
filterbank applied to 24 kHz audio, n_fft 2048, win 1200, hop 300,
(log(mel+1e-5)+4)/4), Karras/ADPM2 noise contract
(`StyleTTS2DiffusionSchedule.swift`), alpha/beta style blending and
duration rounding (`StyleTTS2GlueOps.swift`), 50-sample tail trim.

TPU re-design: 8 CoreML stages -> 4 jitted programs (models/styletts2.py)
over static token/frame buckets (reference buckets 64/128/256,
`StyleTTS2Constants.bucketTokenSizes`).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.kokoro import expand_durations
from fluidaudio_tpu.models.styletts2 import (
    DIFFUSION_STEPS,
    HOP,
    SAMPLE_RATE,
    STYLE_DIM,
    STYLETTS2_BASE,
    StyleTts2AcousticProgram,
    StyleTts2Config,
    StyleTts2PredictProgram,
    StyleTts2StyleProgram,
    StyleTts2TextProgram,
    blend_style,
    round_durations,
)
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.tts.g2p import EnglishG2P
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("tts.styletts2")

# --------------------------------------------------------------------------
# TextCleaner: pad + punctuation + letters + IPA, canonical training order
# (StyleTTS2TextCleaner.swift:13-48; later duplicates overwrite earlier ids)
# --------------------------------------------------------------------------

_PAD = "$"
_PUNCTUATION = ';:,.!?¡¿—…"«»“” '
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_IPA = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"
)
SYMBOLS = [_PAD] + list(_PUNCTUATION) + list(_LETTERS) + list(_IPA)
_CHAR_TO_ID = {c: i for i, c in enumerate(SYMBOLS)}  # last write wins


def text_cleaner_encode(phonemes: str, prepend_pad: bool = True) -> list[int]:
    """espeak-IPA string -> TextCleaner ids; unknown chars silently dropped
    (`StyleTTS2TextCleaner.encode`)."""
    ids = [0] if prepend_pad else []
    ids.extend(_CHAR_TO_ID[c] for c in phonemes if c in _CHAR_TO_ID)
    return ids


# --------------------------------------------------------------------------
# Phonemizer: shared English cascade + Misaki -> espeak shorthand expansion
# --------------------------------------------------------------------------

# Misaki/Kokoro single-char diphthong shorthand -> espeak two-char IPA
# (StyleTTS2Phonemizer.swift:172-189). StyleTTS2 was trained on espeak
# transcriptions; without expansion the TextCleaner reads `O` as the Latin
# letter and the audio is gibberish. Lowercase a/o/i/y/w are real IPA or
# grapheme passthrough and stay untouched.
MISAKI_SHORTHAND = {"A": "eɪ", "O": "oʊ", "I": "aɪ", "Y": "ɔɪ", "W": "aʊ"}

_PUNCT_SET = set(_PUNCTUATION)


def expand_misaki_shorthand(ipa: str) -> str:
    """Expand A/O/I/Y/W diphthong shorthand
    (`StyleTTS2Phonemizer.expandMisakiShorthand`)."""
    return "".join(MISAKI_SHORTHAND.get(c, c) for c in ipa)


class StyleTts2Phonemizer:
    """Text -> espeak-IPA string for the StyleTTS2 TextCleaner.

    Reference `StyleTTS2Phonemizer.swift:58-170`: conservative raw-text
    normalization, word split, TextCleaner-punctuation passthrough, the
    shared English lexicon/initialism cascade (via `EnglishG2P`), Misaki
    shorthand expansion on every resolved word, grapheme passthrough on a
    degraded G2P miss (never drop a word — that would shift alignment),
    and a hard error when nothing at all resolves.
    """

    def __init__(self, g2p: EnglishG2P | None = None):
        self.g2p = g2p or EnglishG2P()

    def phonemize(self, text: str) -> str:
        from fluidaudio_tpu.tts.g2p import split_words
        from fluidaudio_tpu.tts.text_normalizer import english_normalize

        trimmed = text.strip()
        if not trimmed:
            return ""
        normalized = english_normalize(trimmed)
        parts: list[str] = []
        any_resolved = False
        for word in split_words(normalized):
            if not word:
                continue
            if all(c in _PUNCT_SET for c in word):
                # TextCleaner has direct entries for these; counts as
                # resolved so punctuation-only input doesn't raise
                parts.append(word)
                any_resolved = True
                continue
            ipa = self.g2p.word_to_phonemes(word)
            if ipa:
                parts.append(expand_misaki_shorthand(ipa))
                any_resolved = True
            else:
                # degraded path: the symbol table has ASCII letters, so
                # graphemes still produce something alignment-preserving
                logger.info("G2P unresolved for %r; passing graphemes", word)
                parts.append(word)
        if not any_resolved:
            raise ValueError(
                f"phonemization failed: no words resolved (input={trimmed[:40]!r})"
            )
        return " ".join(parts)

    def encode(self, text: str) -> list[int]:
        """Text -> TextCleaner ids with the leading pad
        (`StyleTTS2Phonemizer.encode`)."""
        return text_cleaner_encode(self.phonemize(text))


# --------------------------------------------------------------------------
# reference-audio mel (torchaudio parity incl. the 16 kHz filterbank quirk)
# --------------------------------------------------------------------------

_MEL_SR_QUIRK = 16_000  # filterbank built at 16 kHz, audio is 24 kHz
_MEL_NFFT = 2_048
_MEL_WIN = 1_200
_MEL_HOP = 300


def _htk_filterbank(n_fft: int, n_mels: int, sr: int) -> np.ndarray:
    """torchaudio default melscale_fbanks: HTK scale, no norm."""
    f_max = sr / 2.0
    m_min, m_max = 0.0, 2595.0 * np.log10(1.0 + f_max / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


_FB_CACHE: dict[int, np.ndarray] = {}


def styletts2_ref_mel(audio_24k: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """24 kHz mono f32 -> normalized log-mel [n_mels, T] (torchaudio parity:
    reflect-pad center, periodic hann(1200), power 2, HTK filterbank built at
    16 kHz — the upstream `make_preprocess()` never overrides sample_rate)."""
    x = np.asarray(audio_24k, np.float32).reshape(-1)
    if n_mels not in _FB_CACHE:
        _FB_CACHE[n_mels] = _htk_filterbank(_MEL_NFFT, n_mels, _MEL_SR_QUIRK)
    pad = _MEL_NFFT // 2
    if x.size < 2:
        x = np.zeros(2, np.float32)
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (xp.size - _MEL_NFFT) // _MEL_HOP
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(_MEL_WIN) / _MEL_WIN)  # periodic
    wpad = (_MEL_NFFT - _MEL_WIN) // 2
    win_full = np.zeros(_MEL_NFFT, np.float32)
    win_full[wpad : wpad + _MEL_WIN] = win
    idx = np.arange(n_frames)[:, None] * _MEL_HOP + np.arange(_MEL_NFFT)[None, :]
    frames = xp[idx] * win_full[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [T, n_fft//2+1]
    mel = spec @ _FB_CACHE[n_mels]  # [T, n_mels]
    return ((np.log(mel + 1e-5) + 4.0) / 4.0).T.astype(np.float32)


# --------------------------------------------------------------------------


@dataclass
class StyleTts2Result:
    samples: np.ndarray
    sample_rate: int

    @property
    def duration(self) -> float:
        return self.samples.size / self.sample_rate


_TOKEN_BUCKETS = (64, 128, 256)  # StyleTTS2Constants.bucketTokenSizes
_MEL_BUCKETS = (128, 256, 512, 1024)


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def ref_mel_padded(reference_audio: np.ndarray | None,
                   n_mels: int) -> tuple[np.ndarray, int]:
    """Reference audio -> (bucket-padded mel [1, n_mels, mb], frames used).

    Single source of truth for the style-encoder input convention (the
    trained fixture computes its training-time reference style through this
    same helper, so train and inference cannot drift). None = the silence
    default (1 s of zeros). Padding REPLICATES the last frame: the style
    encoder's convs smear a few boundary columns of padding into the masked
    pool at every scale, and zero (nowhere near log-mel silence) shifts the
    style vector; an edge-continued signal keeps the bleed negligible."""
    if reference_audio is None:
        reference_audio = np.zeros(SAMPLE_RATE, np.float32)
    mel = styletts2_ref_mel(reference_audio, n_mels)
    frames = mel.shape[1]
    mb = _bucket(frames, _MEL_BUCKETS)
    used = min(frames, mb)
    mel_pad = np.repeat(mel[None, :, used - 1 : used], mb, axis=2).astype(np.float32)
    mel_pad[0, :, :used] = mel[:, :mb]
    return mel_pad, used


class StyleTTS2Manager:
    def __init__(
        self,
        config: StyleTts2Config | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = cfg = config or STYLETTS2_BASE
        self.text_prog = StyleTts2TextProgram(cfg)
        self.style_prog = StyleTts2StyleProgram(cfg)
        self.predict_prog = StyleTts2PredictProgram(cfg)
        self.acoustic_prog = StyleTts2AcousticProgram(cfg, deterministic=True)
        self.g2p = EnglishG2P()
        self.phonemizer = StyleTts2Phonemizer(self.g2p)

        tb = min(cfg.max_tokens, _TOKEN_BUCKETS[0])
        fb = min(cfg.max_frames, 64)
        k = jax.random.split(jax.random.PRNGKey(rng_seed), 4)
        ids0 = jnp.zeros((1, tb), jnp.int32)
        len0 = jnp.array([tb], jnp.int32)
        bert0 = jnp.zeros((1, tb, cfg.albert_hidden))
        self.params = {
            "text": self.text_prog.init(k[0], ids0, len0),
            "style": self.style_prog.init(
                k[1], jnp.zeros((1, cfg.n_mels, 128)), jnp.array([128], jnp.int32),
                bert0, len0, jnp.zeros((1, 2 * cfg.style_dim)),
                jnp.zeros((DIFFUSION_STEPS - 1, 1, 2 * cfg.style_dim)),
            ),
            "predict": self.predict_prog.init(
                k[2], jnp.zeros((1, tb, cfg.d_model)),
                jnp.zeros((1, cfg.style_dim)), len0,
            ),
            "acoustic": self.acoustic_prog.init(
                k[3],
                jnp.zeros((1, tb, cfg.d_model + cfg.style_dim)),
                jnp.zeros((1, tb, cfg.d_model)),
                jnp.zeros((1, fb), jnp.int32), jnp.array([fb], jnp.int32),
                jnp.zeros((1, cfg.style_dim)), jnp.zeros((1, cfg.style_dim)),
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.STYLETTS2)
        for part in self.params:
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
        self._text_fn = jax.jit(self.text_prog.apply)
        self._style_fn = jax.jit(self.style_prog.apply)
        self._predict_fn = jax.jit(self.predict_prog.apply)
        self._acoustic_fn = jax.jit(self.acoustic_prog.apply)
        self._default_ref = np.zeros((1, 2 * cfg.style_dim), np.float32)

    # ------------------------------------------------------------------ api

    def synthesize(
        self,
        text: str,
        reference_audio: np.ndarray | None = None,
        *,
        alpha: float = 0.3,
        beta: float = 0.7,
        noise_seed: int = 0,
        speed: float = 1.0,
    ) -> StyleTts2Result:
        """Text -> 24 kHz samples. `alpha`/`beta` blend the diffusion-sampled
        style against the reference style (`StyleTTS2Synthesizer.swift:33-40`;
        defaults 0.3/0.7)."""
        cfg = self.cfg
        phonemes = self.phonemizer.phonemize(text)
        # long input: shared PhonemeChunker semantics (reference
        # TTS/Shared/PhonemeChunker.swift via issue #712 follow-up)
        from fluidaudio_tpu.tts.phoneme_chunker import chunk_phonemes

        # chunk at max_tokens - 1 chars so pad + per-char tokens always fit
        # the largest bucket (StyleTTS2Constants.maxPhonemeChunkChars)
        pieces = chunk_phonemes(phonemes, cfg.max_tokens - 1)
        if len(pieces) > 1:
            outs = [
                self._synthesize_phonemes(
                    piece, reference_audio, alpha=alpha, beta=beta,
                    noise_seed=noise_seed + i, speed=speed,
                ).samples
                for i, piece in enumerate(pieces)
            ]
            return StyleTts2Result(
                samples=np.concatenate(outs) if outs else np.zeros(0, np.float32),
                sample_rate=SAMPLE_RATE,
            )
        return self._synthesize_phonemes(
            phonemes, reference_audio, alpha=alpha, beta=beta,
            noise_seed=noise_seed, speed=speed,
        )

    def _synthesize_phonemes(
        self,
        phonemes: str,
        reference_audio: np.ndarray | None = None,
        *,
        alpha: float = 0.3,
        beta: float = 0.7,
        noise_seed: int = 0,
        speed: float = 1.0,
    ) -> StyleTts2Result:
        cfg = self.cfg
        ids = text_cleaner_encode(phonemes)[: cfg.max_tokens]
        n = len(ids)
        tb = _bucket(n, tuple(b for b in _TOKEN_BUCKETS if b < cfg.max_tokens) + (cfg.max_tokens,))
        tokens = np.zeros((1, tb), np.int32)
        tokens[0, :n] = ids
        lengths = jnp.asarray([n], jnp.int32)

        bert_dur, d_en, t_en = self._text_fn(
            self.params["text"], jnp.asarray(tokens), lengths
        )

        # style: ref_encoder + ADPM2 diffusion sampling
        mel_pad, used = ref_mel_padded(reference_audio, cfg.n_mels)
        rng = np.random.RandomState(noise_seed)
        noise_init = rng.randn(1, 2 * cfg.style_dim).astype(np.float32)
        noises_aux = rng.randn(DIFFUSION_STEPS - 1, 1, 2 * cfg.style_dim).astype(np.float32)
        s_pred, ref_s = self._style_fn(
            self.params["style"], jnp.asarray(mel_pad),
            jnp.asarray([used], jnp.int32), bert_dur, lengths,
            jnp.asarray(noise_init), jnp.asarray(noises_aux),
        )
        ref128, s128 = blend_style(np.asarray(s_pred), np.asarray(ref_s), alpha, beta)

        d, dur_logits = self._predict_fn(
            self.params["predict"], d_en, jnp.asarray(s128), lengths
        )
        durations = round_durations(np.asarray(dur_logits)[0], n).astype(np.float64)
        durations = np.maximum(np.rint(durations / max(speed, 0.05)), 1)
        frame_idx, total = expand_durations(durations, cfg.max_frames)
        fbkt = _bucket(total, tuple(b for b in (256, 512, 1024, 2048) if b < cfg.max_frames) + (cfg.max_frames,))
        audio = self._acoustic_fn(
            self.params["acoustic"], d, t_en,
            jnp.asarray(frame_idx[:fbkt])[None], jnp.asarray([total], jnp.int32),
            jnp.asarray(s128), jnp.asarray(ref128),
        )
        samples = np.asarray(audio[0])[: total * HOP + 1]
        trim = min(50, samples.size)  # tail trim (Synthesizer.swift:127-131)
        return StyleTts2Result(samples=samples[: samples.size - trim],
                               sample_rate=SAMPLE_RATE)
