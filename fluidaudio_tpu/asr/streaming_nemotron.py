"""Nemotron streaming ASR (en 0.6B + multilingual), cache-aware RNN-T.

Behavioral parity: reference `Streaming/Nemotron/StreamingNemotronAsrManager.
swift:10` (+Pipeline): chunk tiers 560/1120/2240 ms, cache-aware conformer,
greedy RNN-T; and `StreamingNemotronMultilingualAsrManager.swift:24`
(~40 locales): per-language `prompt_id` conditioning the encoder, latin
(2,828) vs multilingual (13,087) joint vocabularies, auto language detection
mode (here: prompt 0 = auto).

Shares the jitted chunk-step design of the EOU manager (one device call per
chunk; caches carried in HBM).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.multistream import MultiStreamMixin
from fluidaudio_tpu.asr.streaming_eou import (
    MEL_HOP,
    MEL_WIN,
    SAMPLE_RATE,
    EouPartialResult,
    _StreamState,
)
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.models.conformer_streaming import (
    StreamingConformerConfig,
    StreamingConformerEncoder,
    init_caches,
)
from fluidaudio_tpu.models.predictor import PredictorConfig, RnntJoint, RnntPredictor
from fluidaudio_tpu.models.zoo import _placeholder_vocab
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.ops.tdt_decode import TdtDecodeConfig, make_initial_state, tdt_greedy_decode
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("asr.nemotron")

NEMOTRON_TIERS_MS = (560, 1120, 2240)

# fallback multilingual locale -> prompt id table (0 = auto-detect); the
# real mapping ships in the model's metadata.json (prompt_dictionary,
# reference NemotronMultilingualStreamingConfig.swift:95-120)
NEMOTRON_LOCALES = {
    loc: i
    for i, loc in enumerate(
        ["auto", "en", "es", "fr", "it", "pt", "de", "nl", "pl", "ru", "uk", "cs",
         "ro", "hu", "sv", "da", "no", "fi", "tr", "ar", "he", "hi", "zh", "ja",
         "ko", "vi", "th", "id", "ms"]
    )
}


@dataclass
class NemotronMultilingualMetadata:
    """Operational config from the multilingual pack's metadata.json
    (reference `NemotronMultilingualStreamingConfig.swift:11-105`): the
    prompt-id dictionary, the auto-detect default (101), the prompt-table
    size (128) and the `<xx-XX>` language-tag token ids the model emits
    (filtered from transcripts; the first one = detected language)."""

    num_prompts: int = 128
    default_prompt_id: int = 101
    prompt_dictionary: dict | None = None
    lang_tag_token_ids: frozenset = frozenset()

    def __post_init__(self):
        if self.prompt_dictionary is None:
            self.prompt_dictionary = {"auto": self.default_prompt_id}

    @classmethod
    def load(cls, path):
        """Parse metadata.json. Unreadable/invalid JSON and a non-object
        root RAISE (reference `testLoadInvalidJsonFormatThrows` /
        `testLoadJsonArrayInsteadOfDictionaryThrows`); missing or
        wrong-typed keys fall back to defaults
        (`testLoadPartialJsonUsesDefaults` / `testLoadJsonWithWrongTypes`)."""
        import json as _json

        meta = _json.loads(Path(path).read_text())
        if not isinstance(meta, dict):
            raise ValueError(f"{path}: metadata root must be a JSON object")

        def _int(key: str, default: int) -> int:
            v = meta.get(key)
            return v if isinstance(v, int) and not isinstance(v, bool) else default

        pd = meta.get("prompt_dictionary")
        tags = meta.get("lang_tag_token_ids")
        return cls(
            num_prompts=_int("num_prompts", 128),
            default_prompt_id=_int("default_prompt_id", 101),
            prompt_dictionary=(
                {k: v for k, v in pd.items() if isinstance(v, int)}
                if isinstance(pd, dict) else {"auto": 101}
            ),
            lang_tag_token_ids=(
                frozenset(t for t in tags if isinstance(t, int))
                if isinstance(tags, list) else frozenset()
            ),
        )

    def prompt_id(self, language: str | None) -> int:
        """Resolve a language code to a prompt id with the reference's
        normalization fallbacks (`promptId(forLanguage:)`): exact ->
        underscore->dash -> xx-XX casing -> bare-prefix match -> default."""
        if not language:
            return self.default_prompt_id
        d = self.prompt_dictionary
        if language in d:
            return d[language]
        dashed = language.replace("_", "-")
        if dashed in d:
            return d[dashed]
        if "-" in dashed:
            lang, _, region = dashed.partition("-")
            cased = f"{lang.lower()}-{region.upper()}"
            if cased in d:
                return d[cased]
        prefix = dashed.split("-")[0].lower()
        for key, pid in d.items():
            if key.split("-")[0].lower() == prefix:
                return pid
        return self.default_prompt_id


@dataclass(frozen=True)
class NemotronSpec:
    name: str
    repo: Repo
    vocab_size: int  # excludes blank
    d_model: int = 1024
    n_layers: int = 24
    multilingual: bool = False
    pred_hidden: int = 640
    joint_hidden: int = 640


NEMOTRON_EN = NemotronSpec("nemotron-en", Repo.NEMOTRON_EN, vocab_size=1024)
NEMOTRON_MULTI_LATIN = NemotronSpec(
    "nemotron-multilingual-latin", Repo.NEMOTRON_MULTILINGUAL, vocab_size=2828,
    multilingual=True,
)
NEMOTRON_MULTI_FULL = NemotronSpec(
    "nemotron-multilingual", Repo.NEMOTRON_MULTILINGUAL, vocab_size=13087,
    multilingual=True,
)
#: hermetic trained-fixture spec (zoo `test-tiny` pattern): two synthetic
#: "languages" (pure-tone w-words ids 0-15 / harmonic v-words ids 16-31),
#: lang tags <aa-AA>=32 <bb-BB>=33, blank 34; prompts {auto:0, aa:1, bb:2}
NEMOTRON_TEST = NemotronSpec(
    "nemotron-test", Repo.NEMOTRON_MULTILINGUAL, vocab_size=34,
    d_model=64, n_layers=2, multilingual=True,
    pred_hidden=64, joint_hidden=64,
)


class _PromptedEncoder(nn.Module):
    """Streaming conformer + additive per-language prompt conditioning."""

    cfg: StreamingConformerConfig
    n_prompts: int

    @nn.compact
    def __call__(self, mel_chunk, caches, prompt_id):
        enc = StreamingConformerEncoder(self.cfg, name="encoder")
        x, new_caches = enc(mel_chunk, caches)
        if self.n_prompts > 0:
            table = self.param(
                "prompt_embed",
                nn.initializers.normal(0.02),
                (self.n_prompts, self.cfg.d_model),
                jnp.float32,
            )
            x = x + table[prompt_id][:, None, :].astype(x.dtype)
        return x, new_caches


def fleurs_to_multilingual_language(fleurs_code: str) -> str:
    """FLEURS locale (e.g. `en_us`) -> the multilingual pack's prompt-key
    format (`en-US`), with the reference's special cases
    (`NemotronMultilingualFleursBenchmark.fleursToMultilingualLanguage`).
    Unknown shapes pass through and fall back to the default prompt."""
    special = {"cmn_hans_cn": "zh-CN", "es_419": "es-ES",
               "pt_br": "pt-BR", "ar_eg": "ar-EG"}
    if fleurs_code in special:
        return special[fleurs_code]
    parts = fleurs_code.split("_")
    if len(parts) == 2:
        return f"{parts[0]}-{parts[1].upper()}"
    return fleurs_code


class StreamingNemotronAsrManager(MultiStreamMixin):
    def __init__(
        self,
        spec: NemotronSpec = NEMOTRON_EN,
        chunk_ms: int = 2240,
        *,
        language: str = "auto",
        enc_cfg: StreamingConformerConfig | None = None,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
        on_partial: Callable[[EouPartialResult], None] | None = None,
    ):
        assert chunk_ms in NEMOTRON_TIERS_MS
        self.spec = spec
        self.chunk_ms = chunk_ms
        self.chunk_samples = chunk_ms * SAMPLE_RATE // 1000
        self.mel_frames = self.chunk_samples // MEL_HOP
        self.on_partial = on_partial
        self.language = language

        self.enc_cfg = enc_cfg or StreamingConformerConfig(
            d_model=spec.d_model, n_layers=spec.n_layers
        )
        # resolve the asset folder + metadata FIRST: the prompt-embedding
        # table is sized from metadata.num_prompts (hardcoding 128 would
        # break packs with a different table size at load — or silently
        # clamp prompt ids under jit with random init)
        self._ckpt_base = self._resolve_base(checkpoint_dir)
        self.metadata = self._load_metadata(self._ckpt_base)
        self.encoder = _PromptedEncoder(
            self.enc_cfg, self.metadata.num_prompts if spec.multilingual else 0
        )
        self.pred_cfg = PredictorConfig(
            vocab_size=spec.vocab_size, pred_hidden=spec.pred_hidden, n_layers=1,
            enc_hidden=self.enc_cfg.d_model, joint_hidden=spec.joint_hidden,
            n_durations=0,
        )
        self.predictor = RnntPredictor(self.pred_cfg)
        self.joint = RnntJoint(self.pred_cfg)
        self.dcfg = TdtDecodeConfig(
            blank_id=spec.vocab_size, durations=(), max_symbols_per_step=10,
            max_tokens=256,
        )
        self.mel = MelFrontend(MelConfig(center=False, normalize=None))
        self._init_params(checkpoint_dir, rng_seed)
        if spec.multilingual:
            self.prompt_id = self.metadata.prompt_id(
                None if language == "auto" else language
            )
        else:
            self.prompt_id = 0
        self.detected_language: str | None = None
        self._step = jax.jit(self._chunk_step)

    def _resolve_base(self, checkpoint_dir) -> Path:
        root = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(self.spec.repo)
        # per-tier (and per-language for multilingual) asset subfolders: the
        # reference selects the HF subfolder at download
        # (StreamingNemotronMultilingualAsrManager.swift:24)
        candidates = [root / f"{self.chunk_ms}ms", root]
        if self.spec.multilingual and self.language not in ("auto", ""):
            lang_key = self.language.replace("_", "-").split("-")[0].lower()
            candidates = [root / lang_key / f"{self.chunk_ms}ms",
                          root / lang_key] + candidates
        return next(
            (c for c in candidates if (c / "encoder.npz").exists()), candidates[-1]
        )

    def _load_metadata(self, base: Path) -> NemotronMultilingualMetadata:
        if not self.spec.multilingual:
            return NemotronMultilingualMetadata(num_prompts=0, default_prompt_id=0)
        if (base / "metadata.json").exists():
            return NemotronMultilingualMetadata.load(base / "metadata.json")
        # no metadata asset: fall back to the built-in locale table
        return NemotronMultilingualMetadata(
            num_prompts=128,
            default_prompt_id=NEMOTRON_LOCALES["auto"],
            prompt_dictionary=dict(NEMOTRON_LOCALES),
        )

    def _init_params(self, checkpoint_dir, rng_seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        caches = init_caches(self.enc_cfg, 1)
        mel = jnp.zeros((1, self.enc_cfg.n_mels, self.mel_frames), jnp.float32)
        self.params = {
            "encoder": jax.jit(self.encoder.init)(
                k1, mel, caches, jnp.zeros((1,), jnp.int32)
            ),
            "predictor": jax.jit(self.predictor.init)(
                k2, jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, self.pred_cfg.pred_hidden)),
                jnp.zeros((1, 1, self.pred_cfg.pred_hidden)),
            ),
            "joint": jax.jit(self.joint.init)(
                k3, jnp.zeros((1, self.pred_cfg.enc_hidden)),
                jnp.zeros((1, self.pred_cfg.pred_hidden)),
            ),
        }
        base = self._ckpt_base
        loaded = False
        for part in ("encoder", "predictor", "joint"):
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
                loaded = True
        if not loaded:
            logger.warning("%s: no checkpoints in %s — seeded random init", self.spec.name, base)
        vocab_file = base / "vocab.json"
        self.tokenizer = (
            Tokenizer.from_json(vocab_file)
            if vocab_file.exists()
            else Tokenizer(_placeholder_vocab(self.spec.vocab_size))
        )

    def _chunk_step(self, params, window, last_sample, caches, dec_state, prompt_id):
        # mel fused into the chunk program (one dispatch per chunk; see
        # streaming_eou._chunk_step)
        mel_chunk, _ = self.mel(window, last_samples=last_sample)
        mel_chunk = mel_chunk[:, :, : self.mel_frames]
        return self._chunk_step_mel(params, mel_chunk, caches, dec_state, prompt_id)

    def _chunk_step_mel(self, params, mel_chunk, caches, dec_state, prompt_id):
        enc, new_caches = self.encoder.apply(params["encoder"], mel_chunk, caches, prompt_id)
        lengths = jnp.full((1,), enc.shape[1], jnp.int32)
        result = tdt_greedy_decode(
            self.dcfg,
            lambda t, h, c: self.predictor.apply(params["predictor"], t, h, c),
            lambda f, g: self.joint.apply(params["joint"], f, g),
            enc, lengths, dec_state,
        )
        return result, new_caches

    def set_language(self, language: str | None) -> None:
        """Switch the encoder's prompt conditioning between utterances
        (reference `StreamingNemotronMultilingualAsrManager.setLanguage`).
        The prompt id is a traced ARGUMENT of the chunk program, so this is
        pure data — no recompilation; unknown codes fall back to the
        metadata's default (auto-detect) prompt."""
        self.language = language or "auto"
        self.prompt_id = (
            self.metadata.prompt_id(None if self.language == "auto" else self.language)
            if self.spec.multilingual else 0
        )
        self.detected_language = None

    def lang_tag_token(self, language: str) -> int | None:
        """Vocab id of the `<xx-XX>` language-tag piece, if the pack has one
        (used by forced-prefix decoding, the reference's Whisper-style hard
        language lock, `NemotronMultilingualFleursBenchmark.Config.forcedPrefix`)."""
        code = (language or "").replace("_", "-")
        if "-" in code:
            l, _, r = code.partition("-")
            code = f"{l.lower()}-{r.upper()}"
        p2i = self.tokenizer._piece_to_id
        for cand in (f"<{code}>", f"<{code.split('-')[0].lower()}>"):
            if cand in p2i:
                return p2i[cand]
        return None

    def make_multi_state(self, n_streams: int, *,
                         languages: list[str | None] | None = None,
                         prompt_ids: np.ndarray | None = None,
                         forced_prefix: list[int | None] | None = None):
        """Multi-stream session with PER-STREAM language prompts: each row
        of the batched chunk program is conditioned by its own prompt id
        (`languages[i]`; None/'auto' = auto-detect), the TPU mapping of the
        reference's one-language-per-stream multi-stream bench."""
        if languages is not None:
            prompt_ids = np.asarray([
                self.metadata.prompt_id(
                    None if lang in (None, "auto") else lang)
                if self.spec.multilingual else 0
                for lang in languages
            ], np.int32)
        elif prompt_ids is None:
            prompt_ids = np.full(n_streams, self.prompt_id, np.int32)
        return super().make_multi_state(
            n_streams, prompt_ids=prompt_ids, forced_prefix=forced_prefix
        )

    # public API mirrors the EOU manager
    def make_state(self, forced_prefix: int | None = None) -> _StreamState:
        """`forced_prefix`: seed the decoder as if that token (a `<xx-XX>`
        lang tag) was just emitted — TdtDecodeState stores h/c
        PRE-consumption of last_token, so setting last_token alone is the
        exact seeding (the warm start consumes it first)."""
        dec_state = make_initial_state(
            self.dcfg, self.pred_cfg.n_layers, self.pred_cfg.pred_hidden, 1
        )
        if forced_prefix is not None:
            dec_state = dec_state._replace(
                last_token=jnp.full_like(dec_state.last_token, int(forced_prefix))
            )
        return _StreamState(
            pending=np.zeros(0, np.float32),
            last_sample=0.0,
            consumed_samples=0,
            caches=init_caches(self.enc_cfg, 1),
            dec_state=dec_state,
        )

    def process(self, audio: np.ndarray, state: _StreamState) -> list[EouPartialResult]:
        audio = np.asarray(audio, np.float32).reshape(-1)
        state.pending = np.concatenate([state.pending, audio])
        need = self.chunk_samples + (MEL_WIN - MEL_HOP)
        results = []
        while state.pending.size >= need:
            results.append(self._process_one(state))
        return results

    def finish(self, state: _StreamState) -> EouPartialResult:
        need = self.chunk_samples + (MEL_WIN - MEL_HOP)
        if state.pending.size > 0:  # flush ANY tail (even < one mel window)
            pad = (-state.pending.size) % need
            state.pending = np.concatenate([state.pending, np.zeros(pad, np.float32)])
            while state.pending.size >= need:
                self._process_one(state)
        return self._final_result(state)

    def _final_result(self, state) -> EouPartialResult:
        return EouPartialResult(
            text=self.tokenizer.decode(state.tokens),
            token_ids=list(state.tokens),
            timestamps_ms=list(state.timestamps_ms),
            is_final=True,
            eou_detected=False,
        )

    def _apply_encoder(self, params, mel_chunk, caches, prompt_ids):
        """MultiStreamMixin hook: per-STREAM prompt conditioning — each row
        of a multi-stream batch can run a different language prompt (the
        reference's multi-stream bench runs one language per stream,
        `NemotronMultilingualMultiStreamBench.swift`)."""
        return self.encoder.apply(params["encoder"], mel_chunk, caches, prompt_ids)

    def _host_advance(self, state, raw_tokens, frames,
                      eou_raw: bool = False) -> EouPartialResult:
        """Host-side chunk bookkeeping — shared VERBATIM between the
        single-stream (`_process_one`) and batched multi-stream
        (`MultiStreamMixin._serve_tick`) paths, so they cannot drift."""
        del eou_raw  # Nemotron has no EOU head
        raw_ids = [int(t) for t in raw_tokens]
        # multilingual: the model emits leading <xx-XX> language-tag tokens —
        # filter them from the transcript, surface the first as the detected
        # language (NemotronMultilingualStreamingConfig.swift:44-47)
        tag_ids = getattr(self.metadata, "lang_tag_token_ids", frozenset())
        ids, ts_ms = [], []
        for t, f in zip(raw_ids, frames):
            if t in tag_ids:
                if state.detected_language is None:
                    piece = self.tokenizer.piece(t) or ""
                    state.detected_language = piece.strip("<>▁ ") or None
                    # mirror of the CURRENT stream's detection (convenience;
                    # per-stream truth lives on the state)
                    self.detected_language = state.detected_language
                continue
            ids.append(t)
            ts_ms.append((state.enc_frames_emitted + int(f)) * 80.0)
        state.tokens.extend(ids)
        state.timestamps_ms.extend(ts_ms)
        state.enc_frames_emitted += self.mel_frames // 8
        state.last_sample = float(state.pending[self.chunk_samples - 1])
        state.pending = state.pending[self.chunk_samples :]
        state.consumed_samples += self.chunk_samples
        partial = EouPartialResult(
            text=self.tokenizer.decode(state.tokens),
            token_ids=ids,
            timestamps_ms=ts_ms,
            is_final=False,
            eou_detected=False,
        )
        if self.on_partial:
            self.on_partial(partial)
        return partial

    def _process_one(self, state: _StreamState) -> EouPartialResult:
        window = state.pending[: self.chunk_samples + MEL_WIN - MEL_HOP]
        result, new_caches = self._step(
            self.params,
            jnp.asarray(window)[None, :],
            jnp.array([state.last_sample], jnp.float32),
            state.caches,
            state.dec_state,
            jnp.array([self.prompt_id], jnp.int32),
        )
        tokens_h, counts_h, times_h = jax.device_get(
            (result.tokens, result.counts, result.token_times)
        )
        count = int(counts_h[0])
        state.caches = new_caches
        state.dec_state = result.state._replace(
            time_jump=jnp.zeros_like(result.state.time_jump)
        )
        return self._host_advance(state, tokens_h[0][:count], times_h[0][:count])
