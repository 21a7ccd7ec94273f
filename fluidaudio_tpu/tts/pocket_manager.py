"""PocketTtsManager: streaming AR TTS with voice cloning.

Behavioral parity: reference `PocketTTS/PocketTtsManager.swift` +
`PocketTtsSynthesizer.swift:142-287,498-707`: text tokens + 125-frame voice
prompt prefill the KV cache; then per 80 ms frame: flowlm_step (EOS logit
threshold -4.0) -> flow_decoder (8 Euler) -> mimi_decoder (1920 samples,
streaming states); voices persist to disk; cloning mimi-encodes a 1-30 s
sample. Streaming via a generator; `generate` = one fused scan (the
reference's `generatePipelined` overlap is subsumed by device-side fusion).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

_PREFILL_BUCKETS = (160, 192, 256, 384, 512)

from fluidaudio_tpu.models.pocket_tts import (
    EOS_THRESHOLD,
    FRAME_SAMPLES,
    KV_POSITIONS,
    LATENT_DIM,
    POCKET_BASE,
    SAMPLE_RATE,
    VOICE_PROMPT_FRAMES,
    FlowDecoder,
    FlowLm,
    KvCache,
    MimiDecoder,
    MimiEncoder,
    PocketTtsConfig,
    init_kv,
)
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.tts.pocket_text import chunk_text_with_metadata, normalize_text
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("tts.pocket")

MAX_TEXT_TOKENS = 256

# Voice-cloning window contract (PocketTtsVoiceCloner.swift:21-33): the Mimi
# encoder always consumes exactly 10 s @ 24 kHz and emits 125 frames.
ENCODER_INPUT_SAMPLES = 240_000
MIN_CLONE_SECONDS = 1.0


def make_encoder_input_buffer(samples: np.ndarray) -> np.ndarray:
    """Zero-pad or truncate to the fixed encoder window
    (`PocketTtsVoiceCloner.makeEncoderInputBuffer`)."""
    x = np.asarray(samples, np.float32).reshape(-1)
    buf = np.zeros(ENCODER_INPUT_SAMPLES, np.float32)
    n = min(x.size, ENCODER_INPUT_SAMPLES)
    buf[:n] = x[:n]
    return buf


def usable_frame_count(
    real_sample_count: int,
    available_frames: int,
    *,
    frame_size: int = 1920,
    max_voice_frames: int = VOICE_PROMPT_FRAMES,
) -> int:
    """Leading encoder frames covered by real (non-padding) audio:
    ceil(real/frame), capped at the KV budget and the encoder output
    (`PocketTtsVoiceCloner.usableFrameCount`)."""
    covered = -(-real_sample_count // frame_size)
    return max(1, min(covered, max_voice_frames, available_frames))


@dataclass
class PocketSynthesisResult:
    samples: np.ndarray
    sample_rate: int
    frames: int

    @property
    def duration(self) -> float:
        return self.samples.size / self.sample_rate


class PocketTtsManager:
    def __init__(
        self,
        config: PocketTtsConfig | None = None,
        *,
        language: str = "english",
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.cfg = config or POCKET_BASE
        self.language = language
        cfg = self.cfg
        self.flowlm = FlowLm(cfg)
        self.flow = FlowDecoder(cfg)
        self.mimi = MimiDecoder(cfg.mimi)
        self.mimi_enc = MimiEncoder(cfg.mimi)

        k = jax.random.split(jax.random.PRNGKey(rng_seed), 4)
        kv = init_kv(cfg, 1)
        self.params = {
            "flowlm": jax.jit(self.flowlm.init)(
                k[0], jnp.zeros((1, cfg.d_model)), jnp.zeros((1,), jnp.int32), kv
            ),
            "flow": jax.jit(self.flow.init)(
                k[1], jnp.zeros((1, cfg.d_model)), jnp.zeros((1, cfg.mimi.latent_dim))
            ),
            "mimi": jax.jit(self.mimi.init)(
                k[2], jnp.zeros((1, cfg.mimi.latent_dim)), self.mimi.init_state(1)
            ),
            "mimi_enc": jax.jit(self.mimi_enc.init)(
                k[3], jnp.zeros((1, cfg.mimi.hop * 2))
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.POCKET_TTS)
        # real SentencePiece vocab when cached (binary ModelProto, parsed by
        # asr/sentencepiece_model.py — no sentencepiece package needed)
        self.tokenizer = None
        sp_model = base / "tokenizer.model"
        if sp_model.exists():
            from fluidaudio_tpu.asr.tokenizer import Tokenizer

            self.tokenizer = Tokenizer.from_sentencepiece(sp_model)
        for part in self.params:
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
        self.frame_samples = cfg.mimi.hop  # 1920 at the base config
        self.voices: dict[str, np.ndarray] = self._load_voices(base)
        self._prefill_cache: dict[int, object] = {}
        self._generate_jit = jax.jit(self._generate_scan, static_argnums=(4,))

    def _load_voices(self, base: Path) -> dict[str, np.ndarray]:
        f = base / "voices.npz"
        if f.exists():
            data = np.load(f)
            return {k: data[k] for k in data.files}
        rng = np.random.RandomState(3)
        return {"default": rng.randn(VOICE_PROMPT_FRAMES, self.cfg.mimi.latent_dim).astype(np.float32) * 0.3}

    # ------------------------------------------------------------- voice clone

    def clone_voice(self, samples_24k: np.ndarray, name: str,
                    voices_dir: str | Path | None = None) -> None:
        """Mimi-encode a reference sample into a 125-frame voice prompt.

        Reference `PocketTtsVoiceCloner.swift:21-75`: the encoder always sees
        a fixed 10 s window (pad short audio with zeros, truncate longer),
        then only `ceil(real_samples / frame)` leading frames are trusted as
        conditioning. The fixed window is also the jit-friendly shape: every
        clone shares one compiled encoder program. Because the prefill scan
        carries a static 125-slot prompt, short clones tile their usable
        frames to fill the buffer (repeats of the voice rather than zeros).
        """
        x = np.asarray(samples_24k, np.float32).reshape(-1)
        if x.size < int(MIN_CLONE_SECONDS * SAMPLE_RATE):
            raise ValueError(
                f"voice sample too short: {x.size / SAMPLE_RATE:.2f}s "
                f"(minimum {MIN_CLONE_SECONDS}s required)"
            )
        real = min(x.size, ENCODER_INPUT_SAMPLES)
        buf = make_encoder_input_buffer(x)
        latents = np.asarray(
            jax.jit(self.mimi_enc.apply)(self.params["mimi_enc"], jnp.asarray(buf)[None])
        )[0]
        usable = usable_frame_count(
            real, latents.shape[0], frame_size=self.frame_samples
        )
        kept = latents[:usable]
        reps = -(-VOICE_PROMPT_FRAMES // usable)
        prompt = np.tile(kept, (reps, 1))[:VOICE_PROMPT_FRAMES]
        self.voices[name] = prompt.astype(np.float32)
        if voices_dir:
            out = Path(voices_dir)
            out.mkdir(parents=True, exist_ok=True)
            np.savez(out / "voices.npz", **self.voices)

    # --------------------------------------------------------------- generate

    def _prefill(self, text_tokens: jnp.ndarray, prompt: jnp.ndarray):
        """Run text + voice prompt through the flowlm to fill the KV cache.

        The scan length is BUCKETED (pad tokens, true length passed in) so
        distinct sentence lengths share compiled programs — keying on the
        exact token count meant one multi-minute XLA compile per new length.
        Padded steps write garbage KV at positions >= true length, which is
        harmless: the causal mask hides slots beyond the current position
        and generation overwrites each slot before attending to it.
        """
        n_text = text_tokens.shape[1]
        total = 1 + VOICE_PROMPT_FRAMES + n_text
        if total > _PREFILL_BUCKETS[-1]:
            # keep the prefill inside the KV budget (callers chunk long text
            # upstream; this is the belt-and-braces cap)
            keep = _PREFILL_BUCKETS[-1] - 1 - VOICE_PROMPT_FRAMES
            text_tokens = text_tokens[:, :keep]
            total = 1 + VOICE_PROMPT_FRAMES + keep
        bucket = next(b for b in _PREFILL_BUCKETS if b >= total)

        def run(params, tokens, prompt_latents, true_len):
            kv = init_kv(self.cfg, 1)
            text_emb = self.flowlm.apply(params, tokens[0], method=FlowLm.embed_text)
            prompt_emb = self.flowlm.apply(
                params, prompt_latents, method=FlowLm.embed_latent
            )
            bos = self.flowlm.apply(params, method=FlowLm.bos_embedding)[None]
            # reference prefill order: BOS, voice prompt, text
            # (PocketTtsSynthesizer.swift:519-526 prefillKVCache bosBeforeVoice)
            seq = jnp.concatenate([bos, prompt_emb, text_emb], axis=0)  # [n, D]
            seq = jnp.pad(seq, ((0, bucket - seq.shape[0]), (0, 0)))

            def step(carry, inp):
                kv, pos = carry
                x, = inp
                cond, eos, kv = self.flowlm.apply(
                    params, x[None], jnp.array([pos]), kv, method=FlowLm.step
                )
                return (kv, pos + 1), cond[0]

            (kv, pos), conds = jax.lax.scan(
                lambda c, x: step(c, (x,)), (kv, 0), seq
            )
            return kv, true_len, conds[true_len - 1]

        key = bucket
        if key not in self._prefill_cache:
            self._prefill_cache[key] = jax.jit(run)
        pad_tokens = jnp.pad(text_tokens, ((0, 0), (0, bucket - total)))
        return self._prefill_cache[key](
            self.params["flowlm"], pad_tokens, prompt, total
        )

    def _generate_scan(self, params, kv, start_pos, first_cond, max_frames, noise):
        """One fused scan: flowlm step -> flow Euler -> mimi decode per frame."""
        mimi_states = self.mimi.init_state(1)

        def step(carry, frame_noise):
            kv, pos, cond, states, done = carry
            latent = self.flow.apply(params["flow"], cond[None], frame_noise[None])[0]
            samples, states = self.mimi.apply(params["mimi"], latent[None], states)
            emb = self.flowlm.apply(
                params["flowlm"], latent[None], method=FlowLm.embed_latent
            )
            new_cond, eos_logit, kv = self.flowlm.apply(
                params["flowlm"], emb, jnp.array([pos]), kv, method=FlowLm.step
            )
            now_done = done | (eos_logit[0] > EOS_THRESHOLD)
            out = jnp.where(done, 0.0, samples[0])
            return (kv, pos + 1, new_cond[0], states, now_done), (out, now_done)

        init = (kv, start_pos, first_cond, mimi_states, jnp.asarray(False))
        _, (audio, done_flags) = jax.lax.scan(step, init, noise)
        return audio, done_flags

    def _count_tokens(self, text: str) -> int:
        return int(self._tokenize(text).shape[1])

    def synthesize(
        self,
        text: str,
        voice: str = "default",
        max_frames: int | None = None,
        seed: int = 0,
    ) -> PocketSynthesisResult:
        """Normalize + chunk the text (sentence/clause/word boundaries with
        mid-sentence prosody tags, ref PocketTtsSynthesizer.chunkText issue
        #584), synthesize each chunk, and concatenate."""
        chunks = chunk_text_with_metadata(
            text, self._count_tokens, language=self.language
        )
        pieces: list[PocketSynthesisResult] = []
        for i, chunk in enumerate(chunks):
            norm, frames_after_eos = normalize_text(
                chunk.text, chunk.is_mid_sentence, self.language
            )
            pieces.append(
                self._synthesize_chunk(
                    norm, voice, max_frames, seed + i, frames_after_eos
                )
            )
        if len(pieces) == 1:
            return pieces[0]
        return PocketSynthesisResult(
            samples=np.concatenate([p.samples for p in pieces]),
            sample_rate=SAMPLE_RATE,
            frames=sum(p.frames for p in pieces),
        )

    def _synthesize_chunk(
        self,
        text: str,
        voice: str = "default",
        max_frames: int | None = None,
        seed: int = 0,
        frames_after_eos: int = 0,
    ) -> PocketSynthesisResult:
        tokens = self._tokenize(text)
        prompt = self.voices.get(voice)
        if prompt is None:
            raise KeyError(f"unknown voice {voice!r}; available {sorted(self.voices)}")
        max_frames = min(
            max_frames or self.cfg.max_frames,
            KV_POSITIONS - tokens.shape[1] - VOICE_PROMPT_FRAMES - 1,
        )
        kv, pos, first_cond = self._prefill(tokens, jnp.asarray(prompt))
        noise = jax.random.normal(jax.random.PRNGKey(seed), (max_frames, self.cfg.mimi.latent_dim))
        t0 = time.perf_counter()
        audio, done = self._generate_jit(
            self.params, kv, pos, first_cond, max_frames, noise
        )
        audio = np.asarray(audio)
        done = np.asarray(done)
        # Keep a few frames past EOS detection for prosody tails (ref
        # shortTextPadFrames / longTextExtraFrames, issue #584).
        if done.any():
            n_frames = min(int(np.argmax(done)) + 1 + frames_after_eos, max_frames)
        else:
            n_frames = max_frames
        samples = audio[:n_frames].reshape(-1)
        logger.debug("pocket generate: %d frames in %.2fs", n_frames, time.perf_counter() - t0)
        return PocketSynthesisResult(samples=samples, sample_rate=SAMPLE_RATE,
                                     frames=n_frames)

    STREAM_BLOCK_FRAMES = 25  # 2 s per compiled block

    def stream(self, text: str, voice: str = "default", seed: int = 0
               ) -> Iterator[np.ndarray]:
        """Yield sample blocks INCREMENTALLY while generation continues.

        Generation runs in fixed-size blocks (one compiled scan per block
        size, state carried between blocks), so first audio arrives after
        ~STREAM_BLOCK_FRAMES frames instead of after the whole utterance
        (the reference's `generatePipelined` contract,
        `PocketTtsSynthesizer.swift:590`)."""
        text, _ = normalize_text(text, language=self.language)
        tokens = self._tokenize(text)
        prompt = self.voices.get(voice)
        if prompt is None:
            raise KeyError(f"unknown voice {voice!r}; available {sorted(self.voices)}")
        max_frames = min(
            self.cfg.max_frames,
            KV_POSITIONS - tokens.shape[1] - VOICE_PROMPT_FRAMES - 1,
        )
        kv, pos, cond = self._prefill(tokens, jnp.asarray(prompt))
        if not hasattr(self, "_block_jit"):
            self._block_jit = jax.jit(self._generate_block)
        mimi_states = self.mimi.init_state(1)
        done = jnp.asarray(False)
        key = jax.random.PRNGKey(seed)
        emitted = 0
        while emitted < max_frames and not bool(done):
            key, sub = jax.random.split(key)
            noise = jax.random.normal(
                sub, (self.STREAM_BLOCK_FRAMES, self.cfg.mimi.latent_dim)
            )
            (kv, pos, cond, mimi_states, done), (audio, done_flags) = self._block_jit(
                self.params, kv, pos, cond, mimi_states, done, noise
            )
            audio_np = np.asarray(audio)
            flags = np.asarray(done_flags)
            n = int(np.argmax(flags)) + 1 if flags.any() else flags.size
            n = min(n, max_frames - emitted)
            for i in range(n):
                yield audio_np[i]
            emitted += n

    def _generate_block(self, params, kv, pos, cond, mimi_states, done, noise):
        """One streaming block: same per-frame step as _generate_scan but
        with ALL state (incl. mimi conv tails + done flag) carried in/out."""

        def step(carry, frame_noise):
            kv, pos, cond, states, done = carry
            latent = self.flow.apply(params["flow"], cond[None], frame_noise[None])[0]
            samples, states = self.mimi.apply(params["mimi"], latent[None], states)
            emb = self.flowlm.apply(
                params["flowlm"], latent[None], method=FlowLm.embed_latent
            )
            new_cond, eos_logit, kv = self.flowlm.apply(
                params["flowlm"], emb, jnp.array([pos]), kv, method=FlowLm.step
            )
            now_done = done | (eos_logit[0] > EOS_THRESHOLD)
            out = jnp.where(done, 0.0, samples[0])
            return (kv, pos + 1, new_cond[0], states, now_done), (out, now_done)

        carry = (kv, pos, cond, mimi_states, done)
        carry, outs = jax.lax.scan(step, carry, noise)
        return carry, outs

    def _tokenize(self, text: str) -> jnp.ndarray:
        """SentencePiece tokenizer when `tokenizer.model` is cached (binary
        ModelProto via asr/sentencepiece_model.py, Viterbi segmentation);
        char-level stand-in otherwise."""
        if self.tokenizer is not None:
            ids: list[int] = []
            for wi, word in enumerate(text.split()):
                enc = self.tokenizer.encode_word(word, word_initial=True)
                if enc is None:  # fall back per-char through the vocab
                    enc = [i for c in word
                           if (i := self.tokenizer._piece_to_id.get(c)) is not None]
                ids.extend(enc)
            ids = [min(i, self.cfg.vocab_size - 1) for i in ids[:MAX_TEXT_TOKENS]]
            return jnp.asarray([ids or [1]], jnp.int32)
        from fluidaudio_tpu.tts.pocket_text import fallback_char_tokens

        return jnp.asarray(
            [fallback_char_tokens(text, self.cfg.vocab_size, MAX_TEXT_TOKENS)],
            jnp.int32,
        )
