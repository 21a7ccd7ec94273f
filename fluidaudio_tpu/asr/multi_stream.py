"""Multi-stream streaming ASR: N live streams batched into one chunk step.

Behavioral parity: reference multi-stream paths (`MultiStreamCommand.swift`,
`NemotronMultilingualMultiStreamBench.swift`) which run N independent manager
instances. TPU re-design (SURVEY §2.10): the N streams' conformer caches and
decode states stack on the batch axis, so every chunk tick is ONE device call
for all streams — throughput scales with N at near-constant latency.

Ragged arrival (realistic serving): streams buffer audio at independent
rates and may join/leave mid-session. Every tick steps the full static batch
on device, but rows without a full chunk carry a False entry in the step's
`active` mask — their conformer caches and decoder state are re-selected
from the pre-step values inside the jitted step, so a stalled or late-joining
stream produces EXACTLY the transcript it would produce running solo
(tests/test_multi_stream.py::test_ragged_join_leave_transcript_invariance).
`open_stream` reuses freed slots after `close_stream`, resetting that row's
caches/decode state in place.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.streaming_eou import (
    EOU_BLANK_ID,
    EOU_TOKEN_ID,
    MEL_HOP,
    MEL_WIN,
    SAMPLE_RATE,
)
from fluidaudio_tpu.models.conformer_streaming import (
    EOU_120M,
    StreamingConformerConfig,
    StreamingConformerEncoder,
    init_caches,
)
from fluidaudio_tpu.models.predictor import PredictorConfig, RnntJoint, RnntPredictor
from fluidaudio_tpu.models.zoo import _placeholder_vocab
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.ops.tdt_decode import TdtDecodeConfig, make_initial_state, tdt_greedy_decode
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("asr.multistream")


@dataclass
class _PerStream:
    pending: np.ndarray
    last_sample: float = 0.0
    tokens: list[int] = field(default_factory=list)
    ended: bool = False


class MultiStreamEouManager:
    def __init__(
        self,
        n_streams: int,
        chunk_ms: int = 320,
        *,
        enc_cfg: StreamingConformerConfig | None = None,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        self.n = n_streams
        self.chunk_samples = chunk_ms * SAMPLE_RATE // 1000
        self.mel_frames = self.chunk_samples // MEL_HOP
        self.enc_cfg = enc_cfg or EOU_120M
        self.encoder = StreamingConformerEncoder(self.enc_cfg)
        self.pred_cfg = PredictorConfig(
            vocab_size=EOU_BLANK_ID, pred_hidden=640, n_layers=1,
            enc_hidden=self.enc_cfg.d_model, joint_hidden=640, n_durations=0,
        )
        self.predictor = RnntPredictor(self.pred_cfg)
        self.joint = RnntJoint(self.pred_cfg)
        self.dcfg = TdtDecodeConfig(
            blank_id=EOU_BLANK_ID, durations=(), max_tokens=64, eou_id=EOU_TOKEN_ID
        )
        self.mel = MelFrontend(MelConfig(center=False, normalize=None))

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        caches = init_caches(self.enc_cfg, self.n)
        mel = jnp.zeros((self.n, self.enc_cfg.n_mels, self.mel_frames), jnp.float32)
        self.params = {
            "encoder": jax.jit(self.encoder.init)(k1, mel, caches),
            "predictor": jax.jit(self.predictor.init)(
                k2, jnp.zeros((self.n,), jnp.int32),
                jnp.zeros((1, self.n, self.pred_cfg.pred_hidden)),
                jnp.zeros((1, self.n, self.pred_cfg.pred_hidden)),
            ),
            "joint": jax.jit(self.joint.init)(
                k3, jnp.zeros((self.n, self.pred_cfg.enc_hidden)),
                jnp.zeros((self.n, self.pred_cfg.pred_hidden)),
            ),
        }
        # real EOU checkpoints + vocab when cached (same assets as the
        # single-stream manager; batch-1 trees broadcast over the stream axis
        # via a fresh batched init template)
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.PARAKEET_EOU)
        loaded = False
        for part in ("encoder", "predictor", "joint"):
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
                loaded = True
        if not loaded:
            logger.warning("multi-stream EOU: no checkpoints in %s — seeded random init", base)
        vocab_file = base / "vocab.json"
        self.tokenizer = (
            Tokenizer.from_json(vocab_file)
            if vocab_file.exists()
            else Tokenizer(_placeholder_vocab(EOU_TOKEN_ID))
        )
        self.caches = caches
        self.dec_state = make_initial_state(
            self.dcfg, self.pred_cfg.n_layers, self.pred_cfg.pred_hidden, self.n
        )
        self.streams = [
            _PerStream(pending=np.zeros(0, np.float32)) for _ in range(self.n)
        ]
        self._step = jax.jit(self._chunk_step)

    def _chunk_step(self, params, window, last, caches, dec_state, active):
        # mel fused into the batched step: ONE device dispatch per tick for
        # all streams (same rationale as streaming_eou._chunk_step)
        mel_chunk, _ = self.mel(window, last_samples=last)
        mel_chunk = mel_chunk[:, :, : self.mel_frames]
        enc, new_caches = self.encoder.apply(params["encoder"], mel_chunk, caches)
        lengths = jnp.where(active, enc.shape[1], 0).astype(jnp.int32)
        result = tdt_greedy_decode(
            self.dcfg,
            lambda t, h, c: self.predictor.apply(params["predictor"], t, h, c),
            lambda f, g: self.joint.apply(params["joint"], f, g),
            enc, lengths, dec_state,
        )
        # freeze state for inactive rows: caches batch axes are (0,1,1,0)
        # (StreamingCaches pre_cache/channel/time/channel_len), decode state
        # h/c are [L, B, H], last_token/time_jump [B]
        a0 = active[:, None, None]
        a1 = active[None, :, None, None]
        kept = type(caches)(
            pre_cache=jnp.where(a0, new_caches.pre_cache, caches.pre_cache),
            channel=jnp.where(a1, new_caches.channel, caches.channel),
            time=jnp.where(a1, new_caches.time, caches.time),
            channel_len=jnp.where(active, new_caches.channel_len, caches.channel_len),
        )
        ns = result.state
        kept_state = type(dec_state)(
            h=jnp.where(active[None, :, None], ns.h, dec_state.h),
            c=jnp.where(active[None, :, None], ns.c, dec_state.c),
            last_token=jnp.where(active, ns.last_token, dec_state.last_token),
            time_jump=jnp.zeros_like(ns.time_jump),
        )
        return result, kept, kept_state

    def feed(self, stream_idx: int, audio: np.ndarray) -> None:
        s = self.streams[stream_idx]
        s.pending = np.concatenate([s.pending, np.asarray(audio, np.float32).reshape(-1)])

    def end_stream(self, stream_idx: int) -> None:
        self.streams[stream_idx].ended = True

    # ------------------------------------------------------- ragged slots

    def close_stream(self, stream_idx: int) -> None:
        """Free a slot for reuse (its transcript remains readable until the
        slot is re-opened)."""
        self.streams[stream_idx].ended = True

    def open_stream(self) -> int:
        """Claim a free (ended) slot for a newly-joining stream; resets that
        row's conformer caches, decoder state and transcript in place."""
        for i, s in enumerate(self.streams):
            if s.ended:
                self._reset_slot(i)
                self.streams[i] = _PerStream(pending=np.zeros(0, np.float32))
                return i
        raise RuntimeError(f"all {self.n} stream slots are live")

    def _reset_slot(self, i: int) -> None:
        c = self.caches
        self.caches = type(c)(
            pre_cache=c.pre_cache.at[i].set(0.0),
            channel=c.channel.at[:, i].set(0.0),
            time=c.time.at[:, i].set(0.0),
            channel_len=c.channel_len.at[i].set(0),
        )
        d = self.dec_state
        self.dec_state = type(d)(
            h=d.h.at[:, i].set(0.0),
            c=d.c.at[:, i].set(0.0),
            last_token=d.last_token.at[i].set(self.dcfg.blank_id),
            time_jump=d.time_jump.at[i].set(0),
        )

    @property
    def ready(self) -> bool:
        """True when any live stream has a full chunk buffered."""
        need = self.chunk_samples + (MEL_WIN - MEL_HOP)
        return any(
            s.pending.size >= need for s in self.streams if not s.ended
        )

    def tick(self) -> list[list[int]]:
        """One batched chunk step; returns new token ids per stream."""
        need = self.chunk_samples + (MEL_WIN - MEL_HOP)
        window = np.zeros((self.n, need), np.float32)
        last = np.zeros((self.n,), np.float32)
        active = np.zeros((self.n,), bool)
        for i, s in enumerate(self.streams):
            if s.ended or s.pending.size < need:
                continue  # silent zero chunk keeps the cache cadence
            window[i] = s.pending[:need]
            last[i] = s.last_sample
            active[i] = True

        result, self.caches, self.dec_state = self._step(
            self.params, jnp.asarray(window), jnp.asarray(last),
            self.caches, self.dec_state, jnp.asarray(active)
        )

        counts, tokens = jax.device_get((result.counts, result.tokens))
        out: list[list[int]] = []
        for i, s in enumerate(self.streams):
            if active[i]:
                ids = [int(t) for t in tokens[i][: int(counts[i])]]
                s.tokens.extend(ids)
                s.last_sample = float(s.pending[self.chunk_samples - 1])
                s.pending = s.pending[self.chunk_samples :]
                out.append(ids)
            else:
                out.append([])
        return out

    def transcript(self, stream_idx: int) -> str:
        return self.tokenizer.decode(self.streams[stream_idx].tokens)
