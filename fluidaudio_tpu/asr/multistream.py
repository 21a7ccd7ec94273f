"""Multi-stream batched serving for the streaming ASR families.

The reference serves N concurrent live streams with a pool of cloned
managers on independent threads (`MultiStreamCommand.swift`,
`NemotronMultilingualMultiStreamBench.swift` — each stream owns a manager
and the OS schedules them). The TPU-native redesign packs the N streams'
mel pre-caches, conformer channel/time caches and RNN-T decoder states
along a batch axis and runs ONE jitted chunk program per serving tick:

- one device dispatch serves every stream that has a full chunk pending
  (the dominant cost for a tunneled/remote TPU is per-call RTT, so N
  streams cost the same round trip as one);
- the batch axis shards over a `jax.sharding.Mesh`'s 'data' axis
  (`set_mesh`), so adding chips adds serving capacity with no new code
  path — the same program runs SPMD, XLA partitions it;
- streams advance independently: rows without a full chunk this tick are
  masked (`active=False`) and their caches/decoder state pass through
  unchanged inside the jitted step, which keeps every stream bit-identical
  to the single-stream path (gated by tests/test_multistream.py).

Host-side text assembly (debounce, language-tag filtering, callbacks)
stays per stream and reuses the exact single-stream bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.conformer_streaming import StreamingCaches, init_caches
from fluidaudio_tpu.ops.tdt_decode import TdtDecodeState, make_initial_state

__all__ = [
    "MultiStreamSession",
    "MultiStreamMixin",
]


# ---------------------------------------------------------------- helpers
# Batch axes are NOT uniform across the carried state (conformer caches and
# LSTM h/c put batch on axis 1, the rest on axis 0), so masking and mesh
# sharding are written out per field instead of guessing from shapes.


def _mask_caches(active: jax.Array, new: StreamingCaches,
                 old: StreamingCaches) -> StreamingCaches:
    """Row-select: active rows take the freshly-computed caches, masked rows
    keep their previous state untouched."""
    m0 = active[:, None, None]            # [B,1,1]   batch on axis 0
    m1 = active[None, :, None, None]      # [1,B,1,1] batch on axis 1
    return StreamingCaches(
        pre_cache=jnp.where(m0, new.pre_cache, old.pre_cache),
        channel=jnp.where(m1, new.channel, old.channel),
        time=jnp.where(m1, new.time, old.time),
        channel_len=jnp.where(active, new.channel_len, old.channel_len),
    )


def _mask_dec_state(active: jax.Array, new: TdtDecodeState,
                    old: TdtDecodeState) -> TdtDecodeState:
    m1 = active[None, :, None]            # [1,B,1] h/c are [L,B,H]
    return TdtDecodeState(
        h=jnp.where(m1, new.h, old.h),
        c=jnp.where(m1, new.c, old.c),
        last_token=jnp.where(active, new.last_token, old.last_token),
        time_jump=jnp.where(active, new.time_jump, old.time_jump),
    )


def _state_shardings(mesh):
    """NamedShardings for the carried device state on a mesh 'data' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ns = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
    caches = StreamingCaches(
        pre_cache=ns(P("data")),
        channel=ns(P(None, "data")),
        time=ns(P(None, "data")),
        channel_len=ns(P("data")),
    )
    dec = TdtDecodeState(
        h=ns(P(None, "data")), c=ns(P(None, "data")),
        last_token=ns(P("data")), time_jump=ns(P("data")),
    )
    return caches, dec, ns(P("data")), ns(P())


@dataclass
class _HostStream:
    """Per-stream host-side bookkeeping — the same fields the single-stream
    `_StreamState` carries, minus the device arrays (those live batched on
    the session)."""

    pending: np.ndarray
    last_sample: float = 0.0
    consumed_samples: int = 0
    enc_frames_emitted: int = 0
    tokens: list[int] = field(default_factory=list)
    timestamps_ms: list[float] = field(default_factory=list)
    last_eou_ms: float = -1e9
    detected_language: str | None = None


@dataclass
class MultiStreamSession:
    """N concurrent streams served by one batched chunk program."""

    streams: list[_HostStream]
    caches: StreamingCaches          # batched [.., B, ..]
    dec_state: TdtDecodeState        # batched
    prompt_ids: np.ndarray | None = None  # [B] (multilingual Nemotron)

    @property
    def n(self) -> int:
        return len(self.streams)


class MultiStreamMixin:
    """Multi-stream serving for a streaming chunk manager.

    Host classes provide: `chunk_samples`, `mel_frames`, `params`,
    `enc_cfg`, `pred_cfg`, `dcfg`, `mel`, plus the two hooks
    `_apply_encoder(params, mel_chunk, caches, prompt_ids)` and
    `_host_advance(state, raw_ids, frames, eou_raw) -> partial`
    (the latter shared verbatim with the single-stream `_process_one`, so
    both paths stay behavior-identical by construction).
    """

    _mesh = None
    _multi_step_jit = None

    # `MEL_WIN - MEL_HOP` lookahead, matching the single-stream `process`
    @property
    def _need(self) -> int:
        return self.chunk_samples + 240

    # --------------------------------------------------------------- mesh

    def set_mesh(self, mesh) -> None:
        """Enable (None: disable) mesh-sharded multi-stream serving: the
        stream batch axis shards over the mesh's 'data' axis, params are
        replicated, and the SAME jitted chunk program runs SPMD (SURVEY
        §2.10; the reference's thread-pool-of-managers multi-stream becomes
        a sharded batch dimension)."""
        self._mesh = mesh
        self._multi_step_jit = None  # re-trace under the new placement
        if mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec

        self.params = jax.device_put(
            self.params, NamedSharding(mesh, PartitionSpec())
        )

    # ------------------------------------------------------------ session

    def make_multi_state(self, n_streams: int, *,
                         prompt_ids: np.ndarray | None = None,
                         forced_prefix: list[int | None] | None = None,
                         ) -> MultiStreamSession:
        if self._mesh is not None:
            n_data = self._mesh.shape["data"]
            if n_streams % n_data:
                raise ValueError(
                    f"n_streams={n_streams} must be a multiple of the mesh "
                    f"data axis ({n_data})"
                )
        caches = init_caches(self.enc_cfg, n_streams)
        dec = make_initial_state(
            self.dcfg, self.pred_cfg.n_layers, self.pred_cfg.pred_hidden,
            n_streams,
        )
        if forced_prefix is not None:
            lt = np.asarray(dec.last_token)
            for i, tok in enumerate(forced_prefix):
                if tok is not None:
                    lt[i] = int(tok)
            dec = dec._replace(last_token=jnp.asarray(lt))
        if self._mesh is not None:
            cs, ds, _, _ = _state_shardings(self._mesh)
            caches = jax.device_put(caches, cs)
            dec = jax.device_put(dec, ds)
        return MultiStreamSession(
            streams=[_HostStream(pending=np.zeros(0, np.float32))
                     for _ in range(n_streams)],
            caches=caches, dec_state=dec,
            prompt_ids=(np.asarray(prompt_ids, np.int32)
                        if prompt_ids is not None
                        else np.zeros(n_streams, np.int32)),
        )

    # -------------------------------------------------------- jitted step

    def _multi_chunk_step(self, params, windows, last_samples, caches,
                          dec_state, active, prompt_ids):
        from fluidaudio_tpu.ops.tdt_decode import tdt_greedy_decode

        mel_chunk, _ = self.mel(windows, last_samples=last_samples)
        mel_chunk = mel_chunk[:, :, : self.mel_frames]
        enc, new_caches = self._apply_encoder(
            params, mel_chunk, caches, prompt_ids
        )
        B, T = enc.shape[0], enc.shape[1]
        result = tdt_greedy_decode(
            self.dcfg,
            lambda t, h, c: self.predictor.apply(params["predictor"], t, h, c),
            lambda f, g: self.joint.apply(params["joint"], f, g),
            enc, jnp.full((B,), T, jnp.int32), dec_state,
        )
        new_state = result.state._replace(
            time_jump=jnp.zeros_like(result.state.time_jump)
        )
        new_caches = _mask_caches(active, new_caches, caches)
        new_state = _mask_dec_state(active, new_state, dec_state)
        counts = jnp.where(active, result.counts, 0)
        eou = (result.eou_detected & active
               if result.eou_detected is not None
               else jnp.zeros_like(active))
        return (result.tokens, result.token_times, counts, eou,
                new_caches, new_state)

    # -------------------------------------------------------------- serve

    def process_multi(self, session: MultiStreamSession,
                      audios: list[np.ndarray | None],
                      ) -> list[list]:
        """Feed per-stream 16 kHz samples (None/empty: no new audio for that
        stream this call) and serve every full chunk; returns, per stream,
        the list of partial results emitted this call."""
        if len(audios) != session.n:
            raise ValueError(f"expected {session.n} audio entries")
        for s, a in zip(session.streams, audios):
            if a is not None and np.size(a):
                s.pending = np.concatenate(
                    [s.pending, np.asarray(a, np.float32).reshape(-1)]
                )
        out: list[list] = [[] for _ in range(session.n)]
        while True:
            active = np.array([s.pending.size >= self._need
                               for s in session.streams])
            if not active.any():
                return out
            self._serve_tick(session, active, out)

    def flush_multi(self, session: MultiStreamSession,
                    streams: list[int] | None = None) -> list:
        """Zero-pad and flush the listed streams' tails (all by default):
        the multi-stream `finish()`. Returns one final result per flushed
        stream, in the given order."""
        idx = list(range(session.n)) if streams is None else list(streams)
        for i in idx:
            s = session.streams[i]
            if s.pending.size > 0:
                pad = (-s.pending.size) % self._need
                s.pending = np.concatenate(
                    [s.pending, np.zeros(pad, np.float32)]
                )
        while True:
            active = np.array([
                i in set(idx) and s.pending.size >= self._need
                for i, s in enumerate(session.streams)
            ])
            if not active.any():
                break
            self._serve_tick(session, active, [[] for _ in range(session.n)])
        return [self._final_result(session.streams[i]) for i in idx]

    def _serve_tick(self, session: MultiStreamSession, active: np.ndarray,
                    out: list[list]) -> None:
        B, need = session.n, self._need
        windows = np.zeros((B, need), np.float32)
        last = np.zeros((B,), np.float32)
        for i, s in enumerate(session.streams):
            if active[i]:
                windows[i] = s.pending[:need]
                last[i] = s.last_sample
        win_j = jnp.asarray(windows)
        last_j = jnp.asarray(last)
        act_j = jnp.asarray(active)
        pid_j = jnp.asarray(session.prompt_ids)
        if self._mesh is not None:
            _, _, row, _ = _state_shardings(self._mesh)
            win_j, last_j, act_j, pid_j = jax.device_put(
                (win_j, last_j, act_j, pid_j), (row, row, row, row)
            )
        if self._multi_step_jit is None:
            self._multi_step_jit = jax.jit(self._multi_chunk_step)
        tokens, times, counts, eou, caches, dec = self._multi_step_jit(
            self.params, win_j, last_j, session.caches, session.dec_state,
            act_j, pid_j,
        )
        session.caches, session.dec_state = caches, dec
        tokens_h, counts_h, times_h, eou_h = jax.device_get(
            (tokens, counts, times, eou)
        )
        for i, s in enumerate(session.streams):
            if not active[i]:
                continue
            count = int(counts_h[i])
            partial = self._host_advance(
                s, tokens_h[i][:count], times_h[i][:count], bool(eou_h[i])
            )
            out[i].append(partial)
