"""Batched greedy TDT / RNN-T decoding as a single compiled loop.

TPU-native re-design of the reference's per-token host loop
(`TDT/Decoder/TdtDecoderV3.swift:103-470`): instead of 2 CoreML calls per
emitted token with host control flow, the whole decode is ONE
`lax.while_loop` under jit. All rows of the batch advance together with
done-masks (the reference's worker pool of 4 cloned managers becomes a batch
dimension — SURVEY.md §2.10).

Semantics preserved from the reference decoder:
  - joint predicts (token, duration-bin); time advances by the predicted
    duration for blank AND non-blank (TDT), with blank forcing >=1 frame
  - the predictor (LSTM) only updates on non-blank emissions; its projection
    is cached across blank steps (`TdtDecoderV3.swift:347-405`)
  - force-blank anti-livelock: after `max_symbols_per_step` emissions on one
    frame, time is force-advanced (`TdtConfig.maxSymbolsPerStep`)
  - decode state (h, c, last_token, time_jump) can be carried across chunks
    (`TdtDecoderState.swift:5-99`)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TdtDecodeConfig:
    blank_id: int = 8192
    durations: tuple[int, ...] = (0, 1, 2, 3, 4)  # TdtConfig durationBins
    max_symbols_per_step: int = 10
    max_tokens: int = 512  # per window (TdtConfig.maxTokensPerChunk)
    include_duration_confidence: bool = False
    # last-chunk finalization flush: stop probing after this many consecutive
    # blanks (reference `TdtConfig.consecutiveBlankLimit`)
    consecutive_blank_limit: int = 5
    # end-of-utterance token (reference RnntDecoder.swift:31-32: eou 1024,
    # blank 1026 for the EOU 120M model). Treated as blank for decode state;
    # sets the per-row eou_detected flag. None disables.
    eou_id: int | None = None


class TdtDecodeState(NamedTuple):
    """Per-row decoder state carried across windows (TdtDecoderState parity).

    h/c hold the LSTM state from BEFORE `last_token` was consumed: the warm
    start re-runs `predictor_step(last_token, h, c)` and lands on exactly
    the post-consumption state + cached projection the in-loop carry had
    (storing the post-consumption state instead would make that warm-start
    step consume `last_token` a second time, corrupting the prediction
    context at every window/chunk boundary)."""

    h: jax.Array  # [L, B, H] pre-consumption of last_token
    c: jax.Array  # [L, B, H]
    last_token: jax.Array  # [B] int32 (blank == SOS)
    time_jump: jax.Array  # [B] int32: frames the previous window overshot


class TdtResult(NamedTuple):
    tokens: jax.Array  # [B, max_tokens] int32 (padded with blank)
    token_times: jax.Array  # [B, max_tokens] int32 encoder frame of emission
    counts: jax.Array  # [B] int32 number of emitted tokens
    state: TdtDecodeState
    confidences: jax.Array  # [B, max_tokens] f32 token prob
    eou_detected: jax.Array = None  # [B] bool (when cfg.eou_id is set)
    eou_frame: jax.Array = None  # [B] int32 frame of first EOU (-1 if none)
    durations: jax.Array = None  # [B, max_tokens] int32 predicted frames


def make_initial_state(cfg: TdtDecodeConfig, n_layers: int, hidden: int, batch: int,
                       dtype=jnp.float32) -> TdtDecodeState:
    z = jnp.zeros((n_layers, batch, hidden), dtype)
    return TdtDecodeState(
        h=z,
        c=z,
        last_token=jnp.full((batch,), cfg.blank_id, jnp.int32),
        time_jump=jnp.zeros((batch,), jnp.int32),
    )


def language_filter_rerank(
    token_logits: jax.Array,  # [B, V] (vocab incl. blank)
    k: jax.Array,  # [B] argmax token
    conf: jax.Array,  # [B] argmax prob
    allowed_mask: jax.Array,  # [V] bool: script-matching, non-blocklist tokens
    blank_id: int,
    top_k: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Script-aware top-K rerank inside the decode loop.

    Mirrors the reference's two per-step passes (`TdtDecoderV3.swift:620-700`):
    `tokenLanguageFilter` (replace a wrong-script top-1 with the best
    right-script top-K candidate) and `applyEnglishBlocklist` (for non-English
    Latin targets, swap blocklisted English words for the best allowed
    candidate). Both collapse into one pass over a single `allowed_mask`
    precomputed by `TokenLanguageFilter` (script match minus blocklist).
    Blanks are never replaced and never chosen as replacements; when no
    allowed candidate is in the top-K, the original prediction stands.
    Replacement confidence = softmax over the top-K (reference formula).
    """
    top_k = min(top_k, token_logits.shape[-1])
    tk_logits, tk_ids = jax.lax.top_k(token_logits, top_k)  # [B, K]
    cand_ok = allowed_mask[tk_ids] & (tk_ids != blank_id)
    masked = jnp.where(cand_ok, tk_logits, -jnp.inf)
    best = jnp.argmax(masked, axis=-1)  # [B]
    has_cand = jnp.isfinite(jnp.max(masked, axis=-1))

    need_swap = (k != blank_id) & ~allowed_mask[k] & has_cand
    best_id = jnp.take_along_axis(tk_ids, best[:, None], axis=-1)[:, 0]
    new_k = jnp.where(need_swap, best_id, k)

    tk_probs = jax.nn.softmax(tk_logits.astype(jnp.float32), axis=-1)
    best_prob = jnp.take_along_axis(tk_probs, best[:, None], axis=-1)[:, 0]
    new_conf = jnp.where(need_swap, best_prob, conf)
    return new_k.astype(jnp.int32), new_conf


def _finalize_last_chunk(cfg, predictor_step, joint_logits, encoder_out,
                         encoder_lengths, finalize_mask, final, durations,
                         is_tdt):
    """Reference last-chunk flush (`TdtDecoderV3.swift:469-578`), batched.

    Probes up to `max_symbols_per_step` extra joint steps per finalized row,
    cycling the frame between [current, eff-1, eff-2]; blanks accumulate and
    `consecutive_blank_limit` of them in a row ends the row; non-blanks emit
    (resetting the blank run) and advance by max(1, duration) clamped to eff.
    `final` is the main loop's carry; the returned carry has the flushed
    tokens appended and the predictor state advanced past them.
    """
    B, T, _ = encoder_out.shape
    n_dur = len(cfg.durations)
    eff = jnp.clip(encoder_lengths, 1, T)

    class FinCarry(NamedTuple):
        t: jax.Array
        h: jax.Array
        c: jax.Array
        g: jax.Array
        prev_h: jax.Array
        prev_c: jax.Array
        last_token: jax.Array
        tokens: jax.Array
        times: jax.Array
        confs: jax.Array
        durs: jax.Array
        count: jax.Array
        steps: jax.Array  # [B] additional flush steps taken
        blanks: jax.Array  # [B] consecutive blank run

    def fin_active(carry: FinCarry) -> jax.Array:
        return (
            finalize_mask
            & (carry.steps < cfg.max_symbols_per_step)
            & (carry.blanks < cfg.consecutive_blank_limit)
            & (carry.count < cfg.max_tokens)
        )

    def cond(carry: FinCarry) -> jax.Array:
        return jnp.any(fin_active(carry))

    def body(carry: FinCarry) -> FinCarry:
        active = fin_active(carry)
        # frame variations cycle: current position, last frame, second-to-last
        # — all clamped to the row's REAL frame count (the reference's
        # `encoderFrames.count` is the chunk's actual frames; our static [T]
        # axis is bucket padding whose frames must never be probed)
        v0 = jnp.clip(carry.t, 0, eff - 1)
        v1 = jnp.clip(eff - 1, 0, T - 1)
        v2 = jnp.clip(eff - 2, 0, T - 1)
        variations = jnp.stack([v0, v1, v2], axis=-1)  # [B, 3]
        frame = jnp.take_along_axis(
            variations, (carry.steps % 3)[:, None], axis=-1
        )[:, 0]
        f = jnp.take_along_axis(
            encoder_out, frame[:, None, None], axis=1
        )[:, 0, :]

        logits = joint_logits(f, carry.g)
        if is_tdt:
            token_logits = logits[:, : -n_dur]
            dur = durations[jnp.argmax(logits[:, -n_dur:], axis=-1)]
        else:
            token_logits = logits
            dur = jnp.zeros((B,), jnp.int32)
        k = jnp.argmax(token_logits, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(token_logits.astype(jnp.float32), axis=-1)
        conf = jnp.clip(jnp.take_along_axis(probs, k[:, None], axis=-1)[:, 0], 0.0, 1.0)

        is_blank_tok = k == cfg.blank_id
        if cfg.eou_id is not None:  # EOU never emits from the flush
            is_blank_tok = is_blank_tok | (k == cfg.eou_id)
        emit = active & ~is_blank_tok

        pos = jnp.clip(carry.count, 0, cfg.max_tokens - 1)
        row = jnp.arange(B)
        stamp = jnp.minimum(carry.t, eff - 1)
        tokens = carry.tokens.at[row, pos].set(
            jnp.where(emit, k, carry.tokens[row, pos])
        )
        times = carry.times.at[row, pos].set(
            jnp.where(emit, stamp, carry.times[row, pos])
        )
        confs = carry.confs.at[row, pos].set(
            jnp.where(emit, conf, carry.confs[row, pos])
        )
        durs = carry.durs.at[row, pos].set(
            jnp.where(emit, dur, carry.durs[row, pos])
        )
        count = carry.count + emit.astype(jnp.int32)

        new_token = jnp.where(emit, k, carry.last_token)
        g_new, h_new, c_new = predictor_step(new_token, carry.h, carry.c)
        sel = emit[:, None]
        sel3 = sel[None, :, :] if h_new.ndim == 3 else sel
        g = jnp.where(sel, g_new, carry.g)
        prev_h = jnp.where(sel3, carry.h, carry.prev_h)
        prev_c = jnp.where(sel3, carry.c, carry.prev_c)
        h = jnp.where(sel3, h_new, carry.h)
        c = jnp.where(sel3, c_new, carry.c)
        last_token = jnp.where(emit, k, carry.last_token)

        blanks = jnp.where(
            emit, 0, carry.blanks + (active & is_blank_tok).astype(jnp.int32)
        )
        t = jnp.where(
            active, jnp.minimum(carry.t + jnp.maximum(dur, 1), eff), carry.t
        )
        steps = carry.steps + active.astype(jnp.int32)
        return FinCarry(t, h, c, g, prev_h, prev_c, last_token,
                        tokens, times, confs, durs, count, steps, blanks)

    init = FinCarry(
        t=final.t, h=final.h, c=final.c, g=final.g,
        prev_h=final.prev_h, prev_c=final.prev_c,
        last_token=final.last_token,
        tokens=final.tokens, times=final.times, confs=final.confs,
        durs=final.durs, count=final.count,
        steps=jnp.zeros((B,), jnp.int32),
        blanks=jnp.zeros((B,), jnp.int32),
    )
    fin = jax.lax.while_loop(cond, body, init)
    return final._replace(
        t=fin.t, h=fin.h, c=fin.c, g=fin.g,
        prev_h=fin.prev_h, prev_c=fin.prev_c, last_token=fin.last_token,
        tokens=fin.tokens, times=fin.times, confs=fin.confs, durs=fin.durs,
        count=fin.count,
    )


def tdt_greedy_decode(
    cfg: TdtDecodeConfig,
    predictor_step: Callable[[jax.Array, jax.Array, jax.Array], tuple[jax.Array, jax.Array, jax.Array]],
    joint_logits: Callable[[jax.Array, jax.Array], jax.Array],
    encoder_out: jax.Array,  # [B, T, D] float
    encoder_lengths: jax.Array,  # [B] int32
    state: TdtDecodeState | None = None,
    allowed_mask: jax.Array | None = None,  # [V] bool language filter
    finalize_mask: jax.Array | None = None,  # [B] bool: row is a last chunk
) -> TdtResult:
    """Greedy TDT decode over a batch of encoder outputs.

    `predictor_step(tokens, h, c) -> (g, h', c')`; `joint_logits(f, g) ->
    [B, vocab+1+n_dur]`. Both must be jit-traceable (e.g. bound flax applies).
    `allowed_mask` enables decode-time script filtering (see
    `language_filter_rerank`; reference `TdtDecoderV3.swift:33-78`).

    `finalize_mask` marks rows decoding the LAST chunk of their utterance:
    after the main loop those rows run the reference's last-chunk
    finalization flush (`TdtDecoderV3.swift:469-578`) — probe frames cycling
    [current, eff-1, eff-2] for up to `max_symbols_per_step` extra steps,
    stopping after `consecutive_blank_limit` consecutive blanks, emitting any
    pending trailing tokens with timestamp `min(t, eff-1)`. The language
    filter deliberately does NOT run in the flush (reference note at
    `TdtDecoderV3.swift:601-604`). Finalized rows return `time_jump == 0`
    (the reference returns nil for last chunks).
    """
    B, T, _ = encoder_out.shape
    durations = jnp.asarray(cfg.durations, jnp.int32)
    n_dur = len(cfg.durations)
    is_tdt = n_dur > 0

    if state is None:
        raise ValueError("pass an explicit initial state (make_initial_state)")

    # time_jump from the previous window shifts this window's start frame
    t0 = jnp.maximum(state.time_jump, 0)

    class Carry(NamedTuple):
        t: jax.Array  # [B] current encoder frame
        h: jax.Array
        c: jax.Array
        g: jax.Array  # [B, H] cached predictor output for last_token
        prev_h: jax.Array  # [L, B, H] LSTM state BEFORE last_token (for carry-out)
        prev_c: jax.Array
        last_token: jax.Array
        sym_count: jax.Array  # [B] emissions on the current frame
        tokens: jax.Array  # [B, max_tokens]
        times: jax.Array
        confs: jax.Array
        durs: jax.Array  # [B, max_tokens] predicted duration (frames)
        count: jax.Array  # [B]
        eou: jax.Array  # [B] bool
        eou_frame: jax.Array  # [B] int32

    g0, h0, c0 = predictor_step(state.last_token, state.h, state.c)

    init = Carry(
        t=t0,
        h=h0,
        c=c0,
        g=g0,
        prev_h=state.h,
        prev_c=state.c,
        last_token=state.last_token,
        sym_count=jnp.zeros((B,), jnp.int32),
        tokens=jnp.full((B, cfg.max_tokens), cfg.blank_id, jnp.int32),
        times=jnp.zeros((B, cfg.max_tokens), jnp.int32),
        confs=jnp.zeros((B, cfg.max_tokens), jnp.float32),
        durs=jnp.zeros((B, cfg.max_tokens), jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
        eou=jnp.zeros((B,), bool),
        eou_frame=jnp.full((B,), -1, jnp.int32),
    )

    def cond(carry: Carry) -> jax.Array:
        active = (carry.t < encoder_lengths) & (carry.count < cfg.max_tokens)
        return jnp.any(active)

    def body(carry: Carry) -> Carry:
        active = (carry.t < encoder_lengths) & (carry.count < cfg.max_tokens)
        t_safe = jnp.clip(carry.t, 0, T - 1)
        f = jnp.take_along_axis(
            encoder_out, t_safe[:, None, None], axis=1
        )[:, 0, :]  # [B, D]

        logits = joint_logits(f, carry.g)  # [B, V+1(+n_dur)]
        if is_tdt:
            token_logits = logits[:, : -n_dur]
            dur_logits = logits[:, -n_dur:]
            dur = durations[jnp.argmax(dur_logits, axis=-1)]
        else:
            token_logits = logits
            dur = jnp.zeros((B,), jnp.int32)

        k = jnp.argmax(token_logits, axis=-1).astype(jnp.int32)
        probs = jax.nn.softmax(token_logits.astype(jnp.float32), axis=-1)
        conf = jnp.take_along_axis(probs, k[:, None], axis=-1)[:, 0]
        if allowed_mask is not None:
            k, conf = language_filter_rerank(
                token_logits, k, conf, allowed_mask, cfg.blank_id
            )

        force_blank = carry.sym_count >= cfg.max_symbols_per_step
        is_eou = (
            (k == cfg.eou_id) & active
            if cfg.eou_id is not None
            else jnp.zeros_like(active)
        )
        is_blank = (k == cfg.blank_id) | force_blank | ~active | is_eou

        # --- emission (non-blank rows) ---
        emit = ~is_blank
        pos = jnp.clip(carry.count, 0, cfg.max_tokens - 1)
        row = jnp.arange(B)
        tokens = carry.tokens.at[row, pos].set(
            jnp.where(emit, k, carry.tokens[row, pos])
        )
        times = carry.times.at[row, pos].set(
            jnp.where(emit, carry.t, carry.times[row, pos])
        )
        confs = carry.confs.at[row, pos].set(
            jnp.where(emit, conf, carry.confs[row, pos])
        )
        durs = carry.durs.at[row, pos].set(
            jnp.where(emit, dur, carry.durs[row, pos])
        )
        count = carry.count + emit.astype(jnp.int32)

        # --- predictor update (only where a token was emitted) ---
        new_token = jnp.where(emit, k, carry.last_token)
        g_new, h_new, c_new = predictor_step(new_token, carry.h, carry.c)
        sel = emit[:, None]
        sel3 = sel[None, :, :] if h_new.ndim == 3 else sel
        g = jnp.where(sel, g_new, carry.g)
        # the state BEFORE consuming the token just emitted (carry-out pair)
        prev_h = jnp.where(sel3, carry.h, carry.prev_h)
        prev_c = jnp.where(sel3, carry.c, carry.prev_c)
        h = jnp.where(sel3, h_new, carry.h)
        c = jnp.where(sel3, c_new, carry.c)
        last_token = jnp.where(emit, k, carry.last_token)

        # --- time advance (TDT semantics) ---
        if is_tdt:
            adv_blank = jnp.maximum(dur, 1)  # blank always moves on
            adv_emit = dur  # token may emit again on same frame (dur 0)
            adv = jnp.where(is_blank, adv_blank, adv_emit)
        else:
            adv = jnp.where(is_blank, 1, 0)  # classic RNN-T
        adv = jnp.where(force_blank, jnp.maximum(adv, 1), adv)
        adv = jnp.where(active, adv, 0)
        t = carry.t + adv

        sym_count = jnp.where(adv > 0, 0, carry.sym_count + emit.astype(jnp.int32))

        eou = carry.eou | is_eou
        eou_frame = jnp.where(is_eou & (carry.eou_frame < 0), carry.t, carry.eou_frame)

        return Carry(t, h, c, g, prev_h, prev_c, last_token, sym_count,
                     tokens, times, confs, durs, count, eou, eou_frame)

    final = jax.lax.while_loop(cond, body, init)

    if finalize_mask is not None:
        final = _finalize_last_chunk(
            cfg, predictor_step, joint_logits, encoder_out, encoder_lengths,
            finalize_mask, final, durations, is_tdt,
        )

    # frames the decode overshot past this window's end, carried to the next
    time_jump = jnp.maximum(final.t - encoder_lengths, 0)
    if finalize_mask is not None:
        time_jump = jnp.where(finalize_mask, 0, time_jump)

    return TdtResult(
        tokens=final.tokens,
        token_times=final.times,
        counts=final.count,
        state=TdtDecodeState(final.prev_h, final.prev_c, final.last_token, time_jump),
        confidences=final.confs,
        eou_detected=final.eou,
        eou_frame=final.eou_frame,
        durations=final.durs,
    )
