"""Transducer losses in pure JAX: RNN-T and TDT (token-and-duration).

The reference is inference-only (CoreML); a TPU framework for the same model
families should also train them, so this module provides the exact losses the
shipped checkpoints were trained with (NeMo rnnt/tdt):

- `rnnt_loss`: log-domain forward DP over the (T, U) lattice. Sequential
  `lax.scan` over T; the intra-frame u-recurrence
  `alpha_t[u] = logaddexp(base[u], alpha_t[u-1] + emit[u-1])` is solved in
  O(log U) depth with an associative log-semiring scan (prefix trick:
  alpha = C + logcumsumexp(base - C), C = shifted cumsum of emit).
- `tdt_loss`: generalization with per-step duration distributions (Xu et al.,
  TDT). Token emissions may carry duration 0 (stay on the frame) which keeps
  the intra-frame recurrence; blanks must advance (duration >= 1). The scan
  over T carries the last `max(durations)` alpha rows.

Both are validated against a brute-force path-enumeration reference on small
lattices (tests/test_transducer_loss.py) and differentiate cleanly (jax.grad
through the scans).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def _log_cum_prefix(base: jnp.ndarray, emit: jnp.ndarray) -> jnp.ndarray:
    """Solve x[u] = logaddexp(base[u], x[u-1] + emit[u-1]) for u = 0..U
    (x[-1] = -inf) via an associative scan in the (max,+)->logsumexp semiring.

    base [..., U1], emit [..., U1] (emit[..., U1-1] unused). Returns x."""
    # C[u] = sum_{j<u} emit[j]
    C = jnp.cumsum(jnp.concatenate([jnp.zeros_like(emit[..., :1]),
                                    emit[..., :-1]], axis=-1), axis=-1)
    # x[u] = C[u] + logsumexp_{k<=u}(base[k] - C[k])
    shifted = base - C
    running = jax.lax.associative_scan(jnp.logaddexp, shifted, axis=-1)
    return C + running


def rnnt_loss(
    log_probs: jnp.ndarray,  # [B, T, U+1, V] log-softmaxed joint outputs
    labels: jnp.ndarray,  # [B, U] int32
    t_lengths: jnp.ndarray,  # [B]
    u_lengths: jnp.ndarray,  # [B] label counts
    blank_id: int,
) -> jnp.ndarray:
    """Negative log-likelihood per batch row [B]."""
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    u_idx = jnp.arange(U1)

    # per-(t,u) blank and emit scores
    blank = log_probs[..., blank_id]  # [B, T, U+1]
    lab = jnp.concatenate([labels, jnp.zeros((B, 1), labels.dtype)], axis=1)
    emit = jnp.take_along_axis(
        log_probs, lab[:, None, :, None], axis=3
    )[..., 0]  # [B, T, U+1]; emit[..., U] unused
    # forbid emitting beyond the label count
    emit = jnp.where(u_idx[None, None, :] < u_lengths[:, None, None], emit, NEG)

    # alpha over frames: row t computed from row t-1 (blank move), then the
    # intra-row emit recurrence
    def scan_body(alpha, ts):
        blank_prev, emit_row = ts  # [B, U+1] each
        base = alpha + blank_prev
        alpha_new = _log_cum_prefix(base, emit_row)
        return alpha_new, alpha_new

    alpha0_base = jnp.full((B, U1), NEG).at[:, 0].set(0.0)
    alpha0 = _log_cum_prefix(alpha0_base, emit[:, 0])  # row t=0
    # rows 1..T-1: blank from row t-1 uses scores at frame t-1; emits at frame t
    xs = (jnp.moveaxis(blank[:, :-1], 1, 0), jnp.moveaxis(emit[:, 1:], 1, 0))
    _, alphas_rest = jax.lax.scan(scan_body, alpha0, xs)
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T, B, U+1]

    # terminate: alpha[T_b - 1, U_b] + blank(T_b - 1, U_b)
    t_last = t_lengths - 1
    alpha_final = alphas[t_last, jnp.arange(B)]  # [B, U+1]
    alpha_end = jnp.take_along_axis(alpha_final, u_lengths[:, None], axis=1)[:, 0]
    blank_end = blank[jnp.arange(B), t_last, u_lengths]
    return -(alpha_end + blank_end)


def tdt_loss(
    token_log_probs: jnp.ndarray,  # [B, T, U+1, V] log-softmax over tokens
    dur_log_probs: jnp.ndarray,  # [B, T, U+1, D] log-softmax over durations
    durations: tuple[int, ...],  # e.g. (0, 1, 2, 3, 4)
    labels: jnp.ndarray,  # [B, U]
    t_lengths: jnp.ndarray,
    u_lengths: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """TDT negative log-likelihood per row [B]. Blank transitions must advance
    time (duration 0 blank is excluded, as in NeMo's TDT implementation)."""
    B, T, U1, V = token_log_probs.shape
    U = U1 - 1
    u_idx = jnp.arange(U1)
    D = len(durations)
    assert dur_log_probs.shape[-1] == D

    blank = token_log_probs[..., blank_id]
    lab = jnp.concatenate([labels, jnp.zeros((B, 1), labels.dtype)], axis=1)
    emit = jnp.take_along_axis(
        token_log_probs, lab[:, None, :, None], axis=3
    )[..., 0]
    emit = jnp.where(u_idx[None, None, :] < u_lengths[:, None, None], emit, NEG)

    max_d = max(durations)
    # duration 0 may sit anywhere in the bins tuple; indexing bin 0 for it
    # would silently drop every zero-duration emission from the lattice
    has_zero = 0 in durations
    zero_idx = durations.index(0) if has_zero else -1

    # window[d] holds alpha row of frame t-1-d (d = 0..max_d-1)
    def scan_body(window, t):
        # contributions landing exactly on frame t from earlier frames
        base = jnp.full((B, U1), NEG)
        for di, d in enumerate(durations):
            if d == 0:
                continue
            src_t = t - d  # source frame
            valid = src_t >= 0
            a_src = window[d - 1]  # alpha at frame t-d
            b = blank[:, jnp.maximum(src_t, 0)] + dur_log_probs[:, jnp.maximum(src_t, 0), :, di]
            base_blank = a_src + b
            e = emit[:, jnp.maximum(src_t, 0)] + dur_log_probs[:, jnp.maximum(src_t, 0), :, di]
            base_emit_shift = jnp.concatenate(
                [jnp.full((B, 1), NEG), (a_src + e)[:, :-1]], axis=1)
            contrib = jnp.logaddexp(base_blank, base_emit_shift)
            base = jnp.where(valid, jnp.logaddexp(base, contrib), base)
        base = jnp.where(t == 0, base.at[:, 0].set(0.0), base)
        # duration-0 token emissions within frame t
        if has_zero:
            e0 = emit[:, t] + dur_log_probs[:, t, :, zero_idx]
            alpha_t = _log_cum_prefix(base, e0)
        else:
            alpha_t = base
        window = jnp.concatenate([alpha_t[None], window[:-1]], axis=0)
        return window, alpha_t

    window0 = jnp.full((max_d, B, U1), NEG)
    _, alphas = jax.lax.scan(scan_body, window0, jnp.arange(T))  # [T, B, U+1]

    # terminate: from (t, U) take a blank whose duration jumps exactly to T_b
    end = jnp.full((B,), NEG)
    for di, d in enumerate(durations):
        if d == 0:
            continue
        t_src = t_lengths - d  # frame whose blank+duration d lands on T
        ok = t_src >= 0
        ts = jnp.maximum(t_src, 0)
        a = alphas[ts, jnp.arange(B)]
        a_u = jnp.take_along_axis(a, u_lengths[:, None], axis=1)[:, 0]
        b = blank[jnp.arange(B), ts, u_lengths]
        dd = dur_log_probs[jnp.arange(B), ts, u_lengths, di]
        end = jnp.where(ok, jnp.logaddexp(end, a_u + b + dd), end)
    return -end
