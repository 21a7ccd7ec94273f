"""Fused Transformer-XL relative-position attention (Pallas TPU kernel).

The XLA path for the conformer's rel-pos MHSA materializes ~7 HBM-resident
[B,H,T,T]-class tensors per layer (content scores, position scores at
[B,H,T,2T-1], the pad-reshape rel-shift, mask select, f32 softmax, probs).
This kernel computes one batch row's full attention (all heads) in VMEM:
both score matmuls, the rel-shift, masking, softmax, and the value matmul,
writing only the [T, Dh] output per head to HBM.

Layout: [B, H, T, Dh]. The conformer transposes its natural [B, T, H, Dh]
projections into this layout; feeding the kernel the natural layout with
strided per-head VMEM reads was measured SLOWER than paying the transposes
(v5e, B=128/T=188: 293 ms vs 283 ms encoder total).

The Transformer-XL shift (`conformer._rel_shift`) becomes one static lane
rotation + one `pltpu.roll` with per-row stride per <=128-row half (Mosaic
caps a strided roll's total shift below one lane width): bd[t, s] =
qp[t, (s + (T-1) - t) mod Rp]. Rp is 2T-1 rounded up one lane: lanes that
wrap (s >= Rp-(T-1)+t, so always s >= T) land in key columns the validity
mask forces to float32.min anyway, so neither extra table padding nor a
wider Rp is needed for correctness. Query rows pad to a sublane multiple
(T=188 -> 192) while only the key axis pads to a lane multiple (256) —
~25% less score work than a square 256 pad.

Semantics are identical to the XLA reference path
(tests/test_attention_pallas.py verifies elementwise): scores =
((q+u)k^T + shift((q+w)p^T)) / sqrt(Dh), invalid key columns forced to
float32.min before a f32 softmax (padded query rows therefore produce the
same uniform-prob garbage the XLA path produces; callers mask padded rows
downstream, `conformer.ConformerEncoder`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(len_ref, qu_ref, qw_ref, k_ref, v_ref, p_ref, out_ref,
                 *, t_real: int, scale: float):
    H = qu_ref.shape[1]
    Tq = qu_ref.shape[2]
    Tk = k_ref.shape[2]
    length = len_ref[0, 0, 0]  # this row's valid key count (tiled block)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
    valid = col < jnp.minimum(length, t_real)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)

    for h in range(H):  # unrolled: all heads of one batch row per program
        qu = qu_ref[0, h]  # [Tq, Dh] bf16
        qw = qw_ref[0, h]
        k = k_ref[0, h]  # [Tk, Dh]
        v = v_ref[0, h]
        p = p_ref[h]  # [Rp, Dh]

        ac = jax.lax.dot_general(
            qu, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Tq, Tk]
        qp = jax.lax.dot_general(
            qw, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Tq, Rp]
        # rel-shift: bd[t, s] = qp[t, (s + (t_real-1) - t) mod Rp]. Mosaic's
        # strided dynamic_rotate caps the per-call shift below one lane width
        # (128), so process <=128-row halves: a static lane rotation by
        # (t_real-1 - g0) for the half starting at row g0, then ONE strided
        # roll covering that half's 0..127 within-half row offsets.
        Rp = qp.shape[1]
        base = (t_real - 1) % Rp
        parts = []
        for g0 in range(0, Tq, 128):
            rows = min(128, Tq - g0)
            k_g = (base - g0) % Rp
            blk = qp[g0 : g0 + rows, :]
            blk = jnp.concatenate([blk[:, k_g:], blk[:, :k_g]], axis=1)
            blk = pltpu.roll(blk, 0, 1, stride=1, stride_axis=0)
            parts.append(blk)
        bd = (parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0))[:, :Tk]

        scores = jnp.where(valid, (ac + bd) * scale, neg)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)

        out = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, h] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("t_real", "interpret"))
def relpos_attention(
    qu: jax.Array,  # [B, H, T, Dh] (q + pos_bias_u), any float dtype
    qw: jax.Array,  # [B, H, T, Dh] (q + pos_bias_v)
    k: jax.Array,  # [B, H, T, Dh]
    v: jax.Array,  # [B, H, T, Dh]
    p: jax.Array,  # [H, 2T-1, Dh] position projections (XL row order)
    lengths: jax.Array,  # [B] int32 valid key counts
    t_real: int,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, H, T, Dh] f32 attention output (padded rows: uniform-prob avg,
    mask downstream). T is padded internally to a multiple of 128."""
    B, H, T, Dh = qu.shape
    assert T == t_real, f"T axis {T} != t_real {t_real}"
    Tq = max(_round_up(T, 64), 64)   # query rows: sublane-mult is enough
    Tk = max(_round_up(T, 128), 128)  # key axis: lane-mult required
    # wrapped roll lanes land in masked columns (s >= T), so one-lane
    # round-up of the true 2T-1 table is enough; Rp >= Tk for the bd slice
    Rp = max(_round_up(2 * t_real - 1, 128), Tk)

    dt = jnp.bfloat16
    def pad_to(x, n):
        x = x.astype(dt)
        return jnp.pad(x, ((0, 0), (0, 0), (0, n - x.shape[2]), (0, 0)))

    qu_p, qw_p = pad_to(qu, Tq), pad_to(qw, Tq)
    k_p, v_p = pad_to(k, Tk), pad_to(v, Tk)
    p_p = jnp.pad(p.astype(dt), ((0, 0), (0, Rp - p.shape[1]), (0, 0)))

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # lengths tiled [B,8,128]
            pl.BlockSpec((1, H, Tq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tk, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tk, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Rp, Dh), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Tq, Dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out_fn = pl.pallas_call(
        functools.partial(_attn_kernel, t_real=t_real,
                          scale=1.0 / math.sqrt(Dh)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dh), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tq * Dh * (2 * Tk + Rp),
            transcendentals=B * H * Tq * Tk,
            bytes_accessed=(2 * B * H * (Tq + Tk) * Dh + H * Rp * Dh) * 2
            + B * H * Tq * Dh * 4,
        ),
    )
    lengths_t = jnp.broadcast_to(
        lengths.astype(jnp.int32)[:, None, None], (B, 8, 128)
    )
    return out_fn(lengths_t, qu_p, qw_p, k_p, v_p, p_p)[:, :, :T, :]


def relpos_attention_reference(qu, qw, k, v, p, lengths, t_real):
    """Pure-XLA reference with identical semantics (for tests)."""
    B, H, T, Dh = qu.shape
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, k)
    # XL shift as an explicit gather: bd[t, s] = raw[t, (t_real-1) + (s - t)]
    # (identical to NeMo rel_shift + truncation; pinned by
    # tests/test_conformer_nemo_parity.py)
    r = jnp.arange(T)[None, :] - jnp.arange(T)[:, None] + (t_real - 1)
    pr = jnp.einsum("bhtd,hrd->bhtr", qw, p)
    bd = jnp.take_along_axis(pr, jnp.broadcast_to(r, (B, H, T, T)), axis=-1)
    scores = (ac + bd) / math.sqrt(Dh)
    col = jnp.arange(T)[None, None, None, :]
    valid = col < jnp.minimum(lengths, t_real)[:, None, None, None]
    scores = jnp.where(valid, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v.astype(jnp.float32))
