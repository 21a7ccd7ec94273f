"""Fused rel-pos attention kernel vs the XLA reference path.

Runs in interpreter mode on CPU (the suite's platform); the same kernel is
exercised compiled on device by profile/bench runs. Parity target: the
kernel must reproduce `conformer.RelPosMHSA`'s semantics including the
Transformer-XL shift and length masking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluidaudio_tpu.ops.attention_pallas import (
    relpos_attention,
    relpos_attention_reference,
)


def _mk(B=2, H=2, T=40, Dh=128, seed=0):
    rng = np.random.RandomState(seed)
    # magnitudes chosen so post-softmax probs are PEAKED: near-uniform probs
    # average v and hide index-map bugs under tolerance (this suite once
    # passed with a row-mixing rel_shift in the XLA path because 0.3-scale
    # inputs washed out to near-uniform attention)
    f = lambda: jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 1.0)
    qu, qw, k, v = f(), f(), f(), f()
    p = jnp.asarray(rng.randn(H, 2 * T - 1, Dh).astype(np.float32) * 1.0)
    return qu, qw, k, v, p


def test_kernel_matches_reference_full_lengths():
    B, H, T, Dh = 2, 2, 40, 128
    qu, qw, k, v, p = _mk(B, H, T, Dh)
    lengths = jnp.array([T, T], jnp.int32)
    ref = relpos_attention_reference(qu, qw, k, v, p, lengths, T)
    got = relpos_attention(qu, qw, k, v, p, lengths, T, interpret=True)
    # kernel computes in bf16 on the MXU path; interpret mode still casts
    # inputs to bf16, so compare at bf16-appropriate tolerance
    ref_b = relpos_attention_reference(
        qu.astype(jnp.bfloat16).astype(jnp.float32),
        qw.astype(jnp.bfloat16).astype(jnp.float32),
        k.astype(jnp.bfloat16).astype(jnp.float32),
        v.astype(jnp.bfloat16).astype(jnp.float32),
        p.astype(jnp.bfloat16).astype(jnp.float32),
        lengths, T,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_b), atol=3e-2, rtol=3e-2)
    # and bf16 quantization itself is the only deviation from true f32
    np.testing.assert_allclose(np.asarray(ref_b), np.asarray(ref), atol=6e-2, rtol=6e-2)


def test_kernel_respects_lengths():
    B, H, T, Dh = 2, 2, 40, 128
    qu, qw, k, v, p = _mk(B, H, T, Dh, seed=1)
    lengths = jnp.array([T, 17], jnp.int32)
    got = relpos_attention(qu, qw, k, v, p, lengths, T, interpret=True)
    ref = relpos_attention_reference(
        qu.astype(jnp.bfloat16).astype(jnp.float32),
        qw.astype(jnp.bfloat16).astype(jnp.float32),
        k.astype(jnp.bfloat16).astype(jnp.float32),
        v.astype(jnp.bfloat16).astype(jnp.float32),
        p.astype(jnp.bfloat16).astype(jnp.float32),
        lengths, T,
    )
    # compare valid query rows only (padded-row behavior is uniform-prob
    # garbage in both paths but not bit-identical)
    got = np.asarray(got)
    ref = np.asarray(ref)
    np.testing.assert_allclose(got[0], ref[0], atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(got[1, :, :17], ref[1, :, :17], atol=5e-2, rtol=5e-2)


def test_shift_semantics_vs_conformer_rel_shift():
    """bd path alone (k=0): kernel shift == conformer._rel_shift gather.

    Probe design makes the INDEX MAP observable (an earlier version used
    v=ones, which any row-stochastic probs matrix maps to 1 — vacuous):
    qw rows and p rows are one-hot-ish so bd[t, s] is sharply peaked exactly
    when the kernel reads offset index (T-1) + (s - t); v carries a distinct
    per-key signature so the argmax key is visible in the output."""
    from fluidaudio_tpu.models.conformer import _rel_shift

    B, H, T, Dh = 1, 1, 24, 128
    rng = np.random.RandomState(2)
    qw = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32) * 2.0)
    p = jnp.asarray(rng.randn(H, 2 * T - 1, Dh).astype(np.float32) * 2.0)
    zeros = jnp.zeros((B, H, T, Dh))
    v = jnp.asarray(rng.randn(B, H, T, Dh).astype(np.float32))
    lengths = jnp.array([T], jnp.int32)
    got = relpos_attention(zeros, qw, zeros, v, p, lengths, T, interpret=True)

    qw_b = qw.astype(jnp.bfloat16).astype(jnp.float32)
    p_b = p.astype(jnp.bfloat16).astype(jnp.float32)
    v_b = v.astype(jnp.bfloat16).astype(jnp.float32)
    bd = jnp.einsum("bhtd,hrd->bhtr", qw_b, p_b)
    bd = _rel_shift(bd)  # [B,H,T,T]
    probs = jax.nn.softmax(bd / np.sqrt(Dh), axis=-1)
    ref = jnp.einsum("bhts,bhsd->bhtd", probs, v_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
    # and _rel_shift itself is the NeMo gather (redundant belt+braces here;
    # the index-level pin lives in tests/test_conformer_nemo_parity.py)
    r = np.arange(T)[None, :] - np.arange(T)[:, None] + (T - 1)
    bd_gather = np.take_along_axis(
        np.asarray(jnp.einsum("bhtd,hrd->bhtr", qw_b, p_b)),
        np.broadcast_to(r, (B, H, T, T)), axis=-1)
    np.testing.assert_allclose(np.asarray(bd), bd_gather, atol=1e-4, rtol=1e-4)
