"""Dynamic int8 matmul path: numerics + conformer drop-in equivalence."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fluidaudio_tpu.ops.quant import Int8Dense, int8_matmul, quantize_cols, quantize_rows


def test_quantize_roundtrip_bounds():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32) * 3.0)
    q, s = quantize_rows(x)
    deq = q.astype(jnp.float32) * s
    # per-row symmetric int8: error <= scale/2 elementwise
    assert float(jnp.max(jnp.abs(deq - x) / s)) <= 0.5 + 1e-6
    qc, sc = quantize_cols(x)
    deqc = qc.astype(jnp.float32) * sc
    assert float(jnp.max(jnp.abs(deqc - x) / sc)) <= 0.5 + 1e-6


def test_int8_matmul_close_to_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32) * 0.05)
    exact = x @ w
    got = int8_matmul(x, w)
    # relative error of dynamic w8a8 on gaussian data: ~1% of column norm
    denom = jnp.maximum(jnp.abs(exact), 1.0)
    assert float(jnp.max(jnp.abs(got - exact) / denom)) < 0.05
    cos = float(jnp.sum(got * exact) / (jnp.linalg.norm(got) * jnp.linalg.norm(exact)))
    assert cos > 0.999


def test_int8_dense_params_match_nn_dense():
    """Same {kernel, bias} tree -> checkpoints/converters work unchanged."""
    import flax.linen as nn

    x = jnp.ones((2, 8))
    d = nn.Dense(4)
    q = Int8Dense(4)
    pd = d.init(jax.random.PRNGKey(0), x)
    pq = q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
    shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
    assert shapes(pd) == shapes(pq)
    # applying the quant module with the dense params reproduces the matmul
    out_d = d.apply(pd, x)
    out_q = q.apply(pd, x)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d), atol=0.05)


def test_quantized_conformer_matches_bf16_direction():
    """cfg.quantization='int8' encoder stays close to the full-precision one
    (cosine similarity on outputs) with an identical param tree."""
    from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder

    base = ConformerConfig(d_model=64, n_layers=2, n_heads=4,
                           subsampling_channels=32, dtype="float32")
    qcfg = dataclasses.replace(base, quantization="int8")
    enc = ConformerEncoder(base)
    qenc = ConformerEncoder(qcfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 128, 101).astype(np.float32))
    ml = jnp.full((2,), 101, jnp.int32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), mel, ml)
    qparams = jax.jit(qenc.init)(jax.random.PRNGKey(0), mel, ml)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(qparams))

    ref, _ = enc.apply(params, mel, ml)
    got, _ = qenc.apply(params, mel, ml)  # SAME params on the int8 path
    ref = np.asarray(ref).ravel()
    got = np.asarray(got).ravel()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9))
    assert cos > 0.98, cos
