"""Dynamic int8 matmul path: numerics + conformer drop-in equivalence."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from fluidaudio_tpu.ops.quant import (
    Int8Dense,
    int8_matmul,
    quantize_cols,
    quantize_dense_tree,
    quantize_rows,
)


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
    denom = jnp.maximum(jnp.abs(exact), 1.0)
    assert float(jnp.max(jnp.abs(got - exact) / denom)) < 0.05
    cos = float(jnp.sum(got * exact) / (jnp.linalg.norm(got) * jnp.linalg.norm(exact)))
    assert cos > 0.999


def test_quantize_dense_tree_serves_f32_checkpoints():
    """f32 nn.Dense tree -> Int8Dense layout; apply reproduces the matmul."""
    import flax.linen as nn

    x = jnp.asarray(np.random.RandomState(2).randn(4, 8).astype(np.float32))
    d = nn.Dense(6)
    pd = d.init(jax.random.PRNGKey(0), x)
    q = Int8Dense(6)
    pq = quantize_dense_tree(pd)
    leaves = pq["params"]
    assert set(leaves) == {"kernel_q", "kernel_scale", "bias"}
    assert leaves["kernel_q"].dtype == np.int8
    out_d = np.asarray(d.apply(pd, x))
    out_q = np.asarray(q.apply(pq, x))
    np.testing.assert_allclose(out_q, out_d, atol=0.05)
    # init alone also produces the right structure
    pi = q.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(pi)
            == jax.tree_util.tree_structure(pq))


def test_quantized_conformer_matches_f32_direction():
    """int8 encoder on a quantized f32 tree stays close to the f32 encoder
    (output cosine similarity)."""
    from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder

    base = ConformerConfig(d_model=64, n_layers=2, n_heads=4,
                           subsampling_channels=32, dtype="float32")
    qcfg = dataclasses.replace(base, quantization="int8")
    enc = ConformerEncoder(base)
    qenc = ConformerEncoder(qcfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 128, 101).astype(np.float32))
    ml = jnp.full((2,), 101, jnp.int32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), mel, ml)
    qparams = quantize_dense_tree(params)
    assert (jax.tree_util.tree_structure(qparams)
            == jax.tree_util.tree_structure(
                jax.jit(qenc.init)(jax.random.PRNGKey(0), mel, ml)))

    ref, _ = enc.apply(params, mel, ml)
    got, _ = qenc.apply(qparams, mel, ml)
    ref = np.asarray(ref).ravel()
    got = np.asarray(got).ravel()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9))
    assert cos > 0.98, cos


def test_zoo_loads_quantized():
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load("test-tiny", allow_random_init=True,
                            quantization="int8")
    enc_params = models.params["encoder"]["params"]
    blk = enc_params["block0"]["mhsa"]
    assert "kernel_q" in blk["q"]
    assert blk["q"]["kernel_q"].dtype == np.int8
