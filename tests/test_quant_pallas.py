"""Fused quantizing int8 matmul kernel (interpret-mode numerics)."""

import numpy as np
import jax.numpy as jnp

from fluidaudio_tpu.ops.quant import quantize_cols
from fluidaudio_tpu.ops.quant_pallas import int8_matmul_fused


def test_fused_matches_exact_matmul():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(100, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 192).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(192).astype(np.float32))
    wq, ws = quantize_cols(w)
    got = np.asarray(
        int8_matmul_fused(x, wq, ws, bias, block_m=64, block_n=128,
                          interpret=True), np.float32)
    exact = np.asarray(x @ w + bias)
    rel = np.abs(got - exact) / np.maximum(np.abs(exact), 1.0)
    assert rel.max() < 0.05


def test_fused_handles_padding_and_no_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(37, 128).astype(np.float32))  # M not tile-mult
    w = jnp.asarray(rng.randn(128, 130).astype(np.float32) * 0.1)  # N ragged
    wq, ws = quantize_cols(w)
    got = np.asarray(int8_matmul_fused(x, wq, ws, None, block_m=32,
                                       block_n=128, interpret=True), np.float32)
    exact = np.asarray(x @ w)
    assert got.shape == exact.shape
    rel = np.abs(got - exact) / np.maximum(np.abs(exact), 1.0)
    assert rel.max() < 0.05
