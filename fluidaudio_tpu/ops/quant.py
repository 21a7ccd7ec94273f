"""Dynamic int8 quantized matmul for TPU MXU (w8a8, dequant on the fly).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured 235
TOP/s vs 145 TFLOP/s on the conformer FFN shapes, profile_int8). This
module provides a drop-in for `nn.Dense` on the encoder's large matmuls:

  - weights: per-OUTPUT-channel symmetric scales, quantized in-graph from
    the stored f32 kernel (param tree stays identical to nn.Dense —
    {kernel, bias} — so every checkpoint converter works unchanged)
  - activations: per-ROW (per token) symmetric dynamic scales
  - accumulate int32 on the MXU, dequantize as acc * s_row * s_col

The reference ships the same trade on its own hardware: Nemotron's ANE
encoder is int8 (SURVEY §2.4 "int8 encoder"). Accuracy: symmetric dynamic
w8a8 on conformer encoders is the standard NeMo/TensorRT recipe; the test
suite pins cosine similarity vs the bf16 path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[M, K] f32/bf16 -> (int8 [M, K], f32 scales [M, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[K, N] f32 -> (int8 [K, N], f32 scales [1, N]) per output channel."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Dynamic w8a8 x @ kernel -> f32 [..., N]."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    xq, sx = quantize_rows(x2)
    wq, sw = quantize_cols(kernel)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * sx * sw
    return out.reshape(*shape[:-1], kernel.shape[-1])


class Int8Dense(nn.Module):
    """nn.Dense drop-in (same {kernel, bias} params) on the int8 MXU path."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None  # output dtype (mirrors nn.Dense)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features),
            jnp.float32,
        )
        out = int8_matmul(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            out = out + bias
        return out.astype(self.dtype or x.dtype)
