"""Dynamic int8 quantized matmul for TPU MXU (w8a8, dequant on the fly).

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured 235
TOP/s vs 145 TFLOP/s on the conformer FFN shapes, profile_int8). This
module provides a drop-in for `nn.Dense` on the encoder's large matmuls:

  - weights: per-OUTPUT-channel symmetric scales, pre-quantized once at
    load (`quantize_dense_tree` converts any f32 {kernel, bias} Dense tree,
    so every checkpoint converter keeps emitting plain f32 trees)
  - activations: per-ROW (per token) symmetric dynamic scales
  - accumulate int32 on the MXU, dequantize as acc * s_row * s_col

The reference ships the same trade on its own hardware: Nemotron's ANE
encoder is int8 (SURVEY §2.4 "int8 encoder"). Accuracy: symmetric dynamic
w8a8 on conformer encoders is the standard NeMo/TensorRT recipe; the test
suite pins cosine similarity vs the bf16 path.

STATUS — experimental opt-in. With pre-quantized weights the flagship
pipeline measures 5,071x RT vs 6,570x on the bf16 path (v5e, B=128): the
per-matmul activation amax/quantize passes and f32 dequant epilogues cost
more HBM traffic than the 1.6x MXU rate saves under XLA. Making w8a8 win
end-to-end needs a Pallas int8 matmul with the quantize/dequant fused into
the kernel epilogue (TODO.md); until then bf16 stays the default.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import numpy as np
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
    """nn.Dense drop-in storing PRE-QUANTIZED weights.

    Params: kernel_q int8 [K, N], kernel_scale f32 [1, N], bias f32 [N].
    Weights are quantized ONCE — at init, or by `quantize_dense_tree` when
    loading an f32 checkpoint — so the hot path pays only the per-token
    activation quantization (quantizing 2.4 GB of f32 weights in-graph per
    call measured SLOWER than bf16: 4.3k vs 6.6k RTFx on the flagship).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None  # output dtype (mirrors nn.Dense)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]

        def init_q(key, shape, _):
            w = nn.initializers.lecun_normal()(key, shape, jnp.float32)
            # quantize against the CONSTANT init scale below (each flax
            # param gets its own folded RNG, so deriving the scale from a
            # second lecun draw would pair q of matrix A with s of matrix B)
            scale = 3.0 / np.sqrt(fan_in) / 127.0
            return jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)

        def init_s(key, shape, _):
            return jnp.full(shape, 3.0 / np.sqrt(fan_in) / 127.0, jnp.float32)

        kq = self.param("kernel_q", init_q, (fan_in, self.features), jnp.int8)
        ks = self.param("kernel_scale", init_s, (1, self.features), jnp.float32)

        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        xq, sx = quantize_rows(x2)
        acc = jax.lax.dot_general(
            xq, kq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = (acc.astype(jnp.float32) * sx * ks).reshape(
            *shape[:-1], self.features
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            out = out + bias
        return out.astype(self.dtype or x.dtype)


def quantize_dense_tree(tree):
    """Transform every {kernel, [bias]} Dense subtree into the Int8Dense
    layout ({kernel_q, kernel_scale, [bias]}); other leaves pass through.
    Used by model loaders to serve f32 checkpoints on the int8 path.

    Pure jnp on purpose: callers wrap it in ONE `jax.jit` so a 0.6B tree
    quantizes as a single device program (eager per-kernel dispatch through
    a remote-TPU relay takes minutes; host round-trips move gigabytes)."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                q, s = quantize_cols(jnp.asarray(node["kernel"]))
                out = {"kernel_q": q, "kernel_scale": s}
                for k, v in node.items():
                    if k != "kernel":
                        out[k] = walk(v)  # siblings may hold nested Dense trees
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(tree)
