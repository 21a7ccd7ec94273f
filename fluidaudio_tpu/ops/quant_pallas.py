"""Fused dynamic-quantize int8 matmul (Pallas TPU kernel).

The XLA w8a8 path loses to bf16 end-to-end (BENCHMARKS.md) because the
per-matmul activation amax/quantize and the f32 dequant epilogue are extra
HBM passes. This kernel does the whole thing tile-resident in VMEM:

    load x tile (bf16)  ->  row amax  ->  quantize int8   (VPU, no HBM)
    int8 dot int8 -> int32 on the MXU
    dequant * s_row * s_col (+bias) -> bf16 write          (epilogue)

so HBM traffic equals the plain bf16 matmul's while the MXU runs at the
int8 rate.

STATUS — experimental, NOT wired into the encoder. Measured on v5e via the
axon relay: this kernel runs the FFN chain at 136 ms vs 133 bf16 — Mosaic
lowers the int8 dot at bf16-class rate (an isolated `lax.dot_general`
int8 dot measures ~6-7 TOP/s under BOTH Pallas and XLA; the 235 TOP/s
int8 rate appears only in XLA's fused int8 chains). Until Mosaic emits
native int8 MXU ops on this toolchain the bf16 path stays the default;
the kernel and its tests are kept as the ready integration point.

Grid is (N-blocks, M-blocks) with the weight block index depending only on
the N coordinate: Pallas keeps a block resident when its index map result
is unchanged between consecutive grid steps, so each weight tile is
fetched once per N-block while the M axis sweeps. K stays whole (encoder
K in {1024, 4096} fits VMEM alongside the tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, wq_ref, ws_ref, b_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # [BM, K]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s_row = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / s_row), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [BM, BN] int32
    out = acc.astype(jnp.float32) * s_row * ws_ref[:]
    out = out + b_ref[:]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def int8_matmul_fused(
    x: jax.Array,  # [M, K] bf16/f32
    wq: jax.Array,  # [K, N] int8 (pre-quantized, per-output-channel)
    ws: jax.Array,  # [1, N] f32 column scales
    bias: jax.Array | None = None,  # [N] f32
    *,
    block_m: int = 512,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    Kw, N = wq.shape
    assert Kw == K
    # VMEM budget: the kernel materializes the x tile in f32 for the row
    # amax/quantize, so cap BM*K*4B (+double-buffered inputs) under ~12 MB
    if block_m * K * 4 > 6 * 1024 * 1024:
        block_m = max(32, (6 * 1024 * 1024) // (K * 4) // 32 * 32)
    BM = min(block_m, _round_up(M, 32))
    BN = min(block_n, _round_up(N, 128))
    Mp, Np = _round_up(M, BM), _round_up(N, BN)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        wq = jnp.pad(wq, ((0, 0), (0, Np - N)))
        ws = jnp.pad(ws, ((0, 0), (0, Np - N)))
    b = (jnp.zeros((1, Np), jnp.float32) if bias is None else jnp.pad(
        bias.astype(jnp.float32), (0, Np - N)
    ).reshape(1, Np))

    grid_spec = pl.GridSpec(
        # N outer, M inner: the weight tile's index map depends only on the
        # outer coordinate, so it stays VMEM-resident across the M sweep
        grid=(Np // BN, Mp // BM),
        in_specs=[
            pl.BlockSpec((1, BM, K), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BM, BN), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Mp // BM, BM, Np), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * Np,
            transcendentals=0,
            bytes_accessed=Mp * K * 2 + (Np // BN) * Mp * K * 2
            + K * Np + Mp * Np * 2,
        ),
    )(x.reshape(Mp // BM, BM, K), wq, ws.astype(jnp.float32), b)
    return out.reshape(Mp, Np)[:M, :N]
