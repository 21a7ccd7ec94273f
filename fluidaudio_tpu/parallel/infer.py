"""Mesh-sharded batch inference: encoder forward + greedy TDT decode.

The serving-side counterpart of `parallel/train.py`: batch rows shard over
the 'data' axis (the reference's worker-pool data parallelism,
`ChunkProcessor.swift:397-632`, re-expressed as a sharded batch dimension),
while kernels shard over 'model' via the same `param_sharding_rules` the
train step uses. XLA inserts the collectives; decode runs as one
`lax.while_loop` per shard with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluidaudio_tpu.ops.tdt_decode import (
    TdtDecodeConfig,
    make_initial_state,
    tdt_greedy_decode,
)
from fluidaudio_tpu.parallel.mesh import param_sharding_rules


def jit_sharded_infer(mesh: Mesh, modules, pcfg, params,
                      durations: tuple[int, ...] = (0, 1, 2, 3, 4)):
    """jit an (encoder -> TDT greedy decode) forward over the mesh.

    Returns `infer(params, mel, mel_lengths) -> (tokens, counts,
    enc_lengths)` with mel batch-sharded on 'data' and params sharded by
    `param_sharding_rules`. Used by the driver's multichip dryrun to prove
    the *inference* path (not just training) compiles and executes under
    real dp+tp shardings.
    """
    encoder, predictor, joint = modules
    dcfg = TdtDecodeConfig(
        blank_id=pcfg.blank_id, durations=durations, max_tokens=64
    )

    def infer(params, mel, mel_lengths):
        enc, enc_lengths = encoder.apply(params["encoder"], mel, mel_lengths)
        B = enc.shape[0]

        def predictor_step(tokens, h, c):
            return predictor.apply(params["predictor"], tokens, h, c)

        def joint_logits(f, g):
            return joint.apply(params["joint"], f, g)

        state = make_initial_state(dcfg, pcfg.n_layers, pcfg.pred_hidden, B,
                                   dtype=enc.dtype)
        result = tdt_greedy_decode(
            dcfg, predictor_step, joint_logits, enc, enc_lengths, state
        )
        return result.tokens, result.counts, enc_lengths

    param_sh = param_sharding_rules(mesh, params)
    batch_sh = (
        param_sh,
        NamedSharding(mesh, P("data", None, None)),
        NamedSharding(mesh, P("data")),
    )
    out_sh = (
        NamedSharding(mesh, P("data", None)),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
    )
    return jax.jit(infer, in_shardings=batch_sh, out_shardings=out_sh)
