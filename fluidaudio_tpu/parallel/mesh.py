"""Device mesh + sharding rules: the TPU equivalent of the reference's
"device placement" layer (`MLComputeUnits` routing, SURVEY.md §2.10).

Design: a 2D ('data', 'model') mesh by default.
  - 'data'  : batch of audio windows / files (the reference's worker pool and
              multi-stream parallelism become this axis)
  - 'model' : tensor parallelism over hidden dims for the large encoders
Collectives ride ICI via XLA (GSPMD inserts all-gather/reduce-scatter from the
NamedSharding annotations); nothing here issues explicit NCCL-style calls.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None, model: int = 1
) -> Mesh:
    """Build a ('data', 'model') mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place arrays with their leading axis sharded over 'data'."""

    def put(x):
        x = jnp.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def param_sharding_rules(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel NamedShardings for a param pytree.

    Heuristic GSPMD rule set: 2D kernels shard their output (last) dim over
    'model' when divisible; embeddings shard their row dim; everything else is
    replicated. XLA then inserts the matching collectives. This is the "pick a
    mesh, annotate, let XLA insert collectives" recipe.
    """
    model_size = mesh.shape["model"]

    def rule(path, x):
        if model_size == 1 or x.ndim == 0:
            return NamedSharding(mesh, P())
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if x.ndim >= 2 and x.shape[-1] % model_size == 0 and ("kernel" in name or "embedding" in name):
            spec = [None] * x.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        if x.ndim == 1 and x.shape[0] % model_size == 0 and "bias" in name:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    shardings = param_sharding_rules(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
