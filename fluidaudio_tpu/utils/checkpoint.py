"""Param pytree save/load as npz (flat '/'-joined keys).

The reference's "checkpointing" is its model asset cache (SURVEY.md §5); here
checkpoints are explicit param pytrees converted offline from the upstream
NeMo/PyTorch checkpoints. npz keeps loading dependency-light; orbax remains an
option for sharded checkpoints later.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) if hasattr(p, "idx") else str(p)
            for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params(path: str | Path, tree: Any) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(tree))


def load_params(path: str | Path, template: Any) -> Any:
    """Load into the structure of `template` (shapes/dtypes validated)."""
    data = np.load(path)
    flat_template = _flatten(template)
    missing = set(flat_template) - set(data.files)
    extra = set(data.files) - set(flat_template)
    if missing or extra:
        raise ValueError(f"checkpoint mismatch: missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}")
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_keys, leaf in leaves_with_path:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) if hasattr(p, "idx") else str(p)
            for p in path_keys
        )
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch at {key}: {arr.shape} vs {np.shape(leaf)}")
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
