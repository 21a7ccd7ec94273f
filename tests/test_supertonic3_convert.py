"""Supertonic3 topology-based ONNX conversion: the matcher must recover the
exact ground-truth tree from graphs with OPAQUE tensor names, the trees must
load into the flax stages (shape-exact vs init), and the loaded models must
run. Mismatched graphs must fail loudly with positional diffs.

Reference contract: upstream ships ONNX only
(`Supertonic3Constants.swift:9-13`); conversion keys on node order/op/shape,
never names (VERDICT r2 #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.convert.supertonic3 import (
    SLOT_BUILDERS,
    STAGES,
    ConversionError,
    convert_supertonic3,
    match_stage,
    synthesize_supertonic3_fixture,
)
from fluidaudio_tpu.models.supertonic3 import (
    SUPERTONIC3_TEST,
    Supertonic3DurationPredictor,
    Supertonic3TextEncoder,
    Supertonic3VectorEstimator,
    Supertonic3Vocoder,
)


def tree_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(getattr(leaf, "shape", np.shape(leaf)))
    return out


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("st3")
    truth = synthesize_supertonic3_fixture(d, SUPERTONIC3_TEST, seed=0)
    return d, truth


def test_topology_conversion_recovers_ground_truth(fixture_dir):
    d, truth = fixture_dir
    trees = convert_supertonic3(d, SUPERTONIC3_TEST)
    assert set(trees) == set(STAGES)
    for stage in STAGES:
        want = tree_shapes(truth[stage])
        got = tree_shapes(trees[stage])
        assert got == want, f"{stage}: {set(got) ^ set(want)}"
        flat_t = jax.tree_util.tree_leaves(truth[stage])
        flat_g = jax.tree_util.tree_leaves(trees[stage])
        for a, b in zip(flat_t, flat_g):
            np.testing.assert_array_equal(a, b)


def _stage_inits():
    cfg = SUPERTONIC3_TEST
    B, T, L = 1, cfg.text_t, cfg.max_latent
    key = jax.random.PRNGKey(0)
    ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.float32)
    ttl = jnp.zeros((B, 50, 256), jnp.float32)
    dp = jnp.zeros((B, 8, 16), jnp.float32)
    latent = jnp.zeros((B, 144, L), jnp.float32)
    lmask = jnp.ones((B, 1, L), jnp.float32)
    tmask2 = jnp.ones((B, 1, T), jnp.float32)
    step = jnp.zeros((B,), jnp.float32)
    total = jnp.full((B,), 8.0)
    return {
        "text_encoder": (Supertonic3TextEncoder(cfg), (ids, mask, ttl)),
        "duration_predictor": (Supertonic3DurationPredictor(cfg), (ids, mask, dp)),
        "vector_estimator": (
            Supertonic3VectorEstimator(cfg),
            (latent, jnp.zeros((B, 256, T)), ttl, lmask, tmask2, step, total),
        ),
        "vocoder": (Supertonic3Vocoder(cfg), (latent,)),
    }, key


def test_converted_trees_load_and_run(fixture_dir):
    """Converted trees are shape-exact vs each flax stage's own init — the
    slot tables really describe models/supertonic3.py — and the stages run
    finite with them."""
    d, _ = fixture_dir
    trees = convert_supertonic3(d, SUPERTONIC3_TEST)
    stages, key = _stage_inits()
    for stage, (model, args) in stages.items():
        want = tree_shapes(jax.eval_shape(lambda m=model, a=args: m.init(key, *a)))
        got = tree_shapes(trees[stage])
        assert got == want, (
            f"{stage}: missing={set(want) - set(got)} extra={set(got) - set(want)}"
        )
        out = model.apply(trees[stage], *args)
        assert np.isfinite(np.asarray(out)).all(), stage


def test_mismatched_topology_fails_loudly(fixture_dir):
    """A graph whose stream diverges (wrong shape at one position) must raise
    with the slot path + position in the message, not convert silently."""
    from fluidaudio_tpu.convert.onnx_reader import read_onnx_graph

    d, _ = fixture_dir
    graph = read_onnx_graph(d / "text_encoder.onnx")
    slots = SLOT_BUILDERS["text_encoder"](SUPERTONIC3_TEST)
    # corrupt one expected shape
    import dataclasses

    bad = list(slots)
    bad[3] = dataclasses.replace(bad[3], shape=(999,))
    with pytest.raises(ConversionError, match="text_encoder"):
        match_stage(graph, bad, "text_encoder")
    # and a truncated slot table (count mismatch) is also loud
    with pytest.raises(ConversionError, match="weight events"):
        match_stage(graph, slots[:5], "text_encoder")
