"""Multichip sharding: mesh building, dp+tp train step on 8 virtual devices."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual CPU devices"
)


def test_mesh_and_param_sharding():
    from fluidaudio_tpu.parallel.mesh import make_mesh, param_sharding_rules, shard_batch

    mesh = make_mesh(8, data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {"layer": {"kernel": np.zeros((16, 64)), "bias": np.zeros((64,))}}
    shardings = param_sharding_rules(mesh, params)
    assert "model" in str(shardings["layer"]["kernel"])
    batch = shard_batch(mesh, {"x": np.zeros((8, 4))})
    assert batch["x"].sharding.spec[0] == "data"


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
