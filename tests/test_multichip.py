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
    """Run the driver contract exactly as the driver does: its own process.

    Skipped inside a full suite run by default: on this 1-core host the
    parent pytest process's live XLA:CPU thread pools starve the child, and
    the 8-way collective rendezvous overruns (observed: abort at the default
    40 s termination timeout, or a 500 s stall with it raised). Standalone
    the dryrun finishes in ~20 s and that is how the driver invokes it;
    scripts/test.sh runs it right after the suite. Set
    FLUID_DRYRUN_IN_SUITE=1 to force it inside pytest."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    if os.environ.get("FLUID_DRYRUN_IN_SUITE") != "1":
        pytest.skip("runs standalone via scripts/test.sh (1-core starvation)")

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    r = subprocess.run(
        [sys.executable, str(repo / "__graft_entry__.py")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=500,
    )
    assert r.returncode == 0, f"dryrun failed:\n{r.stderr[-2000:]}"
    assert "OK" in r.stdout, r.stdout
