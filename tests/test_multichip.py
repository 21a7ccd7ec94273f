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
    """Driver-env contract: dryrun_multichip must self-provision the mesh.

    The round-1 driver failure (MULTICHIP_r01.json ok:false) was a process
    with ONE visible device calling dryrun_multichip(8) directly — nothing
    had set --xla_force_host_platform_device_count. Reproduce exactly that:
    a child with JAX_PLATFORMS=cpu and no device-count flag (1 CPU device),
    which must detect the shortfall and re-exec its own virtual-mesh child.
    """
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.pop("_FLUID_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        capture_output=True, text=True, cwd=repo, env=env, timeout=580,
    )
    assert r.returncode == 0, f"dryrun failed:\n{r.stderr[-2000:]}"
    assert "OK" in r.stdout, r.stdout


def test_manager_sharded_long_file_matches_single_device():
    """One long file's windows sharded over the mesh 'data' axis must merge
    to a transcript IDENTICAL to the single-device path (SURVEY §2.10: the
    reference's worker pool -> batch axis mapping, proven at the MANAGER
    level, chunk merge and all). Uses the trained tiny fixture so the
    transcript is real decoded language, not noise."""
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels
    from fluidaudio_tpu.parallel.mesh import make_mesh
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.train import tiny_corpus as tc

    if not fx.fixtures_available("asr"):
        pytest.skip("trained ASR fixture not committed")

    models = AsrModels.load(
        "test-tiny", checkpoint_dir=fx.trained_assets_dir() / "asr",
        allow_random_init=False,
    )
    rs = np.random.RandomState(2024)
    ids = rs.randint(0, tc.N_WORDS, size=60)  # ~26 s -> several 15 s windows
    audio = tc.make_utterance(ids, rs)

    # single-device reference transcript (batch 4, same grouping math)
    single = AsrManager(models, ASRConfig(parallel_chunk_batch=4))
    ref = single.transcribe(audio)

    sharded = AsrManager(models, ASRConfig(parallel_chunk_batch=4))
    sharded.set_mesh(make_mesh(8, data=4, model=2))
    got = sharded.transcribe(audio)

    assert got.text == ref.text
    assert got.text == tc.transcript_text(ids)  # and it's the real labels
    assert [t.token_id for t in got.token_timings] == [
        t.token_id for t in ref.token_timings
    ]


def test_manager_set_mesh_validates_batch_divisibility():
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels
    from fluidaudio_tpu.parallel.mesh import make_mesh

    models = AsrModels.load("test-tiny", allow_random_init=True)
    mgr = AsrManager(models, ASRConfig(parallel_chunk_batch=3))
    with pytest.raises(ValueError, match="multiple of the mesh data axis"):
        mgr.set_mesh(make_mesh(8, data=4, model=2))
