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


def test_vad_sharded_batch_matches_single_device():
    """VadManager.process_batch over the mesh 'data' axis: probabilities
    bit-identical to single-device, including the padded-batch rows the
    shard requires (batch 5 -> padded to 8 on a 4-way data axis)."""
    from fluidaudio_tpu.parallel.mesh import make_mesh
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.train import tiny_corpus as tc
    from fluidaudio_tpu.vad import VadManager

    if not fx.fixtures_available("vad"):
        pytest.skip("trained VAD fixture not committed")

    rs = np.random.RandomState(77)
    utts = [tc.speechish(1.5, rs) for _ in range(3)] + [
        (rs.randn(24000) * 0.002).astype(np.float32) for _ in range(2)
    ]
    ckpt = fx.trained_assets_dir() / "vad"
    single = VadManager(checkpoint_dir=ckpt)
    ref = single.process_batch(utts)

    sharded = VadManager(checkpoint_dir=ckpt)
    sharded.set_mesh(make_mesh(8, data=4, model=2))
    got = sharded.process_batch(utts)

    ref_probs = [[r.probability for r in b] for b in ref]
    got_probs = [[r.probability for r in b] for b in got]
    assert got_probs == ref_probs
    # trained model still detects: speech rows over, noise rows under
    assert np.mean(got_probs[0]) >= 0.5 and np.mean(got_probs[3]) < 0.5


def test_sortformer_sharded_offline_matches_single_device():
    """SortformerDiarizer.process_offline with the fused window axis
    constrained to the mesh: identical segments vs single-device, real DER
    on the trained fixture."""
    from fluidaudio_tpu.diarizer.sortformer import SortformerDiarizer
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST
    from fluidaudio_tpu.parallel.mesh import make_mesh
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.train import tiny_corpus as tc

    if not fx.fixtures_available("sortformer"):
        pytest.skip("trained sortformer fixture not committed")

    rs = np.random.RandomState(4242)
    mix, _, _ = tc.diarizer_mixture(rs, 60.0, overlap_prob=0.0)
    ckpt = fx.trained_assets_dir() / "sortformer"

    single = SortformerDiarizer(SORTFORMER_TEST, checkpoint_dir=ckpt)
    ref = single.process_offline(mix)

    sharded = SortformerDiarizer(SORTFORMER_TEST, checkpoint_dir=ckpt)
    sharded.set_mesh(make_mesh(8, data=4, model=2))
    got = sharded.process_offline(mix)

    assert [(s.speaker_id, round(s.start_time, 3), round(s.end_time, 3))
            for s in got.segments] == [
        (s.speaker_id, round(s.start_time, 3), round(s.end_time, 3))
        for s in ref.segments
    ]
    assert got.speaker_count == ref.speaker_count == 2


def test_manager_set_mesh_validates_batch_divisibility():
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels
    from fluidaudio_tpu.parallel.mesh import make_mesh

    models = AsrModels.load("test-tiny", allow_random_init=True)
    mgr = AsrManager(models, ASRConfig(parallel_chunk_batch=3))
    with pytest.raises(ValueError, match="multiple of the mesh data axis"):
        mgr.set_mesh(make_mesh(8, data=4, model=2))
