"""End-to-end AsrManager on the tiny fixture model (hermetic, CPU)."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.models.zoo import AsrModels


@pytest.fixture(scope="module")
def manager():
    models = AsrModels.load("test-tiny", allow_random_init=True)
    return AsrManager(models, ASRConfig(parallel_chunk_batch=2,
                                        tdt=TdtConfig(max_tokens_per_chunk=128)))


def test_transcribe_short_array(manager):
    rng = np.random.RandomState(0)
    audio = (rng.randn(24_000) * 0.1).astype(np.float32)  # 1.5 s
    result = manager.transcribe(audio)
    assert result.duration == pytest.approx(1.5)
    assert result.processing_time > 0
    assert isinstance(result.text, str)
    # token timings are ordered and within the audio span
    times = [t.start_time for t in result.token_timings]
    assert times == sorted(times)
    if times:
        assert times[-1] <= result.duration + 0.2


def test_transcribe_too_short_returns_empty(manager):
    result = manager.transcribe(np.zeros(100, np.float32))
    assert result.text == ""
    assert result.confidence == 0.0


def test_transcribe_resamples_other_rates(manager):
    rng = np.random.RandomState(1)
    audio = (rng.randn(48_000) * 0.1).astype(np.float32)  # 1 s at 48 kHz
    result = manager.transcribe(audio, sample_rate=48_000)
    assert result.duration == pytest.approx(1.0, abs=0.01)


def test_transcribe_long_uses_chunking(manager):
    rng = np.random.RandomState(2)
    audio = (rng.randn(300_000) * 0.1).astype(np.float32)  # 18.75 s > 15 s cap
    result = manager.transcribe(audio)
    assert result.duration == pytest.approx(18.75)
    # chunked path: timestamps are near-monotonic. Seam splices may locally
    # invert within the 2 s overlap window (the reference's merge has the
    # same property — gap tokens adopt the other window's timestamps).
    times = [t.start_time for t in result.token_timings]
    assert all(b - a >= -2.0 for a, b in zip(times, times[1:]))
    assert times[-1] > 15.0  # tokens from the second window exist


def test_deterministic(manager):
    rng = np.random.RandomState(3)
    audio = (rng.randn(20_000) * 0.1).astype(np.float32)
    r1 = manager.transcribe(audio)
    r2 = manager.transcribe(audio)
    assert r1.text == r2.text


def test_chunked_merge_invariant_to_completion_grouping():
    """The final transcript must not depend on how windows were grouped into
    device batches (parallel_chunk_batch 1/2/3) — the TPU analog of the
    reference worker pool's out-of-order chunk-completion determinism
    (`ChunkProcessorTests`/`ChunkMergeTests`): whatever order/grouping
    decodes complete in, merging by window index yields one canonical
    result, and bucket padding must not leak into real rows."""
    rng = np.random.RandomState(7)
    # plain gaussian: seeded-random weights stay blank-dominated on
    # AM-modulated noise, which would make this check vacuous (0 tokens)
    audio = (rng.randn(700_000) * 0.1).astype(np.float32)  # ~43.75 s

    outs = []
    for bs in (1, 2, 3):
        models = AsrModels.load("test-tiny", allow_random_init=True)
        m = AsrManager(models, ASRConfig(parallel_chunk_batch=bs,
                                         tdt=TdtConfig(max_tokens_per_chunk=128)))
        r = m.transcribe(audio)
        outs.append((r.text, [(tt.token_id, round(tt.start_time, 3))
                              for tt in r.token_timings]))
    assert outs[0] == outs[1] == outs[2]
    assert outs[0][1], "0 tokens emitted — determinism check is vacuous"
