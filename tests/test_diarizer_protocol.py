"""DiarizerProtocol parity: addAudio/processComplete/finalize/reset/cleanup."""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.manager import DiarizerManager
from fluidaudio_tpu.diarizer.types import DiarizerConfig


@pytest.fixture(scope="module")
def manager():
    return DiarizerManager(DiarizerConfig(min_active_frames_count=0.0,
                                          min_speech_duration=0.1))


def test_add_audio_then_process_complete(manager):
    rng = np.random.RandomState(0)
    manager.add_audio((rng.randn(80_000) * 0.1).astype(np.float32))
    manager.add_audio((rng.randn(80_000) * 0.1).astype(np.float32))
    result = manager.process_complete()
    assert result.speaker_count >= 0
    # buffer drained: a second call sees nothing
    empty = manager.process_complete()
    assert empty.segments == [] and empty.speaker_count == 0


def test_reset_and_cleanup(manager):
    rng = np.random.RandomState(1)
    manager.add_audio((rng.randn(16_000) * 0.1).astype(np.float32))
    manager.enroll_speaker((rng.randn(32_000) * 0.1).astype(np.float32), "vip")
    manager.speaker_manager.make_speaker_permanent("vip")
    manager.reset()
    assert manager.process_complete().segments == []  # pending dropped
    assert manager.speaker_manager.get_speaker("vip") is not None  # permanent kept
    manager.cleanup()
    assert manager.speaker_manager.speaker_count == 0
