"""Dual-decode arbitration probe (tiny model)."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.arbitration import ArbitrationDecision, arbitrate
from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.models.zoo import AsrModels


def test_arbitration_picks_a_strategy():
    manager = AsrManager(
        AsrModels.load("test-tiny", allow_random_init=True),
        ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)),
    )
    rng = np.random.RandomState(0)
    audio = (rng.randn(60_000) * 0.1).astype(np.float32)
    decision = arbitrate(manager, audio, probe_seconds=3.0)
    assert decision.strategy in ("silence_aligned", "warmup", "regular")
    assert set(decision.confidences) == {"silence_aligned", "warmup", "regular"}
    cfg = decision.apply(ASRConfig())
    assert isinstance(cfg.prefer_silence_alignment, bool)
