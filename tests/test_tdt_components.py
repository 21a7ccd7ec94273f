"""TDT component scenario ports (no models needed).

Covers the logic-level reference suites around the decoder: frame-count
math (`ASRConstantsTests.swift`), word-boundary token utilities
(`TokenUtilsTests.swift`), config surface (`TdtConfigTests.swift`),
per-version blank-id adaptation (`TdtDecoderV2Tests.swift`,
`AsrModelsTests.swift` version table), and decode-state shape contracts
(`DecoderStateTests.swift` / `TdtDecoderStateV3Tests.swift` — the pieces
that survive the CoreML->JAX redesign).
"""

import dataclasses

import numpy as np
import pytest

from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.asr.custom_vocab.rescorer import (
    is_word_boundary,
    strip_word_boundary_prefix,
)
from fluidaudio_tpu.models.zoo import ASR_VERSIONS
from fluidaudio_tpu.ops.tdt_decode import TdtDecodeConfig, make_initial_state

# --------------------------------------------------------------------------
# ASRConstants.encoder_frames (ASRConstantsTests.swift:10-210)
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "samples,frames",
    [(0, 0), (1280, 1), (2560, 2), (16_000, 13)],
)
def test_encoder_frames_basic(samples, frames):
    assert ASRConstants.encoder_frames(samples) == frames


def test_encoder_frames_chunk_boundaries():
    chunk_samples = int(14.96 * 16_000)  # ~239,360
    overlap_samples = 2 * 16_000
    assert ASRConstants.encoder_frames(chunk_samples) == 187
    assert ASRConstants.encoder_frames(overlap_samples) == 25
    assert ASRConstants.encoder_frames(chunk_samples) <= 188


def test_encoder_frames_model_limits():
    assert ASRConstants.encoder_frames(240_000) == 188
    assert ASRConstants.encoder_frames(240_001) == 188
    assert ASRConstants.encoder_frames(188 * 1280) == 188


@pytest.mark.parametrize(
    "samples,frames",
    [(640, 1), (1280, 1), (1920, 2), (2559, 2), (2560, 2), (3200, 3)],
)
def test_encoder_frames_ceiling_rounding(samples, frames):
    assert ASRConstants.encoder_frames(samples) == frames


def test_encoder_frames_large():
    assert ASRConstants.encoder_frames(60 * 16_000) == 750
    assert ASRConstants.encoder_frames(3600 * 16_000) == 45_000


def test_encoder_frames_negative_is_zero():
    assert ASRConstants.encoder_frames(-100) == 0


def test_encoder_frames_subframe_inputs():
    for samples in (1, 100, 639, 1279):
        assert ASRConstants.encoder_frames(samples) == 1


def test_frame_sample_roundtrip():
    for n in (0, 1, 10, 100, 1000):
        assert ASRConstants.encoder_frames(n * ASRConstants.SAMPLES_PER_ENCODER_FRAME) == n


def test_frame_rate_constants():
    assert ASRConstants.SAMPLES_PER_ENCODER_FRAME == 1280
    assert ASRConstants.SECONDS_PER_ENCODER_FRAME == pytest.approx(0.08)
    assert ASRConstants.minimum_required_samples() == 1600


def test_timestamp_conversion():
    for frame, seconds in [(0, 0.0), (10, 0.8), (100, 8.0), (1000, 80.0)]:
        assert frame * ASRConstants.SECONDS_PER_ENCODER_FRAME == pytest.approx(seconds)


# --------------------------------------------------------------------------
# Word-boundary token utilities (TokenUtilsTests.swift)
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "piece,expected",
    [
        ("▁hello", True),
        (" hello", True),
        ("hello", False),
        ("", False),
        ("▁", True),
        (" ", True),
    ],
)
def test_is_word_boundary(piece, expected):
    assert is_word_boundary(piece) is expected


@pytest.mark.parametrize(
    "piece,expected",
    [
        ("▁hello", "hello"),
        (" hello", "hello"),
        ("hello", "hello"),
        ("", ""),
        ("▁", ""),
        ("he▁llo", "he▁llo"),  # internal markers untouched
        ("  hello", " hello"),  # only ONE leading char is stripped
    ],
)
def test_strip_word_boundary_prefix(piece, expected):
    assert strip_word_boundary_prefix(piece) == expected


# --------------------------------------------------------------------------
# TdtConfig surface (TdtConfigTests.swift)
# --------------------------------------------------------------------------


def test_tdt_config_defaults():
    cfg = TdtConfig()
    assert cfg.durations == (0, 1, 2, 3, 4)
    assert cfg.max_symbols_per_step == 10
    assert cfg.consecutive_blank_limit == 5
    assert cfg.boundary_search_frames == 20
    assert cfg.include_token_duration is True


def test_tdt_config_immutable():
    cfg = TdtConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.max_symbols_per_step = 3


def test_tdt_config_custom_and_equality():
    a = TdtConfig(durations=(0, 1, 2), max_symbols_per_step=4)
    b = TdtConfig(durations=(0, 1, 2), max_symbols_per_step=4)
    assert a == b
    assert a != TdtConfig()
    assert a.durations == (0, 1, 2)
    # unspecified fields keep defaults (partial-custom scenario)
    assert a.consecutive_blank_limit == 5


def test_tdt_config_empty_and_single_duration_bins():
    assert TdtConfig(durations=()).durations == ()
    assert TdtConfig(durations=(1,)).durations == (1,)
    assert TdtDecodeConfig(durations=()).durations == ()


def test_asr_config_defaults():
    cfg = ASRConfig()
    assert cfg.sample_rate == 16_000
    assert cfg.parallel_chunk_batch == 4
    assert cfg.streaming_threshold == 480_000
    assert cfg.mel_chunk_context is True
    assert cfg.dual_decode_arbitration is False


# --------------------------------------------------------------------------
# Per-version blank-id adaptation (TdtDecoderV2Tests.swift:9-34,
# AsrModels.swift:5-54 version table)
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "version,blank_id",
    [("v3", 8192), ("v2", 1024), ("tdt-ja", 3072), ("tdt-ctc-110m", 1024)],
)
def test_version_blank_ids(version, blank_id):
    assert ASR_VERSIONS[version].predictor.blank_id == blank_id


def test_version_decoder_layers():
    # v2 has a 2-layer LSTM predictor; v3 and ja 1-layer (AsrModels.swift)
    assert ASR_VERSIONS["v2"].predictor.n_layers == 2
    assert ASR_VERSIONS["v3"].predictor.n_layers == 1
    assert ASR_VERSIONS["tdt-ja"].predictor.n_layers == 1


def test_version_hidden_sizes():
    assert ASR_VERSIONS["v3"].conformer.d_model == 1024
    assert ASR_VERSIONS["tdt-ctc-110m"].conformer.d_model == 512


# --------------------------------------------------------------------------
# Decode-state contract (DecoderStateTests / TdtDecoderStateV3Tests —
# the semantics that survive the redesign: zero init, blank SOS, shapes)
# --------------------------------------------------------------------------


def test_initial_state_shapes_and_values():
    cfg = TdtDecodeConfig(blank_id=8192)
    s = make_initial_state(cfg, n_layers=2, hidden=640, batch=3)
    assert s.h.shape == (2, 3, 640) and s.c.shape == (2, 3, 640)
    assert np.all(np.asarray(s.h) == 0) and np.all(np.asarray(s.c) == 0)
    assert np.all(np.asarray(s.last_token) == 8192)  # blank acts as SOS
    assert np.all(np.asarray(s.time_jump) == 0)


def test_initial_state_reset_equivalence():
    """Reference `TdtDecoderState.reset()` == constructing a fresh state."""
    cfg = TdtDecodeConfig(blank_id=1024)
    a = make_initial_state(cfg, 1, 8, 2)
    b = make_initial_state(cfg, 1, 8, 2)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
