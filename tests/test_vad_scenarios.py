"""VAD scenario parity suite.

Ports the reference's `Tests/FluidAudioTests/VAD/VadTests.swift`
segmentation scenarios (merging within min-silence, max-duration
enforcement and splitting, min-speech filtering, 120 s real-world pattern,
alternating speech/silence, padding application) driven by synthetic
probability patterns exactly like the reference's `makeVadResults`, plus
the processChunk edge cases (pad/truncate, empty, extremes, NaN/Inf).
"""

from __future__ import annotations

import numpy as np
import pytest

from fluidaudio_tpu.vad.manager import CHUNK_SIZE, SAMPLE_RATE, VadManager
from fluidaudio_tpu.vad.types import VadSegmentationConfig, VadState

CHUNK_SECONDS = CHUNK_SIZE / SAMPLE_RATE  # 0.256 s


def make_probs(pattern: list[tuple[bool, float]]) -> tuple[list[float], int]:
    """(speech?, seconds) pattern -> per-chunk probabilities + total samples,
    mirroring the reference's makeVadResults helper."""
    probs: list[float] = []
    for speech, seconds in pattern:
        n = max(1, round(seconds / CHUNK_SECONDS))
        probs.extend([0.95 if speech else 0.05] * n)
    return probs, len(probs) * CHUNK_SIZE


@pytest.fixture(scope="module")
def vad():
    return VadManager()


def segment(vad, pattern, **cfg):
    probs, total = make_probs(pattern)
    config = VadSegmentationConfig(**cfg)
    return vad.segment_speech(
        np.zeros(total, np.float32), config=config, probabilities=probs
    )


class TestSegmentationScenarios:
    def test_multiple_segments(self, vad):
        segs = segment(
            vad,
            [(False, 1.0), (True, 2.0), (False, 1.0), (True, 2.0), (False, 1.0)],
            min_speech_duration=0.15, min_silence_duration=0.75,
        )
        assert len(segs) == 2
        for s in segs:
            assert s.duration < 15.0

    def test_merge_within_min_silence(self, vad):
        # 1s speech + 0.5s silence + 1s speech: <750ms gap merges.
        segs = segment(
            vad,
            [(True, 1.0), (False, 0.5), (True, 1.0)],
            min_speech_duration=0.15, min_silence_duration=0.75,
        )
        assert len(segs) == 1
        assert 2.3 < segs[0].duration < 2.8

    def test_no_merge_beyond_min_silence(self, vad):
        segs = segment(
            vad,
            [(True, 1.0), (False, 1.0), (True, 1.0)],
            min_speech_duration=0.15, min_silence_duration=0.75,
        )
        assert len(segs) == 2
        for s in segs:
            assert 0.9 < s.duration < 1.4

    def test_min_speech_duration_filtering(self, vad):
        segs = segment(
            vad,
            [(True, 0.2), (False, 1.0), (True, 0.8), (False, 1.0), (True, 0.1)],
            min_speech_duration=0.5, min_silence_duration=0.75,
        )
        assert len(segs) == 1
        assert 0.7 < segs[0].duration < 1.2

    def test_split_long_continuous_speech(self, vad):
        segs = segment(
            vad, [(True, 30.0)], min_speech_duration=0.15, max_speech_duration=15.0
        )
        assert len(segs) >= 2
        for s in segs:
            assert s.duration < 15.2

    def test_max_speech_duration_enforcement(self, vad):
        segs = segment(
            vad, [(True, 25.0)], min_speech_duration=0.15, max_speech_duration=10.0
        )
        assert len(segs) >= 3
        for s in segs:
            assert s.duration < 10.2

    def test_split_at_or_before_max_duration(self, vad):
        segs = segment(
            vad, [(True, 16.0)], min_speech_duration=0.15, max_speech_duration=15.0
        )
        assert len(segs) >= 2
        for s in segs:
            assert s.duration <= 15.2

    def test_exactly_max_duration_segment(self, vad):
        segs = segment(
            vad, [(True, 14.0)], min_speech_duration=0.15, max_speech_duration=14.0
        )
        assert segs
        for s in segs:
            assert s.duration <= 14.2

    def test_real_world_120_seconds(self, vad):
        # Alternating long utterances and pauses over ~2 minutes.
        pattern = []
        for _ in range(6):
            pattern.append((True, 12.0))
            pattern.append((False, 8.0))
        segs = segment(
            vad, pattern,
            min_speech_duration=0.15, min_silence_duration=0.75,
            max_speech_duration=15.0,
        )
        assert len(segs) == 6
        for s in segs:
            assert s.duration < 15.0

    def test_alternating_speech_silence(self, vad):
        pattern = []
        for _ in range(5):
            pattern.append((True, 1.0))
            pattern.append((False, 1.0))
        segs = segment(
            vad, pattern, min_speech_duration=0.15, min_silence_duration=0.75
        )
        assert len(segs) == 5

    def test_empty_audio(self, vad):
        segs = vad.segment_speech(
            np.zeros(0, np.float32), config=VadSegmentationConfig(), probabilities=[]
        )
        assert segs == []

    def test_very_short_audio(self, vad):
        segs = vad.segment_speech(
            np.zeros(100, np.float32),
            config=VadSegmentationConfig(min_speech_duration=0.15),
            probabilities=[0.95],
        )
        # A single 256 ms chunk of speech survives the 150 ms floor.
        assert len(segs) <= 1

    def test_speech_padding_applied(self, vad):
        no_pad = segment(
            vad,
            [(False, 2.0), (True, 2.0), (False, 2.0)],
            min_speech_duration=0.15, speech_padding=0.0,
        )
        padded = segment(
            vad,
            [(False, 2.0), (True, 2.0), (False, 2.0)],
            min_speech_duration=0.15, speech_padding=0.2,
        )
        assert len(no_pad) == len(padded) == 1
        assert padded[0].start_time <= no_pad[0].start_time
        assert padded[0].end_time >= no_pad[0].end_time
        assert padded[0].duration > no_pad[0].duration

    def test_custom_config_thresholds(self, vad):
        # Borderline 0.5 probabilities: default threshold (0.85-based) drops
        # them, an explicit negative_threshold of 0.3 keeps them.
        probs = [0.5] * 8
        total = len(probs) * CHUNK_SIZE
        strict = vad.segment_speech(
            np.zeros(total, np.float32),
            config=VadSegmentationConfig(),
            probabilities=probs,
        )
        loose = vad.segment_speech(
            np.zeros(total, np.float32),
            config=VadSegmentationConfig(negative_threshold=0.3,
                                         negative_threshold_offset=0.05),
            probabilities=probs,
        )
        assert strict == []
        assert len(loose) == 1


class TestProcessChunkEdgeCases:
    def test_short_chunk_padded(self, vad):
        result = vad.process_chunk(np.zeros(CHUNK_SIZE // 2, np.float32))
        assert np.isfinite(result.probability)

    def test_long_chunk_truncated(self, vad):
        result = vad.process_chunk(np.zeros(CHUNK_SIZE * 2, np.float32))
        assert np.isfinite(result.probability)

    def test_empty_chunk(self, vad):
        result = vad.process_chunk(np.zeros(0, np.float32))
        assert np.isfinite(result.probability)

    def test_extreme_values(self, vad):
        for fill in (1.0, -1.0):
            result = vad.process_chunk(np.full(CHUNK_SIZE, fill, np.float32))
            assert np.isfinite(result.probability)
        alternating = np.where(
            np.arange(CHUNK_SIZE) % 2 == 0, 1.0, -1.0
        ).astype(np.float32)
        assert np.isfinite(vad.process_chunk(alternating).probability)

    def test_nan_and_infinity_sanitized(self, vad):
        chunk = np.zeros(CHUNK_SIZE, np.float32)
        chunk[CHUNK_SIZE // 2] = np.nan
        result = vad.process_chunk(chunk)
        assert not np.isnan(result.probability)
        chunk = np.zeros(CHUNK_SIZE, np.float32)
        chunk[CHUNK_SIZE // 2] = np.inf
        result = vad.process_chunk(chunk)
        assert np.isfinite(result.probability)

    def test_state_reset_reproducibility(self, vad):
        rng = np.random.default_rng(3)
        chunk = rng.standard_normal(CHUNK_SIZE).astype(np.float32) * 0.1
        r1 = vad.process_chunk(chunk, VadState.initial())
        r2 = vad.process_chunk(chunk, VadState.initial())
        assert r1.probability == pytest.approx(r2.probability, abs=1e-6)
        # Threaded state generally changes the probability.
        r3 = vad.process_chunk(chunk, r1.output_state)
        assert np.isfinite(r3.probability)
