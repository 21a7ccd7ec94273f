"""CtcKeywordSpotter manager (tiny encoder) + spot dedupe."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.custom_vocab.context import CustomVocabularyContext, VocabularyTerm
from fluidaudio_tpu.asr.custom_vocab.ctc_spotter import KeywordSpot
from fluidaudio_tpu.asr.keyword_spotter import (
    CtcKeywordSpotter,
    KeywordSpotterConfig,
    _dedupe_spots,
)
from fluidaudio_tpu.models.conformer import ConformerConfig


def test_dedupe_overlapping_spots():
    spots = [
        KeywordSpot("acme", 10, 20, -1.0, -10.0),
        KeywordSpot("acme", 15, 25, -0.5, -5.0),  # overlapping, better
        KeywordSpot("acme", 40, 50, -1.2, -12.0),
        KeywordSpot("other", 12, 22, -0.9, -9.0),
    ]
    out = _dedupe_spots(spots)
    acme = [s for s in out if s.keyword == "acme"]
    assert len(acme) == 2
    assert acme[0].score == -0.5  # kept the better overlapping spot
    assert len(out) == 3


def test_spotter_end_to_end_tiny():
    terms = [VocabularyTerm("acme", aliases=["akme"])]
    ctx = CustomVocabularyContext(terms)
    # hand-assign ctc token ids (tiny vocab)
    terms[0].ctc_token_ids = [3, 5, 7]
    spotter = CtcKeywordSpotter(
        ctx,
        KeywordSpotterConfig(vocab_size=16, min_score=-1e9),
        ConformerConfig(d_model=32, n_layers=1, n_heads=4,
                        subsampling_channels=16, dtype="float32"),
    )
    rng = np.random.RandomState(0)
    audio = (rng.randn(32_000) * 0.1).astype(np.float32)
    spots = spotter.spot(audio)
    # random weights: the DP still runs and returns finite-scored windows
    for s in spots:
        assert s.keyword == "acme"
        assert 0 <= s.start_frame <= s.end_frame
        assert np.isfinite(s.score)


# --------------------------------------------------------------------------
# Overlap log-prob merging (CtcOverlapMergeTests.swift:21-123)
# --------------------------------------------------------------------------


class TestMergeOverlapFrames:
    def test_equal_inputs_return_same_value(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        for x in (-0.1, -1.0, -3.0, -10.0):
            out = merge_overlap_frames(np.array([x]), np.array([x]))
            assert out[0] == pytest.approx(x, abs=1e-5)

    def test_matches_double_precision_reference(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        for a, b in [(-0.1, -0.5), (-1.0, -3.0), (-2.5, -7.0), (-0.05, -0.05)]:
            expected = np.log((np.exp(a) + np.exp(b)) / 2.0)
            out = merge_overlap_frames(np.array([a]), np.array([b]))
            assert out[0] == pytest.approx(expected, abs=1e-4)

    def test_probability_space_mean_exceeds_log_space_mean(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        a, b = -0.1, -3.0
        out = merge_overlap_frames(np.array([a]), np.array([b]))
        assert out[0] > (a + b) / 2.0  # AM > GM when a != b

    def test_stable_for_largely_negative_values(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        out = merge_overlap_frames(np.array([-50.0]), np.array([-49.0]))
        assert np.isfinite(out[0])
        assert out[0] == pytest.approx(-49.379, abs=0.01)

    def test_neg_infinity_both_propagates(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        out = merge_overlap_frames(np.array([-np.inf]), np.array([-np.inf]))
        assert out[0] == -np.inf

    def test_neg_infinity_one_defers_minus_log2(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        out = merge_overlap_frames(np.array([-np.inf]), np.array([-2.0]))
        assert out[0] == pytest.approx(-2.0 - np.log(2.0), abs=1e-5)

    def test_vector_merge_commutative(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        a = np.array([-0.1, -2.0, -5.0, -10.0], np.float32)
        b = np.array([-2.0, -0.1, -10.0, -5.0], np.float32)
        np.testing.assert_allclose(
            merge_overlap_frames(a, b), merge_overlap_frames(b, a), atol=1e-6
        )

    def test_empty_returns_empty(self):
        from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

        assert merge_overlap_frames(np.array([]), np.array([])).size == 0


def test_spot_merges_across_chunk_boundary():
    """A 2-D canvas check: the spotter's concatenation must produce one
    continuous frame axis with logmeanexp-merged overlap columns."""
    from fluidaudio_tpu.asr.keyword_spotter import merge_overlap_frames

    a = np.full((3, 4), -1.0, np.float32)
    b = np.full((3, 4), -3.0, np.float32)
    merged = merge_overlap_frames(a.reshape(-1), b.reshape(-1)).reshape(3, 4)
    expected = np.log((np.exp(-1.0) + np.exp(-3.0)) / 2.0)
    np.testing.assert_allclose(merged, expected, atol=1e-5)
