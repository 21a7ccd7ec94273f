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
