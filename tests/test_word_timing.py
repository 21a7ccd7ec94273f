"""Word-level timing aggregation + streaming timing drain.

Mirrors reference `Tests/.../ASR/Parakeet/WordTimingTests.swift` (pure
`buildWordTimings` cases) and the `consumeTokenTimings` drain contract from
`StreamingUnifiedAsrManager.swift:195-209`.
"""

import numpy as np
import pytest

from fluidaudio_tpu.asr.config import (
    ASRConfig,
    TdtConfig,
    TokenTiming,
    build_word_timings,
)


def _tok(piece, start, end, tid=0, conf=1.0):
    return TokenTiming(piece, tid, start, end, conf)


def test_groups_subword_tokens_into_words():
    # "▁Hello" "▁wor" "ld" -> ["Hello", "world"]
    words = build_word_timings([
        _tok("▁Hello", 0.0, 0.08),
        _tok("▁wor", 0.16, 0.24),
        _tok("ld", 0.24, 0.32),
    ])
    assert [w.word for w in words] == ["Hello", "world"]
    assert words[0].start_time == 0.0 and words[0].end_time == 0.08
    # second word spans first sub-word start to last sub-word end
    assert words[1].start_time == 0.16 and words[1].end_time == 0.32


def test_first_word_without_boundary_marker_still_starts():
    words = build_word_timings([
        _tok("the", 0.0, 0.08),
        _tok("▁cat", 0.08, 0.16),
    ])
    assert [w.word for w in words] == ["the", "cat"]


def test_leading_space_treated_as_boundary():
    words = build_word_timings([
        _tok(" Hello", 0.0, 0.08),
        _tok(" world", 0.16, 0.24),
    ])
    assert [w.word for w in words] == ["Hello", "world"]


def test_skips_special_tokens():
    words = build_word_timings([
        _tok("▁hi", 0.0, 0.08),
        _tok("<blank>", 0.08, 0.16),
        _tok("▁there", 0.16, 0.24),
    ])
    assert [w.word for w in words] == ["hi", "there"]


def test_empty_input_produces_no_words():
    assert build_word_timings([]) == []


def test_strips_exactly_one_boundary_marker():
    # "▁▁x": one marker is the boundary, the second is content (reference
    # stripWordBoundaryPrefix drops exactly one character)
    words = build_word_timings([_tok("▁▁x", 0.0, 0.1)])
    assert [w.word for w in words] == ["▁x"]


def test_whitespace_only_word_is_dropped():
    words = build_word_timings([
        _tok("▁", 0.0, 0.1),  # bare boundary -> trims to empty
        _tok("▁ok", 0.1, 0.2),
    ])
    assert [w.word for w in words] == ["ok"]


# --------------------------------------------------------------------------
# Streaming drain contract
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def unified():
    from fluidaudio_tpu.asr.manager import AsrManager  # noqa: F401 (jax warm)
    from fluidaudio_tpu.asr.unified import StreamingUnifiedAsrManager, UnifiedStreamingConfig
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load("test-tiny", allow_random_init=True)
    return StreamingUnifiedAsrManager(
        models,
        UnifiedStreamingConfig(chunk_seconds=1.0, left_context_seconds=1.0,
                               right_context_seconds=0.5),
    )


def test_consume_token_timings_drains_and_stays_bounded(unified):
    rng = np.random.RandomState(7)
    audio = (rng.randn(16000 * 4) * 0.1).astype(np.float32)
    session = unified.make_session()
    drained = []
    for piece in np.array_split(audio, 5):
        unified.feed(piece, session)
        batch = unified.consume_token_timings(session)
        drained.extend(batch)
        # drain empties the buffer: immediate second call returns nothing
        assert unified.consume_token_timings(session) == []
    unified.finish(session)
    drained.extend(unified.consume_token_timings(session))
    assert drained, "random-weight decode should emit at least one token"
    # absolute stream seconds, non-decreasing starts, within audio duration
    starts = [t.start_time for t in drained]
    assert starts == sorted(starts)
    assert all(0.0 <= t.start_time <= 4.0 + 1e-6 for t in drained)
    assert all(t.end_time >= t.start_time for t in drained)
    # drained token ids match the confirmed transcript token stream
    assert [t.token_id for t in drained] == [tw.token for tw in session.confirmed]


def test_consume_word_timings_groups_drained_tokens(unified):
    rng = np.random.RandomState(8)
    audio = (rng.randn(16000 * 3) * 0.1).astype(np.float32)
    session = unified.make_session()
    unified.feed(audio, session)
    unified.finish(session)
    words = unified.consume_word_timings(session)
    for w in words:
        assert w.end_time >= w.start_time
        assert w.word.strip() == w.word != ""
    # the same buffer is shared: token drain after word drain is empty
    assert unified.consume_token_timings(session) == []
