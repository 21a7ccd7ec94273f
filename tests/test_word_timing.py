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


# --------------------------------------------------------------------------
# Token-timing assembly: emission-delay correction + duration-aware ends
# (AsrManager+TokenProcessing.swift:30-105 createTokenTimings)
# --------------------------------------------------------------------------


class TestTimingAssembly:
    @pytest.fixture(scope="class")
    def manager(self):
        from fluidaudio_tpu.asr.manager import AsrManager
        from fluidaudio_tpu.models.zoo import AsrModels

        return AsrManager(AsrModels.load("test-tiny", allow_random_init=True),
                          ASRConfig())

    def _assemble(self, manager, tokens):
        from fluidaudio_tpu.asr.chunk import TokenWindow

        tws = [TokenWindow(t, ts, c, d) for t, ts, c, d in tokens]
        return manager._assemble_result(tws, duration=10.0, t_start=0.0)

    def test_emission_delay_shifts_one_frame(self, manager):
        r = self._assemble(manager, [(1, 5, 0.9, 0)])
        assert r.token_timings[0].start_time == pytest.approx(4 * 0.08)

    def test_delay_clamps_at_zero(self, manager):
        r = self._assemble(manager, [(1, 0, 0.9, 0)])
        assert r.token_timings[0].start_time == pytest.approx(0.0)

    def test_duration_sets_end_time(self, manager):
        r = self._assemble(manager, [(1, 5, 0.9, 3)])
        t = r.token_timings[0]
        assert t.end_time == pytest.approx(t.start_time + 3 * 0.08)

    def test_zero_duration_uses_next_token_start(self, manager):
        r = self._assemble(manager, [(1, 5, 0.9, 0), (2, 10, 0.8, 0)])
        a, b = r.token_timings
        assert a.end_time == pytest.approx(b.start_time)
        # last token falls back to one frame
        assert b.end_time == pytest.approx(b.start_time + 0.08)

    def test_duration_floor_is_one_frame(self, manager):
        # duration 0 on the LAST token -> one-frame end; a token with
        # explicit short duration still gets >= one frame
        r = self._assemble(manager, [(1, 5, 0.9, 1)])
        t = r.token_timings[0]
        assert t.end_time - t.start_time >= 0.08 - 1e-9

    def test_env_override_disables_delay(self, manager, monkeypatch):
        monkeypatch.setenv("TDT_EMISSION_DELAY_FRAMES", "0")
        r = self._assemble(manager, [(1, 5, 0.9, 0)])
        assert r.token_timings[0].start_time == pytest.approx(5 * 0.08)

    def test_tokens_sorted_by_timestamp(self, manager):
        r = self._assemble(manager, [(2, 10, 0.8, 0), (1, 5, 0.9, 0)])
        starts = [t.start_time for t in r.token_timings]
        assert starts == sorted(starts)

    def test_boundary_marker_replaced_with_space(self, manager):
        vocab = manager.models.tokenizer.vocabulary
        tid = next(i for i, p in vocab.items() if p.startswith("▁"))
        r = self._assemble(manager, [(tid, 5, 0.9, 0)])
        assert "▁" not in r.token_timings[0].token
        assert r.token_timings[0].token.startswith(" ")
