"""DiarizerTimeline: hysteresis, post-processing, finalized/tentative split,
slot management."""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.timeline import DiarizerTimeline, TimelineConfig


def make_tl(**kw):
    defaults = dict(frame_seconds=0.1, min_duration_on=0.2, min_duration_off=0.2,
                    tentative_horizon_seconds=1.0)
    defaults.update(kw)
    return DiarizerTimeline(TimelineConfig(**defaults))


def test_basic_segments_and_tentative_split():
    tl = make_tl()
    # 5 s of frames: spk0 active 1.0-3.0 s
    probs = np.zeros((50, 2), np.float32)
    probs[10:30, 0] = 0.9
    tl.append(probs)
    finalized, tentative = tl.segments()
    f0 = [s for s in finalized if s.speaker_id == "spk0"]
    assert len(f0) == 1
    assert f0[0].start_time == pytest.approx(1.0, abs=0.11)
    assert f0[0].end_time == pytest.approx(3.0, abs=0.11)
    assert not tentative  # activity ended before the 1 s horizon

    # activity crossing the horizon is split finalized/tentative
    probs2 = np.zeros((10, 2), np.float32)
    probs2[:, 1] = 0.9
    tl.append(probs2)  # spk1 active 5.0-6.0 (the last 1 s = horizon)
    finalized, tentative = tl.segments()
    t1 = [s for s in tentative if s.speaker_id == "spk1"]
    assert t1 and t1[0].end_time == pytest.approx(6.0, abs=0.11)


def test_hysteresis_offset_threshold():
    tl = make_tl(onset_threshold=0.5, offset_threshold=0.3, tentative_horizon_seconds=0.0)
    # dips to 0.4 (above offset 0.3) must not split the segment
    probs = np.zeros((30, 1), np.float32)
    probs[5:25, 0] = 0.9
    probs[12:15, 0] = 0.4
    tl.append(probs)
    finalized, _ = tl.segments()
    assert len(finalized) == 1


def test_min_duration_off_merges_gaps():
    tl = make_tl(tentative_horizon_seconds=0.0)
    probs = np.zeros((40, 1), np.float32)
    probs[5:15, 0] = 0.9
    probs[16:26, 0] = 0.9  # 0.1 s gap < min_duration_off 0.2
    tl.append(probs)
    finalized, _ = tl.segments()
    assert len(finalized) == 1


def test_min_duration_on_drops_blips():
    tl = make_tl(tentative_horizon_seconds=0.0)
    probs = np.zeros((20, 1), np.float32)
    probs[5, 0] = 0.9  # 0.1 s blip < min_duration_on 0.2
    tl.append(probs)
    finalized, _ = tl.segments()
    assert finalized == []


def test_slot_management():
    tl = make_tl(tentative_horizon_seconds=0.0)
    probs = np.zeros((20, 2), np.float32)
    probs[2:10, 0] = 0.9
    probs[12:19, 1] = 0.9
    tl.append(probs)
    tl.rename_slot(0, "alice")
    finalized, _ = tl.segments()
    assert any(s.speaker_id == "alice" for s in finalized)
    # reassign slot 1 into 0: single speaker now covers both spans
    tl.reassign_slot(1, 0)
    finalized, _ = tl.segments()
    assert {s.speaker_id for s in finalized} == {"alice"}
    assert len(finalized) == 2
    tl.remove_slot(0)
    assert tl.segments() == ([], [])


def test_emit_only_is_pure():
    tl = make_tl()
    probs = np.zeros((30, 1), np.float32)
    probs[5:20, 0] = 0.9
    tl.append(probs)
    a = tl.segments()
    b = tl.segments()
    assert a == b


class TestTimelineScenarios:
    """Ported from the reference `SortformerTimelineTests.swift` and
    `DiarizerTimelineMergeTests.swift`."""

    def test_empty_timeline_zero_duration(self):
        tl = make_tl()
        assert tl.duration == 0.0

    def test_empty_timeline_empty_segments(self):
        tl = make_tl()
        assert tl.segments() == ([], [])
        assert tl.finalize() == []

    def test_append_updates_duration(self):
        tl = make_tl()
        tl.append(np.zeros((10, 2), np.float32))
        assert tl.duration == pytest.approx(1.0)

    def test_multiple_appends_accumulate_frames(self):
        tl = make_tl()
        for _ in range(3):
            tl.append(np.zeros((10, 2), np.float32))
        assert tl.duration == pytest.approx(3.0)

    def test_reset_clears_state(self):
        tl = make_tl()
        probs = np.zeros((20, 1), np.float32)
        probs[2:18, 0] = 0.9
        tl.append(probs)
        tl.rename_slot(0, "Alice")
        tl.reset()
        assert tl.duration == 0.0
        assert tl.segments() == ([], [])
        assert tl.slot_names() == {}

    def test_reset_keeping_speakers_preserves_names(self):
        tl = make_tl()
        probs = np.zeros((20, 1), np.float32)
        probs[2:18, 0] = 0.9
        tl.append(probs)
        tl.rename_slot(0, "Alice")
        tl.reset(keeping_speakers=True)
        assert tl.duration == 0.0
        assert tl.slot_names() == {0: "Alice"}
        assert tl.segments() == ([], [])

    def test_finalize_moves_all_to_finalized(self):
        tl = make_tl(tentative_horizon_seconds=1.0)
        probs = np.zeros((10, 1), np.float32)
        probs[:, 0] = 0.9  # all within the 1 s horizon
        tl.append(probs)
        finalized, tentative = tl.segments()
        assert tentative  # still tentative pre-finalize
        final = tl.finalize()
        assert len(final) == 1
        assert final[0].end_time == pytest.approx(1.0, abs=0.11)

    def test_segment_confidence_excludes_padding_frames(self):
        tl = make_tl(onset_padding=0.3, offset_padding=0.3,
                     tentative_horizon_seconds=0.0)
        probs = np.zeros((30, 1), np.float32)
        probs[10:20, 0] = 0.8
        tl.append(probs)
        finalized, _ = tl.segments()
        assert len(finalized) == 1
        seg = finalized[0]
        # Padding widens the span but contributes nothing to confidence.
        assert seg.duration == pytest.approx(1.0 + 0.6, abs=0.11)
        assert seg.quality_score == pytest.approx(0.8, abs=1e-5)

    def test_segment_confidence_excludes_bridged_gap_frames(self):
        tl = make_tl(tentative_horizon_seconds=0.0, min_duration_off=0.3)
        probs = np.zeros((40, 1), np.float32)
        probs[5:15, 0] = 0.8
        probs[16:26, 0] = 0.8  # 0.1 s bridged gap of prob 0
        tl.append(probs)
        finalized, _ = tl.segments()
        assert len(finalized) == 1
        # Gap frames (prob 0) are NOT averaged in.
        assert finalized[0].quality_score == pytest.approx(0.8, abs=1e-5)

    def test_upsert_slot_allowed(self):
        tl = make_tl()
        tl.upsert_slot(3, "Dana")
        assert tl.slot_names()[3] == "Dana"

    def test_small_gap_merges_two_long_segments(self):
        tl = make_tl(tentative_horizon_seconds=0.0, min_duration_off=0.2)
        probs = np.zeros((50, 1), np.float32)
        probs[0:20, 0] = 0.9   # 2.0 s
        probs[21:41, 0] = 0.9  # 0.1 s gap, then 2.0 s
        tl.append(probs)
        finalized, _ = tl.segments()
        assert len(finalized) == 1
        assert finalized[0].duration == pytest.approx(4.1, abs=0.11)

    def test_short_segment_after_small_gap_does_not_drop_prior(self):
        tl = make_tl(tentative_horizon_seconds=0.0, min_duration_off=0.2,
                     min_duration_on=0.2)
        probs = np.zeros((40, 1), np.float32)
        probs[0:20, 0] = 0.9  # long segment
        probs[21:23, 0] = 0.9  # short tail after small gap -> merges in
        tl.append(probs)
        finalized, _ = tl.segments()
        assert len(finalized) == 1
        assert finalized[0].end_time == pytest.approx(2.3, abs=0.11)

    def test_trailing_tentative_tail(self):
        tl = make_tl(tentative_horizon_seconds=0.5)
        probs = np.zeros((30, 1), np.float32)
        probs[10:30, 0] = 0.9  # active through the very end
        tl.append(probs)
        finalized, tentative = tl.segments()
        assert finalized and tentative
        # finalized part ends exactly at the horizon cut
        assert finalized[0].end_time == pytest.approx(2.5, abs=1e-6)
        assert tentative[0].start_time == pytest.approx(2.5, abs=1e-6)
        assert tentative[0].end_time == pytest.approx(3.0, abs=0.11)

    def test_segments_without_tentative(self):
        tl = make_tl(tentative_horizon_seconds=0.5)
        probs = np.zeros((30, 1), np.float32)
        probs[10:30, 0] = 0.9
        tl.append(probs)
        finalized, tentative = tl.segments(include_tentative=False)
        assert finalized and not tentative
