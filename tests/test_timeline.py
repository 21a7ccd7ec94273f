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
