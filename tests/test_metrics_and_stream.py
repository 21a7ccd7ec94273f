"""WER/CER, scoring normalization, RTTM, AudioStream ring buffer."""

import numpy as np
import pytest

from fluidaudio_tpu.metrics import cer, normalize_for_scoring, parse_rttm, wer, write_rttm
from fluidaudio_tpu.utils.audio_stream import AudioStream


def test_wer_basic():
    r = wer("the cat sat on the mat", "the cat sat on the mat")
    assert r.rate == 0.0
    r = wer("the cat sat", "the bat sat")
    assert r.substitutions == 1 and r.errors == 1
    assert r.rate == pytest.approx(1 / 3)
    r = wer("a b c", "a c")
    assert r.deletions == 1
    r = wer("a c", "a b c")
    assert r.insertions == 1


def test_cer():
    r = cer("abc", "abd")
    assert r.errors == 1 and r.reference_length == 3


def test_scoring_normalization():
    assert normalize_for_scoring("Hello, World!") == "hello world"
    assert normalize_for_scoring("I can't go") == "i cannot go"
    assert normalize_for_scoring("naïve  café") == "naive cafe"


def test_rttm_roundtrip():
    text = (
        "SPEAKER meet 1 0.50 2.00 <NA> <NA> alice <NA> <NA>\n"
        "SPEAKER meet 1 3.00 1.50 <NA> <NA> bob <NA> <NA>\n"
    )
    segs = parse_rttm(text)
    assert len(segs) == 2
    assert segs[0].speaker_id == "alice"
    assert segs[0].end_time == pytest.approx(2.5)
    out = write_rttm(segs, "meet")
    assert parse_rttm(out) == segs


class TestAudioStream:
    def test_append_read(self):
        s = AudioStream(capacity_samples=100)
        s.append(np.arange(10, dtype=np.float32))
        np.testing.assert_array_equal(s.read(0, 10), np.arange(10))
        assert s.available == 10

    def test_gap_zero_fill(self):
        s = AudioStream(capacity_samples=100)
        s.append(np.ones(5, np.float32))
        s.append(np.ones(5, np.float32) * 2, at_index=8)  # gap 5..8
        out = s.read(0, 13)
        np.testing.assert_array_equal(out[5:8], np.zeros(3))
        np.testing.assert_array_equal(out[8:], np.full(5, 2.0))

    def test_capacity_window_slides(self):
        s = AudioStream(capacity_samples=16)
        s.append(np.arange(40, dtype=np.float32))
        assert s.start_index == 24 and s.end_index == 40
        np.testing.assert_array_equal(s.read_latest(4), np.arange(36, 40))
        # reads before the window are zero
        assert np.all(s.read(0, 8) == 0)

    def test_sliding_chunks(self):
        s = AudioStream(capacity_samples=64)
        s.append(np.arange(20, dtype=np.float32))
        chunks = list(s.chunks(8, hop=4))
        assert [pos for pos, _ in chunks] == [0, 4, 8, 12]
        np.testing.assert_array_equal(chunks[1][1], np.arange(4, 12))
