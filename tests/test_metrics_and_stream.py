"""WER/CER, scoring normalization, RTTM, AudioStream ring buffer."""

import numpy as np
import pytest

from fluidaudio_tpu.metrics import cer, normalize_for_scoring, parse_rttm, wer, write_rttm
from fluidaudio_tpu.utils.audio_stream import (
    AudioRingBuffer,
    AudioStream,
    AudioStreamError,
)


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


class TestAudioRingBuffer:
    def test_append_read(self):
        s = AudioRingBuffer(capacity_samples=100)
        s.append(np.arange(10, dtype=np.float32))
        np.testing.assert_array_equal(s.read(0, 10), np.arange(10))
        assert s.available == 10

    def test_gap_zero_fill(self):
        s = AudioRingBuffer(capacity_samples=100)
        s.append(np.ones(5, np.float32))
        s.append(np.ones(5, np.float32) * 2, at_index=8)  # gap 5..8
        out = s.read(0, 13)
        np.testing.assert_array_equal(out[5:8], np.zeros(3))
        np.testing.assert_array_equal(out[8:], np.full(5, 2.0))

    def test_capacity_window_slides(self):
        s = AudioRingBuffer(capacity_samples=16)
        s.append(np.arange(40, dtype=np.float32))
        assert s.start_index == 24 and s.end_index == 40
        np.testing.assert_array_equal(s.read_latest(4), np.arange(36, 40))
        # reads before the window are zero
        assert np.all(s.read(0, 8) == 0)

    def test_sliding_chunks(self):
        s = AudioRingBuffer(capacity_samples=64)
        s.append(np.arange(20, dtype=np.float32))
        chunks = list(s.chunks(8, hop=4))
        assert [pos for pos, _ in chunks] == [0, 4, 8, 12]
        np.testing.assert_array_equal(chunks[1][1], np.arange(4, 12))


class TestAudioStreamChunking:
    """Reference AudioStream.swift chunk-assembly semantics."""

    def test_geometry_validation(self):
        with pytest.raises(AudioStreamError):
            AudioStream(chunk_duration=0.0)
        with pytest.raises(AudioStreamError):
            AudioStream(chunk_duration=1.0, chunk_skip=2.0)
        with pytest.raises(AudioStreamError):
            AudioStream(chunk_duration=1.0, buffer_capacity_seconds=0.5)

    def test_start_silent_first_chunk_after_skip(self):
        # chunk 1.0 s / skip 0.25 s @ sr 8: first chunk fires after 2 samples
        s = AudioStream(chunk_duration=1.0, chunk_skip=0.25, sample_rate=8.0)
        assert s.chunk_size == 8 and s.skip_size == 2
        s.write(np.array([1.0], np.float32))
        assert not s.has_new_chunk
        s.write(np.array([2.0], np.float32))
        chunk, ts = s.read_chunk_if_available()
        # 6 samples of implicit leading silence + the 2 written
        np.testing.assert_array_equal(chunk, [0, 0, 0, 0, 0, 0, 1, 2])
        assert ts == pytest.approx(-0.75)

    def test_wait_full_then_overlap(self):
        s = AudioStream(
            chunk_duration=1.0, chunk_skip=0.5, sample_rate=8.0,
            startup_strategy="wait_full",
        )
        s.write(np.arange(1, 8, dtype=np.float32))
        assert s.read_chunk_if_available() is None
        s.write(np.array([8.0], np.float32))
        chunk, ts = s.read_chunk_if_available()
        np.testing.assert_array_equal(chunk, np.arange(1, 9))
        assert ts == 0.0
        # next chunk starts skip (4 samples) later and overlaps by 4
        s.write(np.arange(9, 13, dtype=np.float32))
        chunk2, ts2 = s.read_chunk_if_available()
        np.testing.assert_array_equal(chunk2, np.arange(5, 13))
        assert ts2 == pytest.approx(0.5)

    def test_ramp_up_grows_by_skip(self):
        s = AudioStream(
            chunk_duration=1.0, chunk_skip=0.25, sample_rate=8.0,
            startup_strategy="ramp_up",
        )
        sizes = []
        s.bind(lambda chunk, ts: sizes.append(len(chunk)))
        for i in range(8):
            s.write(np.arange(2 * i, 2 * i + 2, dtype=np.float32))
        assert sizes[:4] == [2, 4, 6, 8]  # grows by skip until full
        assert all(n == 8 for n in sizes[4:])

    def test_fixed_skip_vs_most_recent_under_overrun(self):
        # write far more than capacity between reads: most_recent jumps
        # ahead; fixed_skip keeps constant-skip chunk starts
        kw = dict(chunk_duration=1.0, chunk_skip=0.5, sample_rate=8.0,
                  startup_strategy="wait_full", buffer_capacity_seconds=1.5)
        fixed = AudioStream(chunking_strategy="fixed_skip", **kw)
        recent = AudioStream(chunking_strategy="most_recent", **kw)
        data = np.arange(1, 41, dtype=np.float32)  # 5 s of audio
        fixed.write(data)
        recent.write(data)
        f1 = fixed.read_chunk_if_available()
        r1 = recent.read_chunk_if_available()
        # most_recent: newest 8 samples
        np.testing.assert_array_equal(r1[0], np.arange(33, 41))
        # fixed_skip: oldest still-buffered chunk
        np.testing.assert_array_equal(f1[0], np.arange(29, 37))
        f2 = fixed.read_chunk_if_available()
        assert f2[1] - f1[1] == pytest.approx(0.5)  # constant skip

    def test_timestamp_resync_forward_zero_fills(self):
        s = AudioStream(
            chunk_duration=1.0, chunk_skip=1.0, sample_rate=8.0,
            startup_strategy="wait_full",
        )
        s.write(np.ones(2, np.float32))
        # 2 written + 2 gap + 2 new = end time 0.75 s
        s.write(np.full(2, 2.0, np.float32), at_time=0.75)
        s.write(np.full(2, 3.0, np.float32))
        chunk, _ = s.read_chunk_if_available()
        np.testing.assert_array_equal(chunk, [1, 1, 0, 0, 2, 2, 3, 3])

    def test_timestamp_resync_backward_rolls_back(self):
        s = AudioStream(
            chunk_duration=1.0, chunk_skip=1.0, sample_rate=8.0,
            startup_strategy="wait_full",
        )
        s.write(np.ones(4, np.float32))
        # end time says only 2 samples should precede these: roll back 2
        s.write(np.full(4, 2.0, np.float32), at_time=0.75)
        s.write(np.full(2, 3.0, np.float32))
        chunk, _ = s.read_chunk_if_available()
        np.testing.assert_array_equal(chunk, [1, 1, 2, 2, 2, 2, 3, 3])

    def test_bound_callback_fires_during_write(self):
        got = []
        s = AudioStream(
            chunk_duration=0.5, chunk_skip=0.25, sample_rate=8.0,
            startup_strategy="wait_full",
        )
        s.bind(lambda chunk, ts: got.append((chunk.copy(), ts)))
        for i in range(1, 9, 2):
            s.write(np.array([i, i + 1], np.float32))
        assert len(got) == 3  # chunks at t=0, 0.25, 0.5
        np.testing.assert_array_equal(got[0][0], [1, 2, 3, 4])
        np.testing.assert_array_equal(got[1][0], [3, 4, 5, 6])
        assert got[1][1] == pytest.approx(0.25)
        s.unbind()
        s.write(np.array([9.0, 10.0], np.float32))
        assert len(got) == 3  # unbound: pull mode again
        assert s.has_new_chunk


class TestAudioStreamScenarios:
    """Further `AudioStreamTests.swift` ports: negative timestamps,
    oscillation, bound-read exclusivity, start-time offsets, backpressure."""

    def test_negative_timestamp_drops_old_data_without_crash(self):
        s = AudioStream(chunk_duration=0.02, sample_rate=1000.0,
                        chunking_strategy="most_recent",
                        startup_strategy="start_silent")
        s.write(np.arange(20, dtype=np.float32))
        s.write(np.arange(100, 105, dtype=np.float32), at_time=-0.05)
        s.write(np.arange(200, 215, dtype=np.float32))
        chunk, start = s.read_chunk_if_available()
        assert start == pytest.approx(-0.055)
        np.testing.assert_array_equal(
            chunk, np.concatenate([np.arange(100, 105), np.arange(200, 215)])
        )

    def test_bound_prevents_manual_reads_until_unbound(self):
        s = AudioStream(chunk_duration=0.01, sample_rate=1000.0,
                        chunking_strategy="most_recent",
                        startup_strategy="start_silent")
        callbacks = []
        s.bind(lambda chunk, ts: callbacks.append((chunk.copy(), ts)))
        first = np.arange(s.chunk_size, dtype=np.float32)
        s.write(first)
        # the callback consumed the chunk during write
        assert s.read_chunk_if_available() is None
        assert len(callbacks) == 1
        np.testing.assert_array_equal(callbacks[0][0], first)
        s.unbind()
        second = np.arange(s.chunk_size, dtype=np.float32) + s.chunk_size
        s.write(second)
        chunk, ts = s.read_chunk_if_available()
        np.testing.assert_array_equal(chunk, second)
        assert ts == pytest.approx(0.01)

    def test_oscillating_timestamps_produce_ordered_chunks(self):
        s = AudioStream(chunk_duration=0.01, sample_rate=1000.0,
                        chunking_strategy="fixed_skip",
                        startup_strategy="start_silent",
                        buffer_capacity_seconds=1.0)
        times = []
        s.bind(lambda chunk, ts: times.append(ts))
        # jitter end-timestamps forward and slightly backward
        s.write(np.ones(10, np.float32), at_time=0.010)
        s.write(np.ones(10, np.float32), at_time=0.019)  # 1 ms early
        s.write(np.ones(10, np.float32), at_time=0.031)  # 2 ms late
        s.write(np.ones(10, np.float32), at_time=0.040)
        assert times == sorted(times)
        assert len(times) >= 3

    def test_start_time_offset_propagates_to_chunks(self):
        s = AudioStream(chunk_duration=0.01, sample_rate=1000.0,
                        stream_start_time=5.0,
                        chunking_strategy="most_recent",
                        startup_strategy="wait_full")
        s.write(np.arange(10, dtype=np.float32))
        chunk, ts = s.read_chunk_if_available()
        assert ts == pytest.approx(5.0)

    def test_backpressure_drops_oldest_and_advances_start(self):
        # capacity 1.5 chunks: writing 4 chunks' worth keeps only the tail
        s = AudioStream(chunk_duration=1.0, chunk_skip=1.0, sample_rate=8.0,
                        startup_strategy="wait_full",
                        buffer_capacity_seconds=1.5)
        s.write(np.arange(32, dtype=np.float32))  # 4 s at sr 8
        chunk, ts = s.read_chunk_if_available()
        # only the newest samples survived; start time advanced past 0
        assert ts > 0.0
        assert chunk[-1] == 31.0

    def test_append_zeros_gap_produces_padding_chunks(self):
        s = AudioStream(chunk_duration=1.0, chunk_skip=1.0, sample_rate=8.0,
                        chunking_strategy="fixed_skip",
                        startup_strategy="wait_full")
        got = []
        s.bind(lambda chunk, ts: got.append(chunk.copy()))
        s.write(np.ones(4, np.float32))
        # end-of-gap timestamp 2.0 s => 12 zero samples inserted
        s.write(np.full(4, 2.0, np.float32), at_time=2.0)
        assert len(got) == 2
        np.testing.assert_array_equal(got[0], [1, 1, 1, 1, 0, 0, 0, 0])
        np.testing.assert_array_equal(got[1], [0, 0, 0, 0, 2, 2, 2, 2])

    def test_fixed_hop_chunks_preserve_overlap(self):
        s = AudioStream(chunk_duration=1.0, chunk_skip=0.25, sample_rate=8.0,
                        chunking_strategy="fixed_skip",
                        startup_strategy="wait_full",
                        buffer_capacity_seconds=4.0)
        s.write(np.arange(1, 17, dtype=np.float32))
        chunks = []
        while (out := s.read_chunk_if_available()) is not None:
            chunks.append(out)
        assert len(chunks) >= 2
        for (c1, t1), (c2, t2) in zip(chunks, chunks[1:]):
            assert t2 - t1 == pytest.approx(0.25)
            # 6-sample overlap between consecutive chunks
            np.testing.assert_array_equal(c1[2:], c2[:6])
