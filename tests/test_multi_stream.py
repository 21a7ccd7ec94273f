"""Multi-stream batched streaming ASR (tiny model)."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.multi_stream import MultiStreamEouManager
from fluidaudio_tpu.models.conformer_streaming import StreamingConformerConfig

TINY = StreamingConformerConfig(
    d_model=64, n_layers=2, n_heads=4, att_context_left=16, subsampling_channels=16
)


@pytest.fixture(scope="module")
def manager():
    return MultiStreamEouManager(n_streams=3, chunk_ms=320, enc_cfg=TINY)


def test_lockstep_ticks(manager):
    rng = np.random.RandomState(0)
    a = (rng.randn(16000) * 0.1).astype(np.float32)
    b = (rng.randn(16000) * 0.3).astype(np.float32)
    manager.feed(0, a)
    manager.feed(1, b)
    # stream 2 gets nothing: it must be zero-stepped without emitting tokens
    ticks = 0
    while manager.ready and ticks < 10:
        out = manager.tick()
        assert out[2] == []
        ticks += 1
    assert ticks >= 2
    # streams got independent transcripts
    t0, t1 = manager.transcript(0), manager.transcript(1)
    assert isinstance(t0, str) and isinstance(t1, str)


def test_stream_isolation_matches_feed_order(manager):
    # feeding more audio to stream 0 only advances stream 0's transcript
    before = manager.transcript(1)
    rng = np.random.RandomState(5)
    manager.feed(0, (rng.randn(12000) * 0.1).astype(np.float32))
    while manager.ready:
        manager.tick()
    assert manager.transcript(1) == before


def test_ragged_join_leave_transcript_invariance():
    """A stream that joins mid-session gets EXACTLY the transcript it would
    get running solo: inactive rows' caches/decoder state are frozen."""
    rng = np.random.RandomState(7)
    audio = (rng.randn(24000) * 0.2).astype(np.float32)

    # solo run
    solo = MultiStreamEouManager(n_streams=2, chunk_ms=320, enc_cfg=TINY)
    solo.feed(0, audio)
    while solo.ready:
        solo.tick()
    want = solo.transcript(0)

    # ragged run: stream 0 runs for a while alone; stream 1 joins late with
    # the same audio and must reproduce `want`
    m = MultiStreamEouManager(n_streams=2, chunk_ms=320, enc_cfg=TINY)
    m.streams[1].ended = True  # slot 1 initially closed
    other = (rng.randn(24000) * 0.1).astype(np.float32)
    m.feed(0, other[:12000])
    for _ in range(2):
        if m.ready:
            m.tick()
    late = m.open_stream()
    assert late == 1
    m.feed(late, audio[:8000])
    m.feed(0, other[12000:])
    while m.ready:
        m.tick()
    m.feed(late, audio[8000:])
    while m.ready:
        m.tick()
    assert m.transcript(late) == want


def test_close_and_reopen_resets_slot():
    rng = np.random.RandomState(9)
    m = MultiStreamEouManager(n_streams=2, chunk_ms=320, enc_cfg=TINY)
    m.feed(0, (rng.randn(16000) * 0.2).astype(np.float32))
    m.feed(1, (rng.randn(16000) * 0.2).astype(np.float32))
    while m.ready:
        m.tick()
    m.close_stream(1)
    slot = m.open_stream()
    assert slot == 1
    assert m.transcript(slot) == ""
    with pytest.raises(RuntimeError):
        # both slots live now (slot 1 reopened, slot 0 never ended)
        m.open_stream()
