"""StreamingEouAsrManager: chunk loop, state carry, EOU debounce (tiny random model)."""

import numpy as np
import pytest

import fluidaudio_tpu.asr.streaming_eou as eou_mod
from fluidaudio_tpu.models.conformer_streaming import StreamingConformerConfig


@pytest.fixture(scope="module")
def manager(tmp_path_factory):
    # shrink the encoder so CPU tests are fast
    eou_mod.EOU_120M = StreamingConformerConfig(
        n_mels=128, d_model=64, n_layers=2, n_heads=4,
        att_context_left=16, subsampling_channels=16,
    )
    m = eou_mod.StreamingEouAsrManager.__new__(eou_mod.StreamingEouAsrManager)
    m.__init__(chunk_ms=320)
    return m


def test_stream_chunks_and_finish(manager):
    rng = np.random.RandomState(0)
    state = manager.make_state()
    partials = []
    # feed 2 s of audio in uneven pieces
    audio = (rng.randn(32_000) * 0.1).astype(np.float32)
    for piece in np.array_split(audio, 7):
        partials.extend(manager.process(piece, state))
    # 320 ms chunks need 5120+240 samples; ~6 chunks from 32000 samples
    assert len(partials) >= 5
    final = manager.finish(state)
    assert isinstance(final.text, str)
    assert len(state.tokens) == len(state.timestamps_ms)
    # timestamps are monotone non-decreasing and grow across chunks
    ts = state.timestamps_ms
    assert all(b >= a for a, b in zip(ts, ts[1:]))


def test_state_isolation(manager):
    """Two interleaved streams must not share state."""
    rng = np.random.RandomState(1)
    a = (rng.randn(16_000) * 0.1).astype(np.float32)
    b = (rng.randn(16_000) * 0.3).astype(np.float32)
    s1, s2 = manager.make_state(), manager.make_state()
    manager.process(a, s1)
    manager.process(b, s2)
    s1_solo = manager.make_state()
    manager.process(a, s1_solo)
    assert s1.tokens == s1_solo.tokens


def test_callbacks_fire(manager):
    seen = []
    manager.on_partial = lambda p: seen.append(p)
    try:
        state = manager.make_state()
        rng = np.random.RandomState(2)
        manager.process((rng.randn(11_000) * 0.1).astype(np.float32), state)
        assert len(seen) >= 1
        assert all(hasattr(p, "eou_detected") for p in seen)
    finally:
        manager.on_partial = None


def test_eou_debounce():
    from fluidaudio_tpu.asr.streaming_eou import EOU_DEBOUNCE_MS

    assert EOU_DEBOUNCE_MS == 1280.0
