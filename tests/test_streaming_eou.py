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


def test_token_timestamp_calculation_ms():
    """StreamingEouAsrManagerTimestampTests.swift:7-19."""
    from fluidaudio_tpu.asr.streaming_eou import compute_token_timestamps_ms

    assert compute_token_timestamps_ms(4, [0, 1, 3]) == [320, 400, 560]


def test_token_timestamp_calculation_empty():
    from fluidaudio_tpu.asr.streaming_eou import compute_token_timestamps_ms

    assert compute_token_timestamps_ms(10, []) == []


def test_chunk_tier_mel_frame_counts():
    """EouChunkSizeFrameCountTests.swift (issue #441): every tier's chunk
    consumes a whole number of hops and yields chunk_samples/hop frames,
    8-frame-divisible so the encoder's 8x subsampling stays aligned."""
    from fluidaudio_tpu.asr.streaming_eou import CHUNK_TIERS_MS, MEL_HOP

    expected = {160: 16, 320: 32, 1280: 128}
    for ms in CHUNK_TIERS_MS:
        samples = ms * 16000 // 1000
        assert samples % MEL_HOP == 0
        frames = samples // MEL_HOP
        assert frames == expected[ms]
        assert frames % 8 == 0


def test_mel_frame_formula_positive_for_varied_lengths():
    """EouChunkSizeFrameCountTests.swift:44-61 adapted: the non-center
    frame formula stays positive/stable over arbitrary lengths."""
    from fluidaudio_tpu.ops.mel import MelConfig

    cfg = MelConfig(n_mels=128, n_fft=512, hop_length=160, win_length=400,
                    center=False)
    for n in (1000, 2000, 5000, 8000, 10080, 12000, 15000, 20000, 25000, 30000):
        frames = cfg.num_frames(n)
        assert frames == 1 + (n - 400) // 160
        assert frames > 0
