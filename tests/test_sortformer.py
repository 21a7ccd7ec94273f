"""Sortformer: streaming state machine (FIFO/compression), offline stitcher."""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.sortformer import SortformerDiarizer
from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST, NUM_SPEAKERS


@pytest.fixture(scope="module")
def diarizer():
    return SortformerDiarizer(SORTFORMER_TEST, threshold=0.5)


def test_streaming_state_carry(diarizer):
    rng = np.random.RandomState(0)
    chunk_samples = diarizer.cfg.chunk_frames * 1280
    state = diarizer.make_state()
    fifo_lens = []
    for i in range(6):
        preds, state = diarizer.process_chunk(
            (rng.randn(chunk_samples) * 0.1).astype(np.float32), state
        )
        assert preds.shape == (diarizer.cfg.chunk_frames, NUM_SPEAKERS)
        assert np.all((preds >= 0) & (preds <= 1))
        fifo_lens.append(int(state.fifo_len_valid[0]))
    # FIFO fills then saturates at its capacity
    assert fifo_lens[0] == diarizer.cfg.chunk_frames
    assert fifo_lens[-1] == diarizer.cfg.fifo_len
    # speaker cache accumulated something once FIFO overflowed
    assert bool(state.spkcache_mask[0].any())


def test_streaming_full_process(diarizer):
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000 * 4) * 0.1).astype(np.float32)
    result = diarizer.process(audio)
    for seg in result.segments:
        assert seg.speaker_id.startswith("spk")
        assert 0 <= seg.start_time < seg.end_time <= 4.2


def test_offline_with_stitching(diarizer):
    rng = np.random.RandomState(2)
    audio = (rng.randn(16000 * 35) * 0.1).astype(np.float32)  # > one window
    result = diarizer.process_offline(audio)
    assert result.timings.total_seconds > 0
    for seg in result.segments:
        assert seg.end_time <= 35.5


def test_stitcher_permutation_alignment(diarizer):
    # window 2's slots are a permutation of window 1's; stitcher must align
    T = 20
    rng = np.random.RandomState(3)
    base = (rng.rand(T, NUM_SPEAKERS) > 0.5).astype(np.float32)
    perm = [2, 0, 3, 1]
    w1 = (0, base[:12])
    w2 = (8, base[8:, perm])  # overlaps frames 8..12
    stitched = diarizer._stitch([w1, w2])
    # after alignment the overlap region should agree with base
    np.testing.assert_allclose(stitched[8:12], base[8:12], atol=0.51)
    np.testing.assert_allclose(stitched[12:], base[12:], atol=1e-6)


def test_stream_scan_matches_per_chunk_steps(diarizer):
    """The single-dispatch scan program must equal looping process_chunk with
    carried state (pins batched-encode + lax.scan against the stepwise path)."""
    rng = np.random.RandomState(7)
    chunk_samples = diarizer.cfg.chunk_frames * 1280
    n = 5
    audio = (rng.randn(chunk_samples * n) * 0.1).astype(np.float32)

    state = diarizer.make_state()
    loop_preds = []
    for i in range(n):
        preds, state = diarizer.process_chunk(
            audio[i * chunk_samples : (i + 1) * chunk_samples], state
        )
        loop_preds.append(preds)
    loop_preds = np.concatenate(loop_preds)

    result = diarizer.process(audio)
    import jax.numpy as jnp

    bucket = 1 << (n - 1).bit_length()
    buf = np.zeros((bucket, chunk_samples), np.float32)
    buf.reshape(-1)[: audio.size] = audio
    scan_preds, _ = diarizer._stream_scan(bucket)(
        diarizer.params, jnp.asarray(buf), diarizer.make_state()
    )
    scan_preds = np.asarray(scan_preds).reshape(-1, NUM_SPEAKERS)[: n * diarizer.cfg.chunk_frames]
    np.testing.assert_allclose(scan_preds, loop_preds, atol=2e-4)
    assert result.timings.total_seconds > 0


def test_offline_batched_windows_match_single(diarizer):
    """Flat-audio fused offline preds (on-device overlapped windowing) must
    equal one-window-at-a-time `_offline` calls on the same hand-cut windows
    (pins the reshape/slice windowing + bucket padding), and the int16
    transfer path must match f32 on PCM-representable audio."""
    import jax.numpy as jnp

    rng = np.random.RandomState(8)
    from fluidaudio_tpu.diarizer.sortformer import OFFLINE_WINDOW_MEL

    window_samples = OFFLINE_WINDOW_MEL * 160
    overlap = 64 * 1280
    step = window_samples - overlap
    # PCM-representable so the int16 path is lossless
    flat_real = (
        np.round(rng.randn(2 * step + overlap) * 3000).astype(np.int16)
    )
    samples = flat_real.astype(np.float32) / 32768.0

    bucket = 4
    flat = np.zeros((bucket + 1) * step, np.float32)
    flat[: samples.size] = samples
    fn = diarizer._offline_fused(bucket, step, window_samples)
    batched = np.asarray(fn(diarizer.params, jnp.asarray(flat)))
    for i in range(2):
        win = np.zeros(window_samples, np.float32)
        seg = samples[i * step : i * step + window_samples]
        win[: seg.size] = seg
        mel, _ = diarizer.mel(jnp.asarray(win)[None, :])
        solo = np.asarray(diarizer._offline(diarizer.params, mel[:, :, :OFFLINE_WINDOW_MEL]))[0]
        np.testing.assert_allclose(batched[i], solo, atol=2e-4)

    flat16 = np.zeros((bucket + 1) * step, np.int16)
    flat16[: flat_real.size] = flat_real
    batched16 = np.asarray(
        diarizer._offline_fused(bucket, step, window_samples)(
            diarizer.params, jnp.asarray(flat16)
        )
    )
    np.testing.assert_allclose(batched16, batched, atol=1e-5)
