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


# --------------------------------------------------------------------------
# Config constraints + computed properties (SortformerTypesTests.swift:11-67)
# --------------------------------------------------------------------------


def test_config_default_computed_properties():
    from fluidaudio_tpu.models.sortformer import SORTFORMER_V2, FRAME_SECONDS

    assert SORTFORMER_V2.per_speaker_quota == 47  # 188 // 4
    assert SORTFORMER_V2.frame_duration_seconds == pytest.approx(0.08)
    assert FRAME_SECONDS == pytest.approx(8 * 160 / 16000)


def test_config_clamps_chunk_frames_to_one():
    from fluidaudio_tpu.models.sortformer import SortformerConfig

    assert SortformerConfig(chunk_frames=0).chunk_frames == 1
    assert SortformerConfig(chunk_frames=-5).chunk_frames == 1


def test_config_spkcache_len_floor():
    from fluidaudio_tpu.models.sortformer import SortformerConfig

    assert SortformerConfig(spkcache_len=1).spkcache_len >= 16


def test_config_update_period_window():
    from fluidaudio_tpu.models.sortformer import SortformerConfig

    # defaults: max(min(31, 40 + 6), 6) = 31
    assert SortformerConfig().update_period == 31
    # below chunk length -> clamped up
    cfg = SortformerConfig(chunk_frames=10, update_period=2)
    assert cfg.update_period >= cfg.chunk_frames
    # above fifo + chunk -> clamped down
    cfg = SortformerConfig(fifo_len=8, chunk_frames=4, update_period=100)
    assert cfg.update_period == 12


def test_config_compatibility():
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST, SORTFORMER_V2

    assert SORTFORMER_V2.is_compatible(SORTFORMER_V2)
    assert not SORTFORMER_V2.is_compatible(SORTFORMER_TEST)


# --------------------------------------------------------------------------
# Stitcher scenarios (OfflineSortformerTests.swift:11-89)
# --------------------------------------------------------------------------


def test_stitcher_identity_when_aligned(diarizer):
    rng = np.random.RandomState(11)
    base = (rng.rand(16, NUM_SPEAKERS) > 0.5).astype(np.float32)
    w1 = (0, base[:10])
    w2 = (6, base[6:])  # same slot order in the overlap
    stitched = diarizer._stitch([w1, w2])
    np.testing.assert_allclose(stitched, base, atol=1e-6)


def test_stitcher_soft_activity(diarizer):
    """Continuous probabilities (not binarized) still align via correlation."""
    rng = np.random.RandomState(12)
    base = rng.rand(18, NUM_SPEAKERS).astype(np.float32)
    perm = [1, 2, 3, 0]
    w1 = (0, base[:12])
    w2 = (6, base[6:, perm])
    stitched = diarizer._stitch([w1, w2])
    np.testing.assert_allclose(stitched[12:], base[12:], atol=1e-5)


def test_stitcher_zero_frames_is_identity(diarizer):
    out = diarizer._stitch([])
    assert out.shape == (0, NUM_SPEAKERS)
    single = np.random.RandomState(13).rand(5, NUM_SPEAKERS).astype(np.float32)
    np.testing.assert_allclose(diarizer._stitch([(0, single)]), single, atol=1e-6)


def test_stitcher_mapping_is_bijection(diarizer):
    """Two slots with identical activity must still map to distinct outputs."""
    T = 12
    base = np.zeros((T, NUM_SPEAKERS), np.float32)
    base[:, 0] = 1.0
    base[:, 1] = 1.0  # identical twin activity
    w1 = (0, base[:8])
    w2 = (4, base[4:])
    stitched = diarizer._stitch([w1, w2])
    # both active slots survive (a non-bijective mapping would merge them)
    active = (stitched >= 0.5).sum(axis=1)
    assert np.all(active == 2)


# --------------------------------------------------------------------------
# Session continuity (SortformerStreamingIntegrationTests.swift:22-108)
# --------------------------------------------------------------------------


def test_process_stream_continues_frame_clock():
    d = SortformerDiarizer(SORTFORMER_TEST, threshold=0.0)  # all frames active
    chunk_s = d.cfg.chunk_frames * 1280
    rng = np.random.RandomState(21)
    a = (rng.randn(chunk_s) * 0.1).astype(np.float32)

    r1 = d.process_stream(a)
    r2 = d.process_stream(a)
    # threshold 0 => whole-chunk segments; second call starts where first ended
    end1 = max(s.end_time for s in r1.segments)
    start2 = min(s.start_time for s in r2.segments)
    assert start2 == pytest.approx(end1)

    d.reset_session()
    r3 = d.process_stream(a)
    assert min(s.start_time for s in r3.segments) == pytest.approx(0.0)


def test_process_is_one_shot_per_recording(diarizer):
    """`process` must not leak state between recordings."""
    rng = np.random.RandomState(22)
    audio = (rng.randn(16000 * 2) * 0.1).astype(np.float32)
    a = diarizer.process(audio)
    b = diarizer.process(audio)
    assert len(a.segments) == len(b.segments)
    for x, y in zip(a.segments, b.segments):
        assert x.start_time == pytest.approx(y.start_time)
        assert x.end_time == pytest.approx(y.end_time)
