"""Unified streaming windower + batch layout — ports UnifiedWindowingTests.swift."""

from fluidaudio_tpu.asr.unified import (
    UnifiedBatchLayout,
    UnifiedStreamingWindower,
    UnifiedWindowConfig,
)

CFG = UnifiedWindowConfig()  # [70, 13, 13], 1280 samples/frame


def encoder_length(buffer_samples: int) -> int:
    return min(-(-buffer_samples // CFG.frame_samples), 96)


def test_first_window_requires_chunk_plus_right_context():
    w = UnifiedStreamingWindower(CFG)
    assert w.next_window(33_279, is_final=False) is None
    plan = w.next_window(33_280, is_final=False)
    assert plan is not None
    assert plan.buffer_start == 0
    assert plan.buffer_end == 33_280
    assert plan.holdback_frames == CFG.right_frames


def test_first_window_decodes_only_chunk_frames():
    w = UnifiedStreamingWindower(CFG)
    plan = w.next_window(33_280, is_final=False)
    rng = w.decode_range(26, plan)
    assert rng == range(0, 13)
    assert w.decoded_frames == 13


def test_steady_state_advances_by_one_chunk_per_step():
    w = UnifiedStreamingWindower(CFG)
    total = 16 * CFG.chunk_samples + CFG.right_samples

    decoded = []
    while (plan := w.next_window(total, is_final=False)) is not None:
        buffer_samples = plan.buffer_end - plan.buffer_start
        assert buffer_samples <= CFG.window_samples
        rng = w.decode_range(encoder_length(buffer_samples), plan)
        if rng is not None:
            assert len(rng) == CFG.chunk_frames
            decoded.append(rng)
    assert w.decoded_frames == 16 * CFG.chunk_frames
    assert len(decoded) == 16
    assert w.consumed_samples == total


def test_final_flush_decodes_held_back_right_context():
    w = UnifiedStreamingWindower(CFG)
    total = 4 * CFG.chunk_samples + CFG.right_samples

    while (plan := w.next_window(total, is_final=False)) is not None:
        w.decode_range(encoder_length(plan.buffer_end - plan.buffer_start), plan)
    assert w.decoded_frames == 4 * CFG.chunk_frames

    plan = w.next_window(total, is_final=True)
    assert plan is not None and plan.holdback_frames == 0
    rng = w.decode_range(encoder_length(plan.buffer_end - plan.buffer_start), plan)
    assert rng is not None and len(rng) == CFG.right_frames
    assert w.decoded_frames == 4 * CFG.chunk_frames + CFG.right_frames
    assert w.next_window(total, is_final=True) is None


def test_unaligned_final_buffer_never_exceeds_window():
    w = UnifiedStreamingWindower(CFG)
    total = 123_440  # > window_samples (122_880), not frame-aligned

    saw_final = False
    while (plan := w.next_window(total, is_final=True)) is not None:
        buffer_samples = plan.buffer_end - plan.buffer_start
        assert buffer_samples <= CFG.window_samples
        assert plan.buffer_start % CFG.frame_samples == 0
        w.decode_range(encoder_length(buffer_samples), plan)
        if plan.buffer_end == total:
            saw_final = True
    assert saw_final
    assert w.consumed_samples == total


def test_short_final_only_audio_is_flushed_in_one_window():
    w = UnifiedStreamingWindower(CFG)
    total = 20_000
    assert w.next_window(total, is_final=False) is None
    plan = w.next_window(total, is_final=True)
    assert plan.buffer_start == 0 and plan.buffer_end == total
    assert plan.holdback_frames == 0
    enc = encoder_length(total)
    assert w.decode_range(enc, plan) == range(0, enc)


def test_final_flush_emits_at_most_once_even_if_decode_falls_short():
    w = UnifiedStreamingWindower(CFG)
    total = 960_006  # ceil = 751, but encoder reports one frame fewer

    plans = 0
    while (plan := w.next_window(total, is_final=True)) is not None:
        plans += 1
        buffer_samples = plan.buffer_end - plan.buffer_start
        enc = min(buffer_samples // CFG.frame_samples, 96)
        w.decode_range(enc, plan)
        assert plans < 100, "final flush loops forever"
    assert w.next_window(total, is_final=True) is None


def test_reset_clears_progress():
    w = UnifiedStreamingWindower(CFG)
    plan = w.next_window(50_000, is_final=False)
    w.decode_range(26, plan)
    assert w.consumed_samples > 0

    w.reset()
    assert w.consumed_samples == 0 and w.decoded_frames == 0
    assert w.next_window(33_279, is_final=False) is None


def test_batch_layout_quantities():
    layout = UnifiedBatchLayout(CFG)
    assert layout.window_samples == 240_000  # 15 s
    assert layout.chunk_samples % CFG.frame_samples == 0
    assert layout.chunk_samples <= layout.window_samples
    assert layout.overlap_samples == 32_000  # 2 s, frame-aligned (25 frames)
    assert layout.stride_samples == layout.chunk_samples - layout.overlap_samples


def test_batch_chunk_starts_cover_all_audio():
    layout = UnifiedBatchLayout(CFG)
    assert layout.chunk_starts(100_000) == [0]
    assert layout.chunk_starts(0) == []

    total = 60 * 16_000
    starts = layout.chunk_starts(total)
    assert starts[0] == 0
    assert all(s % CFG.frame_samples == 0 for s in starts)
    for a, b in zip(starts, starts[1:]):
        assert b - a == layout.stride_samples
        assert a + layout.chunk_samples > b  # adjacent windows overlap
    assert starts[-1] + layout.chunk_samples >= total


def test_config_derived_quantities():
    assert CFG.window_samples == 122_880  # 96 frames x 1280
    assert CFG.chunk_samples == 16_640
    assert CFG.latency_ms == 2080
    assert CFG.context_suffix == "70_13_13"
