"""VAD: hysteresis segmentation + streaming state machine (synthetic probs),
plus a model-level smoke test. Mirrors reference VadSegmentationTests /
VadStreamingTests driven via `VadManager(skipModelLoading:)`."""

import numpy as np
import pytest

from fluidaudio_tpu.vad.manager import VadManager
from fluidaudio_tpu.vad.segmentation import detect_speech_sample_ranges
from fluidaudio_tpu.vad.types import (
    CHUNK_SIZE,
    SAMPLE_RATE,
    VadConfig,
    VadSegmentationConfig,
    VadState,
    VadStreamState,
)


@pytest.fixture(scope="module")
def logic_manager():
    return VadManager(VadConfig(), skip_model_loading=True)


def chunks_seconds(n_sec):
    return int(n_sec * SAMPLE_RATE / CHUNK_SIZE)


def test_basic_segmentation():
    cfg = VadSegmentationConfig()
    # 2 s silence, 3 s speech, 2 s silence
    probs = [0.0] * chunks_seconds(2) + [0.95] * chunks_seconds(3) + [0.0] * chunks_seconds(2)
    total = len(probs) * CHUNK_SIZE
    ranges = detect_speech_sample_ranges(probs, total, 0.85, cfg)
    assert len(ranges) == 1
    start, end = ranges[0]
    # speech starts at 2 s minus 0.1 s padding
    assert start == pytest.approx(2 * SAMPLE_RATE - 0.1 * SAMPLE_RATE, abs=CHUNK_SIZE)
    assert end > start


def test_min_speech_duration_filters_blips():
    cfg = VadSegmentationConfig()
    probs = [0.0] * 10 + [0.95] + [0.0] * 10  # one 256 ms blip > minSpeech 0.15s
    ranges = detect_speech_sample_ranges(probs, len(probs) * CHUNK_SIZE, 0.85, cfg)
    assert len(ranges) == 1  # 256 ms >= 150 ms, kept
    cfg2 = VadSegmentationConfig(min_speech_duration=0.3)
    ranges2 = detect_speech_sample_ranges(probs, len(probs) * CHUNK_SIZE, 0.85, cfg2)
    assert ranges2 == []


def test_short_silence_does_not_split():
    cfg = VadSegmentationConfig()  # min_silence 0.75 s
    probs = (
        [0.95] * chunks_seconds(2)
        + [0.0] * chunks_seconds(0.5)  # below min silence
        + [0.95] * chunks_seconds(2)
    )
    ranges = detect_speech_sample_ranges(probs, len(probs) * CHUNK_SIZE, 0.85, cfg)
    assert len(ranges) == 1


def test_long_silence_splits():
    cfg = VadSegmentationConfig()
    probs = (
        [0.95] * chunks_seconds(2)
        + [0.0] * chunks_seconds(1.5)
        + [0.95] * chunks_seconds(2)
    )
    ranges = detect_speech_sample_ranges(probs, len(probs) * CHUNK_SIZE, 0.85, cfg)
    assert len(ranges) == 2


def test_max_speech_splits_at_best_silence():
    cfg = VadSegmentationConfig(max_speech_duration=5.0)
    # 10 s of speech with a dip at 4 s (prob 0.1 for ~0.26 s)
    probs = []
    for i in range(chunks_seconds(10)):
        t = i * CHUNK_SIZE / SAMPLE_RATE
        probs.append(0.1 if 4.0 <= t < 4.3 else 0.95)
    ranges = detect_speech_sample_ranges(probs, len(probs) * CHUNK_SIZE, 0.85, cfg)
    assert len(ranges) >= 2
    # first segment must end near the 4 s dip, not at the 5 s hard limit
    assert ranges[0][1] / SAMPLE_RATE == pytest.approx(4.0, abs=0.5)


def test_hysteresis_negative_threshold():
    cfg = VadSegmentationConfig()
    # prob falls to 0.75 (>= negative 0.70) -> should NOT end the segment
    probs = [0.95] * 8 + [0.75] * chunks_seconds(2) + [0.95] * 8
    ranges = detect_speech_sample_ranges(probs, len(probs) * CHUNK_SIZE, 0.85, cfg)
    assert len(ranges) == 1


def test_streaming_events(logic_manager):
    cfg = VadSegmentationConfig()
    state = VadStreamState.initial()
    model_state = VadState.initial()
    events = []
    # 1 s silence, 2 s speech, 2 s silence
    seq = [0.0] * chunks_seconds(1) + [0.95] * chunks_seconds(2) + [0.0] * chunks_seconds(2)
    for p in seq:
        result = logic_manager.streaming_state_machine(
            probability=p,
            chunk_sample_count=CHUNK_SIZE,
            model_state=model_state,
            state=state,
            config=cfg,
            return_seconds=True,
        )
        state = result.state
        if result.event:
            events.append(result.event)
    kinds = [e.kind for e in events]
    assert kinds == ["speech_start", "speech_end"]
    # silence = 3 chunks (0.768 s); start event = speech onset - padding(0.1)
    assert events[0].time == pytest.approx(0.668, abs=0.15)
    # speech = 7 chunks ending at 2.56 s; end fires after 0.75 s silence,
    # reported at silence start + padding
    assert events[1].time == pytest.approx(2.66, abs=0.3)


def test_streaming_no_event_on_short_silence(logic_manager):
    cfg = VadSegmentationConfig()
    state = VadStreamState.initial()
    ms = VadState.initial()
    seq = [0.95] * 8 + [0.0] * 2 + [0.95] * 8  # 0.5 s dip < min silence
    events = []
    for p in seq:
        r = logic_manager.streaming_state_machine(p, CHUNK_SIZE, ms, state, cfg)
        state = r.state
        if r.event:
            events.append(r.event.kind)
    assert events == ["speech_start"]


def test_model_smoke_deterministic():
    m = VadManager(VadConfig())  # random-init params
    rng = np.random.RandomState(0)
    audio = (rng.randn(SAMPLE_RATE) * 0.1).astype(np.float32)  # 1 s
    r1 = m.process(audio)
    r2 = m.process(audio)
    assert len(r1) == -(-SAMPLE_RATE // CHUNK_SIZE)
    assert all(0.0 <= r.probability <= 1.0 for r in r1)
    assert [a.probability for a in r1] == [b.probability for b in r2]
    # state threading: second call starting from final state differs from fresh
    out = m.process_chunk(audio[:CHUNK_SIZE])
    out2 = m.process_chunk(audio[:CHUNK_SIZE], out.output_state)
    assert out.probability != out2.probability or not np.allclose(
        out.output_state.hidden_state, out2.output_state.hidden_state
    )


def test_frame_program_matches_sequential():
    """`vad_frame_program` (batched encoder + hoisted ih/head, LSTM-only scan)
    must equal stepping SileroVadV5 frame by frame — pins the duplicated gate
    math and the global framing (shared 64-sample context via the waveform)."""
    import jax
    import jax.numpy as jnp

    from fluidaudio_tpu.models.silero_vad import (
        SileroV5Config,
        SileroVadV5,
        vad_frame_program,
    )

    cfg = SileroV5Config()
    model = SileroVadV5(cfg)
    rng = np.random.RandomState(3)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.window_size)),
        jnp.zeros((1, cfg.hidden)),
        jnp.zeros((1, cfg.hidden)),
    )
    n_frames = 11
    samples = rng.randn(n_frames * cfg.frame_size).astype(np.float32) * 0.1
    ctx0 = rng.randn(cfg.context_size).astype(np.float32) * 0.1
    audio = np.concatenate([ctx0, samples])[None, :]

    mid = n_frames - 3  # also pin the on-device last_idx gather off the end
    probs, h_mid, c_mid = jax.jit(
        lambda p, a, h, c, last: vad_frame_program(model, p, a, h, c, last)
    )(params, jnp.asarray(audio), jnp.zeros((1, cfg.hidden)),
      jnp.zeros((1, cfg.hidden)), jnp.asarray([mid], jnp.int32))

    h = jnp.zeros((1, cfg.hidden))
    c = jnp.zeros((1, cfg.hidden))
    step = jax.jit(model.apply)
    for j in range(n_frames):
        frame = audio[:, j * cfg.frame_size : j * cfg.frame_size + cfg.window_size]
        p_ref, h, c = step(params, jnp.asarray(frame), h, c)
        np.testing.assert_allclose(float(probs[0, j]), float(p_ref[0]), atol=1e-5)
        if j == mid:
            np.testing.assert_allclose(np.asarray(h_mid[0]), np.asarray(h[0]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(c_mid[0]), np.asarray(c[0]), atol=1e-5)


def test_process_batch_matches_process():
    """The single-dispatch batch path must produce identical probabilities and
    final states to per-utterance `process`, including ragged lengths."""
    m = VadManager(VadConfig())
    rng = np.random.RandomState(1)
    utts = [
        (rng.randn(int(SAMPLE_RATE * d)) * 0.1).astype(np.float32)
        for d in (1.0, 0.35, 2.3)
    ]
    batched = m.process_batch(utts)
    for u, batch_results in zip(utts, batched):
        solo = m.process(u)
        assert len(solo) == len(batch_results)
        for a, b in zip(solo, batch_results):
            np.testing.assert_allclose(a.probability, b.probability, atol=1e-5)
        np.testing.assert_allclose(
            solo[-1].output_state.hidden_state,
            batch_results[-1].output_state.hidden_state,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            solo[-1].output_state.context, batch_results[-1].output_state.context
        )


def test_process_batch_state_threading():
    """Chaining final states through process_batch equals one long process."""
    m = VadManager(VadConfig())
    rng = np.random.RandomState(2)
    audio = (rng.randn(SAMPLE_RATE * 2) * 0.1).astype(np.float32)
    whole = m.process(audio)
    half = SAMPLE_RATE  # chunk-aligned? 16000/4096 is not integral — force align
    half = (half // CHUNK_SIZE) * CHUNK_SIZE
    first = m.process(audio[:half])
    second = m.process(audio[half:], first[-1].output_state)
    got = [r.probability for r in first + second]
    want = [r.probability for r in whole]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_int16_transfer_path_matches_f32():
    """int16 input (PCM) must produce identical probabilities and threadable
    state vs the same audio pre-upcast to f32 — the on-device 1/32768 upcast
    halves host->device bytes and must be lossless for PCM sources."""
    m = VadManager(VadConfig())
    rng = np.random.RandomState(4)
    pcm = np.round(rng.randn(SAMPLE_RATE + 1234) * 3000).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0

    r16 = m.process(pcm)
    r32 = m.process(f32)
    assert len(r16) == len(r32)
    np.testing.assert_allclose(
        [a.probability for a in r16], [b.probability for b in r32], atol=1e-6
    )
    # carried context stays int16 and threads into the next int16 call
    st = r16[-1].output_state
    assert st.context.dtype == np.int16
    n16 = m.process(pcm[:CHUNK_SIZE], st)
    n32 = m.process(f32[:CHUNK_SIZE], r32[-1].output_state)
    np.testing.assert_allclose(n16[0].probability, n32[0].probability, atol=1e-6)


def test_streaming_start_event_at_sample_zero(logic_manager):
    """VadStreamingTests.swift:7-50: an immediate high-probability chunk
    emits speech_start clamped to sample 0 and sets triggered."""
    cfg = VadSegmentationConfig()
    state = VadStreamState.initial()
    r = logic_manager.streaming_state_machine(
        0.9, CHUNK_SIZE, VadState.initial(), state, cfg
    )
    assert r.event is not None and r.event.kind == "speech_start"
    assert r.event.sample_index == 0
    assert r.state.triggered

    # silence until min_silence elapses -> speech_end with positive index
    end = None
    for _ in range(60):
        r = logic_manager.streaming_state_machine(
            0.05, CHUNK_SIZE, VadState.initial(), r.state, cfg
        )
        if r.event:
            end = r.event
            break
    assert end is not None and end.kind == "speech_end"
    assert end.sample_index > 0
    assert not r.state.triggered


def test_streaming_returns_seconds_rounded_to_resolution(logic_manager):
    """VadStreamingTests.swift:53-92: with return_seconds, event.time is
    sample_index/rate rounded at the requested decimal resolution."""
    cfg = VadSegmentationConfig()
    state = VadStreamState.initial()
    r = logic_manager.streaming_state_machine(
        0.9, CHUNK_SIZE, VadState.initial(), state, cfg,
        return_seconds=True, time_resolution=2,
    )
    end = None
    for _ in range(60):
        r = logic_manager.streaming_state_machine(
            0.05, CHUNK_SIZE, VadState.initial(), r.state, cfg,
            return_seconds=True, time_resolution=2,
        )
        if r.event:
            end = r.event
            break
    assert end is not None
    expected = end.sample_index / SAMPLE_RATE
    assert end.time == round(expected * 100) / 100


def test_streaming_respects_threshold_override():
    """VadStreamingTests.swift:94-125: negative_threshold + offset derive
    the entry threshold (0.2 + 0.05 = 0.25)."""
    vad = VadManager(VadConfig(default_threshold=0.8), skip_model_loading=True)
    cfg = VadSegmentationConfig(negative_threshold=0.2, negative_threshold_offset=0.05)
    state = VadStreamState.initial()

    below = vad.streaming_state_machine(0.24, CHUNK_SIZE, VadState.initial(), state, cfg)
    assert below.event is None

    trig = vad.streaming_state_machine(
        0.3, CHUNK_SIZE, VadState.initial(), below.state, cfg
    )
    assert trig.event is not None and trig.event.kind == "speech_start"
    pad = int(cfg.speech_padding * SAMPLE_RATE)
    assert trig.event.sample_index == max(0, CHUNK_SIZE - pad)


def test_streaming_uses_default_threshold_without_override():
    """VadStreamingTests.swift:127+: without an override the manager's
    default_threshold gates entry."""
    vad = VadManager(VadConfig(default_threshold=0.6), skip_model_loading=True)
    cfg = VadSegmentationConfig()
    state = VadStreamState.initial()

    below = vad.streaming_state_machine(0.59, CHUNK_SIZE, VadState.initial(), state, cfg)
    assert below.event is None
    above = vad.streaming_state_machine(
        0.61, CHUNK_SIZE, VadState.initial(), below.state, cfg
    )
    assert above.event is not None and above.event.kind == "speech_start"
