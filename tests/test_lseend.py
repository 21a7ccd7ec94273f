"""LS-EEND: context stacking, warmup gating, recurrent state."""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.lseend import LSEENDDiarizer
from fluidaudio_tpu.models.lseend import LSEEND_TEST, MAX_SPEAKERS, subsample_with_context

import jax.numpy as jnp


def test_subsample_with_context():
    cfg = LSEEND_TEST
    T = 40
    mel = jnp.asarray(np.arange(1 * cfg.n_mels * T, dtype=np.float32).reshape(1, cfg.n_mels, T))
    feats = subsample_with_context(mel, cfg)
    assert feats.shape == (1, T // cfg.subsample, cfg.feat_dim)


@pytest.fixture(scope="module")
def diarizer():
    return LSEENDDiarizer(LSEEND_TEST, step_ms=200)


def test_warmup_suppresses_early_frames(diarizer):
    rng = np.random.RandomState(0)
    audio = (rng.randn(8000 * 2) * 0.1).astype(np.float32)  # 2 s @8k
    state = diarizer.make_state()
    acts1, state = diarizer.process_step(audio[:1600], state)  # frames 0-1
    assert np.all(acts1 == 0.0)  # within 900 ms warmup
    # advance past warmup
    for i in range(5):
        acts, state = diarizer.process_step(audio[1600 * (i + 1) : 1600 * (i + 2)], state)
    assert np.any(acts > 0.0)


def test_full_process_16k_input(diarizer):
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000 * 3) * 0.1).astype(np.float32)
    result = diarizer.process(audio, sample_rate=16_000)
    for seg in result.segments:
        assert seg.speaker_id.startswith("spk")
        assert seg.end_time <= 3.2
    assert result.speaker_count <= MAX_SPEAKERS


def test_state_recurrence_changes_output(diarizer):
    rng = np.random.RandomState(2)
    chunk = (rng.randn(1600) * 0.1).astype(np.float32)
    s0 = diarizer.make_state()
    # process warmup-length audio so outputs are ungated
    state = s0
    for _ in range(6):
        _, state = diarizer.process_step(chunk, state)
    a_with_history, _ = diarizer.process_step(chunk, state)
    # same chunk from a *fresh* (but warmed) different history
    state2 = s0
    loud = (chunk * 5).astype(np.float32)
    for _ in range(6):
        _, state2 = diarizer.process_step(loud, state2)
    a_other_history, _ = diarizer.process_step(chunk, state2)
    # recurrent attractors carry history; outputs must not be bitwise equal
    # (with random weights the gated update is near a fixed point, so the
    # difference is small but real)
    assert not np.array_equal(a_with_history, a_other_history)


def test_lseend_converter_tree_matches_and_mha_equivalence():
    """Synthetic torch-layout sd converts to a structurally-matching tree, and
    the fused-MHA remap numerically equals torch nn.MultiheadAttention."""
    import jax
    import jax.numpy as jnp
    import pytest

    torch = pytest.importorskip("torch")

    from fluidaudio_tpu.convert.lseend import _mha, convert_lseend_state_dict
    from fluidaudio_tpu.models.lseend import (
        LSEEND_TEST,
        MAX_SPEAKERS,
        LsEendModel,
        init_state,
    )

    cfg = LSEEND_TEST
    rng = np.random.RandomState(0)
    D, FF = cfg.d_model, cfg.d_model * 4

    def mha(base):
        return {
            f"{base}.in_proj_weight": rng.randn(3 * D, D) * 0.05,
            f"{base}.in_proj_bias": rng.randn(3 * D) * 0.05,
            f"{base}.out_proj.weight": rng.randn(D, D) * 0.05,
            f"{base}.out_proj.bias": rng.randn(D) * 0.05,
        }

    sd = {
        "enc.input_proj.weight": rng.randn(D, cfg.feat_dim) * 0.05,
        "enc.input_proj.bias": rng.randn(D) * 0.05,
        "dec.slot_init": rng.randn(MAX_SPEAKERS, D) * 0.05,
        "dec.gate.weight": rng.randn(D, 2 * D) * 0.05,
        "dec.gate.bias": rng.randn(D) * 0.05,
        "dec.cand.weight": rng.randn(D, D) * 0.05,
        "dec.cand.bias": rng.randn(D) * 0.05,
        **mha("dec.cross_attn"),
    }
    for i in range(cfg.n_layers):
        sd.update(mha(f"enc.layers.{i}.self_attn"))
        sd[f"enc.layers.{i}.norm1.weight"] = np.abs(rng.randn(D)) + 0.5
        sd[f"enc.layers.{i}.norm1.bias"] = rng.randn(D) * 0.05
        sd[f"enc.layers.{i}.norm2.weight"] = np.abs(rng.randn(D)) + 0.5
        sd[f"enc.layers.{i}.norm2.bias"] = rng.randn(D) * 0.05
        sd[f"enc.layers.{i}.fc1.weight"] = rng.randn(FF, D) * 0.05
        sd[f"enc.layers.{i}.fc1.bias"] = rng.randn(FF) * 0.05
        sd[f"enc.layers.{i}.fc2.weight"] = rng.randn(D, FF) * 0.05
        sd[f"enc.layers.{i}.fc2.bias"] = rng.randn(D) * 0.05

    params = convert_lseend_state_dict(sd, cfg)
    model = LsEendModel(cfg)
    feats = jnp.asarray(rng.randn(1, 5, cfg.feat_dim).astype(np.float32) * 0.1)
    state = init_state(cfg, 1)
    want = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), feats, state))

    def shapes(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(q, "key", q)) for q in path)
            out[key] = tuple(getattr(leaf, "shape", np.shape(leaf)))
        return out

    assert shapes(want) == shapes(params), (
        f"missing={set(shapes(want)) - set(shapes(params))}\n"
        f"extra={set(shapes(params)) - set(shapes(want))}")
    acts, new_state = model.apply(params, feats, state)
    assert acts.shape == (1, 5, MAX_SPEAKERS)
    assert np.isfinite(np.asarray(acts)).all()

    # fused-MHA remap == torch nn.MultiheadAttention (self-attention case)
    import flax.linen as nn

    tm = torch.nn.MultiheadAttention(D, cfg.n_heads, batch_first=True)
    with torch.no_grad():
        tm.in_proj_weight.copy_(torch.tensor(sd["enc.layers.0.self_attn.in_proj_weight"], dtype=torch.float32))
        tm.in_proj_bias.copy_(torch.tensor(sd["enc.layers.0.self_attn.in_proj_bias"], dtype=torch.float32))
        tm.out_proj.weight.copy_(torch.tensor(sd["enc.layers.0.self_attn.out_proj.weight"], dtype=torch.float32))
        tm.out_proj.bias.copy_(torch.tensor(sd["enc.layers.0.self_attn.out_proj.bias"], dtype=torch.float32))
    x = rng.randn(2, 6, D).astype(np.float32)
    with torch.no_grad():
        ref, _ = tm(torch.tensor(x), torch.tensor(x), torch.tensor(x))
    fl = nn.MultiHeadDotProductAttention(num_heads=cfg.n_heads)
    got = fl.apply({"params": _mha(sd, "enc.layers.0.self_attn", cfg.n_heads)},
                   jnp.asarray(x), jnp.asarray(x))
    # atol accommodates compile-host variation (the XLA compile relay's
    # fma/vectorization choices differ per host); a wrong weight mapping
    # would diverge by O(1), not O(1e-4)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-3, rtol=1e-3)


# --------------------------------------------------------------------------
# StreamingChunkQueue (LSEENDQueueTests.swift) + tail-deferral streaming
# --------------------------------------------------------------------------


class TestStreamingChunkQueue:
    def test_requires_exact_minimum_for_first_chunk(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(8, left_context=3, right_context=2)
        assert not q.has_chunk and q.ready_chunks == 0
        q.append(np.ones(9, np.float32))
        assert not q.has_chunk and q.ready_chunks == 0
        q.append(np.ones(1, np.float32))
        assert q.has_chunk and q.ready_chunks == 1
        first = q.pop_next_chunk()
        np.testing.assert_array_equal(first, [0, 0, 0] + [1] * 10)
        assert q.ready_chunks == 0

    def test_pop_all_consumes_whole_chunks_preserves_tail(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(4, left_context=2, right_context=1)
        q.append(np.arange(1, 11, dtype=np.float32))
        combined = q.pop_all_chunks()
        np.testing.assert_array_equal(combined, [0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
        assert q.ready_chunks == 0
        q.append(np.array([11, 12, 13], np.float32))
        nxt = q.pop_next_chunk()
        np.testing.assert_array_equal(nxt, [7, 8, 9, 10, 11, 12, 13])

    def test_pop_next_raises_when_not_ready(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(4)
        with pytest.raises(IndexError):
            q.pop_next_chunk()

    def test_pop_all_empty_when_not_ready(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(4, right_context=2)
        q.append(np.ones(5, np.float32))
        assert q.pop_all_chunks().size == 0

    def test_pop_tail_drains_remainder_with_context(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(4, left_context=2)
        q.append(np.arange(1, 7, dtype=np.float32))  # one chunk + tail [5,6]
        q.pop_next_chunk()
        tail = q.pop_tail()
        np.testing.assert_array_equal(tail, [3, 4, 5, 6])  # left ctx + tail
        assert q.pop_tail().size == 0  # idempotent once drained

    def test_reset_clears_buffer(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(4)
        q.append(np.ones(10, np.float32))
        q.reset()
        assert not q.has_chunk and q.pending == 0

    def test_stride_scales_lengths(self):
        from fluidaudio_tpu.utils.chunk_queue import StreamingChunkQueue

        q = StreamingChunkQueue(2, left_context=1, right_context=0, stride=3)
        q.append(np.arange(6, dtype=np.float32))
        assert q.ready_chunks == 1
        window = q.pop_next_chunk()
        assert window.size == 3 + 6  # left(1*3 zeros) + chunk(2*3)


def test_stream_defers_partial_tail(diarizer):
    """A partial step stays queued (no zero-pad predictions) and completes
    on the next call; finish_stream drains the rest."""
    diarizer.reset_session()
    step_samples = diarizer.step_frames * 800  # 8 kHz samples per step
    rng = np.random.RandomState(5)
    # 16 kHz input is resampled 2:1 -> send 1.5 steps worth
    audio = (rng.randn(3 * step_samples) * 0.1).astype(np.float32)
    r1 = diarizer.process_stream(audio)  # 1.5 steps at 8k -> 1 full step
    frames_1 = diarizer._session_frames
    assert frames_1 == diarizer.step_frames  # tail deferred, not padded

    r2 = diarizer.process_stream(audio)  # another 1.5 -> tail completes
    assert diarizer._session_frames == 3 * diarizer.step_frames

    fin = diarizer.finish_stream()
    assert diarizer._session_queue.pending == 0
    # a second finish is a no-op
    fin2 = diarizer.finish_stream()
    assert fin2.segments == []
