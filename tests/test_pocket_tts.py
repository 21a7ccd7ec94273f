"""PocketTTS: prefill + fused generation scan, streaming, voice cloning."""

import numpy as np
import pytest

from fluidaudio_tpu.models.pocket_tts import (
    FRAME_SAMPLES,
    POCKET_TEST,
    SAMPLE_RATE,
    VOICE_PROMPT_FRAMES,
)
from fluidaudio_tpu.tts.pocket_manager import PocketTtsManager


@pytest.fixture(scope="module")
def manager():
    return PocketTtsManager(POCKET_TEST)


def test_synthesize_smoke(manager):
    r = manager.synthesize("hello world")
    assert r.sample_rate == SAMPLE_RATE
    assert r.frames >= 1
    assert r.samples.size == r.frames * manager.frame_samples
    assert np.all(np.isfinite(r.samples))
    assert np.abs(r.samples).max() <= 1.0


def test_deterministic_given_seed(manager):
    a = manager.synthesize("same text", seed=7)
    b = manager.synthesize("same text", seed=7)
    np.testing.assert_array_equal(a.samples, b.samples)
    c = manager.synthesize("same text", seed=8)
    assert a.frames != c.frames or not np.array_equal(a.samples, c.samples)


def test_streaming_blocks(manager):
    blocks = list(manager.stream("stream me"))
    assert all(b.size == manager.frame_samples for b in blocks)
    assert len(blocks) >= 1


def test_voice_cloning(manager, tmp_path):
    rng = np.random.RandomState(0)
    sample = (rng.randn(SAMPLE_RATE * 2) * 0.1).astype(np.float32)  # 2 s
    manager.clone_voice(sample, "alice", voices_dir=tmp_path)
    assert manager.voices["alice"].shape == (VOICE_PROMPT_FRAMES, manager.cfg.mimi.latent_dim)
    assert (tmp_path / "voices.npz").exists()
    r = manager.synthesize("cloned voice", voice="alice")
    assert r.frames >= 1
    # different voice prompt conditions the generation
    r2 = manager.synthesize("cloned voice", voice="default")
    assert r.frames != r2.frames or not np.array_equal(r.samples, r2.samples)


def test_unknown_voice_raises(manager):
    with pytest.raises(KeyError):
        manager.synthesize("hi", voice="ghost")


def test_too_short_clone_rejected(manager):
    with pytest.raises(ValueError, match="too short"):
        manager.clone_voice(np.zeros(100, np.float32), "bad")


def test_pocket_uses_sentencepiece_model_when_cached(tmp_path):
    """A cached binary tokenizer.model switches _tokenize to real vocab ids."""
    from fluidaudio_tpu.asr.sentencepiece_model import (
        NORMAL, UNKNOWN, Piece, SentencePieceModel, serialize_model,
    )
    from fluidaudio_tpu.models.pocket_tts import POCKET_TEST
    from fluidaudio_tpu.tts.pocket_manager import PocketTtsManager

    pieces = [Piece("<unk>", 0.0, UNKNOWN)]
    pieces += [Piece(p, -1.0, NORMAL) for p in ("▁hello", "▁world", "▁", "h", "i")]
    (tmp_path / "tokenizer.model").write_bytes(
        serialize_model(SentencePieceModel(pieces=pieces)))
    mgr = PocketTtsManager(POCKET_TEST, checkpoint_dir=tmp_path)
    assert mgr.tokenizer is not None
    ids = mgr._tokenize("hello world")
    import numpy as np

    np.testing.assert_array_equal(np.asarray(ids)[0], [1, 2])


def tree_shapes(tree):
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(getattr(leaf, "shape", np.shape(leaf)))
    return out


def synthetic_flowlm_state_dict(cfg, rng):
    d = cfg.d_model
    sd = {
        "text_emb.weight": rng.randn(cfg.vocab_size, d) * 0.05,
        "input_proj.weight": rng.randn(d, cfg.mimi.latent_dim) * 0.05,
        "bos_emb": rng.randn(d) * 0.05,
        "out_norm.alpha": np.abs(rng.randn(1, 1, d)) + 0.5,
        "eos_head.weight": rng.randn(1, d) * 0.05,
        "eos_head.bias": rng.randn(1) * 0.05,
    }
    for i in range(cfg.n_layers):
        b = f"transformer.layers.{i}"
        sd[f"{b}.norm1.alpha"] = np.abs(rng.randn(1, 1, d)) + 0.5
        sd[f"{b}.norm2.alpha"] = np.abs(rng.randn(1, 1, d)) + 0.5
        sd[f"{b}.self_attn.in_proj_weight"] = rng.randn(3 * d, d) * 0.05
        sd[f"{b}.self_attn.out_proj.weight"] = rng.randn(d, d) * 0.05
        sd[f"{b}.gating.linear_in.weight"] = rng.randn(2 * cfg.ff_hidden, d) * 0.05
        sd[f"{b}.gating.linear_out.weight"] = rng.randn(d, cfg.ff_hidden) * 0.05
    return sd


def synthetic_flow_decoder_state_dict(cfg, rng):
    ld, fh = cfg.mimi.latent_dim, cfg.flow_hidden
    sd = {
        "velocity.time_proj.weight": rng.randn(fh, fh) * 0.05,
        "velocity.time_proj.bias": rng.randn(fh) * 0.05,
        "velocity.in_proj.weight": rng.randn(fh, ld + cfg.d_model) * 0.05,
        "velocity.in_proj.bias": rng.randn(fh) * 0.05,
        "velocity.out_proj.weight": rng.randn(ld, fh) * 0.05,
        "velocity.out_proj.bias": rng.randn(ld) * 0.05,
    }
    for i in range(cfg.flow_blocks):
        sd[f"velocity.blk{i}.norm.weight"] = np.abs(rng.randn(fh)) + 0.5
        sd[f"velocity.blk{i}.norm.bias"] = rng.randn(fh) * 0.05
        sd[f"velocity.blk{i}.fc1.weight"] = rng.randn(fh, fh) * 0.05
        sd[f"velocity.blk{i}.fc1.bias"] = rng.randn(fh) * 0.05
        sd[f"velocity.blk{i}.fc2.weight"] = rng.randn(fh, fh) * 0.05
        sd[f"velocity.blk{i}.fc2.bias"] = rng.randn(fh) * 0.05
    return sd


def test_pocket_converters_tree_match_and_run():
    import jax
    import jax.numpy as jnp

    from fluidaudio_tpu.convert.pocket_tts import (
        convert_pocket_flow_decoder_state_dict,
        convert_pocket_flowlm_state_dict,
    )
    from fluidaudio_tpu.models.pocket_tts import FlowDecoder, FlowLm, init_kv

    cfg = POCKET_TEST
    rng = np.random.RandomState(0)
    lm_params = convert_pocket_flowlm_state_dict(
        synthetic_flowlm_state_dict(cfg, rng), cfg)
    fd_params = convert_pocket_flow_decoder_state_dict(
        synthetic_flow_decoder_state_dict(cfg, rng), cfg)

    lm = FlowLm(cfg)
    kv = init_kv(cfg, 1)
    x = jnp.zeros((1, cfg.d_model))
    want = jax.eval_shape(
        lambda: lm.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), kv))
    assert tree_shapes(want) == tree_shapes(lm_params), (
        f"missing={set(tree_shapes(want)) - set(tree_shapes(lm_params))}\n"
        f"extra={set(tree_shapes(lm_params)) - set(tree_shapes(want))}")
    hidden, eos, kv2 = lm.apply(lm_params, x, jnp.zeros((1,), jnp.int32), kv)
    assert hidden.shape == (1, cfg.d_model) and np.isfinite(float(eos[0]))

    fd = FlowDecoder(cfg)
    noise = jnp.asarray(rng.randn(1, cfg.mimi.latent_dim).astype(np.float32))
    want_fd = jax.eval_shape(lambda: fd.init(jax.random.PRNGKey(0), hidden, noise))
    assert tree_shapes(want_fd) == tree_shapes(fd_params), (
        f"missing={set(tree_shapes(want_fd)) - set(tree_shapes(fd_params))}\n"
        f"extra={set(tree_shapes(fd_params)) - set(tree_shapes(want_fd))}")
    latent = fd.apply(fd_params, hidden, noise)
    assert latent.shape == (1, cfg.mimi.latent_dim)
    assert np.isfinite(np.asarray(latent)).all()


def test_flowlm_kv_step_matches_full_attention():
    """Step-by-step KV decode == full-sequence causal attention with the same
    converted params (validates the cache write/mask/rope math)."""
    import jax
    import jax.numpy as jnp

    from fluidaudio_tpu.convert.pocket_tts import convert_pocket_flowlm_state_dict
    from fluidaudio_tpu.models.mimi import _rope
    from fluidaudio_tpu.models.pocket_tts import FlowLm, init_kv

    cfg = POCKET_TEST
    rng = np.random.RandomState(1)
    params = convert_pocket_flowlm_state_dict(
        synthetic_flowlm_state_dict(cfg, rng), cfg)
    lm = FlowLm(cfg)

    T = 7
    xs = rng.randn(1, T, cfg.d_model).astype(np.float32)

    # streaming
    kv = init_kv(cfg, 1)
    hiddens = []
    for t in range(T):
        h, _, kv = lm.apply(params, jnp.asarray(xs[:, t]),
                            jnp.array([t], jnp.int32), kv, method=FlowLm.step)
        hiddens.append(np.asarray(h))
    got = np.stack(hiddens, axis=1)

    # full-sequence reference with the same params
    def full_ref():
        pp = params["params"]
        x = jnp.asarray(xs)
        B, T_, D = x.shape
        H, Dh = cfg.n_heads, cfg.head_dim
        pos = jnp.broadcast_to(jnp.arange(T_)[None], (B, T_))
        rms = lambda p, v: v * jax.lax.rsqrt(
            jnp.mean(v * v, -1, keepdims=True) + 1e-5) * p["scale"]
        for i in range(cfg.n_layers):
            lp = pp[f"blk{i}"]
            h = rms(lp["norm1"], x)
            qkv = h @ lp["in_proj"]["kernel"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = _rope(q.reshape(B, T_, H, Dh), pos)
            k = _rope(k.reshape(B, T_, H, Dh), pos)
            v = v.reshape(B, T_, H, Dh)
            sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(Dh)
            sc = jnp.where(jnp.tril(jnp.ones((T_, T_), bool))[None, None], sc, -1e30)
            att = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(sc, -1), v)
            x = x + att.reshape(B, T_, D) @ lp["out_proj"]["kernel"]
            f = rms(lp["norm2"], x)
            g = f @ lp["gate_in"]["kernel"]
            a, b = jnp.split(g, 2, axis=-1)
            x = x + (jax.nn.silu(a) * b) @ lp["gate_out"]["kernel"]
        return rms(pp["out_norm"], x)

    ref = np.asarray(full_ref())
    np.testing.assert_allclose(got[:, :, :], ref, atol=3e-5, rtol=1e-4)


class TestVoiceClonerHelpers:
    """PocketTtsVoiceClonerTests.swift:16-108 — fixed-window pad/truncate
    and ceil-trimmed usable frame count (pure host logic)."""

    def test_encoder_input_buffer_pads_shorter_audio(self):
        from fluidaudio_tpu.tts.pocket_manager import (
            ENCODER_INPUT_SAMPLES,
            make_encoder_input_buffer,
        )

        real = 180_000
        x = (np.arange(real) % 17 - 8).astype(np.float32)
        buf = make_encoder_input_buffer(x)
        assert buf.shape == (ENCODER_INPUT_SAMPLES,)
        np.testing.assert_array_equal(buf[:real], x)
        assert not buf[real:].any()

    def test_encoder_input_buffer_truncates_longer_audio(self):
        from fluidaudio_tpu.tts.pocket_manager import (
            ENCODER_INPUT_SAMPLES,
            make_encoder_input_buffer,
        )

        x = (np.arange(ENCODER_INPUT_SAMPLES + 120_000) % 23 - 11).astype(np.float32)
        buf = make_encoder_input_buffer(x)
        assert buf.shape == (ENCODER_INPUT_SAMPLES,)
        np.testing.assert_array_equal(buf, x[:ENCODER_INPUT_SAMPLES])

    def test_encoder_input_buffer_handles_exact_length(self):
        from fluidaudio_tpu.tts.pocket_manager import (
            ENCODER_INPUT_SAMPLES,
            make_encoder_input_buffer,
        )

        x = (np.arange(ENCODER_INPUT_SAMPLES) * 1e-6).astype(np.float32)
        np.testing.assert_array_equal(make_encoder_input_buffer(x), x)

    def test_encoder_input_buffer_handles_empty_input(self):
        from fluidaudio_tpu.tts.pocket_manager import (
            ENCODER_INPUT_SAMPLES,
            make_encoder_input_buffer,
        )

        buf = make_encoder_input_buffer(np.zeros(0, np.float32))
        assert buf.shape == (ENCODER_INPUT_SAMPLES,)
        assert not buf.any()

    def test_usable_frame_count_rounds_partial_frame_up(self):
        from fluidaudio_tpu.tts.pocket_manager import usable_frame_count

        assert usable_frame_count(180_000, 125) == 94

    def test_usable_frame_count_caps_at_max_voice_frames(self):
        from fluidaudio_tpu.models.pocket_tts import VOICE_PROMPT_FRAMES
        from fluidaudio_tpu.tts.pocket_manager import (
            ENCODER_INPUT_SAMPLES,
            usable_frame_count,
        )

        assert usable_frame_count(ENCODER_INPUT_SAMPLES, 200) == VOICE_PROMPT_FRAMES

    def test_usable_frame_count_caps_at_available_frames(self):
        from fluidaudio_tpu.tts.pocket_manager import (
            ENCODER_INPUT_SAMPLES,
            usable_frame_count,
        )

        assert usable_frame_count(ENCODER_INPUT_SAMPLES, 80) == 80

    def test_usable_frame_count_handles_exact_frame_boundary(self):
        from fluidaudio_tpu.tts.pocket_manager import usable_frame_count

        assert usable_frame_count(95 * 1920, 125) == 95

    def test_usable_frame_count_handles_sub_frame_audio(self):
        from fluidaudio_tpu.tts.pocket_manager import usable_frame_count

        assert usable_frame_count(100, 125) == 1

    def test_clone_voice_rejects_below_minimum_duration(self, manager):
        with pytest.raises(ValueError, match="too short"):
            manager.clone_voice(np.zeros(12_000, np.float32), "x")
