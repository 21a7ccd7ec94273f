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
    assert r.samples.size == r.frames * FRAME_SAMPLES
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
    assert all(b.size == FRAME_SAMPLES for b in blocks)
    assert len(blocks) >= 1


def test_voice_cloning(manager, tmp_path):
    rng = np.random.RandomState(0)
    sample = (rng.randn(SAMPLE_RATE * 2) * 0.1).astype(np.float32)  # 2 s
    manager.clone_voice(sample, "alice", voices_dir=tmp_path)
    assert manager.voices["alice"].shape == (VOICE_PROMPT_FRAMES, 32)
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
    with pytest.raises(AssertionError):
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
