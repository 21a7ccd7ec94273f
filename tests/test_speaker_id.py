"""Speaker verification/identification over synthetic embeddings."""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.speaker_id import SpeakerVerifier


def fake_embedder_factory():
    """Maps audio deterministically into distinct embedding directions by the
    dominant frequency band (stand-in for WeSpeaker)."""

    def embed(samples):
        rng = np.random.RandomState(int(abs(samples[:100].sum() * 1000)) % 2**31)
        v = rng.randn(256)
        return v / np.linalg.norm(v)

    return embed


@pytest.fixture
def verifier():
    return SpeakerVerifier(embedder=fake_embedder_factory(), threshold=0.35)


def speaker_audio(seed, n=16000):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 0.1).astype(np.float32)


def test_verify_same_speaker(verifier):
    audio = speaker_audio(1)
    verifier.enroll("alice", audio)
    result = verifier.verify("alice", audio)  # same audio -> same embedding
    assert result.is_match and result.similarity == pytest.approx(1.0, abs=1e-5)


def test_verify_different_speaker(verifier):
    verifier.enroll("alice", speaker_audio(1))
    result = verifier.verify("alice", speaker_audio(2))
    assert not result.is_match  # random 256-d directions are near-orthogonal
    assert abs(result.similarity) < 0.3


def test_identify(verifier):
    a, b = speaker_audio(1), speaker_audio(2)
    verifier.enroll("alice", a)
    verifier.enroll("bob", b)
    r = verifier.identify(a)
    assert r.speaker_id == "alice"
    assert set(r.all_scores) == {"alice", "bob"}
    r_unknown = verifier.identify(speaker_audio(99))
    assert r_unknown.speaker_id is None


def test_enroll_merge_and_persistence(verifier, tmp_path):
    verifier.enroll("alice", speaker_audio(1))
    before = verifier.profiles["alice"].copy()
    verifier.enroll("alice", speaker_audio(3))  # merges
    after = verifier.profiles["alice"]
    assert not np.allclose(before, after)
    assert np.linalg.norm(after) == pytest.approx(1.0, abs=1e-5)
    f = tmp_path / "profiles.npz"
    verifier.save(f)
    v2 = SpeakerVerifier(embedder=fake_embedder_factory())
    v2.load(f)
    np.testing.assert_array_equal(v2.profiles["alice"], after)


def test_verify_unknown_raises(verifier):
    with pytest.raises(KeyError):
        verifier.verify("ghost", speaker_audio(1))
