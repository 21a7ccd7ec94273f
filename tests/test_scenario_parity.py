"""Small scenario-parity batch mirroring reference unit suites.

Covers: `TokenizerTests.swift` (decode contract), `StringUtilsTests.swift`
(Levenshtein cases), `StyleTTS2DiffusionScheduleTests.swift` (Karras sigma
schedule), `KMeansClusteringTests.swift` (clustering edge cases).
"""

import json

import numpy as np
import pytest

from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.diarizer.offline.kmeans import kmeans_cluster
from fluidaudio_tpu.metrics.wer import levenshtein
from fluidaudio_tpu.models.styletts2 import karras_sigmas

# --------------------------------------------------------------------------
# Tokenizer decode (TokenizerTests.swift)
# --------------------------------------------------------------------------


@pytest.fixture
def tok():
    return Tokenizer({0: "▁Hello", 1: "▁world", 2: "▁The", 3: "▁qu", 4: "ick",
                      5: "▁brown"})


def test_decode_known_token_ids(tok):
    assert tok.decode([0, 1]) == "Hello world"


def test_decode_unknown_token_id_is_skipped(tok):
    assert tok.decode([0, 9999]) == "Hello"


def test_decode_empty_ids_returns_empty(tok):
    assert tok.decode([]) == ""


def test_sentencepiece_boundary_replacement(tok):
    assert tok.decode([2, 3, 4, 5]) == "The quick brown"


def test_invalid_json_raises(tmp_path):
    f = tmp_path / "vocab.json"
    f.write_text("{not json")
    with pytest.raises(json.JSONDecodeError):
        Tokenizer.from_json(f)


def test_nonexistent_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        Tokenizer.from_json(tmp_path / "missing.json")


# --------------------------------------------------------------------------
# Levenshtein (StringUtilsTests.swift) — ours returns op breakdown
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("hello", "hello", 0),
        ("", "abc", 3),
        ("abc", "", 3),
        ("", "", 0),
        ("kitten", "sitten", 1),
        ("abc", "abcd", 1),
        ("abcd", "abc", 1),
        ("abc", "xyz", 3),
        ("kitten", "sitting", 3),  # classic NLP example
        ("ABC", "abc", 3),  # case-sensitive
    ],
)
def test_levenshtein_distance_chars(a, b, want):
    assert levenshtein(list(a), list(b)).errors == want


def test_levenshtein_generic_int_sequences():
    assert levenshtein([1, 2, 3], [1, 9, 3]).errors == 1
    assert levenshtein([1, 2, 3], [1, 2, 3, 4]).errors == 1


def test_levenshtein_op_breakdown_consistency():
    bd = levenshtein(list("kitten"), list("sitting"))
    assert bd.substitutions + bd.insertions + bd.deletions == bd.errors


# --------------------------------------------------------------------------
# Karras sigma schedule (StyleTTS2DiffusionScheduleTests.swift)
# --------------------------------------------------------------------------


def test_karras_sigmas_length_is_steps_plus_pad():
    assert karras_sigmas(5).shape == (6,)


def test_karras_sigmas_endpoints():
    s = karras_sigmas(8, sigma_min=1e-4, sigma_max=3.0)
    assert s[0] == pytest.approx(3.0, abs=1e-6)
    assert s[7] == pytest.approx(1e-4, abs=1e-7)


def test_karras_sigmas_terminator_is_zero():
    assert karras_sigmas(4)[-1] == 0.0


def test_karras_sigmas_monotonically_decreasing():
    s = karras_sigmas(10)
    assert np.all(np.diff(s) < 0)


# --------------------------------------------------------------------------
# K-means (KMeansClusteringTests.swift)
# --------------------------------------------------------------------------


def _blobs(centers, per, scale=0.05, seed=0):
    rng = np.random.RandomState(seed)
    return np.concatenate(
        [c + rng.randn(per, len(c)) * scale for c in centers]
    ).astype(np.float32)


def test_kmeans_produces_requested_cluster_count():
    X = _blobs([[0, 0], [5, 5], [-5, 5]], per=2)
    labels, cents = kmeans_cluster(X, 3)
    assert labels.shape == (6,)
    assert len(set(labels.tolist())) == 3
    # blob mates share a label
    assert labels[0] == labels[1] and labels[2] == labels[3] and labels[4] == labels[5]


def test_kmeans_handles_single_cluster():
    X = _blobs([[1, 1]], per=3)
    labels, cents = kmeans_cluster(X, 1)
    assert (labels == 0).all()
    assert cents.shape == (1, 2)


def test_kmeans_clamps_k_to_sample_count():
    X = np.array([[0.0, 0.0], [10.0, 10.0]], np.float32)
    labels, cents = kmeans_cluster(X, 3)  # more clusters than points
    assert labels.shape == (2,)
    assert cents.shape[0] == 2  # k clamped
    assert labels[0] != labels[1]


def test_kmeans_computes_centroids():
    X = _blobs([[0, 0], [8, 8]], per=2, scale=0.01)
    labels, cents = kmeans_cluster(X, 2)
    for j in range(2):
        members = X[labels == j]
        assert np.allclose(cents[j], members.mean(axis=0), atol=1e-3)


def test_kmeans_deterministic_with_same_seed():
    X = _blobs([[0, 0], [5, 5], [-5, 5]], per=7, seed=3)
    l1, c1 = kmeans_cluster(X, 3, seed=42)
    l2, c2 = kmeans_cluster(X, 3, seed=42)
    assert np.array_equal(l1, l2)
    assert np.allclose(c1, c2)


def test_kmeans_realistic_embedding_dimension():
    rng = np.random.RandomState(9)
    centers = rng.randn(3, 192) * 3
    X = _blobs(list(centers), per=7, scale=0.1, seed=4)
    labels, _ = kmeans_cluster(X, 3)
    assert labels.shape == (21,)
    assert len(set(labels.tolist())) == 3
