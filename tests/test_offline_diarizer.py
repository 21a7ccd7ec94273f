"""Offline diarization: VBx EM on synthetic rho features, weight interpolation,
k-means, reconstruction, pipeline smoke."""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster, cosine_to_euclidean_threshold
from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights
from fluidaudio_tpu.diarizer.offline.kmeans import kmeans_cluster
from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig, VBxOptions
from fluidaudio_tpu.diarizer.offline.vbx import VBxClustering


def make_blobs(n_per, centers, dim=128, scale=0.3, seed=0):
    rng = np.random.RandomState(seed)
    X, y = [], []
    for i, c in enumerate(centers):
        X.append(rng.randn(n_per, dim) * scale + c)
        y += [i] * n_per
    return np.concatenate(X).astype(np.float32), np.array(y)


def test_cosine_to_euclidean():
    # cos distance 0 (identical unit vecs) -> euclidean 0
    assert cosine_to_euclidean_threshold(0.0) == pytest.approx(0.0)
    # cos distance 1 (orthogonal) -> sqrt(2)
    assert cosine_to_euclidean_threshold(1.0) == pytest.approx(np.sqrt(2))


def test_ahc_separates_blobs():
    rng = np.random.RandomState(0)
    a = rng.randn(10, 16) * 0.01 + np.array([1.0] + [0] * 15)
    b = rng.randn(10, 16) * 0.01 + np.array([0, 1.0] + [0] * 14)
    labels = ahc_cluster(np.concatenate([a, b]), cosine_threshold=0.5)
    assert len(set(labels[:10])) == 1 and len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_vbx_recovers_clusters():
    centers = [np.zeros(128), np.zeros(128), np.zeros(128)]
    centers[0][0] = 4.0
    centers[1][1] = 4.0
    centers[2][2] = 4.0
    X, y = make_blobs(30, centers)
    psi = np.full(128, 4.0, np.float32)
    # noisy warm start: 20% corrupted labels
    rng = np.random.RandomState(1)
    warm = y.copy()
    corrupt = rng.choice(len(y), len(y) // 5, replace=False)
    warm[corrupt] = rng.randint(0, 3, corrupt.size)
    # fa=1/fb=1 = unscaled EM: synthetic blobs are one observation per frame,
    # unlike the dense x-vector streams the production fa=0.07 is tuned for
    vbx = VBxClustering(VBxOptions(fa=1.0, fb=1.0, max_iterations=30))
    result = vbx.refine(X, psi, warm)
    # VBx must fix the corrupted labels (up to permutation)
    from scipy.optimize import linear_sum_assignment

    k = result.labels.max() + 1
    conf = np.zeros((3, k))
    for t, p in zip(y, result.labels):
        conf[t, p] += 1
    rows, cols = linear_sum_assignment(-conf)
    acc = conf[rows, cols].sum() / len(y)
    assert acc > 0.95, f"VBx accuracy {acc}"
    # ELBO is monotone non-decreasing (within tolerance)
    t = result.elbo_trace
    assert all(b >= a - abs(a) * 1e-3 for a, b in zip(t, t[1:]))


def test_vbx_speaker_count_constraints():
    centers = [np.zeros(128), np.zeros(128)]
    centers[0][0] = 4.0
    centers[1][1] = 4.0
    X, y = make_blobs(20, centers, seed=3)
    psi = np.full(128, 4.0, np.float32)
    vbx = VBxClustering()
    # force exactly 1 speaker
    r1 = vbx.refine_with_constraints(X, psi, y, num_speakers=1)
    assert len(np.unique(r1.labels)) == 1
    # force at least 3
    r3 = vbx.refine_with_constraints(X, psi, y, num_speakers=3)
    assert len(np.unique(r3.labels)) == 3


def test_weight_interpolation_half_pixel():
    w = np.array([0.0, 1.0, 0.0], np.float32)
    out = interpolate_weights(w, 6)
    assert out.shape == (6,)
    assert out.max() <= 1.0 and out.min() >= 0.0
    # peak stays centered
    assert np.argmax(out) in (2, 3)
    # identity when lengths match
    np.testing.assert_array_equal(interpolate_weights(w, 3), w)


def test_kmeans_recovers_blobs():
    centers = [np.zeros(16), np.zeros(16)]
    centers[0][0] = 5.0
    centers[1][1] = 5.0
    X, y = make_blobs(15, centers, dim=16, seed=2)
    labels, cents = kmeans_cluster(X, 2)
    assert cents.shape == (2, 16)
    assert len(set(labels[:15])) == 1 and len(set(labels[15:])) == 1


def test_offline_pipeline_smoke():
    from fluidaudio_tpu.diarizer.offline import OfflineDiarizerManager

    mgr = OfflineDiarizerManager()
    rng = np.random.RandomState(0)
    audio = (rng.randn(12 * 16000) * 0.1).astype(np.float32)  # 12 s
    result = mgr.process(audio)
    assert result.timings.segmentation_seconds > 0
    for seg in result.segments:
        assert seg.speaker_id.startswith("S")
        assert 0 <= seg.start_time < seg.end_time <= 12.5


def test_vbx_hmm_smooths_isolated_flips():
    """The sticky HMM (loop_probability) must absorb isolated single-frame
    label flips inside long same-speaker runs — temporal smoothing that a
    pure iid mixture cannot provide when the flipped frame's acoustics are
    genuinely ambiguous (placed midway between both speakers)."""
    rng = np.random.RandomState(7)
    dim = 64
    c0 = np.zeros(dim); c0[0] = 3.0
    c1 = np.zeros(dim); c1[1] = 3.0
    mid = (c0 + c1) / 2
    # 40 frames spk0, 40 frames spk1; frame 20 is acoustically ambiguous
    X = np.concatenate([
        rng.randn(40, dim) * 0.3 + c0,
        rng.randn(40, dim) * 0.3 + c1,
    ]).astype(np.float32)
    X[20] = mid + rng.randn(dim) * 0.05
    y = np.array([0] * 40 + [1] * 40)
    warm = y.copy()
    warm[20] = 1  # warm start got the ambiguous frame wrong
    psi = np.full(dim, 4.0, np.float32)

    vbx = VBxClustering(VBxOptions(fa=1.0, fb=1.0, loop_probability=0.95,
                                   max_iterations=20))
    result = vbx.refine(X, psi, warm)
    labels = result.labels
    # HMM context pulls the ambiguous frame to its run's speaker
    assert labels[20] == labels[19] == labels[21]
    # and the two runs stay distinct
    assert labels[0] != labels[-1]


# --------------------------------------------------------------------------
# AHC clustering scenarios (AHCClusteringTests.swift:12-104)
# --------------------------------------------------------------------------


def test_ahc_empty_returns_empty():
    from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster

    assert ahc_cluster(np.zeros((0, 8)), 0.6).shape == (0,)


def test_ahc_single_embedding_single_cluster():
    from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster

    labels = ahc_cluster(np.random.RandomState(0).randn(1, 8), 0.6)
    assert list(labels) == [0]


def test_ahc_identical_embeddings_cluster_together():
    from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster

    e = np.tile(np.random.RandomState(1).randn(1, 16), (6, 1))
    labels = ahc_cluster(e, 0.3)
    assert len(set(labels.tolist())) == 1


def test_ahc_orthogonal_embeddings_separate_at_tight_threshold():
    from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster

    e = np.eye(4, 16)  # 4 mutually orthogonal rows
    labels = ahc_cluster(e, 0.2)  # tight cosine-distance threshold
    assert len(set(labels.tolist())) == 4


def test_ahc_cluster_ids_contiguous_from_zero():
    from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster

    rng = np.random.RandomState(2)
    a = rng.randn(1, 16)
    b = rng.randn(1, 16)
    e = np.concatenate([a + 0.01 * rng.randn(5, 16), b + 0.01 * rng.randn(5, 16)])
    labels = ahc_cluster(e, 0.5)
    uniq = sorted(set(labels.tolist()))
    assert uniq == list(range(len(uniq)))


def test_ahc_loose_threshold_merges_all():
    from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster

    rng = np.random.RandomState(3)
    e = rng.randn(8, 16)
    # cosine distance threshold ~ 2.0 == euclidean sqrt(2-2*(1-2)) covers all
    labels = ahc_cluster(e, 2.0)
    assert len(set(labels.tolist())) == 1


# --------------------------------------------------------------------------
# Weight interpolation matrix (WeightInterpolationTests.swift:10-136)
# --------------------------------------------------------------------------


def test_interp_identity_when_lengths_match():
    from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights

    w = np.array([0.1, 0.5, 0.9], np.float32)
    np.testing.assert_array_equal(interpolate_weights(w, 3), w)


def test_interp_upsampling_monotone_ramp():
    from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights

    w = np.array([0.0, 1.0], np.float32)
    out = interpolate_weights(w, 8)
    assert out.shape == (8,)
    assert np.all(np.diff(out) >= 0)
    assert out[0] == pytest.approx(0.0, abs=1e-6)  # clamped half-pixel edge
    assert out[-1] == pytest.approx(1.0, abs=1e-6)


def test_interp_downsampling_preserves_mean_roughly():
    from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights

    rng = np.random.RandomState(5)
    w = rng.rand(100).astype(np.float32)
    out = interpolate_weights(w, 25)
    assert out.shape == (25,)
    assert abs(out.mean() - w.mean()) < 0.05


def test_interp_half_pixel_offset_mapping():
    """out[i] samples src at (i + 0.5) * scale - 0.5 (scipy.ndimage.zoom
    alignment) — for a 2x upsample of [0, 1] the quarter points appear."""
    from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights

    out = interpolate_weights(np.array([0.0, 1.0], np.float32), 4)
    np.testing.assert_allclose(out, [0.0, 0.25, 0.75, 1.0], atol=1e-6)


def test_interp_linear_coefficients_exact():
    from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights

    w = np.array([1.0, 3.0, 5.0, 7.0], np.float32)
    out = interpolate_weights(w, 8)
    # position formula: (i + 0.5) * 0.5 - 0.5
    pos = (np.arange(8) + 0.5) * 0.5 - 0.5
    pos = np.clip(pos, 0, 3)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, 3)
    expect = w[lo] * (1 - (pos - lo)) + w[hi] * (pos - lo)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_interp_zero_output_length():
    from fluidaudio_tpu.diarizer.offline.embedding import interpolate_weights

    assert interpolate_weights(np.array([1.0, 2.0], np.float32), 0).shape == (0,)


# --------------------------------------------------------------------------
# Config validation + speaker-constraint conveniences
# (OfflineModuleTests.swift:10-64, OfflineConfigTests.swift:7-62)
# --------------------------------------------------------------------------


def test_offline_config_defaults_validate():
    from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig

    cfg = OfflineDiarizerConfig()
    cfg.validate()
    assert cfg.clustering.ahc_threshold == pytest.approx(0.6)
    assert cfg.vbx.fa == pytest.approx(0.07)
    assert cfg.vbx.fb == pytest.approx(0.8)
    assert cfg.vbx.max_iterations == 20


def test_offline_config_invalid_threshold_raises():
    import dataclasses

    from fluidaudio_tpu.diarizer.offline.types import (
        ClusteringOptions,
        OfflineDiarizerConfig,
    )

    cfg = OfflineDiarizerConfig(clustering=ClusteringOptions(ahc_threshold=1.5))
    with pytest.raises(ValueError, match="clustering.threshold"):
        cfg.validate()
    cfg = dataclasses.replace(cfg, clustering=ClusteringOptions(ahc_threshold=0.0))
    with pytest.raises(ValueError, match="clustering.threshold"):
        cfg.validate()


def test_offline_config_invalid_batch_size_raises():
    from fluidaudio_tpu.diarizer.offline.types import (
        EmbeddingOptions,
        OfflineDiarizerConfig,
    )

    cfg = OfflineDiarizerConfig(embedding=EmbeddingOptions(batch_size=0))
    with pytest.raises(ValueError, match="batch_size"):
        cfg.validate()


def test_offline_config_invalid_min_duration_raises():
    from fluidaudio_tpu.diarizer.offline.types import (
        OfflineDiarizerConfig,
        PostProcessingOptions,
    )

    cfg = OfflineDiarizerConfig(post=PostProcessingOptions(min_duration_on=-1.0))
    with pytest.raises(ValueError, match="min_duration"):
        cfg.validate()


def test_offline_config_with_speakers_min_max():
    from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig

    cfg = OfflineDiarizerConfig().with_speakers(min_speakers=2, max_speakers=5)
    assert cfg.clustering.min_speakers == 2
    assert cfg.clustering.max_speakers == 5
    assert cfg.clustering.num_speakers == -1  # still auto


def test_offline_config_with_exact_speakers():
    from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig

    cfg = OfflineDiarizerConfig().with_speakers(exactly=3)
    assert cfg.clustering.num_speakers == 3
    cfg.validate()


def test_offline_config_min_gt_max_raises():
    from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig

    cfg = OfflineDiarizerConfig().with_speakers(min_speakers=6, max_speakers=2)
    with pytest.raises(ValueError, match="min_speakers"):
        cfg.validate()


class TestSpeakerCountConstraints:
    """SpeakerCountConstraintsTests.swift:10-135 — resolve clamping,
    adjustment detection, and target count."""

    @staticmethod
    def _resolve(**kw):
        from fluidaudio_tpu.diarizer.offline import SpeakerCountConstraints

        return SpeakerCountConstraints.resolve(**kw)

    def test_no_constraints_returns_defaults(self):
        r = self._resolve(num_embeddings=100)
        assert r.num_speakers is None
        assert r.min_speakers == 1
        assert r.max_speakers == 100

    def test_num_speakers_overrides_min_max(self):
        r = self._resolve(num_embeddings=100, num_speakers=3,
                          min_speakers=1, max_speakers=10)
        assert (r.num_speakers, r.min_speakers, r.max_speakers) == (3, 3, 3)

    def test_clamps_to_embeddings(self):
        r = self._resolve(num_embeddings=5, min_speakers=2, max_speakers=20)
        assert (r.min_speakers, r.max_speakers) == (2, 5)

    def test_min_not_greater_than_max(self):
        r = self._resolve(num_embeddings=100, min_speakers=10, max_speakers=5)
        assert (r.min_speakers, r.max_speakers) == (5, 5)

    def test_zero_num_speakers_clamps_to_one(self):
        r = self._resolve(num_embeddings=100, num_speakers=0)
        assert (r.min_speakers, r.max_speakers) == (1, 1)

    def test_negative_num_speakers_clamps_to_one(self):
        r = self._resolve(num_embeddings=100, num_speakers=-5)
        assert (r.min_speakers, r.max_speakers) == (1, 1)

    def test_zero_min_speakers_clamps_to_one(self):
        r = self._resolve(num_embeddings=100, min_speakers=0, max_speakers=5)
        assert r.min_speakers == 1

    def test_negative_min_speakers_clamps_to_one(self):
        r = self._resolve(num_embeddings=100, min_speakers=-3, max_speakers=5)
        assert r.min_speakers == 1

    def test_needs_adjustment_when_below_min(self):
        r = self._resolve(num_embeddings=100, min_speakers=5, max_speakers=10)
        assert r.needs_adjustment(3)
        assert r.target_count(3) == 5

    def test_needs_adjustment_when_above_max(self):
        r = self._resolve(num_embeddings=100, min_speakers=2, max_speakers=5)
        assert r.needs_adjustment(8)
        assert r.target_count(8) == 5

    def test_no_adjustment_when_within_bounds(self):
        r = self._resolve(num_embeddings=100, min_speakers=2, max_speakers=5)
        assert not r.needs_adjustment(3)
        assert r.target_count(3) == 3


def test_vbx_result_reports_adjusted_flag():
    """VBxConstraintTests.swift:8-49 — functional: constraints that change
    the clustering set adjusted + original_cluster_count; an untouched run
    keeps adjusted False but still records the pre-adjustment count."""
    centers = [np.zeros(128), np.zeros(128)]
    centers[0][0] = 4.0
    centers[1][1] = 4.0
    X, y = make_blobs(20, centers, seed=3)
    psi = np.full(128, 4.0, np.float32)
    vbx = VBxClustering()

    forced = vbx.refine_with_constraints(X, psi, y, num_speakers=1)
    assert forced.adjusted
    assert forced.original_cluster_count == 2
    assert len(np.unique(forced.labels)) == 1

    free = vbx.refine_with_constraints(X, psi, y, num_speakers=-1,
                                       min_speakers=1, max_speakers=20)
    assert not free.adjusted
    assert free.original_cluster_count == 2


@pytest.fixture(scope="module")
def offline_manager():
    from fluidaudio_tpu.diarizer.offline import OfflineDiarizerManager

    return OfflineDiarizerManager()


class TestOfflineProgress:
    """OfflineDiarizerManagerProgressTests.swift:11-80 — totalChunks
    estimator and the per-batch progress callback contract."""

    def test_total_chunks_for_default_config(self):
        from fluidaudio_tpu.diarizer.offline import total_chunks
        from fluidaudio_tpu.diarizer.offline.types import SegmentationOptions

        cfg = SegmentationOptions()
        assert cfg.samples_per_step == 32_000
        assert total_chunks(1, cfg) == 1
        assert total_chunks(32_000, cfg) == 1
        assert total_chunks(32_001, cfg) == 2
        assert total_chunks(160_000, cfg) == 5
        assert total_chunks(160_001, cfg) == 6

    def test_total_chunks_at_least_one_for_zero_samples(self):
        from fluidaudio_tpu.diarizer.offline import total_chunks
        from fluidaudio_tpu.diarizer.offline.types import SegmentationOptions

        assert total_chunks(0, SegmentationOptions()) == 1

    def test_progress_callback_fires_and_is_monotonic(self, offline_manager):
        rng = np.random.RandomState(5)
        audio = (rng.randn(16_000 * 25) * 0.1).astype(np.float32)
        updates = []
        offline_manager.process(audio, progress=lambda done, total: updates.append((done, total)))

        assert updates, "progress callback should fire at least once"
        total = updates[0][1]
        assert total > 0
        assert all(t == total for _, t in updates)
        assert all(0 < d <= total for d, _ in updates)
        assert all(b >= a for (a, _), (b, _) in zip(updates, updates[1:]))
        assert updates[-1][0] == total

    def test_progress_callback_is_optional(self, offline_manager):
        rng = np.random.RandomState(6)
        audio = (rng.randn(16_000 * 3) * 0.1).astype(np.float32)
        result = offline_manager.process(audio)
        assert result is not None
