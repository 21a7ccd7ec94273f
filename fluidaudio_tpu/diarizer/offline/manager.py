"""Offline diarization pipeline: segmentation -> embeddings -> PLDA -> AHC ->
VBx -> reconstruction.

Behavioral parity: reference `Offline/Core/OfflineDiarizerManager.swift:7,
112-365`. The reference runs segmentation and embedding as two concurrent
actor tasks joined by an AsyncThrowingStream (2-stage pipeline parallelism);
on TPU both stages are BATCHED jitted calls (all windows at once), so the
pipeline collapses into straight-line code with strictly more parallelism
(SURVEY.md §2.10).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.diarizer.metrics import compute_der
from fluidaudio_tpu.diarizer.offline.ahc import ahc_cluster
from fluidaudio_tpu.diarizer.offline.embedding import OfflineEmbeddingExtractor
from fluidaudio_tpu.diarizer.offline.kmeans import kmeans_cluster
from fluidaudio_tpu.diarizer.offline.plda import PLDATransform
from fluidaudio_tpu.diarizer.offline.reconstruction import reconstruct_segments
from fluidaudio_tpu.diarizer.offline.segmentation import OfflineSegmentationProcessor
from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig
from fluidaudio_tpu.diarizer.offline.vbx import VBxClustering
from fluidaudio_tpu.diarizer.types import DiarizationResult, PipelineTimings
from fluidaudio_tpu.models.pyannote_seg import PyannoteSegmentation, WINDOW_SAMPLES
from fluidaudio_tpu.models.wespeaker import WeSpeakerEmbedder, make_fbank_frontend
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("diarizer.offline")

SAMPLE_RATE = 16_000


class OfflineDiarizerManager:
    def __init__(
        self,
        config: OfflineDiarizerConfig | None = None,
        *,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
        seg_config=None,
        emb_config=None,
    ):
        """`seg_config` / `emb_config` override the model sizes (default:
        the full pyannote/WeSpeaker shapes the reference ships; the trained
        tiny fixtures pass reduced configs — zoo `test-tiny` pattern)."""
        self.config = config or OfflineDiarizerConfig()
        self.config.validate()  # fail fast on bad stage params (reference)
        seg_model = (PyannoteSegmentation(seg_config) if seg_config
                     else PyannoteSegmentation())
        embedder = WeSpeakerEmbedder(emb_config) if emb_config else WeSpeakerEmbedder()
        fbank = make_fbank_frontend()

        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        seg_params = jax.jit(seg_model.init)(k1, jnp.zeros((1, WINDOW_SAMPLES), jnp.float32))
        mel, _ = fbank(jnp.zeros((1, WINDOW_SAMPLES)))
        mel_t = jnp.transpose(mel, (0, 2, 1))
        emb_params = jax.jit(embedder.init)(k2, mel_t, jnp.ones((1, mel_t.shape[1])))

        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(
            Repo.OFFLINE_DIARIZER
        )
        missing = []
        if (base / "segmentation.npz").exists():
            seg_params = load_params(base / "segmentation.npz", seg_params)
        else:
            missing.append("segmentation")
        if (base / "embedding.npz").exists():
            emb_params = load_params(base / "embedding.npz", emb_params)
        else:
            missing.append("embedding")
        self.plda = PLDATransform.load(base) or PLDATransform.random_init(seed=rng_seed)
        if missing:  # partial caches are the dangerous case: name each gap
            logger.warning("offline diarizer: missing %s checkpoints in %s — random init",
                           "+".join(missing), base)

        self.segmentation = OfflineSegmentationProcessor(
            seg_model, seg_params, self.config.segmentation
        )
        self.embedding = OfflineEmbeddingExtractor(
            embedder, emb_params, fbank, self.config.embedding
        )
        self.vbx = VBxClustering(self.config.vbx)

    def process(self, samples: np.ndarray, progress=None) -> DiarizationResult:
        """`progress(chunks_processed, total_chunks)`: optional callback fired
        per segmentation device batch; monotone, consistent total, final
        update reaches total (reference OfflineDiarizerManager.process
        progress contract)."""
        t_total = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        total_seconds = samples.size / SAMPLE_RATE
        timings = PipelineTimings()

        t0 = time.perf_counter()
        chunks = self.segmentation.process(samples, progress=progress)
        timings.segmentation_seconds = time.perf_counter() - t0

        t0 = time.perf_counter()
        embeddings, index = self.embedding.extract(samples, chunks)
        timings.embedding_seconds = time.perf_counter() - t0

        t0 = time.perf_counter()
        cl = self.config.clustering
        if embeddings.shape[0] == 0:
            labels = np.zeros(0, np.int64)
        elif cl.method == "kmeans":
            k = cl.num_speakers if cl.num_speakers > 0 else min(4, embeddings.shape[0])
            labels, _ = kmeans_cluster(embeddings, k)
        else:
            warm = ahc_cluster(embeddings, cl.ahc_threshold)
            if cl.method == "ahc_vbx" and embeddings.shape[0] >= 2:
                rho = self.plda(embeddings)
                result = self.vbx.refine_with_constraints(
                    rho,
                    self.plda.psi,
                    warm,
                    num_speakers=cl.num_speakers,
                    min_speakers=cl.min_speakers,
                    max_speakers=cl.max_speakers,
                )
                labels = result.labels
            else:
                labels = warm
        timings.clustering_seconds = time.perf_counter() - t0

        t0 = time.perf_counter()
        segments = reconstruct_segments(
            chunks, index, labels, total_seconds, self.config.post
        )
        timings.post_processing_seconds = time.perf_counter() - t0
        timings.total_seconds = time.perf_counter() - t_total

        n_speakers = len({s.speaker_id for s in segments})
        return DiarizationResult(segments=segments, speaker_count=n_speakers, timings=timings)

    @staticmethod
    def evaluate(reference, hypothesis, collar: float = 0.25):
        """DER/JER guardrail metric (in-library, reference DiarizationDER)."""
        return compute_der(reference, hypothesis, collar=collar)
