"""Offline diarizer configuration, grouped by stage.

Behavioral parity: reference `Offline/Core/OfflineDiarizerTypes.swift:30-230`
(`OfflineDiarizerConfig` with Segmentation/Embedding/Clustering/VBx/
PostProcessing/Export groups; community default stepRatio 0.1, shipped default
0.2 = 2x faster / -1.2 DER per SURVEY §2.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SegmentationOptions:
    window_seconds: float = 10.0
    step_ratio: float = 0.2  # step = window * ratio
    min_activity_threshold: float = 0.5


@dataclass(frozen=True)
class EmbeddingOptions:
    batch_size: int = 32
    min_active_frames: float = 10.0


@dataclass(frozen=True)
class ClusteringOptions:
    method: str = "ahc_vbx"  # "ahc_vbx" | "ahc" | "kmeans"
    ahc_threshold: float = 0.6  # cosine distance threshold for warm start
    num_speakers: int = -1  # -1 = auto
    min_speakers: int = 1
    max_speakers: int = 20


@dataclass(frozen=True)
class VBxOptions:
    fa: float = 0.07
    fb: float = 0.8
    loop_probability: float = 0.9
    max_iterations: int = 20
    epsilon: float = 1e-4  # ELBO convergence threshold


@dataclass(frozen=True)
class PostProcessingOptions:
    min_duration_on: float = 0.0
    min_duration_off: float = 0.0
    min_gap: float = 0.0


@dataclass(frozen=True)
class OfflineDiarizerConfig:
    segmentation: SegmentationOptions = field(default_factory=SegmentationOptions)
    embedding: EmbeddingOptions = field(default_factory=EmbeddingOptions)
    clustering: ClusteringOptions = field(default_factory=ClusteringOptions)
    vbx: VBxOptions = field(default_factory=VBxOptions)
    post: PostProcessingOptions = field(default_factory=PostProcessingOptions)
