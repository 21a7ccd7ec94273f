"""Online nearest-centroid speaker database.

Behavioral parity: reference `Diarizer/Clustering/SpeakerManager.swift:8-55,
135-530`: dual thresholds (assign vs embedding-update), min durations, EMA
main-embedding updates (alpha 0.9), numeric auto IDs, permanence, merge.
"""

from __future__ import annotations

import time

import numpy as np

from fluidaudio_tpu.diarizer.types import (
    RawEmbedding,
    Speaker,
    cosine_distance,
    l2_normalize,
)
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("diarizer.speakers")

EMBEDDING_SIZE = 256


class SpeakerManager:
    def __init__(
        self,
        speaker_threshold: float = 0.65,
        embedding_threshold: float = 0.45,
        min_speech_duration: float = 1.0,
        min_embedding_update_duration: float = 2.0,
        embedding_size: int = EMBEDDING_SIZE,
    ):
        self.speaker_threshold = speaker_threshold
        self.embedding_threshold = embedding_threshold
        self.min_speech_duration = min_speech_duration
        self.min_embedding_update_duration = min_embedding_update_duration
        self.embedding_size = embedding_size
        self._db: dict[str, Speaker] = {}
        self._next_id = 1

    # ------------------------------------------------------------- queries

    @property
    def speaker_count(self) -> int:
        return len(self._db)

    @property
    def speaker_ids(self) -> list[str]:
        return sorted(self._db)

    def get_speaker(self, speaker_id: str) -> Speaker | None:
        return self._db.get(speaker_id)

    def get_all_speakers(self) -> dict[str, Speaker]:
        return dict(self._db)

    def _closest(self, embedding: np.ndarray) -> tuple[str | None, float]:
        best_id, best = None, float("inf")
        for sid, spk in self._db.items():
            d = cosine_distance(embedding, spk.current_embedding)
            if d < best:
                best, best_id = d, sid
        return best_id, best

    def find_speaker(
        self, embedding: np.ndarray, speaker_threshold: float | None = None
    ) -> tuple[str | None, float]:
        sid, dist = self._closest(embedding)
        thr = speaker_threshold if speaker_threshold is not None else self.speaker_threshold
        if sid is not None and dist <= thr:
            return sid, dist
        return None, float("inf")

    # ------------------------------------------------------------ mutation

    def assign_speaker(
        self,
        embedding: np.ndarray,
        speech_duration: float,
        confidence: float = 1.0,
        speaker_threshold: float | None = None,
    ) -> Speaker | None:
        embedding = np.asarray(embedding, np.float32).reshape(-1)
        if embedding.size != self.embedding_size:
            logger.error("invalid embedding size %d", embedding.size)
            return None
        norm = l2_normalize(embedding)
        thr = speaker_threshold if speaker_threshold is not None else self.speaker_threshold
        sid, dist = self._closest(norm)

        if sid is not None and dist < thr:
            spk = self._db[sid]
            if dist < self.embedding_threshold and float(np.sum(norm**2)) > 0.01:
                spk.update_main_embedding(speech_duration, norm, alpha=0.9)
            else:
                spk.duration += speech_duration
                spk.updated_at = time.time()
            return spk

        if speech_duration >= self.min_speech_duration:
            sid = str(self._next_id)
            self._next_id += 1
            spk = Speaker(
                id=sid,
                name=f"Speaker {sid}",
                current_embedding=norm,
                duration=speech_duration,
            )
            spk.add_raw_embedding(RawEmbedding(norm))
            self._db[sid] = spk
            return spk
        return None

    def initialize_known_speakers(self, speakers: list[Speaker], mode: str = "skip") -> None:
        """mode: skip | overwrite | merge | reset (reference init modes)."""
        if mode == "reset":
            self._db = {s.id: s for s in self._db.values() if s.is_permanent}
        max_numeric = 0
        for spk in speakers:
            if np.size(spk.current_embedding) != self.embedding_size:
                logger.warning("skipping %s: bad embedding size", spk.id)
                continue
            existing = self._db.get(spk.id)
            if existing is not None:
                if mode in ("overwrite", "reset") and not existing.is_permanent:
                    self._db[spk.id] = spk
                elif mode == "merge" and not existing.is_permanent:
                    existing.merge_with(spk, keep_name=spk.name)
                # skip otherwise
            else:
                self._db[spk.id] = spk
            if spk.id.isdigit():
                max_numeric = max(max_numeric, int(spk.id))
        self._next_id = max(self._next_id, max_numeric + 1)

    def merge_speaker(self, source_id: str, into_id: str) -> bool:
        src, dst = self._db.get(source_id), self._db.get(into_id)
        if src is None or dst is None or src.is_permanent:
            return False
        dst.merge_with(src)
        del self._db[source_id]
        return True

    def make_speaker_permanent(self, speaker_id: str) -> None:
        if speaker_id in self._db:
            self._db[speaker_id].is_permanent = True

    def remove_speaker(self, speaker_id: str, keep_if_permanent: bool = True) -> None:
        spk = self._db.get(speaker_id)
        if spk is None or (spk.is_permanent and keep_if_permanent):
            return
        del self._db[speaker_id]

    def reset(self, keep_if_permanent: bool = True) -> None:
        if keep_if_permanent:
            self._db = {k: v for k, v in self._db.items() if v.is_permanent}
        else:
            self._db = {}
        if not self._db:
            self._next_id = 1
