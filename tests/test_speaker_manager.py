"""SpeakerManager scenario parity suite.

Ports the reference's `Tests/FluidAudioTests/Diarizer/SpeakerManagerTests.swift`
(init modes, assign/update, permanence, merge, upsert, removal, FIFO,
threshold boundaries) and the `Speaker` type scenarios from
`Diarizer/SpeakerTests.swift` / `SpeakerOperationsTests.swift`
(raw-embedding FIFO recalculation, remove-raw, merge recency cap).
"""

from __future__ import annotations

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.speaker_manager import SpeakerManager
from fluidaudio_tpu.diarizer.types import (
    MAX_RAW_EMBEDDINGS,
    RawEmbedding,
    Speaker,
    cosine_distance,
    l2_normalize,
)

DIM = 256


def distinct_embedding(pattern: int) -> np.ndarray:
    """Deterministic, mutually-distant unit vectors (ref test helper)."""
    rng = np.random.default_rng(1000 + pattern)
    v = rng.normal(size=DIM).astype(np.float32)
    v[pattern % DIM] += 4.0
    return l2_normalize(v)


def make_manager(**kw) -> SpeakerManager:
    return SpeakerManager(**kw)


class TestAssign:
    def test_assign_new_speaker(self):
        m = make_manager()
        spk = m.assign_speaker(distinct_embedding(1), speech_duration=2.0)
        assert spk is not None
        assert spk.id == "1"
        assert m.speaker_count == 1

    def test_assign_existing_speaker(self):
        m = make_manager(speaker_threshold=0.3)
        e = distinct_embedding(1)
        first = m.assign_speaker(e, 3.0)
        e2 = e.copy()
        e2[0] += 0.01
        second = m.assign_speaker(e2, 3.0)
        assert second is not None and second.id == first.id
        assert m.speaker_count == 1

    def test_multiple_speakers(self):
        m = make_manager(speaker_threshold=0.3)
        ids = {m.assign_speaker(distinct_embedding(p), 2.0).id for p in (1, 2, 3)}
        assert len(ids) == 3
        assert m.speaker_count == 3

    def test_invalid_embedding_size(self):
        m = make_manager()
        assert m.assign_speaker(np.full(128, 0.5, np.float32), 2.0) is None
        assert m.speaker_count == 0

    def test_empty_embedding(self):
        m = make_manager()
        assert m.assign_speaker(np.zeros(0, np.float32), 2.0) is None
        assert m.speaker_count == 0

    def test_min_duration_filtering(self):
        m = make_manager(
            speaker_threshold=0.5, embedding_threshold=0.3, min_speech_duration=2.0
        )
        e = distinct_embedding(1)
        assert m.assign_speaker(e, 0.5) is None
        assert m.speaker_count == 0
        spk = m.assign_speaker(e, 3.0)
        assert spk is not None
        assert m.speaker_count == 1
        # Short duration still matches an EXISTING speaker.
        again = m.assign_speaker(e, 0.5)
        assert again is not None and again.id == spk.id

    def test_threshold_boundaries(self):
        m1 = make_manager(speaker_threshold=0.01)
        e = distinct_embedding(1)
        m1.assign_speaker(e, 2.0)
        e2 = e.copy()
        e2[0] += 0.0001
        m1.assign_speaker(e2, 2.0)
        assert m1.speaker_count == 1

        m2 = make_manager(speaker_threshold=0.001)
        m2.assign_speaker(e, 2.0)
        m2.assign_speaker(e, 2.0)  # exact duplicate matches itself
        assert m2.speaker_count == 1

    def test_embedding_update_within_assign(self):
        m = make_manager(speaker_threshold=0.3, embedding_threshold=0.2)
        e1 = distinct_embedding(1)
        spk = m.assign_speaker(e1, 3.0)
        count0 = m.get_speaker(spk.id).update_count
        e2 = e1.copy()
        e2[0] += 0.01
        same = m.assign_speaker(e2, 3.0)
        assert same.id == spk.id
        updated = m.get_speaker(spk.id)
        assert updated.update_count > count0
        assert not np.allclose(updated.current_embedding, e1)

    def test_embedding_update_even_for_short_duration(self):
        # Reference removed the duration gate on embedding updates.
        m = make_manager(speaker_threshold=0.3, embedding_threshold=0.2)
        e1 = distinct_embedding(1)
        spk = m.assign_speaker(e1, 3.0)
        count0 = m.get_speaker(spk.id).update_count
        e2 = e1.copy()
        e2[0] += 0.01
        same = m.assign_speaker(e2, 0.5)
        assert same.id == spk.id
        updated = m.get_speaker(spk.id)
        assert updated.update_count > count0
        assert updated.duration > 3.0

    def test_duration_only_update_outside_embedding_threshold(self):
        # distance in (embedding_threshold, speaker_threshold): duration
        # accrues but the embedding is not blended.
        m = make_manager(speaker_threshold=0.9, embedding_threshold=1e-6)
        e1 = distinct_embedding(1)
        spk = m.assign_speaker(e1, 3.0)
        emb_before = m.get_speaker(spk.id).current_embedding.copy()
        e2 = e1.copy()
        e2[:8] += 0.05
        same = m.assign_speaker(e2, 2.0)
        assert same.id == spk.id
        after = m.get_speaker(spk.id)
        assert after.duration == pytest.approx(5.0)
        np.testing.assert_allclose(after.current_embedding, emb_before)

    def test_raw_embedding_fifo_in_manager(self):
        m = make_manager(speaker_threshold=0.3, embedding_threshold=0.2)
        e1 = distinct_embedding(1)
        spk = m.assign_speaker(e1, 3.0)
        for i in range(60):
            e = e1.copy()
            e[0] += i * 0.001
            m.assign_speaker(e, 2.5)
        assert len(m.get_speaker(spk.id).raw_embeddings) <= MAX_RAW_EMBEDDINGS


class TestInitializeKnownSpeakers:
    def test_initialize_and_recognize(self):
        m = make_manager(speaker_threshold=0.3)
        e = distinct_embedding(7)
        known = Speaker(id="42", name="Alice", current_embedding=e, duration=10.0)
        m.initialize_known_speakers([known])
        assert m.speaker_count == 1
        sid, dist = m.find_speaker(e)
        assert sid == "42" and dist < 0.01
        # Next auto id continues after the numeric known id.
        new = m.assign_speaker(distinct_embedding(9), 2.0)
        assert new.id == "43"

    def test_preserves_permanent_by_default(self):
        m = make_manager()
        m.initialize_known_speakers(
            [Speaker(id="Alice", name="Original",
                     current_embedding=distinct_embedding(10), duration=4.0)]
        )
        m.make_speaker_permanent("Alice")
        m.initialize_known_speakers(
            [Speaker(id="Alice", name="Replacement",
                     current_embedding=distinct_embedding(20), duration=8.0)],
            mode="overwrite",
        )
        stored = m.get_speaker("Alice")
        assert stored.name == "Original"
        assert stored.duration == 4.0

    def test_overwrite_can_replace_permanent_when_allowed(self):
        m = make_manager()
        m.initialize_known_speakers(
            [Speaker(id="Alice", name="Original",
                     current_embedding=distinct_embedding(10), duration=4.0,
                     is_permanent=True)]
        )
        m.initialize_known_speakers(
            [Speaker(id="Alice", name="Replacement",
                     current_embedding=distinct_embedding(20), duration=10.0)],
            mode="overwrite",
            preserve_if_permanent=False,
        )
        stored = m.get_speaker("Alice")
        assert stored.name == "Replacement"
        assert stored.duration == 10.0

    def test_merge_combines_durations(self):
        m = make_manager()
        m.initialize_known_speakers(
            [Speaker(id="Alice", name="Alice",
                     current_embedding=distinct_embedding(10), duration=2.0)]
        )
        m.initialize_known_speakers(
            [Speaker(id="Alice", name="Alice",
                     current_embedding=distinct_embedding(11), duration=3.0)],
            mode="merge",
        )
        assert m.get_speaker("Alice").duration == pytest.approx(5.0)

    def test_skip_mode_keeps_existing(self):
        m = make_manager()
        m.initialize_known_speakers(
            [Speaker(id="X", name="First",
                     current_embedding=distinct_embedding(1), duration=1.0)]
        )
        m.initialize_known_speakers(
            [Speaker(id="X", name="Second",
                     current_embedding=distinct_embedding(2), duration=9.0)],
            mode="skip",
        )
        assert m.get_speaker("X").name == "First"

    def test_reset_mode_wipes_non_permanent(self):
        m = make_manager()
        m.assign_speaker(distinct_embedding(1), 2.0)
        m.initialize_known_speakers(
            [Speaker(id="5", name="Known",
                     current_embedding=distinct_embedding(3), duration=2.0)],
            mode="reset",
        )
        assert m.speaker_ids == ["5"]
        assert m.assign_speaker(distinct_embedding(4), 2.0).id == "6"

    def test_bad_embedding_size_skipped(self):
        m = make_manager()
        m.initialize_known_speakers(
            [Speaker(id="bad", name="bad",
                     current_embedding=np.ones(13, np.float32), duration=1.0)]
        )
        assert m.speaker_count == 0


class TestQueries:
    def test_find_speaker_and_matching_speakers(self):
        m = make_manager(speaker_threshold=0.5)
        base = distinct_embedding(1)
        spk = m.assign_speaker(base, 2.0)
        m.assign_speaker(distinct_embedding(2), 2.0)
        sid, dist = m.find_speaker(base)
        assert sid == spk.id and dist < 0.05
        matches = m.find_matching_speakers(base)
        assert matches and matches[0][0] == spk.id
        assert matches == sorted(matches, key=lambda t: t[1])
        # Far embedding: no match within threshold.
        sid_none, dist_none = m.find_speaker(distinct_embedding(77))
        assert sid_none is None and dist_none == float("inf")

    def test_find_speakers_where(self):
        m = make_manager()
        a = m.assign_speaker(distinct_embedding(1), 5.0)
        b = m.assign_speaker(distinct_embedding(2), 1.5)
        long_ids = m.find_speakers_where(lambda s: s.duration >= 3.0)
        assert long_ids == [a.id]
        assert set(m.find_speakers_where(lambda s: True)) == {a.id, b.id}

    def test_cosine_distance(self):
        v = distinct_embedding(1)
        assert cosine_distance(v, v) == pytest.approx(0.0, abs=1e-6)
        assert cosine_distance(v, -v) == pytest.approx(2.0, abs=1e-5)
        orth = np.zeros(DIM, np.float32)
        orth[0], orth[1] = 1.0, 0.0
        orth2 = np.zeros(DIM, np.float32)
        orth2[1] = 1.0
        assert cosine_distance(orth, orth2) == pytest.approx(1.0, abs=1e-6)
        # Zero vector ⇒ distance 1 (reference returns worst-case similarity 0).
        assert cosine_distance(np.zeros(DIM, np.float32), v) == 1.0


class TestPermanenceAndMerge:
    def test_make_and_revoke_permanent(self):
        m = make_manager()
        spk = m.assign_speaker(distinct_embedding(1), 2.5)
        m.make_speaker_permanent(spk.id)
        assert spk.id in m.permanent_speaker_ids
        m.remove_speaker(spk.id)
        assert m.has_speaker(spk.id)
        m.revoke_permanence(spk.id)
        m.remove_speaker(spk.id)
        assert not m.has_speaker(spk.id)

    def test_merge_respects_permanent_flag(self):
        m = make_manager()
        s1 = m.assign_speaker(distinct_embedding(1), 3.0)
        s2 = m.assign_speaker(distinct_embedding(2), 4.0)
        m.make_speaker_permanent(s1.id)
        assert not m.merge_speaker(s1.id, s2.id)
        assert m.has_speaker(s1.id) and m.has_speaker(s2.id)
        assert m.merge_speaker(
            s1.id, s2.id, merged_name="Merged Speaker", stop_if_permanent=False
        )
        assert not m.has_speaker(s1.id)
        merged = m.get_speaker(s2.id)
        assert merged.name == "Merged Speaker"
        assert m.speaker_count == 1
        assert merged.duration > 4.0

    def test_merge_into_self_is_noop(self):
        m = make_manager()
        spk = m.assign_speaker(distinct_embedding(1), 3.0)
        assert not m.merge_speaker(spk.id, spk.id)
        assert m.speaker_count == 1

    def test_find_mergeable_pairs_respects_permanent_exclusion(self):
        m = make_manager(speaker_threshold=0.3)
        base = distinct_embedding(1)
        close = base.copy()
        close[0] += 0.001
        s1 = m.assign_speaker(base, 2.0)
        # Force a second distinct DB entry despite similarity: upsert directly.
        m.upsert_speaker(id="close", current_embedding=close, duration=2.0)
        pairs = m.find_mergeable_pairs()
        assert pairs, "near-identical speakers must be mergeable"
        m.make_speaker_permanent(s1.id)
        m.make_speaker_permanent("close")
        assert m.find_mergeable_pairs(exclude_if_both_permanent=True) == []
        assert m.find_mergeable_pairs(exclude_if_both_permanent=False)

    def test_mergeable_pair_prefers_nonpermanent_source(self):
        m = make_manager(speaker_threshold=0.3)
        base = distinct_embedding(1)
        close = base.copy()
        close[0] += 0.001
        m.upsert_speaker(id="perm", current_embedding=base, duration=2.0,
                         is_permanent=True)
        m.upsert_speaker(id="temp", current_embedding=close, duration=2.0)
        ((src, dst),) = m.find_mergeable_pairs()
        assert src == "temp" and dst == "perm"


class TestRemovalAndReset:
    def test_remove_inactive_and_predicate_variants(self):
        import time as _t

        m = make_manager()
        now = _t.time()
        m.upsert_speaker(id="old", current_embedding=distinct_embedding(3),
                         duration=2.0, updated_at=now - 120)
        m.upsert_speaker(id="recent", current_embedding=distinct_embedding(4),
                         duration=2.0, updated_at=now)
        m.remove_speakers_inactive_since(now - 60)
        assert not m.has_speaker("old")
        assert m.has_speaker("recent")

        m.make_speaker_permanent("recent")
        m.remove_speakers_where(lambda s: s.duration <= 2.0)
        assert m.has_speaker("recent")  # permanent shielded by default
        m.remove_speakers_where(lambda s: s.duration <= 2.0, keep_if_permanent=False)
        assert not m.has_speaker("recent")

    def test_remove_inactive_for_duration(self):
        import time as _t

        m = make_manager()
        m.upsert_speaker(id="stale", current_embedding=distinct_embedding(5),
                         duration=1.0, updated_at=_t.time() - 3600)
        m.upsert_speaker(id="fresh", current_embedding=distinct_embedding(6),
                         duration=1.0)
        m.remove_speakers_inactive_for(60.0)
        assert m.speaker_ids == ["fresh"]

    def test_reset_keeps_permanent_speakers(self):
        m = make_manager()
        s1 = m.assign_speaker(distinct_embedding(1), 2.0)
        m.assign_speaker(distinct_embedding(2), 2.0)
        m.make_speaker_permanent(s1.id)
        m.reset(keep_if_permanent=True)
        assert m.speaker_ids == [s1.id]

    def test_full_reset_restarts_ids(self):
        m = make_manager()
        m.assign_speaker(distinct_embedding(1), 2.0)
        m.assign_speaker(distinct_embedding(2), 2.0)
        m.reset()
        assert m.speaker_count == 0
        assert m.assign_speaker(distinct_embedding(3), 2.0).id == "1"

    def test_reset_permanent_flags(self):
        m = make_manager()
        spk = m.assign_speaker(distinct_embedding(1), 2.0)
        m.make_speaker_permanent(spk.id)
        m.reset_permanent_flags()
        assert m.permanent_speaker_ids == []


class TestUpsert:
    def test_upsert_new_speaker(self):
        m = make_manager()
        e = distinct_embedding(1)
        m.upsert_speaker(id="TestSpeaker1", current_embedding=e, duration=5.0)
        assert m.speaker_count == 1
        info = m.get_speaker("TestSpeaker1")
        assert info.id == "TestSpeaker1"
        assert info.duration == 5.0
        assert info.update_count == 1

    def test_upsert_existing_speaker(self):
        m = make_manager()
        e1, e2 = distinct_embedding(1), distinct_embedding(2)
        m.upsert_speaker(id="TestSpeaker1", current_embedding=e1, duration=5.0)
        created_at = m.get_speaker("TestSpeaker1").created_at
        m.upsert_speaker(id="TestSpeaker1", current_embedding=e2, duration=10.0,
                         update_count=5)
        assert m.speaker_count == 1
        info = m.get_speaker("TestSpeaker1")
        np.testing.assert_allclose(info.current_embedding, e2)
        assert info.duration == 10.0
        assert info.update_count == 5
        assert info.created_at == created_at
        assert info.updated_at >= created_at

    def test_upsert_with_speaker_object(self):
        m = make_manager()
        e = distinct_embedding(1)
        spk = Speaker(id="Alice", name="Alice", current_embedding=e, duration=7.5)
        spk.add_raw_embedding(RawEmbedding(e))
        m.upsert_speaker(spk)
        info = m.get_speaker("Alice")
        assert info.duration == 7.5
        assert len(info.raw_embeddings) == 1
        np.testing.assert_allclose(info.current_embedding, l2_normalize(e),
                                   atol=1e-6)

    def test_upsert_numeric_id_advances_counter(self):
        m = make_manager()
        m.upsert_speaker(id="17", current_embedding=distinct_embedding(1),
                         duration=1.0)
        assert m.assign_speaker(distinct_embedding(2), 2.0).id == "18"

    def test_upsert_cannot_revoke_permanence(self):
        m = make_manager()
        m.upsert_speaker(id="p", current_embedding=distinct_embedding(1),
                         duration=1.0, is_permanent=True)
        m.upsert_speaker(id="p", current_embedding=distinct_embedding(2),
                         duration=2.0, is_permanent=False)
        assert m.get_speaker("p").is_permanent


class TestSpeakerType:
    def test_init_normalizes_embedding(self):
        raw = np.full(DIM, 3.0, np.float32)
        spk = Speaker(id="a", name="a", current_embedding=raw)
        assert np.linalg.norm(spk.current_embedding) == pytest.approx(1.0, abs=1e-5)
        assert spk.update_count == 1

    def test_add_raw_recalculates_main(self):
        e1, e2 = distinct_embedding(1), distinct_embedding(2)
        spk = Speaker(id="a", name="a", current_embedding=e1)
        spk.add_raw_embedding(RawEmbedding(e1))
        spk.add_raw_embedding(RawEmbedding(e2))
        expected = l2_normalize((l2_normalize(e1) + l2_normalize(e2)) / 2)
        np.testing.assert_allclose(spk.current_embedding, expected, atol=1e-5)

    def test_add_raw_rejects_near_zero(self):
        spk = Speaker(id="a", name="a", current_embedding=distinct_embedding(1))
        spk.add_raw_embedding(RawEmbedding(np.zeros(DIM, np.float32)))
        assert spk.raw_embeddings == []

    def test_raw_fifo_cap(self):
        spk = Speaker(id="a", name="a", current_embedding=distinct_embedding(1))
        for p in range(MAX_RAW_EMBEDDINGS + 10):
            spk.add_raw_embedding(RawEmbedding(distinct_embedding(p)))
        assert len(spk.raw_embeddings) == MAX_RAW_EMBEDDINGS
        # Oldest dropped: first surviving raw is pattern 10.
        np.testing.assert_allclose(
            spk.raw_embeddings[0].embedding, distinct_embedding(10), atol=1e-6
        )

    def test_remove_raw_embedding_by_segment_id(self):
        e1, e2 = distinct_embedding(1), distinct_embedding(2)
        spk = Speaker(id="a", name="a", current_embedding=e1)
        r1, r2 = RawEmbedding(e1), RawEmbedding(e2)
        spk.add_raw_embedding(r1)
        spk.add_raw_embedding(r2)
        removed = spk.remove_raw_embedding(r1.segment_id)
        assert removed is r1
        assert len(spk.raw_embeddings) == 1
        np.testing.assert_allclose(spk.current_embedding, l2_normalize(e2),
                                   atol=1e-5)
        assert spk.remove_raw_embedding(999999) is None

    def test_merge_with_keeps_most_recent_raws(self):
        a = Speaker(id="a", name="a", current_embedding=distinct_embedding(1))
        b = Speaker(id="b", name="b", current_embedding=distinct_embedding(2))
        for p in range(30):
            a.add_raw_embedding(RawEmbedding(distinct_embedding(p), timestamp=float(p)))
        for p in range(40):
            b.add_raw_embedding(
                RawEmbedding(distinct_embedding(100 + p), timestamp=float(100 + p))
            )
        a.merge_with(b)
        assert len(a.raw_embeddings) == MAX_RAW_EMBEDDINGS
        # b's raws are all newer; the 10 most-recent of a's survive.
        timestamps = sorted(r.timestamp for r in a.raw_embeddings)
        assert timestamps[0] == 20.0

    def test_merge_with_sums_update_counts_and_duration(self):
        a = Speaker(id="a", name="a", current_embedding=distinct_embedding(1),
                    duration=2.0)
        b = Speaker(id="b", name="b", current_embedding=distinct_embedding(2),
                    duration=3.0)
        a.merge_with(b, keep_name="AB")
        assert a.duration == pytest.approx(5.0)
        assert a.update_count == 2
        assert a.name == "AB"

    def test_identity_equality(self):
        a1 = Speaker(id="a", name="x", current_embedding=distinct_embedding(1))
        a2 = Speaker(id="a", name="y", current_embedding=distinct_embedding(2))
        b = Speaker(id="b", name="x", current_embedding=distinct_embedding(1))
        assert a1 == a2
        assert a1 != b
        assert len({a1, a2, b}) == 2
