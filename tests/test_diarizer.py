"""Diarizer: speaker manager clustering logic, DER metric, online pipeline smoke.

Mirrors reference DiarizationTestFixtures-style synthetic-embedding tests.
"""

import numpy as np
import pytest

from fluidaudio_tpu.diarizer.metrics import compute_der
from fluidaudio_tpu.diarizer.speaker_manager import SpeakerManager
from fluidaudio_tpu.diarizer.types import Speaker, TimedSpeakerSegment, cosine_distance


def unit_vec(seed, dim=256):
    rng = np.random.RandomState(seed)
    v = rng.randn(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def jitter(v, eps, seed=0):
    rng = np.random.RandomState(seed)
    out = v + eps * rng.randn(*v.shape).astype(np.float32)
    return out / np.linalg.norm(out)


class TestSpeakerManager:
    def test_assign_creates_and_matches(self):
        sm = SpeakerManager()
        a = unit_vec(1)
        spk1 = sm.assign_speaker(a, speech_duration=2.0)
        assert spk1 is not None and sm.speaker_count == 1
        # close embedding matches same speaker
        spk2 = sm.assign_speaker(jitter(a, 0.05, 7), speech_duration=2.0)
        assert spk2.id == spk1.id
        # distant embedding creates a new speaker
        spk3 = sm.assign_speaker(unit_vec(99), speech_duration=2.0)
        assert spk3.id != spk1.id and sm.speaker_count == 2

    def test_short_segment_does_not_create(self):
        sm = SpeakerManager(min_speech_duration=1.0)
        assert sm.assign_speaker(unit_vec(1), speech_duration=0.5) is None
        assert sm.speaker_count == 0

    def test_embedding_update_threshold(self):
        sm = SpeakerManager(speaker_threshold=0.65, embedding_threshold=0.45)
        a = unit_vec(1)
        spk = sm.assign_speaker(a, 2.0)
        before = spk.current_embedding.copy()
        # within assign threshold but outside update threshold: duration only
        far = jitter(a, 0.8, 3)
        if cosine_distance(far, a) < 0.65:
            spk2 = sm.assign_speaker(far, 2.0)
            if cosine_distance(far, before) >= 0.45:
                np.testing.assert_array_equal(spk2.current_embedding, before)

    def test_ema_update_moves_centroid(self):
        sm = SpeakerManager()
        a = unit_vec(1)
        spk = sm.assign_speaker(a, 2.0)
        b = jitter(a, 0.2, 5)
        sm.assign_speaker(b, 2.0)
        after = sm.get_speaker(spk.id).current_embedding
        assert cosine_distance(after, b) < cosine_distance(a, b)

    def test_known_speaker_enrollment_and_merge(self):
        sm = SpeakerManager()
        known = Speaker(id="42", name="Alice", current_embedding=unit_vec(5), duration=10.0)
        sm.initialize_known_speakers([known])
        assert sm.get_speaker("42").name == "Alice"
        # next auto id continues after numeric enrolled ids
        spk = sm.assign_speaker(unit_vec(50), 2.0)
        assert int(spk.id) == 43
        assert sm.merge_speaker(spk.id, "42")
        assert sm.speaker_count == 1

    def test_permanent_protection(self):
        sm = SpeakerManager()
        spk = sm.assign_speaker(unit_vec(1), 2.0)
        sm.make_speaker_permanent(spk.id)
        sm.remove_speaker(spk.id)
        assert sm.get_speaker(spk.id) is not None
        sm.reset(keep_if_permanent=True)
        assert sm.speaker_count == 1


class TestDer:
    def seg(self, spk, a, b):
        return TimedSpeakerSegment(speaker_id=spk, start_time=a, end_time=b)

    def test_perfect_hypothesis(self):
        ref = [self.seg("A", 0, 5), self.seg("B", 5, 10)]
        hyp = [self.seg("x", 0, 5), self.seg("y", 5, 10)]
        r = compute_der(ref, hyp, collar=0.0)
        assert r.der == pytest.approx(0.0)
        assert r.speaker_mapping == {"x": "A", "y": "B"}

    def test_miss_and_false_alarm(self):
        ref = [self.seg("A", 0, 10)]
        hyp = [self.seg("x", 0, 5)]
        r = compute_der(ref, hyp, collar=0.0, duration=10.0)
        assert r.miss == pytest.approx(0.5, abs=0.01)
        hyp2 = [self.seg("x", 0, 10), self.seg("y", 0, 5)]
        r2 = compute_der(ref, hyp2, collar=0.0, duration=10.0)
        assert r2.false_alarm == pytest.approx(0.5, abs=0.01)

    def test_confusion_with_label_swap(self):
        # hypothesis swaps speakers for 2 s in the middle
        ref = [self.seg("A", 0, 5), self.seg("B", 5, 10)]
        hyp = [self.seg("x", 0, 3), self.seg("y", 3, 5), self.seg("y", 5, 10)]
        r = compute_der(ref, hyp, collar=0.0, duration=10.0)
        assert r.confusion == pytest.approx(0.2, abs=0.01)
        assert r.der == pytest.approx(0.2, abs=0.01)

    def test_collar_forgives_boundary_jitter(self):
        ref = [self.seg("A", 0, 5.0)]
        hyp = [self.seg("x", 0, 5.1)]  # 100 ms late cut
        strict = compute_der(ref, hyp, collar=0.0, duration=6.0)
        lenient = compute_der(ref, hyp, collar=0.25, duration=6.0)
        assert strict.der > 0
        assert lenient.der == pytest.approx(0.0)


def test_online_pipeline_smoke():
    """Random-weight end-to-end: shapes, determinism, timings."""
    from fluidaudio_tpu.diarizer.manager import DiarizerManager
    from fluidaudio_tpu.diarizer.types import DiarizerConfig

    mgr = DiarizerManager(DiarizerConfig(min_active_frames_count=0.0, min_speech_duration=0.1))
    rng = np.random.RandomState(0)
    audio = (rng.randn(160_000) * 0.1).astype(np.float32)  # one 10 s chunk
    result = mgr.process(audio)
    assert result.timings.segmentation_seconds > 0
    assert result.speaker_count >= 0
    for seg in result.segments:
        assert 0 <= seg.start_time < seg.end_time <= 10.5
    # embedding extraction for enrollment works and is unit-norm
    emb = mgr.extract_speaker_embedding(audio[:32000])
    assert emb.shape == (256,)
    assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-3)
