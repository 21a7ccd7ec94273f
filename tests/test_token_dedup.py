"""Sequential-chunk boundary token dedup regression tests.

Mirrors reference `Tests/.../ASR/TokenDeduplicationRegressionTests.swift`:
the 3-stage `removeDuplicateTokenSequence` (punctuation, suffix-prefix,
bounded substring) extracted over `SequenceMatcher`.
"""

import numpy as np
import pytest

from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.asr.sequence_matcher import remove_duplicate_token_sequence

PUNCT = ASRConstants.PUNCTUATION_TOKENS


def dedup(prev, cur, **kw):
    kw.setdefault("punctuation_tokens", PUNCT)
    return remove_duplicate_token_sequence(prev, cur, **kw)


@pytest.mark.parametrize("p", sorted(PUNCT))
def test_punctuation_dedup_stage1(p):
    deduped, removed = dedup([100, 101, p], [p, 102, 103])
    assert deduped == [102, 103] and removed == 1


@pytest.mark.parametrize(
    "previous,current,want,want_removed",
    [
        ([100, 101, 102], [101, 102, 103, 104], [103, 104], 2),
        ([100, 101, 102, 103], [101, 102, 103, 104, 105], [104, 105], 3),
        # maxOverlap default 12: 15-token previous, 12-token overlap
        (list(range(100, 115)), list(range(103, 120)), list(range(115, 120)), 12),
    ],
)
def test_suffix_prefix_overlap_stage2(previous, current, want, want_removed):
    deduped, removed = dedup(previous, current)
    assert deduped == want and removed == want_removed


def test_bounded_substring_stage3_offset_overlap():
    # duplicate run starts at offset 1 into current: drop offset + run
    deduped, removed = dedup([100, 101, 102, 103, 104], [999, 102, 103, 104, 105])
    assert deduped == [105] and removed == 4


def test_edge_cases():
    assert dedup([100, 101, 102], [200, 201, 202]) == ([200, 201, 202], 0)
    assert dedup([100, 101, 102], []) == ([], 0)
    assert dedup([], [100, 101, 102]) == ([100, 101, 102], 0)
    # single non-punctuation overlap: minimum match length is 2
    assert dedup([100, 101], [101, 102]) == ([101, 102], 0)


def test_combined_punctuation_then_no_overlap():
    # stage 1 removes the period; stage 2 finds nothing (previous tail
    # doesn't continue into the remaining current)
    deduped, removed = dedup([100, 101, 7883], [7883, 101, 102, 103])
    assert deduped == [101, 102, 103] and removed == 1


def test_manager_transcribe_previous_tokens_drops_boundary_dup():
    from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load("test-tiny", allow_random_init=True)
    manager = AsrManager(models, ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)))
    for seed in range(11, 31):
        rng = np.random.RandomState(seed)
        audio = (rng.randn(32000) * 0.1).astype(np.float32)
        base = manager.transcribe(audio)
        ids = [t.token_id for t in base.token_timings]
        if len(ids) >= 3:
            break
    else:
        pytest.skip("random decode emitted too few tokens for an overlap")
    # pretend the previous chunk already emitted this chunk's first 2 tokens
    again = manager.transcribe(audio, previous_tokens=[7_000, *ids[:2]])
    again_ids = [t.token_id for t in again.token_timings]
    assert len(again_ids) < len(ids)
    # timings stay aligned with the surviving tokens
    assert [t.token_id for t in again.token_timings] == again_ids
    assert again.token_timings[0].start_time >= base.token_timings[0].start_time
