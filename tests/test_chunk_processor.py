"""ChunkProcessor: layout, starts, merge, seam collapse (host logic, no models).

Mirrors reference `ChunkProcessorTests`/`ChunkMergeTests` coverage (SURVEY §4).
"""

import numpy as np

from fluidaudio_tpu.asr.chunk import (
    ChunkProcessor,
    TokenWindow,
    case_variant_canonical_ids,
    is_splice_safe_piece,
    splice_safe_token_ids,
)
from fluidaudio_tpu.utils.audio_source import ArrayAudioSource


def make_cp(n_samples=1_000_000, audio=None):
    if audio is None:
        audio = np.zeros(n_samples, dtype=np.float32)
    return ChunkProcessor(ArrayAudioSource(audio))


def test_chunk_layout_reference_numbers():
    cp = make_cp()
    layout = cp.chunk_layout(mel_chunk_context=True)
    assert layout.chunk_samples == 238_080  # Documentation/Architecture.md:160-186
    assert layout.stride_samples == 238_080 - 32_000
    assert layout.mel_context_samples == 1280
    # no-context layout fills the encoder window
    layout2 = cp.chunk_layout(mel_chunk_context=False)
    assert layout2.chunk_samples == 239_360  # (240000-160) frame-aligned
    assert layout2.mel_context_samples == 0


def test_regular_chunk_starts_cover_everything():
    cp = make_cp(500_000)
    layout = cp.chunk_layout()
    starts = cp.regular_chunk_starts(layout.stride_samples)
    assert starts[0].start == 0
    assert all(
        b.start - a.start == layout.stride_samples for a, b in zip(starts, starts[1:])
    )
    assert starts[-1].start < 500_000
    assert starts[-1].start + layout.chunk_samples >= 500_000


def test_silence_aligned_starts_snap_to_gap():
    """A loud tone with a silent gap: the second chunk start lands in the gap."""
    sr = 16000
    n = 300_000
    audio = (0.5 * np.sin(2 * np.pi * 300 * np.arange(n) / sr)).astype(np.float32)
    gap_center = 210_000
    audio[gap_center - 8000 : gap_center + 8000] = 0.0
    cp = make_cp(audio=audio)
    layout = cp.chunk_layout()
    starts = cp.silence_aligned_chunk_starts(
        layout.chunk_samples, layout.stride_samples, can_use_warmup_prefix=False
    )
    assert len(starts) >= 2
    second = starts[1].start
    assert abs(second - gap_center) <= 8000 + 1280, f"start {second} not near gap"
    assert second % 1280 == 0  # frame aligned


def test_plan_windows_frame_offsets():
    cp = make_cp(600_000)
    layout, windows = cp.plan_windows()
    assert layout.window_samples == 238_080 + 1280
    assert windows[0].read_start == 0 and windows[0].frame_offset == 0
    for w in windows[1:]:
        # context prepend is exactly 1 encoder frame (80 ms), frame aligned
        assert w.read_start % 1280 == 0
        assert w.frame_offset == w.read_start // 1280
        assert w.read_count <= layout.window_samples
    assert windows[-1].is_last
    assert windows[-1].read_start + windows[-1].read_count == 600_000


VOCAB = {
    0: "▁the",
    1: "▁meeting",
    2: "▁Meeting",
    3: "ing",
    4: "▁was",
    5: ".",
    6: "▁have",
    7: "▁Have",
    8: "▁a",
    9: "s",
    10: "▁don",
    11: "'t",
}


def test_splice_safe_ids():
    ids = splice_safe_token_ids(VOCAB)
    assert 0 in ids and 5 in ids  # word-initial and punctuation
    assert 3 not in ids and 9 not in ids  # continuations are unsafe
    assert splice_safe_token_ids({}) is None
    assert is_splice_safe_piece("...") and not is_splice_safe_piece("abc")


def test_case_variant_canonical_ids():
    canon = case_variant_canonical_ids(VOCAB)
    assert canon[1] == canon[2] == 1  # lowercase wins
    assert canon[6] == canon[7] == 6
    assert 0 not in canon  # no twin
    assert case_variant_canonical_ids({}) is None


def test_merge_no_overlap_concatenates():
    cp = make_cp()
    left = [TokenWindow(0, 10), TokenWindow(4, 20)]
    right = [TokenWindow(1, 100), TokenWindow(5, 110)]
    assert cp.merge_chunks(left, right) == left + right


def test_merge_exact_overlap_dedupes():
    cp = make_cp()
    # left window frames 0..200; right starts at frame 175 (overlap 25 frames = 2s)
    shared = [TokenWindow(0, 180), TokenWindow(1, 185), TokenWindow(4, 190)]
    left = [TokenWindow(6, 100), TokenWindow(8, 150)] + shared
    right = shared + [TokenWindow(5, 195), TokenWindow(10, 210)]
    merged = cp.merge_chunks(left, right)
    tokens = [t.token for t in merged]
    assert tokens == [6, 8, 0, 1, 4, 5, 10]


def test_merge_case_variant_anchor():
    cp = make_cp()
    canon = case_variant_canonical_ids(VOCAB)
    left = [TokenWindow(10, 170), TokenWindow(11, 172), TokenWindow(6, 180), TokenWindow(8, 184)]
    # right heard "Have a" capitalized at the seam (timestamps within tolerance)
    right = [TokenWindow(7, 181), TokenWindow(8, 185), TokenWindow(4, 200)]
    merged = cp.merge_chunks(left, right, splice_safe_token_ids(VOCAB), canon)
    tokens = [t.token for t in merged]
    # the seam word anchors: left's lowercase copy kept once, right tail appended
    assert tokens.count(6) + tokens.count(7) == 1
    assert tokens[-1] == 4


def test_collapse_seam_word_duplicates():
    cp = make_cp()
    # "... don 't have Have a" -> collapse to lowercase "have"
    tokens = [
        TokenWindow(10, 100),
        TokenWindow(11, 101),
        TokenWindow(6, 105),
        TokenWindow(7, 110),
        TokenWindow(8, 112),
    ]
    out = cp.collapse_seam_word_duplicates(tokens, VOCAB)
    ids = [t.token for t in out]
    assert ids == [10, 11, 6, 8]


def test_collapse_keeps_sentence_boundary():
    cp = make_cp()
    vocab = {0: "▁you", 1: "▁You", 2: ".", 3: "▁thank"}
    # "thank you. You said" -> legitimate, no collapse
    tokens = [
        TokenWindow(3, 90),
        TokenWindow(0, 95),
        TokenWindow(2, 96),
        TokenWindow(1, 100),
    ]
    out = cp.collapse_seam_word_duplicates(tokens, vocab)
    assert [t.token for t in out] == [3, 0, 2, 1]


def test_collapse_keeps_genuine_repeat():
    cp = make_cp()
    vocab = {0: "▁that"}
    tokens = [TokenWindow(0, 100), TokenWindow(0, 104)]
    out = cp.collapse_seam_word_duplicates(tokens, vocab)
    assert len(out) == 2  # same case => not a seam duplicate


def test_merge_midpoint_respects_word_boundaries():
    cp = make_cp()
    safe = splice_safe_token_ids(VOCAB)
    # no anchor matches -> midpoint fallback; cutoff splits "meeting|s" in left
    # and orphans right's leading continuation "ing"
    left = [TokenWindow(1, 80), TokenWindow(9, 84)]
    right = [TokenWindow(3, 83), TokenWindow(4, 110)]
    merged = cp.merge_chunks(left, right, safe)
    tokens = [t.token for t in merged]
    assert tokens == [1, 9, 4]  # left word completed; orphaned "ing" dropped


# --- merge-strategy selection + gap resolution (reference
# ChunkProcessorEdgeCaseTests documents these semantics in comments but ships
# placeholder asserts; these are real differential pins of each branch) -----


def test_merge_contiguous_priority_drops_left_stragglers():
    """A contiguous matched run >= minimumPairs is used directly; tokens after
    the last match come from the RIGHT window (fresher acoustic context), so
    left stragglers in the overlap are dropped."""
    cp = make_cp()
    left = [TokenWindow(6, 100), TokenWindow(1, 180), TokenWindow(2, 182),
            TokenWindow(3, 184), TokenWindow(9, 190)]
    right = [TokenWindow(1, 181), TokenWindow(2, 183), TokenWindow(3, 185),
             TokenWindow(5, 200)]
    merged = cp.merge_chunks(left, right)
    assert [t.token for t in merged] == [6, 1, 2, 3, 5]
    ts = [t.timestamp for t in merged]
    assert ts == sorted(ts)


def test_merge_lcs_fallback_gap_prefers_longer_side():
    """When the longest contiguous run < minimumPairs (= max(len(overlap)//2,
    1)), LCS anchors are used; between two anchors the side with MORE tokens
    wins the gap."""
    cp = make_cp()
    left = [TokenWindow(6, 100), TokenWindow(1, 180), TokenWindow(30, 183),
            TokenWindow(2, 188), TokenWindow(32, 193)]
    right = [TokenWindow(1, 181), TokenWindow(41, 182), TokenWindow(42, 184),
             TokenWindow(43, 186), TokenWindow(2, 189), TokenWindow(5, 200)]
    merged = cp.merge_chunks(left, right)
    assert [t.token for t in merged] == [6, 1, 41, 42, 43, 2, 5]


def test_merge_gap_equal_length_prefers_left():
    """gapLeft.count == gapRight.count -> keep the LEFT gap (older decode wins
    ties, reference gap-resolution rule)."""
    cp = make_cp()
    left = [TokenWindow(6, 100), TokenWindow(1, 180), TokenWindow(30, 183),
            TokenWindow(2, 188), TokenWindow(32, 193)]
    right = [TokenWindow(1, 181), TokenWindow(41, 184), TokenWindow(2, 189),
             TokenWindow(5, 200)]
    merged = cp.merge_chunks(left, right)
    assert [t.token for t in merged] == [6, 1, 30, 2, 5]


def test_merge_midpoint_fallback_when_no_matches():
    """Overlap regions populated but zero id matches -> LCS empty -> midpoint
    split: left keeps tokens before the temporal midpoint, right supplies the
    rest."""
    cp = make_cp()
    left = [TokenWindow(6, 100), TokenWindow(30, 180), TokenWindow(31, 185)]
    right = [TokenWindow(40, 182), TokenWindow(41, 190), TokenWindow(5, 200)]
    merged = cp.merge_chunks(left, right)
    assert [t.token for t in merged] == [6, 30, 41, 5]
    ts = [t.timestamp for t in merged]
    assert ts == sorted(ts)


def test_merge_insufficient_overlap_uses_midpoint():
    """< 2 tokens on either overlap side skips matching entirely (midpoint)."""
    cp = make_cp()
    left = [TokenWindow(6, 100), TokenWindow(1, 186)]
    right = [TokenWindow(1, 185), TokenWindow(41, 190), TokenWindow(5, 200)]
    merged = cp.merge_chunks(left, right)
    # midpoint of (14.96, 14.8) = 14.88 -> frame 186: left keeps strictly
    # before the cutoff (1@186 sits ON it and is cut), right resumes >= it
    assert [t.token for t in merged] == [6, 41, 5]


def test_merge_prefix_before_first_match_kept():
    """Left tokens before the first matched anchor always survive."""
    cp = make_cp()
    left = [TokenWindow(60, 10), TokenWindow(61, 50), TokenWindow(1, 180),
            TokenWindow(2, 182), TokenWindow(3, 184)]
    right = [TokenWindow(1, 181), TokenWindow(2, 183), TokenWindow(3, 185)]
    merged = cp.merge_chunks(left, right)
    assert [t.token for t in merged][:2] == [60, 61]


class TestLayoutEdgeCases:
    """Ported from `ChunkProcessorEdgeCaseTests.swift`: boundary/size
    arithmetic for the 15 s window + 2 s overlap contract."""

    def test_overlap_is_two_seconds_frame_aligned(self):
        cp = make_cp()
        layout = cp.chunk_layout()
        overlap = layout.chunk_samples - layout.stride_samples
        # 2.0 s = 32,000 samples; frame-aligned to 1280.
        assert overlap == 32_000
        assert overlap % 1280 == 0

    def test_overlap_clamped_to_half_chunk(self):
        cp = make_cp()
        layout = cp.chunk_layout()
        assert layout.chunk_samples // 2 > 100_000
        assert layout.chunk_samples - layout.stride_samples <= layout.chunk_samples // 2

    def test_window_fits_model_input(self):
        cp = make_cp()
        layout = cp.chunk_layout(mel_chunk_context=True)
        assert layout.window_samples <= 240_000
        assert layout.chunk_samples % 1280 == 0

    def test_first_chunk_starts_at_zero(self):
        cp = make_cp(n_samples=288_000)  # 18 s
        layout = cp.chunk_layout()
        starts = cp.chunk_starts(layout)
        assert starts[0].start == 0

    def test_single_chunk_for_short_audio(self):
        cp = make_cp(n_samples=192_000)  # 12 s < chunk
        layout = cp.chunk_layout()
        starts = cp.chunk_starts(layout)
        assert len(starts) == 1

    def test_chunk_count_two_chunks(self):
        cp = make_cp(n_samples=320_000)  # 20 s
        layout = cp.chunk_layout()
        starts = cp.chunk_starts(layout)
        assert len(starts) == 2
        assert starts[1].start == layout.stride_samples

    def test_chunk_count_many_chunks(self):
        total = 16_000 * 60  # 60 s
        cp = make_cp(n_samples=total)
        layout = cp.chunk_layout()
        starts = cp.chunk_starts(layout)
        # ceil((total - chunk) / stride) + 1 windows cover everything
        import math

        expected = 1 + max(0, math.ceil((total - layout.stride_samples)
                                        / layout.stride_samples))
        assert len(starts) == expected
        last = starts[-1].start
        assert last + layout.chunk_samples >= total

    def test_global_frame_offset_calculation(self):
        # frame_offset = read_start / samplesPerEncoderFrame, exactly
        # divisible by design (starts and context are frame-aligned).
        assert 0 // 1280 == 0
        assert 207_360 // 1280 == 162
        cp = make_cp(n_samples=1_000_000)
        _, windows = cp.plan_windows()
        for spec in windows:
            assert spec.read_start % 1280 == 0
            assert spec.frame_offset == spec.read_start // 1280

    def test_exactly_chunk_boundary(self):
        cp = make_cp(n_samples=0)
        layout = cp.chunk_layout()
        starts = cp.chunk_starts(layout)
        assert [s.start for s in starts] == [0]

    def test_stride_positive_and_frame_aligned(self):
        cp = make_cp()
        layout = cp.chunk_layout(mel_chunk_context=False, model_version="v3")
        assert layout.stride_samples > 0
        assert layout.stride_samples % 1280 == 0


class TestMergeStructural:
    """Structural merge edge cases from `ChunkProcessorEdgeCaseTests`."""

    @staticmethod
    def _fold(cp, chunks):
        merged = []
        for chunk in chunks:
            merged = cp.merge_chunks(merged, chunk)
        return merged

    def test_merge_with_empty_sides(self):
        cp = make_cp()
        assert cp.merge_chunks([], []) == []
        one = [TokenWindow(1, 0, 1.0), TokenWindow(2, 5, 1.0)]
        assert [t.token for t in cp.merge_chunks(one, [])] == [1, 2]
        assert [t.token for t in cp.merge_chunks([], one)] == [1, 2]

    def test_empty_chunk_output_in_middle(self):
        cp = make_cp()
        merged = self._fold(cp, [
            [TokenWindow(1, 0, 1.0), TokenWindow(2, 10, 1.0)],
            [],
            [TokenWindow(3, 400, 1.0)],
        ])
        assert [t.token for t in merged] == [1, 2, 3]

    def test_token_sorting_after_merge(self):
        cp = make_cp()
        merged = self._fold(cp, [
            [TokenWindow(1, 0, 1.0), TokenWindow(2, 50, 1.0)],
            [TokenWindow(3, 300, 1.0), TokenWindow(4, 350, 1.0)],
        ])
        frames = [t.timestamp for t in merged]
        assert frames == sorted(frames)

    def test_merge_preserves_order_within_chunk(self):
        cp = make_cp()
        chunk = [TokenWindow(i, i * 3, 1.0) for i in range(10)]
        merged = self._fold(cp, [chunk])
        assert [t.token for t in merged] == list(range(10))


class TestGapResolutionScenarios:
    """Exact numeric fixtures from ChunkProcessorTests.swift:502-615: when a
    gap between (or before) matched anchors has equal-length candidates on
    both sides, the merge keeps the OLDER (left) chunk's tokens."""

    def _merge(self, left, right, safe_ids=None):
        cp = make_cp()
        return [t.token for t in cp.merge_chunks(left, right, splice_safe_ids=safe_ids)]

    def test_gap_between_matches_keeps_older_when_same_length(self):
        # ChunkProcessorTests.swift:502-521
        left = [
            TokenWindow(100, 120, 0.98), TokenWindow(200, 130, 0.97),
            TokenWindow(901, 131, 0.30), TokenWindow(300, 132, 0.97),
        ]
        right = [
            TokenWindow(200, 130, 0.97), TokenWindow(902, 131, 0.95),
            TokenWindow(300, 132, 0.97), TokenWindow(400, 133, 0.98),
        ]
        assert self._merge(left, right) == [100, 200, 901, 300, 400]

    def test_leading_overlap_gap_keeps_older_when_same_length(self):
        # ChunkProcessorTests.swift:523-541
        left = [
            TokenWindow(100, 120, 0.98), TokenWindow(110, 130, 0.98),
            TokenWindow(901, 131, 0.30), TokenWindow(300, 132, 0.97),
        ]
        right = [
            TokenWindow(902, 131, 0.95), TokenWindow(300, 132, 0.97),
            TokenWindow(400, 133, 0.98),
        ]
        assert self._merge(left, right) == [100, 110, 901, 300, 400]

    def test_leading_overlap_keeps_older_when_newer_confidence_much_lower(self):
        # ChunkProcessorTests.swift:543-564
        left = [
            TokenWindow(100, 120, 0.98), TokenWindow(901, 131, 0.94),
            TokenWindow(902, 132, 0.91), TokenWindow(903, 133, 0.92),
            TokenWindow(300, 134, 0.97),
        ]
        right = [
            TokenWindow(801, 131, 0.49), TokenWindow(802, 132, 0.65),
            TokenWindow(803, 133, 0.94), TokenWindow(300, 134, 0.97),
            TokenWindow(400, 135, 0.98),
        ]
        assert self._merge(left, right) == [100, 901, 902, 903, 300, 400]

    def test_leading_overlap_keeps_older_for_contested_prefix(self):
        # ChunkProcessorTests.swift:566-583
        left = [
            TokenWindow(100, 120, 0.98), TokenWindow(901, 130, 0.84, 3),
            TokenWindow(300, 133, 0.97),
        ]
        right = [
            TokenWindow(902, 131, 0.75), TokenWindow(300, 133, 0.97),
            TokenWindow(400, 134, 0.98),
        ]
        assert self._merge(left, right) == [100, 901, 300, 400]


class TestWordBoundarySpliceScenarios:
    """Issue #683 splice fixtures, ChunkProcessorTests.swift:587-770: the
    post-match tail and midpoint cutoff must never glue a left word prefix
    onto a right word suffix (or vice versa)."""

    VOCAB = {
        10: "▁hello", 20: "▁wor", 21: "ld", 22: "ldo",
        24: "▁Gre", 25: "nl", 26: "and", 27: "▁Green",
        28: "andia", 30: "▁there", 40: "▁friend",
        50: "ne", 60: "▁o",
    }

    @property
    def safe_ids(self):
        ids = splice_safe_token_ids(self.VOCAB)
        assert ids is not None
        return ids

    def _merge(self, left, right, with_vocab=True):
        cp = make_cp()
        safe = self.safe_ids if with_vocab else None
        return [t.token for t in cp.merge_chunks(left, right, splice_safe_ids=safe)]

    def test_post_match_tail_adopts_right_segmentation_of_seam_word(self):
        # ChunkProcessorTests.swift:618-646 — right heard the word from its
        # start, so right's segmentation of the whole seam word wins.
        left = [
            TokenWindow(10, 120, 0.98), TokenWindow(24, 130, 0.97),
            TokenWindow(25, 131, 0.96), TokenWindow(26, 132, 0.95),
        ]
        right = [
            TokenWindow(27, 130, 0.97), TokenWindow(25, 131, 0.96),
            TokenWindow(28, 132, 0.95), TokenWindow(30, 134, 0.97),
        ]
        assert self._merge(left, right) == [10, 27, 25, 28, 30]

    def test_post_match_tail_keeps_left_word_when_right_cut_mid_word(self):
        # ChunkProcessorTests.swift:648-676 — right's stream starts mid-word:
        # left owns the seam word; right resumes at its next word start.
        left = [
            TokenWindow(10, 120, 0.98), TokenWindow(24, 130, 0.97),
            TokenWindow(25, 131, 0.96), TokenWindow(26, 132, 0.95),
        ]
        right = [
            TokenWindow(25, 131, 0.96), TokenWindow(28, 132, 0.95),
            TokenWindow(30, 134, 0.97),
        ]
        assert self._merge(left, right) == [10, 24, 25, 26, 30]

    def test_post_match_tail_legacy_behavior_without_vocabulary(self):
        # ChunkProcessorTests.swift:678-698
        left = [
            TokenWindow(10, 120, 0.98), TokenWindow(20, 130, 0.97),
            TokenWindow(21, 131, 0.96),
        ]
        right = [
            TokenWindow(20, 130, 0.97), TokenWindow(22, 131, 0.95),
            TokenWindow(30, 133, 0.97), TokenWindow(40, 134, 0.98),
        ]
        assert self._merge(left, right, with_vocab=False) == [10, 20, 22, 30, 40]

    def test_post_match_tail_keeps_word_initial_tail_verbatim(self):
        # ChunkProcessorTests.swift:700-721
        left = [
            TokenWindow(10, 120, 0.98), TokenWindow(20, 130, 0.97),
            TokenWindow(21, 131, 0.96),
        ]
        right = [
            TokenWindow(21, 131, 0.97), TokenWindow(30, 133, 0.97),
            TokenWindow(40, 134, 0.98),
        ]
        assert self._merge(left, right) == [10, 20, 21, 30, 40]

    def test_midpoint_merge_does_not_cut_words(self):
        # ChunkProcessorTests.swift:723-748 — disjoint IDs force the midpoint
        # fallback; both sides adjust to word boundaries.
        left = [
            TokenWindow(10, 120, 0.98), TokenWindow(20, 133, 0.97),
            TokenWindow(21, 135, 0.96),
        ]
        right = [
            TokenWindow(60, 134, 0.90), TokenWindow(50, 136, 0.91),
            TokenWindow(30, 138, 0.97),
        ]
        assert self._merge(left, right) == [10, 20, 21, 30]

    def test_midpoint_merge_legacy_behavior_without_vocabulary(self):
        # ChunkProcessorTests.swift:750-768 — pure time cutoff glues "ne".
        left = [
            TokenWindow(10, 120, 0.98), TokenWindow(20, 133, 0.97),
            TokenWindow(21, 135, 0.96),
        ]
        right = [
            TokenWindow(60, 134, 0.90), TokenWindow(50, 136, 0.91),
            TokenWindow(30, 138, 0.97),
        ]
        assert self._merge(left, right, with_vocab=False) == [10, 20, 50, 30]


def test_merged_tokens_preserve_confidence_and_monotonic_timestamps():
    """ChunkProcessorTests.swift:1020-1082 made functional: a real merge
    keeps each surviving token's confidence verbatim and emits timestamps in
    non-decreasing order."""
    cp = make_cp()
    left = [
        TokenWindow(100, 120, 0.95), TokenWindow(101, 125, 0.87),
        TokenWindow(102, 130, 0.72), TokenWindow(103, 131, 0.66),
    ]
    right = [
        TokenWindow(102, 130, 0.90), TokenWindow(103, 131, 0.91),
        TokenWindow(104, 133, 0.88), TokenWindow(105, 134, 0.93),
    ]
    merged = cp.merge_chunks(left, right)
    assert [t.token for t in merged] == [100, 101, 102, 103, 104, 105]
    by_token = {t.token: t.confidence for t in merged}
    # matched anchors keep the LEFT (older) chunk's confidence
    assert by_token[102] == 0.72 and by_token[103] == 0.66
    assert by_token[100] == 0.95 and by_token[105] == 0.93
    times = [t.timestamp for t in merged]
    assert times == sorted(times)
