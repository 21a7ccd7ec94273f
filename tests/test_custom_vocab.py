"""Custom vocabulary: BK-tree, context thresholds, CTC-WS DP, rescorer."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.chunk import TokenWindow
from fluidaudio_tpu.asr.custom_vocab import (
    BKTree,
    CustomVocabularyContext,
    VocabularyRescorer,
    VocabularyTerm,
    ctc_keyword_dp,
    spot_keywords,
)
from fluidaudio_tpu.asr.custom_vocab.context import WILDCARD_TOKEN_ID
from fluidaudio_tpu.asr.tokenizer import Tokenizer


class TestBKTree:
    def test_insert_search(self):
        t = BKTree()
        for w in ["book", "books", "cake", "boo", "cape", "cart"]:
            t.insert(w)
        hits = [w for w, d, _ in t.search("book", 1)]
        assert set(hits) == {"book", "books", "boo"}
        assert t.search("book", 0)[0][0] == "book"
        assert len(t) == 6

    def test_payload(self):
        t = BKTree()
        t.insert("nvidia", payload=42)
        assert t.search("nvida", 1)[0][2] == 42


class TestContext:
    def test_size_aware_thresholds(self):
        small = CustomVocabularyContext([VocabularyTerm(f"w{i}") for i in range(10)])
        large = CustomVocabularyContext([VocabularyTerm(f"w{i}") for i in range(300)])
        assert small.default_min_similarity < large.default_min_similarity

    def test_aliases_and_fuzzy(self):
        ctx = CustomVocabularyContext(
            [VocabularyTerm("kubernetes", aliases=["k8s"])]
        )
        assert ctx.lookup_exact("K8S").text == "kubernetes"
        cands = ctx.fuzzy_candidates("kubernets")  # missing an e
        assert cands and cands[0][0].text == "kubernetes"
        assert cands[0][1] > 0.85


def peaked_logprobs(path, V, p=0.95):
    T = len(path)
    lp = np.log(np.full((T, V), (1 - p) / (V - 1), np.float64))
    for t, k in enumerate(path):
        lp[t, k] = np.log(p)
    return lp


class TestCtcSpotter:
    BLANK = 0

    def test_dp_finds_exact_path(self):
        # frames: blank, A, A, blank, B, blank (A=1, B=2)
        lp = peaked_logprobs([0, 1, 1, 0, 2, 0], V=4)
        dp, bt = ctc_keyword_dp(lp, [1, 2], self.BLANK)
        T = lp.shape[0]
        best_t = int(np.argmax(dp[:, 2]))
        assert dp[best_t, 2] > -2.0  # near-zero cost path exists
        # free start picks the tightest window (token A first peaks at frame 1;
        # starting at 2 is also legal since A repeats at frames 1-2)
        assert bt[best_t, 2] <= 2

    def test_repeated_token_needs_blank(self):
        # keyword A A must traverse a blank between the As;
        # frames A A (no blank) cannot complete both tokens with high score
        lp_noblank = peaked_logprobs([1, 1], V=4)
        dp1, _ = ctc_keyword_dp(lp_noblank, [1, 1], self.BLANK)
        lp_blank = peaked_logprobs([1, 0, 1], V=4)
        dp2, _ = ctc_keyword_dp(lp_blank, [1, 1], self.BLANK)
        assert dp2[3, 2] > dp1[2, 2] + 1.0

    def test_wildcard_matches_free(self):
        lp = peaked_logprobs([1, 3, 2], V=4)
        dp, _ = ctc_keyword_dp(lp, [1, WILDCARD_TOKEN_ID, 2], self.BLANK)
        assert dp[3, 3] > -1.0

    def test_spot_keywords_end_to_end(self):
        lp = peaked_logprobs([0, 0, 1, 2, 3, 0, 0], V=5)
        spots = spot_keywords(lp, {"abc": [1, 2, 3], "zzz": [4, 4, 4]}, self.BLANK,
                              min_score=-1.0)
        names = [s.keyword for s in spots]
        assert "abc" in names and "zzz" not in names
        spot = spots[0]
        assert spot.start_frame <= 2 and spot.end_frame >= 4


class TestRescorer:
    VOCAB = {
        0: "▁n", 1: "videa", 2: "▁in", 3: "video", 4: "▁the", 5: "▁runs",
        6: "▁on", 7: "▁gpu", 8: "s", 9: "vidia",
    }

    def test_rescore_replaces_fuzzy_match(self):
        tokenizer = Tokenizer(self.VOCAB)
        ctx = CustomVocabularyContext([VocabularyTerm("nvidia")], tokenizer)
        rescorer = VocabularyRescorer(ctx, tokenizer)
        # hypothesis: "the nvidea runs" (misrecognized "nvidia", distance 1)
        tokens = [
            TokenWindow(4, 10),
            TokenWindow(0, 12), TokenWindow(1, 13),
            TokenWindow(5, 15),
        ]
        result = rescorer.rescore(tokens)
        assert result.replacements == [("nvidea", "nvidia")]
        text = tokenizer.decode([t.token for t in result.tokens])
        assert "nvidia" in text
        assert "nvidea" not in text

    def test_no_replacement_below_similarity(self):
        tokenizer = Tokenizer(self.VOCAB)
        ctx = CustomVocabularyContext([VocabularyTerm("nvidia", min_similarity=0.99)],
                                      tokenizer)
        rescorer = VocabularyRescorer(ctx, tokenizer)
        tokens = [TokenWindow(2, 12), TokenWindow(3, 13)]
        result = rescorer.rescore(tokens)
        assert result.replacements == []
