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


class TestCandidateMatching:
    """Reference VocabularyRescorer+TokenRescoring term-centric matching."""

    def _ctx(self, *terms, **kw):
        return CustomVocabularyContext(list(terms), **kw)

    def test_multi_word_alias_span(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import find_candidates

        ctx = self._ctx(
            VocabularyTerm("Weights & Biases", aliases=["weights and biases"])
        )
        words = ["using", "waits", "and", "biases", "today"]
        cands = find_candidates(ctx, words)
        assert cands, "multi-word alias should match the 3-word span"
        best = max(cands, key=lambda c: c.similarity)
        assert best.span_start == 1 and best.span_length == 3

    def test_compound_word_two_words(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import find_candidates

        # 'Livmarli' transcribed as 'Liv Mali' (reference docstring case)
        ctx = self._ctx(VocabularyTerm("Livmarli", min_similarity=0.6))
        cands = find_candidates(ctx, ["take", "Liv", "Mali", "daily"])
        assert any(c.span_start == 1 and c.span_length == 2 for c in cands)

    def test_stopword_never_replaced_single(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import find_candidates

        # `just` -> `Wyost` class of false positive must be blocked
        ctx = self._ctx(VocabularyTerm("Wyost", min_similarity=0.1))
        assert find_candidates(ctx, ["just"]) == []

    def test_short_word_length_ratio_gate(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import find_candidates

        # short hypothesis word vs much longer term needs >= 0.80 similarity
        ctx = self._ctx(VocabularyTerm("Quickbooks", min_similarity=0.3))
        assert find_candidates(ctx, ["quik"]) == []

    def test_other_vocab_term_guard(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import find_candidates

        # a word that IS another vocabulary term must not be rewritten
        ctx = self._ctx(
            VocabularyTerm("Cimzia", min_similarity=0.3),
            VocabularyTerm("Cimza", min_similarity=0.3),
        )
        cands = find_candidates(ctx, ["cimza"])
        assert all(c.term.text != "Cimzia" for c in cands)

    def test_exact_canonical_skipped(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import find_candidates

        ctx = self._ctx(VocabularyTerm("nvidia"))
        assert find_candidates(ctx, ["nvidia"]) == []

    def test_selection_prefers_higher_similarity_bucket(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            MatchCandidate,
            select_candidates,
        )

        # FDA-extended pattern: 2-word `rom vimza`->Romvimza (0.89) must
        # beat overlapping 1-word `vimza`->Cimzia (0.67) despite span
        t_big = VocabularyTerm("Romvimza")
        t_small = VocabularyTerm("Cimzia")
        a = MatchCandidate(t_big, 0, 2, 0.89, "rom vimza")
        b = MatchCandidate(t_small, 1, 1, 0.67, "vimza")
        chosen = select_candidates([b, a])
        assert chosen == [a]

    def test_selection_span_tiebreak_within_bucket(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            MatchCandidate,
            select_candidates,
        )

        t = VocabularyTerm("acme")
        a = MatchCandidate(t, 0, 2, 0.80, "ac me")
        b = MatchCandidate(t, 0, 1, 0.79, "acme")  # same 0.05 bucket
        chosen = select_candidates([a, b])
        assert chosen[0] is b  # shorter span wins within a bucket


class TestRescorerMultiWord:
    VOCAB = {
        0: "▁the", 1: "▁weights", 2: "▁and", 3: "▁biases", 4: "▁waits",
        5: "▁W&B", 6: "▁dashboard", 7: ",", 8: "▁acme",
    }

    def test_multi_word_alias_splice(self):
        tokenizer = Tokenizer(self.VOCAB)
        term = VocabularyTerm("W&B", aliases=["weights and biases"])
        ctx = CustomVocabularyContext([term], tokenizer)
        term.tdt_token_ids = [5]
        rescorer = VocabularyRescorer(ctx, tokenizer)
        tokens = [
            TokenWindow(0, 5),
            TokenWindow(4, 10), TokenWindow(2, 12), TokenWindow(3, 14),
            TokenWindow(6, 20),
        ]
        result = rescorer.rescore(tokens)
        assert ("waits and biases", "W&B") in result.replacements
        ids = [t.token for t in result.tokens]
        assert ids == [0, 5, 6]
        # spliced tokens keep the first span word's timestamp
        assert result.tokens[1].timestamp == 10

    def test_punctuation_kept_from_last_span_word(self):
        tokenizer = Tokenizer(self.VOCAB)
        term = VocabularyTerm("W&B", aliases=["weights and biases"])
        ctx = CustomVocabularyContext([term], tokenizer)
        term.tdt_token_ids = [5]
        rescorer = VocabularyRescorer(ctx, tokenizer)
        tokens = [
            TokenWindow(4, 10), TokenWindow(2, 12),
            TokenWindow(3, 14), TokenWindow(7, 15),  # trailing comma piece
            TokenWindow(6, 20),
        ]
        result = rescorer.rescore(tokens)
        ids = [t.token for t in result.tokens]
        assert ids == [5, 7, 6]

    def test_case_variant_folding(self):
        tokenizer = Tokenizer({0: "▁ACME", 1: "▁Acme", 2: "▁acquire"})
        term = VocabularyTerm("ACME")
        ctx = CustomVocabularyContext([term], tokenizer)
        term.tdt_token_ids = [0]
        rescorer = VocabularyRescorer(ctx, tokenizer)
        # exact case-variant match is "already correct": normalization
        # lowercases both, so Acme == acme == ACME -> no replacement
        result = rescorer.rescore([TokenWindow(1, 3)])
        assert result.replacements == []


class TestCtcTokenRescore:
    """CTC-vs-CTC shallow fusion (reference ctcTokenRescore)."""

    BLANK = 9
    VOCAB = {
        0: "▁n", 1: "vidia", 2: "videa", 3: "▁the", 4: "▁runs",
    }

    def _lp(self, path, V=10, p=0.98):
        return peaked_logprobs(path, V, p)

    def test_replaces_when_acoustics_support_term(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            WordTiming,
            ctc_token_rescore,
        )

        tokenizer = Tokenizer(self.VOCAB)
        ctx = CustomVocabularyContext([VocabularyTerm("nvidia")], tokenizer)
        # frames spell ▁n vidia: the TERM's tokens, not the hypothesis's
        lp = self._lp([self.BLANK, 3, self.BLANK, 0, 1, 1, self.BLANK, 4, self.BLANK])
        words = [
            WordTiming("the", 0.08, 0.18),
            WordTiming("nvidea", 0.28, 0.58),
            WordTiming("runs", 0.68, 0.80),
        ]
        out = ctc_token_rescore(
            words, lp, 0.1, ctx, tokenizer, blank_id=self.BLANK
        )
        assert out.was_modified
        assert out.text == "the nvidia runs"
        assert out.replacements[0].boosted_vocab_score > out.replacements[0].original_score

    def test_keeps_original_when_acoustics_refute(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            RescorerConfig,
            WordTiming,
            ctc_token_rescore,
        )

        tokenizer = Tokenizer(self.VOCAB)
        ctx = CustomVocabularyContext([VocabularyTerm("nvidia")], tokenizer)
        # frames spell ▁n videa — the ORIGINAL hypothesis, strongly
        lp = self._lp([0, 2, 2, 2, 2, 2], p=0.999)
        words = [WordTiming("nvidea", 0.0, 0.6)]
        out = ctc_token_rescore(
            words, lp, 0.1, ctx, tokenizer, blank_id=self.BLANK,
            config=RescorerConfig(cbw=0.0, spotter_rescue_enabled=False),
        )
        assert not out.was_modified

    def test_capitalization_preserved(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            WordTiming,
            ctc_token_rescore,
        )

        tokenizer = Tokenizer(self.VOCAB)
        ctx = CustomVocabularyContext([VocabularyTerm("nvidia")], tokenizer)
        lp = self._lp([0, 1, 1, self.BLANK])
        words = [WordTiming("Nvidea", 0.0, 0.4)]
        out = ctc_token_rescore(words, lp, 0.1, ctx, tokenizer, blank_id=self.BLANK)
        assert out.was_modified and out.text == "Nvidia"


class TestRescorerUtilities:
    def test_normalize_for_similarity(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import normalize_for_similarity

        assert normalize_for_similarity("  Hello,  World! ") == "hello world"
        assert normalize_for_similarity("it's-a-test") == "it's-a-test"

    def test_adaptive_cbw_scaling(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import RescorerConfig

        cfg = RescorerConfig()
        assert cfg.adaptive_cbw(3.0, 3) == pytest.approx(3.0)
        assert cfg.adaptive_cbw(3.0, 6) == pytest.approx(3.0 * 1.3)
        assert cfg.adaptive_cbw(3.0, 12) == pytest.approx(3.0 * 1.6)
        taper = RescorerConfig(short_term_cbw_taper_pivot=5)
        assert taper.adaptive_cbw(3.0, 2) == pytest.approx(3.0 * (2 / 5) ** 2)

    def test_encode_variants(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import encode_variants

        tokenizer = Tokenizer({0: "▁liv", 1: "marli", 2: "liv"})
        variants = encode_variants(tokenizer, "livmarli")
        assert [0, 1] in variants and [2, 1] in variants


# --------------------------------------------------------------------------
# Rescorer string utilities (VocabularyRescorerUtilsTests.swift:9-96)
# --------------------------------------------------------------------------


class TestStringSimilarity:
    def test_identical_strings(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import string_similarity

        assert string_similarity("hello", "hello") == pytest.approx(1.0)

    def test_completely_different(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import string_similarity

        assert string_similarity("abc", "xyz") == pytest.approx(0.0)

    def test_case_insensitive(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import string_similarity

        assert string_similarity("Hello", "hello") == pytest.approx(1.0)

    def test_one_char_difference(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import string_similarity

        assert string_similarity("hello", "hallo") == pytest.approx(0.8)

    def test_both_empty(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import string_similarity

        assert string_similarity("", "") == pytest.approx(1.0)

    def test_one_empty(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import string_similarity

        assert string_similarity("abc", "") == pytest.approx(0.0)

    def test_length_penalty_equal_length_is_base(self):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            length_penalized_similarity,
            string_similarity,
        )

        a, b = "kubernetes", "kubernetes"
        assert length_penalized_similarity(a, b) == pytest.approx(
            string_similarity(a, b)
        )

    def test_length_penalty_shorter_compound(self):
        import math

        from fluidaudio_tpu.asr.custom_vocab.rescorer import (
            length_penalized_similarity,
            string_similarity,
        )

        base = string_similarity("kube", "kubernetes")
        ratio = 4 / 10
        assert length_penalized_similarity("kube", "kubernetes") == pytest.approx(
            base * math.sqrt(ratio)
        )


class TestNormalizeForSimilarity:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Hello, World!", "hello world"),
            ("don't", "don't"),
            ("twenty-one", "twenty-one"),
            ("a   b\tc\nd", "a b c d"),
            ("", ""),
            ("Model 123", "model 123"),
        ],
    )
    def test_normalize_matrix(self, raw, expected):
        from fluidaudio_tpu.asr.custom_vocab.rescorer import normalize_for_similarity

        assert normalize_for_similarity(raw) == expected


# --------------------------------------------------------------------------
# BK-tree edge scenarios (BKTreeTests.swift:15-113)
# --------------------------------------------------------------------------


class TestBKTreeEdges:
    def _tree(self, words=()):
        from fluidaudio_tpu.asr.custom_vocab.bktree import BKTree

        t = BKTree()
        for w in words:
            t.insert(w)
        return t

    def test_empty_tree(self):
        t = self._tree()
        assert len(t) == 0
        assert t.search("anything", 2) == []

    def test_single_term(self):
        t = self._tree(["hello"])
        assert len(t) == 1
        assert [m[0] for m in t.search("hello", 0)] == ["hello"]

    def test_exact_match_distance_zero(self):
        t = self._tree(["alpha", "beta", "gamma"])
        hits = t.search("beta", 0)
        assert [h[0] for h in hits] == ["beta"]
        assert hits[0][1] == 0

    def test_fuzzy_distance_1_and_2(self):
        t = self._tree(["kubernetes"])
        assert t.search("kubernete", 1)  # deletion
        assert t.search("kubernetez", 1)  # substitution
        assert t.search("kubernet", 2)
        assert t.search("kubern", 2) == []  # distance 4

    def test_max_distance_zero_miss(self):
        t = self._tree(["hello"])
        assert t.search("hallo", 0) == []

    def test_multiple_matches_returned(self):
        t = self._tree(["cat", "bat", "rat", "dog"])
        hits = {h[0] for h in t.search("hat", 1)}
        assert hits == {"cat", "bat", "rat"}

    def test_single_character_terms(self):
        t = self._tree(["a", "b", "c"])
        assert {h[0] for h in t.search("a", 1)} >= {"a", "b", "c"}
        assert {h[0] for h in t.search("a", 0)} == {"a"}


# --------------------------------------------------------------------------
# Size-aware threshold hierarchy (ContextBiasingConstantsTests.swift:19-102)
# --------------------------------------------------------------------------


def test_size_aware_threshold_hierarchy():
    from fluidaudio_tpu.asr.custom_vocab.context import _size_aware_min_similarity

    small = _size_aware_min_similarity(10)
    medium = _size_aware_min_similarity(100)
    large = _size_aware_min_similarity(500)
    # larger vocabularies demand stricter matches
    assert small <= medium <= large
    for v in (small, medium, large):
        assert 0.0 < v <= 1.0


def test_size_aware_threshold_monotone_in_vocab_size():
    from fluidaudio_tpu.asr.custom_vocab.context import _size_aware_min_similarity

    values = [_size_aware_min_similarity(n) for n in (1, 50, 51, 200, 201, 1000)]
    assert values == sorted(values)


def test_per_term_threshold_respects_caller_when_stricter():
    from fluidaudio_tpu.asr.custom_vocab.context import (
        CustomVocabularyContext,
        VocabularyTerm,
    )

    terms = [VocabularyTerm(text="kubernetes", min_similarity=0.95)]
    ctx = CustomVocabularyContext(terms)
    # caller threshold stricter than the size-aware default wins
    assert ctx.min_similarity(terms[0]) == pytest.approx(0.95)


def test_per_term_threshold_falls_back_to_size_aware_default():
    from fluidaudio_tpu.asr.custom_vocab.context import (
        CustomVocabularyContext,
        VocabularyTerm,
    )

    terms = [VocabularyTerm(text="kubernetes")]
    ctx = CustomVocabularyContext(terms)
    assert ctx.min_similarity(terms[0]) == pytest.approx(ctx.default_min_similarity)


def test_wildcard_token_id_constant():
    from fluidaudio_tpu.asr.custom_vocab.context import WILDCARD_TOKEN_ID

    assert WILDCARD_TOKEN_ID < 0  # can never collide with a real vocab id


class TestVocabularyTermContract:
    """CustomVocabularyTests.swift:10-135 — Term init/clamping/file loading."""

    def test_term_default_init(self):
        t = VocabularyTerm(text="NVIDIA")
        assert t.text == "NVIDIA"
        assert t.aliases == []
        assert t.min_similarity is None
        assert t.tdt_token_ids is None and t.ctc_token_ids is None

    def test_term_min_similarity_clamped_to_range(self):
        assert VocabularyTerm(text="Caivex", min_similarity=-0.5).min_similarity == 0.0
        assert VocabularyTerm(text="Andre", min_similarity=1.7).min_similarity == 1.0
        assert VocabularyTerm(text="Mid", min_similarity=0.6).min_similarity == 0.6

    def test_text_lowercased(self):
        assert VocabularyTerm(text="NVIDIA").text_lowercased == "nvidia"
        assert VocabularyTerm(text="McDonald's").text_lowercased == "mcdonald's"

    def test_load_vocabulary_file_detects_json(self, tmp_path):
        j = tmp_path / "vocab.json"
        j.write_text('[{"text": "Bose", "minSimilarity": 0.9}, "Sennheiser"]')
        ctx = CustomVocabularyContext.from_file(j)
        assert [t.text for t in ctx.terms] == ["Bose", "Sennheiser"]
        assert ctx.terms[0].min_similarity == 0.9

    def test_load_vocabulary_file_plain_text(self, tmp_path):
        p = tmp_path / "vocab.txt"
        p.write_text("# boost list\nNVIDIA\n\nBose QuietComfort\n")
        ctx = CustomVocabularyContext.from_file(p)
        assert [t.text for t in ctx.terms] == ["NVIDIA", "Bose QuietComfort"]

    def test_json_min_similarity_clamped_on_load(self, tmp_path):
        j = tmp_path / "vocab.json"
        j.write_text('[{"text": "X", "minSimilarity": 3.0}]')
        ctx = CustomVocabularyContext.from_file(j)
        assert ctx.terms[0].min_similarity == 1.0
