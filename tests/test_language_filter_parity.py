"""TokenLanguageFilter scenario parity suite (host-side matcher/top-K).

Ports the reference's `Tests/FluidAudioTests/Shared/TokenLanguageFilterTests.swift`:
range-based script matching (Latin Extended-A/B/Additional, combining
diacritics, Cyrillic block), boundary-marker stripping, mixed-script
rejection, Latin-Slavic diacritics (issue #512), and the filterTopK
semantics (unsorted argmax, -inf handling, top-K softmax probability,
missing-vocab skip, None on no match). The in-jit decode-loop rerank is
covered by tests/test_language_filter.py.
"""

from __future__ import annotations

import math

import pytest

from fluidaudio_tpu.utils.language import (
    LANGUAGE_SCRIPTS,
    Script,
    TokenLanguageFilter,
    filter_top_k,
    matches_script,
)


class TestMatchesScript:
    def test_latin_text(self):
        for text in ("hello", "world", "Test123", "don't"):
            assert matches_script(text, Script.LATIN)

    def test_cyrillic_text(self):
        for text in ("привет", "мир", "Тест"):
            assert matches_script(text, Script.CYRILLIC)

    def test_mixed_scripts_match_neither(self):
        assert not matches_script("catПривет", Script.LATIN)
        assert not matches_script("catПривет", Script.CYRILLIC)

    def test_ascii_letters_rejected_as_cyrillic(self):
        assert not matches_script("cat", Script.CYRILLIC)

    def test_strips_sentencepiece_boundary(self):
        assert matches_script("▁hello", Script.LATIN)
        assert matches_script("▁привет", Script.CYRILLIC)

    def test_multiple_boundary_markers(self):
        assert matches_script("▁▁hello▁", Script.LATIN)

    def test_boundary_marker_only_is_neutral(self):
        assert matches_script("▁", Script.LATIN)
        assert matches_script("▁", Script.CYRILLIC)
        assert matches_script("▁▁", Script.GREEK)

    def test_empty_string_is_neutral(self):
        assert matches_script("", Script.LATIN)
        assert matches_script("", Script.CYRILLIC)

    def test_whitespace_is_neutral_ascii(self):
        assert matches_script("  ", Script.LATIN)
        assert matches_script("  ", Script.CYRILLIC)

    def test_numbers_are_neutral(self):
        assert matches_script("123", Script.LATIN)
        assert matches_script("123", Script.CYRILLIC)

    def test_punctuation_with_latin(self):
        assert matches_script("hello,", Script.LATIN)
        assert matches_script("world!", Script.LATIN)

    def test_punctuation_with_cyrillic(self):
        assert matches_script("привет,", Script.CYRILLIC)
        assert matches_script("мир!", Script.CYRILLIC)


class TestLatinSlavicDiacritics:
    """Latin-script Slavic languages prone to Cyrillic confusion (#512)."""

    @pytest.mark.parametrize(
        "ch", ["ą", "ć", "ę", "ł", "ń", "ó", "ś", "ź", "ż"]
    )
    def test_polish_latin_characters(self, ch):
        assert matches_script(ch, Script.LATIN)

    @pytest.mark.parametrize("word", ["cześć", "świat", "Polska", "zażółć"])
    def test_polish_words(self, word):
        assert matches_script(word, Script.LATIN)

    def test_polish_with_boundary_marker(self):
        assert matches_script("▁cześć", Script.LATIN)

    def test_polish_rejected_as_cyrillic(self):
        assert not matches_script("cześć", Script.CYRILLIC)
        assert not matches_script("świat", Script.CYRILLIC)

    @pytest.mark.parametrize("word", ["čeština", "řeka", "žlutý", "ďábel"])
    def test_czech_diacritics(self, word):
        assert matches_script(word, Script.LATIN)

    @pytest.mark.parametrize("word", ["ľudia", "kôň", "mäso"])
    def test_slovak_diacritics(self, word):
        assert matches_script(word, Script.LATIN)

    @pytest.mark.parametrize("word", ["život", "čovjek", "šuma", "džep"])
    def test_slovenian_croatian_diacritics(self, word):
        assert matches_script(word, Script.LATIN)

    @pytest.mark.parametrize("word", ["știință", "țară", "română"])
    def test_romanian_diacritics(self, word):
        # ș/ț live in Latin Extended-B
        assert matches_script(word, Script.LATIN)

    @pytest.mark.parametrize("word", ["čeština", "ľudia", "život", "țară"])
    def test_slavic_latin_rejected_as_cyrillic(self, word):
        assert not matches_script(word, Script.CYRILLIC)

    def test_latin_extended_a_range(self):
        assert matches_script("Ā", Script.LATIN)  # Ā
        assert matches_script("ſ", Script.LATIN)  # ſ

    def test_latin_extended_b_range(self):
        assert matches_script("ƀ", Script.LATIN)
        assert matches_script("ɏ", Script.LATIN)

    def test_latin_extended_additional_range(self):
        assert matches_script("Ḁ", Script.LATIN)  # Ḁ
        assert matches_script("ỿ", Script.LATIN)

    def test_combining_diacritics_range(self):
        # NFD-decomposed é = e + U+0301
        assert matches_script("é", Script.LATIN)

    def test_cyrillic_range(self):
        assert matches_script("Ѐ", Script.CYRILLIC)
        assert matches_script("ӿ", Script.CYRILLIC)
        assert not matches_script("Ѐ", Script.LATIN)


class TestGreek:
    def test_greek_text(self):
        assert matches_script("γειά", Script.GREEK)
        assert matches_script("κόσμος", Script.GREEK)

    def test_greek_rejects_latin(self):
        assert not matches_script("hello", Script.GREEK)

    def test_greek_extended(self):
        assert matches_script("ἀ", Script.GREEK)  # polytonic


class TestFilterTopK:
    VOCAB = {1: "▁при", 2: "▁prz", 3: "▁прі", 4: "▁the", 5: ","}

    def test_returns_highest_logit_match(self):
        result = filter_top_k([1, 2, 3], [0.9, 0.6, 0.4], self.VOCAB, Script.LATIN)
        assert result is not None
        token_id, prob = result
        assert token_id == 2
        # Softmax over top-3 logits: P(0.6 | [0.9, 0.6, 0.4]) ≈ 0.3156
        assert prob == pytest.approx(0.3156, abs=0.01)

    def test_argmax_over_unsorted_logits(self):
        # Input not sorted by logit: the best in-script must still win.
        result = filter_top_k([2, 4, 5], [0.1, 0.8, 0.3], self.VOCAB, Script.LATIN)
        assert result is not None and result[0] == 4

    def test_boundary_marker_token_matches(self):
        vocab = {7: "▁"}
        result = filter_top_k([7], [1.0], vocab, Script.CYRILLIC)
        assert result is not None and result[0] == 7

    def test_none_when_no_match(self):
        result = filter_top_k([1, 3], [0.9, 0.4], self.VOCAB, Script.LATIN)
        assert result is None

    def test_skips_missing_vocabulary_entries(self):
        result = filter_top_k([99, 2], [5.0, 0.1], self.VOCAB, Script.LATIN)
        assert result is not None and result[0] == 2

    def test_picks_negative_infinity_logit(self):
        # The only in-script candidate has -inf logit: still returned
        # (bestIdx < 0 clause), with probability 0.
        result = filter_top_k(
            [1, 2], [0.5, -math.inf], self.VOCAB, Script.LATIN
        )
        assert result is not None
        assert result[0] == 2
        assert result[1] == 0.0

    def test_empty_arrays(self):
        assert filter_top_k([], [], self.VOCAB, Script.LATIN) is None

    def test_length_mismatch_uses_common_prefix(self):
        result = filter_top_k([2, 1, 3], [0.5], self.VOCAB, Script.LATIN)
        assert result is not None and result[0] == 2

    def test_probability_in_valid_range(self):
        result = filter_top_k(
            [2, 4], [100.0, -100.0], self.VOCAB, Script.LATIN
        )
        assert result is not None
        assert 0.0 <= result[1] <= 1.0


class TestLanguageCatalog:
    def test_all_languages_have_script(self):
        for lang, script in LANGUAGE_SCRIPTS.items():
            assert isinstance(script, Script), lang

    def test_latin_slavic_mapped_latin(self):
        for lang in ("pl", "cs", "sk", "sl", "hr", "bs"):
            assert LANGUAGE_SCRIPTS[lang] is Script.LATIN

    def test_cyrillic_languages(self):
        for lang in ("ru", "uk", "be", "bg", "sr"):
            assert LANGUAGE_SCRIPTS[lang] is Script.CYRILLIC

    def test_greek(self):
        assert LANGUAGE_SCRIPTS["el"] is Script.GREEK


class TestTokenLanguageFilterAllowedSets:
    def test_mixed_script_token_excluded_everywhere(self):
        vocab = {0: "aб", 1: "▁ok", 2: "▁да"}
        lat = TokenLanguageFilter("pl", vocab)
        cyr = TokenLanguageFilter("ru", vocab)
        assert 0 not in lat.allowed and 0 not in cyr.allowed
        assert 1 in lat.allowed and 2 in cyr.allowed

    def test_japanese_accepts_kanji_and_kana(self):
        vocab = {0: "日本", 1: "にほん", 2: "▁hello"}
        ja = TokenLanguageFilter("ja", vocab)
        assert 0 in ja.allowed and 1 in ja.allowed and 2 not in ja.allowed
