"""StyleTTS2 text frontend: TextCleaner table, phonemizer, chunking.

Ports StyleTTS2TextCleanerTests.swift, StyleTTS2PhonemizerTests.swift
(shorthand expansion, initialisms, number normalization, degraded paths),
and StyleTTS2ChunkingTests.swift.
"""

import pytest

from fluidaudio_tpu.tts.g2p import EnglishG2P
from fluidaudio_tpu.tts.phoneme_chunker import chunk_phonemes
from fluidaudio_tpu.tts.styletts2_manager import (
    _CHAR_TO_ID,
    _IPA,
    _LETTERS,
    _PUNCTUATION,
    SYMBOLS,
    StyleTts2Phonemizer,
    expand_misaki_shorthand,
    text_cleaner_encode,
)


class TestTextCleaner:
    """StyleTTS2TextCleanerTests.swift:9-71."""

    def test_pad_symbol_is_zero(self):
        assert SYMBOLS[0] == "$"
        assert _CHAR_TO_ID["$"] == 0

    def test_vocabulary_size_matches_spec(self):
        assert len(SYMBOLS) == 1 + len(_PUNCTUATION) + len(_LETTERS) + len(_IPA)

    def test_punctuation_contains_space(self):
        assert " " in _CHAR_TO_ID

    def test_encode_empty_emits_leading_pad(self):
        assert text_cleaner_encode("") == [0]

    def test_encode_empty_no_pad(self):
        assert text_cleaner_encode("", prepend_pad=False) == []

    def test_encode_round_trips_known_letters(self):
        ids = text_cleaner_encode("abc", prepend_pad=False)
        assert ids == [_CHAR_TO_ID["a"], _CHAR_TO_ID["b"], _CHAR_TO_ID["c"]]

    def test_encode_drops_unknown_characters(self):
        ids = text_cleaner_encode("aжb", prepend_pad=False)
        assert ids == [_CHAR_TO_ID["a"], _CHAR_TO_ID["b"]]

    def test_encode_prepends_pad_by_default(self):
        ids = text_cleaner_encode("a")
        assert ids[0] == 0 and len(ids) == 2


def make_phonemizer(lower=None, case=None):
    g2p = EnglishG2P()
    g2p.lexicon = {}  # isolate from the seed lexicon like the Swift fixtures
    g2p.misaki_lower = {k: list(v) for k, v in (lower or {}).items()}
    g2p.misaki_case = {k: list(v) for k, v in (case or {}).items()}
    return StyleTts2Phonemizer(g2p)


class TestPhonemizer:
    """StyleTTS2PhonemizerTests.swift:17-235 adapted to the shared
    EnglishG2P cascade."""

    def test_empty_input_returns_empty_phoneme_string(self):
        assert make_phonemizer().phonemize("") == ""
        assert make_phonemizer().phonemize("   ") == ""

    def test_empty_input_encodes_to_pad_only(self):
        assert make_phonemizer().encode("") == [0]

    def test_punctuation_passes_through_verbatim(self):
        assert make_phonemizer().phonemize(" . , ! ? ") == ". , ! ?"

    def test_lower_case_lexicon_hit(self):
        p = make_phonemizer(lower={"hi": ["h", "i"]})
        assert p.phonemize("hi") == "hi"

    def test_encode_includes_leading_pad(self):
        p = make_phonemizer(lower={"hi": ["h", "i"]})
        assert p.encode("hi") == [0, _CHAR_TO_ID["h"], _CHAR_TO_ID["i"]]

    def test_misaki_diphthong_shorthand_expands(self):
        p = make_phonemizer(
            lower={
                "hello": ["h", "ə", "l", "ˈ", "O"],
                "style": ["s", "t", "ˈ", "I", "l"],
                "abate": ["ə", "b", "ˈ", "A", "t"],
                "boy": ["b", "ˈ", "Y"],
                "out": ["ˈ", "W", "t"],
            }
        )
        assert p.phonemize("hello") == "həlˈoʊ"
        assert p.phonemize("style") == "stˈaɪl"
        assert p.phonemize("abate") == "əbˈeɪt"
        assert p.phonemize("boy") == "bˈɔɪ"
        assert p.phonemize("out") == "ˈaʊt"

    def test_misaki_shorthand_ignores_lowercase(self):
        p = make_phonemizer(lower={"foo": ["f", "o", "o"]})
        assert p.phonemize("foo") == "foo"

    def test_expand_helper_direct(self):
        assert expand_misaki_shorthand("AOIYW") == "eɪoʊaɪɔɪaʊ"
        assert expand_misaki_shorthand("aoiyw") == "aoiyw"

    # ---- letter-name initialisms (issue #710)

    def _initialism_phonemizer(self):
        return make_phonemizer(
            lower={"us": ["ˌ", "ʌ", "s"]},
            case={
                "AI": ["e", "ɪ", "a", "ɪ"],
                "US": ["ˌ", "ʌ", "s"],
                "A": ["ˈ", "A"],
                "I": ["ˈ", "I"],
                "U": ["j", "ˈ", "u"],
                "S": ["ˈ", "ɛ", "s"],
                "F": ["ˈ", "ɛ", "f"],
                "B": ["b", "ˈ", "i"],
                "NASA": ["n", "ˈ", "a", "s", "ə"],
            },
        )

    def test_ai_override_spells_letter_names(self):
        assert self._initialism_phonemizer().phonemize("AI") == "ˈeɪ ˈaɪ"

    def test_us_override_spells_letter_names_not_pronoun(self):
        assert self._initialism_phonemizer().phonemize("US") == "jˈu ˈɛs"

    def test_lowercase_us_stays_pronoun(self):
        assert self._initialism_phonemizer().phonemize("us") == "ˌʌs"

    def test_unknown_all_caps_initialism_spelled_as_letter_names(self):
        assert self._initialism_phonemizer().phonemize("FBI") == "ˈɛf bˈi ˈaɪ"

    def test_known_acronym_stays_lexicon_backed(self):
        assert self._initialism_phonemizer().phonemize("NASA") == "nˈasə"

    def test_override_falls_back_to_lexicon_when_letters_missing(self):
        p = make_phonemizer(case={"AI": ["e", "ɪ", "a", "ɪ"]})
        assert p.phonemize("AI") == "eɪaɪ"

    # ---- raw-text number normalization (issue #711)

    def test_standalone_number_is_normalized_before_lexicon(self):
        p = make_phonemizer(lower={"twenty": ["t"], "six": ["s"]})
        assert p.phonemize("26") == "t s"

    def test_embedded_digits_are_not_normalized(self):
        p = make_phonemizer(lower={"word26": ["w"]})
        assert p.phonemize("word26") == "w"

    # ---- degraded paths

    def test_grapheme_passthrough_when_nothing_known(self):
        # Shared-cascade adaptation: the rules fallback may resolve common
        # graphemes, so force a token the rules can't touch. It passes
        # through as graphemes rather than being dropped.
        p = make_phonemizer(lower={"hi": ["h", "i"]})
        out = p.phonemize("hi zzqq")
        assert out.startswith("hi ")
        assert len(out.split()) == 2


class TestChunking:
    """StyleTTS2ChunkingTests.swift:14-45 against our bucket config."""

    def test_max_phoneme_chunk_chars_stays_under_largest_bucket(self):
        from fluidaudio_tpu.models.styletts2 import STYLETTS2_BASE

        # synthesize() chunks at max_tokens - 1 so pad + chars fit
        assert STYLETTS2_BASE.max_tokens - 1 >= 255

    def test_every_chunk_encodes_within_the_largest_bucket(self):
        largest = 256
        long_phonemes = " ".join(["həlo wɝld"] * 80)
        assert len(long_phonemes) > largest
        chunks = chunk_phonemes(long_phonemes, largest - 1)
        assert len(chunks) > 1
        for chunk in chunks:
            assert len(chunk) <= largest - 1
            assert len(text_cleaner_encode(chunk)) <= largest

    def test_short_text_produces_at_most_one_chunk(self):
        assert chunk_phonemes("həlo wɝld", 255) == ["həlo wɝld"]
