"""SSML scenario parity suite.

Ports the reference's `Tests/FluidAudioTests/TTS/SSMLTests.swift`: tag
parsing (phoneme/sub/say-as incl. reversed attributes, case-insensitivity,
single/mixed quotes), the full SayAsInterpreter matrix, processor output
(cleaned text + word-indexed phoneme overrides), and malformed-tag
passthrough.
"""

from __future__ import annotations

import pytest

from fluidaudio_tpu.tts.ssml import (
    SSMLProcessor,
    interpret_say_as,
    process_ssml,
    spell_out_number,
)


class TestInterpretSayAs:
    def test_characters(self):
        assert interpret_say_as("ABC", "characters") == "A B C"

    def test_spell_out(self):
        assert interpret_say_as("hello", "spell-out") == "h e l l o"

    def test_cardinal(self):
        assert interpret_say_as("123", "cardinal") == "one hundred twenty-three"

    def test_cardinal_alias_number(self):
        assert interpret_say_as("456", "number") == "four hundred fifty-six"

    def test_cardinal_large(self):
        assert interpret_say_as("1000000", "cardinal") == "one million"

    def test_cardinal_negative(self):
        out = interpret_say_as("-5", "cardinal")
        assert "five" in out

    def test_cardinal_invalid(self):
        assert interpret_say_as("abc", "cardinal") == "abc"

    @pytest.mark.parametrize(
        "n,expected",
        [
            ("1", "first"), ("2", "second"), ("3", "third"),
            ("11", "eleventh"), ("12", "twelfth"), ("13", "thirteenth"),
            ("20", "twentieth"), ("21", "twenty-first"),
            ("111", "one hundred eleventh"),
            ("1000", "one thousandth"),
        ],
    )
    def test_ordinal(self, n, expected):
        assert interpret_say_as(n, "ordinal") == expected

    def test_ordinal_invalid(self):
        assert interpret_say_as("abc", "ordinal") == "abc"

    def test_digits(self):
        assert interpret_say_as("123", "digits") == "one two three"

    def test_digits_with_zero(self):
        assert interpret_say_as("1024", "digits") == "one zero two four"

    def test_digits_non_digits_skipped(self):
        assert interpret_say_as("a1b2", "digits") == "one two"

    def test_date_mdy(self):
        out = interpret_say_as("12/25/2024", "date", "mdy")
        assert "December" in out and "twenty" in out

    def test_date_dmy(self):
        out = interpret_say_as("25/12/2024", "date", "dmy")
        assert "December" in out and "twenty" in out

    def test_date_ymd(self):
        out = interpret_say_as("2024-01-15", "date", "ymd")
        assert "January" in out and "twenty" in out

    def test_date_year_with_oh(self):
        assert interpret_say_as("1905", "date", "y") == "nineteen oh five"

    def test_date_year_2000(self):
        assert interpret_say_as("2000", "date", "y") == "two thousand"

    def test_date_year_hundred(self):
        assert interpret_say_as("1900", "date", "y") == "nineteen hundred"

    def test_date_invalid_month_bound(self):
        # Month 13 in mdy: formatting fails, content returned unchanged.
        assert interpret_say_as("13/25/2024", "date", "mdy") == "13/25/2024"

    def test_date_valid_large_day(self):
        out = interpret_say_as("1/31/2024", "date", "mdy")
        assert "January" in out and "thirty-first" in out

    def test_date_invalid(self):
        assert interpret_say_as("not-a-date", "date", "mdy") == "not-a-date"

    def test_date_empty_components(self):
        assert interpret_say_as("", "date", "mdy") == ""

    def test_time_duration(self):
        out = interpret_say_as("1'21\"", "time")
        assert "minute" in out and "second" in out
        assert out == "one minute twenty-one seconds"

    def test_time_clock(self):
        assert interpret_say_as("2:30", "time") == "two thirty"

    def test_time_oclock(self):
        assert interpret_say_as("3:00", "time") == "three o'clock"

    def test_time_single_digit_minutes(self):
        assert interpret_say_as("3:05", "time") == "three oh five"

    def test_time_invalid(self):
        assert interpret_say_as("sometime", "time") == "sometime"

    def test_telephone(self):
        assert (
            interpret_say_as("555-1234", "telephone")
            == "five five five one two three four"
        )

    def test_telephone_with_parens(self):
        assert (
            interpret_say_as("(555) 123-4567", "telephone")
            == "five five five one two three four five six seven"
        )

    def test_telephone_empty(self):
        assert interpret_say_as("", "telephone") == ""

    def test_fraction_half(self):
        assert interpret_say_as("1/2", "fraction") == "one half"

    def test_fraction_two_halves(self):
        assert interpret_say_as("2/2", "fraction") == "two halves"

    def test_fraction_quarter(self):
        assert interpret_say_as("3/4", "fraction") == "three quarters"

    def test_fraction_general(self):
        assert interpret_say_as("2/9", "fraction") == "two ninths"

    def test_fraction_one_third(self):
        assert interpret_say_as("1/3", "fraction") == "one third"

    def test_fraction_large_denominator(self):
        out = interpret_say_as("1/100", "fraction")
        assert "hundredth" in out

    def test_fraction_mixed(self):
        out = interpret_say_as("3+1/2", "fraction")
        assert "three" in out and "half" in out

    def test_fraction_invalid_format(self):
        assert interpret_say_as("1/2/3", "fraction") == "1/2/3"

    def test_fraction_zero_denominator(self):
        assert interpret_say_as("1/0", "fraction") == "1/0"

    def test_unknown_type_unchanged(self):
        assert interpret_say_as("test", "unknown-type") == "test"


class TestProcessSsml:
    def test_phoneme_tag(self):
        result = process_ssml('<phoneme alphabet="ipa" ph="təmeɪtoʊ">tomato</phoneme>')
        assert result.text == "tomato"
        assert len(result.phonetic_overrides) == 1
        ov = result.phonetic_overrides[0]
        assert ov.raw == "təmeɪtoʊ"
        assert ov.word == "tomato"
        assert ov.word_index == 0

    def test_phoneme_tag_without_alphabet(self):
        result = process_ssml('<phoneme ph="wɜrd">word</phoneme>')
        assert result.text == "word"
        assert len(result.phonetic_overrides) == 1

    def test_phoneme_tag_reversed_attributes(self):
        result = process_ssml('<phoneme ph="toʊn" alphabet="ipa">tone</phoneme>')
        assert result.text == "tone"
        assert result.phonetic_overrides[0].raw == "toʊn"

    def test_phoneme_word_index(self):
        result = process_ssml('say <phoneme ph="x">this</phoneme> now')
        assert result.text == "say this now"
        assert result.phonetic_overrides[0].word_index == 1

    def test_multiple_phonemes_sorted_by_word_index(self):
        result = process_ssml(
            '<phoneme ph="a">one</phoneme> mid <phoneme ph="b">two</phoneme>'
        )
        assert result.text == "one mid two"
        idx = [o.word_index for o in result.phonetic_overrides]
        assert idx == sorted(idx)
        assert result.phonetic_overrides[0].raw == "a"
        assert result.phonetic_overrides[1].raw == "b"

    def test_phoneme_token_splitting(self):
        spaced = process_ssml('<phoneme ph="t ə m">x</phoneme>')
        assert spaced.phonetic_overrides[0].tokens == ["t", "ə", "m"]
        solid = process_ssml('<phoneme ph="təm">x</phoneme>')
        assert solid.phonetic_overrides[0].tokens == ["təm"]
        assert solid.phonetic_overrides[0].scalar_tokens == ["t", "ə", "m"]

    def test_sub_tag(self):
        result = process_ssml('<sub alias="World Health Organization">WHO</sub> says')
        assert result.text == "World Health Organization says"
        assert result.phonetic_overrides == []

    def test_say_as_tag(self):
        result = process_ssml('<say-as interpret-as="cardinal">42</say-as>')
        assert result.text == "forty-two"

    def test_say_as_with_format(self):
        result = process_ssml(
            '<say-as interpret-as="date" format="ymd">2024-01-15</say-as>'
        )
        assert "January" in result.text

    def test_say_as_reversed_attributes(self):
        result = process_ssml(
            '<say-as format="ymd" interpret-as="date">2024-01-15</say-as>'
        )
        assert "January" in result.text

    def test_multiple_tags(self):
        result = process_ssml(
            '<sub alias="Doctor">Dr.</sub> saw <say-as interpret-as="cardinal">3</say-as>'
        )
        assert result.text == "Doctor saw three"

    def test_case_insensitive(self):
        result = process_ssml('<SUB ALIAS="Doctor">Dr.</SUB>')
        assert result.text == "Doctor"

    def test_single_quotes(self):
        result = process_ssml("<sub alias='Doctor'>Dr.</sub>")
        assert result.text == "Doctor"

    def test_no_tags_passthrough(self):
        result = process_ssml("plain text, no tags")
        assert result.text == "plain text, no tags"
        assert result.phonetic_overrides == []

    def test_adjacent_tags(self):
        result = process_ssml(
            '<say-as interpret-as="cardinal">1</say-as><say-as interpret-as="cardinal">2</say-as>'
        )
        assert result.text == "onetwo"

    def test_unicode_content(self):
        result = process_ssml('<sub alias="café">caffeine</sub>')
        assert result.text == "café"

    def test_whitespace_in_content(self):
        result = process_ssml('<sub alias="a b">x y</sub>')
        assert result.text == "a b"

    def test_newline_outside_tags(self):
        result = process_ssml('line one\n<say-as interpret-as="cardinal">2</say-as>')
        assert result.text == "line one\ntwo"


class TestMalformedTags:
    """Malformed tags do not match the tag regexes and pass through."""

    def test_phoneme_no_closing_tag(self):
        text = '<phoneme ph="x">word'
        assert process_ssml(text).text == text

    def test_phoneme_no_ph_attribute(self):
        text = '<phoneme alphabet="ipa">word</phoneme>'
        result = process_ssml(text)
        assert result.phonetic_overrides == []
        assert result.text == text

    def test_sub_no_alias(self):
        text = '<sub foo="bar">word</sub>'
        assert process_ssml(text).text == text

    def test_say_as_no_interpret_as(self):
        text = '<say-as format="mdy">1/2/3</say-as>'
        assert process_ssml(text).text == text

    def test_empty_content(self):
        result = process_ssml('<sub alias="X"></sub>')
        assert result.text == "X"

    def test_nested_angle_brackets_not_matched(self):
        text = '<phoneme ph="x"><inner></phoneme>'
        # content may not contain '<' — the tag regex rejects this
        result = process_ssml(text)
        assert result.phonetic_overrides == []

    def test_partial_tag(self):
        text = "<phoneme"
        assert process_ssml(text).text == text

    def test_just_opening_bracket(self):
        assert process_ssml("<").text == "<"

    def test_mismatched_tags(self):
        text = '<phoneme ph="x">word</sub>'
        result = process_ssml(text)
        assert result.phonetic_overrides == []

    def test_mixed_valid_and_invalid(self):
        result = process_ssml('<sub alias="OK">a</sub> <phoneme>broken')
        assert result.text == "OK <phoneme>broken"

    def test_html_entities_passthrough(self):
        text = "&lt;sub&gt;"
        assert process_ssml(text).text == text


class TestSpellOutNumber:
    @pytest.mark.parametrize(
        "n,expected",
        [
            (0, "zero"),
            (13, "thirteen"),
            (21, "twenty-one"),
            (100, "one hundred"),
            (123, "one hundred twenty-three"),
            (1000, "one thousand"),
            (1000000, "one million"),
        ],
    )
    def test_values(self, n, expected):
        assert spell_out_number(n) == expected


class TestSegmentProcessor:
    def test_breaks_and_say_as_still_work(self):
        segs = SSMLProcessor().process(
            '<speak>one<break time="250ms"/>two</speak>'
        )
        assert len(segs) == 2
        assert segs[0].break_after_seconds == pytest.approx(0.25)

    def test_say_as_inside_segments_uses_reference_interpreter(self):
        segs = SSMLProcessor().process(
            '<speak><say-as interpret-as="ordinal">21</say-as></speak>'
        )
        assert segs[0].text == "twenty-first"
