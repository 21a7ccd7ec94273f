"""TTS text normalization + SSML processing."""

import pytest

from fluidaudio_tpu.tts.ssml import SSMLProcessor, interpret_say_as
from fluidaudio_tpu.tts.text_normalizer import (
    normalize_for_tts,
    number_to_words,
    ordinal_to_words,
    year_to_words,
)


class TestNumberWords:
    def test_basic(self):
        assert number_to_words(0) == "zero"
        assert number_to_words(17) == "seventeen"
        assert number_to_words(42) == "forty two"
        assert number_to_words(105) == "one hundred five"
        assert number_to_words(3200) == "three thousand two hundred"
        assert number_to_words(-5) == "minus five"

    def test_ordinals(self):
        assert ordinal_to_words(1) == "first"
        assert ordinal_to_words(22) == "twenty second"
        assert ordinal_to_words(30) == "thirtieth"
        assert ordinal_to_words(100) == "one hundredth"

    def test_years(self):
        assert year_to_words(1984) == "nineteen eighty four"
        assert year_to_words(1905) == "nineteen oh five"
        assert year_to_words(2007) == "two thousand seven"
        assert year_to_words(2024) == "twenty twenty four"

    def test_normalize_for_tts(self):
        assert normalize_for_tts("I have 3 cats") == "I have three cats"
        assert normalize_for_tts("$25") == "twenty five dollars"
        assert normalize_for_tts("50%") == "fifty percent"
        assert normalize_for_tts("the 3rd time") == "the third time"
        assert normalize_for_tts("pi is 3.14") == "pi is three point one four"
        assert "nineteen ninety nine" in normalize_for_tts("born in 1999")


class TestSsml:
    def test_plain_text_passthrough(self):
        segs = SSMLProcessor().process("hello world")
        assert len(segs) == 1 and segs[0].text == "hello world"

    def test_break_splits_segments(self):
        segs = SSMLProcessor().process(
            '<speak>first part<break time="500ms"/>second part</speak>'
        )
        assert len(segs) == 2
        assert segs[0].break_after_seconds == pytest.approx(0.5)
        assert segs[1].text == "second part"

    def test_say_as(self):
        # Reference SayAsInterpreter: literal character spacing, hyphenated
        # spell-out (SSMLTests.swift testInterpretSpellOut/Cardinal).
        assert interpret_say_as("abc", "characters") == "a b c"
        assert interpret_say_as("911", "digits") == "nine one one"
        assert interpret_say_as("42", "cardinal") == "forty-two"
        assert interpret_say_as("3", "ordinal") == "third"
        segs = SSMLProcessor().process(
            '<speak>dial <say-as interpret-as="telephone">555 1212</say-as> now</speak>'
        )
        assert "five five five one two one two" in segs[0].text

    def test_sub_alias(self):
        segs = SSMLProcessor().process(
            '<speak><sub alias="World Health Organization">WHO</sub> says</speak>'
        )
        assert segs[0].text.startswith("World Health Organization")

    def test_prosody_rate(self):
        segs = SSMLProcessor().process(
            '<speak>normal <prosody rate="fast">quick part</prosody> end</speak>'
        )
        rates = [s.rate for s in segs if s.text]
        assert 1.25 in rates and 1.0 in rates
