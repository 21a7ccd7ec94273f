"""Conservative English raw-text normalizer parity suite.

Ports the reference's `Tests/FluidAudioTests/TTS/Shared/
EnglishTextNormalizerTests.swift` (issue #711): strict standalone
numbers/ordinals/decimals/12-hour meridiem times are spelled out;
ambiguous or structured forms pass through unchanged.
"""

import pytest

from fluidaudio_tpu.tts.text_normalizer import english_normalize


@pytest.mark.parametrize(
    "text,expected",
    [
        # standalone forms rewritten
        ("I am 26 years old.", "I am twenty six years old."),
        ("100", "one hundred"),
        ("Today is June 13th.", "Today is June thirteenth."),
        ("the 21st", "the twenty first"),
        ("The score is 3.14.", "The score is three point one four."),
        ("0.5", "zero point five"),
        ("Agent 007", "Agent zero zero seven"),
        ("The current time is 1:49 PM.", "The current time is one forty nine p m."),
        ("1:49 p.m.", "one forty nine p m"),
        ("meet at 9:00 AM", "meet at nine o'clock a m"),
        ("3:05 pm", "three oh five p m"),
        (
            "At 1:49 PM on the 13th I scored 3.14 in 26 tries.",
            "At one forty nine p m on the thirteenth I scored "
            "three point one four in twenty six tries.",
        ),
        # boundary details
        ("I scored 26.", "I scored twenty six."),
        ("pi is 3.14, roughly", "pi is three point one four, roughly"),
        # ambiguous / structured forms unchanged
        ("Install 1.2.3 now", "Install 1.2.3 now"),
        ("It costs 1,234 dollars", "It costs 1,234 dollars"),
        ("word26 and 26word", "word26 and 26word"),
        ("ratio 1:49 here", "ratio 1:49 here"),
        ("1:99 PM", "1:99 PM"),
        ("13:49", "13:49"),
        ("13:49 PM", "13:49 PM"),
        ("1th", "1th"),
        ("2th", "2th"),
        ("13st", "13st"),
        ("v3.14.2", "v3.14.2"),
        ("Hello world", "Hello world"),
        ("", ""),
    ],
)
def test_english_normalize(text, expected):
    assert english_normalize(text) == expected
