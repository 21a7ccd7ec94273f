"""Supertonic3 text chunker + unicode preprocessor parity.

Mirrors reference `Tests/.../TTS/Supertonic3/Supertonic3TextChunkerTests.swift`
and `Supertonic3UnicodeProcessorTests.swift` (the host-side preprocessing
cascade: paragraphs → abbreviation-aware sentences → commas → words).
"""

from fluidaudio_tpu.tts.supertonic_manager import chunk_text, preprocess_text

# --------------------------------------------------------------------------
# chunk_text
# --------------------------------------------------------------------------


def test_empty_input_returns_no_chunks():
    assert chunk_text("", 110) == []
    assert chunk_text("   \n   ", 110) == []


def test_short_input_returns_single_chunk_unchanged():
    assert chunk_text("Hello there.", 110) == ["Hello there."]


def test_input_at_maxlen_boundary_fits_in_one_chunk():
    text = "a" * 110
    chunks = chunk_text(text, 110)
    assert len(chunks) == 1 and len(chunks[0]) == 110


def test_sentences_are_combined_up_to_maxlen():
    assert chunk_text("One. Two. Three. Four.", 110) == ["One. Two. Three. Four."]


def test_long_sentence_triggers_boundary_split():
    a = "a" * 60 + "."
    b = "b" * 60 + "."
    chunks = chunk_text(f"{a} {b}", 80)
    assert len(chunks) == 2
    assert all(len(c) <= 80 for c in chunks)


def test_abbreviation_does_not_split_mid_sentence():
    chunks = chunk_text("Dr. Smith arrived early. Then he left.", 110)
    assert len(chunks) == 1
    assert "Dr. Smith" in chunks[0] and "Then he left." in chunks[0]


def test_abbreviation_kept_within_packed_sentence_under_split():
    # even when the paragraph must split, "Dr." stays glued to its sentence
    filler = "x" * 50 + "."
    chunks = chunk_text(f"Dr. Smith arrived early. {filler}", 40)
    assert any("Dr. Smith arrived early." in c for c in chunks)


def test_long_sentence_falls_back_to_comma_boundaries():
    sentence = ", ".join("x" * 18 for _ in range(6)) + "."
    chunks = chunk_text(sentence, 50)
    assert len(chunks) > 1
    assert all(len(c) <= 50 for c in chunks)


def test_very_long_comma_free_run_falls_back_to_word_boundaries():
    sentence = " ".join(["word"] * 40) + "."
    chunks = chunk_text(sentence, 30)
    assert len(chunks) > 1
    assert all(len(c) <= 30 for c in chunks)


def test_paragraphs_are_split_on_blank_lines():
    chunks = chunk_text("First paragraph.\n\nSecond paragraph.", 110)
    assert chunks == ["First paragraph.", "Second paragraph."]


def test_oversized_single_word_is_hard_cut():
    # stricter than the reference (which can emit an over-long chunk here):
    # the encoder's fixed char buffer would silently drop the tail otherwise
    chunks = chunk_text("a" * 75, 30)
    assert all(len(c) <= 30 for c in chunks)
    assert "".join(chunks) == "a" * 75


# --------------------------------------------------------------------------
# preprocess_text (UnicodeProcessor)
# --------------------------------------------------------------------------


def test_wraps_text_with_lang_tags_and_appends_period():
    assert preprocess_text("hello", "en") == "<en>hello.</en>"
    assert preprocess_text("hello world", "en").endswith(".</en>")


def test_does_not_append_period_when_already_terminated():
    assert preprocess_text("hello!", "en") == "<en>hello!</en>"
    assert preprocess_text("hello?", "en") == "<en>hello?</en>"
    assert preprocess_text("hello.", "en") == "<en>hello.</en>"


def test_strips_emoji_codepoints():
    out = preprocess_text("hi \U0001F600 there", "en")
    assert "\U0001F600" not in out
    assert "hi" in out and "there" in out


def test_replaces_smart_quotes_and_dashes():
    out = preprocess_text("she said “hi” — then left", "en")
    assert "“" not in out and "”" not in out and "—" not in out
    assert '"' in out and "-" in out


def test_expands_at_symbol_and_common_abbreviations():
    out = preprocess_text("ping me @ ten, e.g., now", "en")
    assert " at " in out
    assert "for example," in out


def test_drops_decorative_symbols():
    out = preprocess_text("love ♥ you ☆", "en")
    assert "♥" not in out and "☆" not in out


def test_collapses_repeated_quotes_and_whitespace():
    out = preprocess_text("hello   ''world''", "en")
    assert "  " not in out
    assert "''" not in out
