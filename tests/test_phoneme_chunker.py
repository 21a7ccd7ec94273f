"""Shared phoneme-string chunker — ports PhonemeChunkerTests.swift (issue #712)."""

from fluidaudio_tpu.tts.phoneme_chunker import chunk_phonemes


def test_within_cap_returns_single_trimmed_chunk():
    assert chunk_phonemes("hello world", 100) == ["hello world"]
    assert chunk_phonemes("  hello world  ", 100) == ["hello world"]


def test_blank_input_returns_empty():
    assert chunk_phonemes("", 100) == []
    assert chunk_phonemes("   ", 100) == []


def test_exactly_at_cap_is_not_split():
    text = "a" * 10
    assert chunk_phonemes(text, 10) == [text]


def test_splits_at_whitespace_without_breaking_words():
    text = "aaaaa bbbbb ccccc ddddd"
    chunks = chunk_phonemes(text, 12)
    assert all(len(p) <= 12 for p in chunks)
    assert " ".join(chunks) == text


def test_every_chunk_within_cap():
    words = " ".join(f"w{i}" for i in range(60))
    chunks = chunk_phonemes(words, 20)
    assert len(chunks) > 1
    for piece in chunks:
        assert len(piece) <= 20
        assert piece == piece.strip()


def test_prefers_latest_boundary_to_fill_chunks():
    chunks = chunk_phonemes("one two three four", 9)
    assert chunks[0] == "one two"


def test_punctuation_stays_with_preceding_chunk():
    chunks = chunk_phonemes("hello there, friend over yonder", 14)
    assert chunks[0] == "hello there,"


def test_hard_splits_word_longer_than_cap():
    assert chunk_phonemes("x" * 25, 10) == ["x" * 10, "x" * 10, "x" * 5]


def test_reassembly_preserves_all_non_whitespace_content():
    text = "the quick brown fox jumps over the lazy dog repeatedly today"
    chunks = chunk_phonemes(text, 13)
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")
