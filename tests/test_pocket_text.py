"""PocketTTS text-preprocessing scenario parity suite.

Ports the reference's `Tests/FluidAudioTests/TTS/PocketTTS/
PocketTtsStreamingTests.swift` (issue #584): smart-quote normalization,
normalize_text full-sentence vs mid-sentence behavior (capitalization,
terminal punctuation, short-text padding and frame budgets), sentence
splitting with abbreviation/initial/digit guards, clause/word-boundary
splitting with orphan-tail donation, and chunk metadata grouping.
"""

from __future__ import annotations

from fluidaudio_tpu.tts.pocket_text import (
    LONG_TEXT_EXTRA_FRAMES,
    SHORT_TEXT_PAD_FRAMES,
    TextChunk,
    chunk_text_with_metadata,
    normalize_for_language,
    normalize_smart_quotes,
    normalize_text,
    split_at_clause_boundaries,
    split_at_word_boundaries,
    split_sentences,
)


def word_tokens(text: str) -> int:
    """Tokenizer stand-in: one token per word."""
    return len([w for w in text.split(" ") if w])


class TestNormalizeText:
    def test_adds_terminal_punctuation(self):
        text, _ = normalize_text("Hello world")
        assert text.endswith(".")

    def test_preserves_existing_punctuation(self):
        text, _ = normalize_text("Hello world!")
        assert text.endswith("!") and not text.endswith("!.")

    def test_capitalizes_first_letter(self):
        text, _ = normalize_text("hello")
        assert "H" in text

    def test_short_text_padding(self):
        text, frames = normalize_text("Hi")
        assert text.startswith(" ")
        assert frames == SHORT_TEXT_PAD_FRAMES

    def test_long_text_no_extra_padding(self):
        _, frames = normalize_text(
            "This is a longer sentence with more than five words in it"
        )
        assert frames == LONG_TEXT_EXTRA_FRAMES

    def test_strips_trailing_clause_punctuation_full_sentence(self):
        text, _ = normalize_text("Hello there everyone in the room,")
        assert text.endswith(".")
        assert not text.endswith(",.")

    def test_mid_sentence_preserves_case(self):
        text, _ = normalize_text(
            "combustibles, carburants et chauffage", is_mid_sentence=True
        )
        assert text.strip().startswith("c")

    def test_mid_sentence_does_not_append_period(self):
        text, _ = normalize_text("combustibles, carburants,", is_mid_sentence=True)
        trimmed = text.strip()
        assert trimmed.endswith(",") and not trimmed.endswith(".")

    def test_mid_sentence_preserves_preposition(self):
        text, _ = normalize_text("stations-service de", is_mid_sentence=True)
        assert text.strip() == "stations-service de"

    def test_mid_sentence_short_chunk_skips_leading_padding(self):
        orphan, _ = normalize_text(
            "stations-service de", is_mid_sentence=True, language="french24L"
        )
        assert not orphan.startswith(" ")
        clause, _ = normalize_text(
            "d'aboutir à une trêve", is_mid_sentence=True, language="french24L"
        )
        assert not clause.startswith(" ")

    def test_mid_sentence_short_chunk_uses_long_text_frames(self):
        _, frames = normalize_text(
            "stations-service de", is_mid_sentence=True, language="french24L"
        )
        assert frames == LONG_TEXT_EXTRA_FRAMES

    def test_full_sentence_short_chunk_still_pads(self):
        text, frames = normalize_text("Hi there", is_mid_sentence=False)
        assert text.startswith(" ")
        assert frames == SHORT_TEXT_PAD_FRAMES

    def test_mid_sentence_long_chunk_unchanged(self):
        text, frames = normalize_text(
            "qu'elle juge déloyal en raison de la concurrence",
            is_mid_sentence=True, language="french24L",
        )
        assert not text.startswith(" ")
        assert frames == LONG_TEXT_EXTRA_FRAMES

    def test_inline_smart_quotes_removed(self):
        text, _ = normalize_text("Il n’a pas pu d’aboutir.")
        assert "’" not in text
        assert "n'a" in text and "d'aboutir" in text

    def test_collapses_whitespace(self):
        text, _ = normalize_text("Hello   there   friend of mine today")
        assert "  " not in text


class TestSmartQuotesAndLanguage:
    def test_replaces_u2019(self):
        assert (
            normalize_smart_quotes("Avant d’aboutir, c’est fini.")
            == "Avant d'aboutir, c'est fini."
        )

    def test_replaces_all_quote_variants(self):
        assert normalize_smart_quotes("‘hello’ and “world”") == "'hello' and \"world\""

    def test_english_language_noop(self):
        assert normalize_for_language("«quoted»", "english") == "«quoted»"

    def test_french_replaces_guillemets(self):
        assert normalize_for_language("«mot»", "french24L") == '"mot"'

    def test_french_replaces_nbsp(self):
        assert normalize_for_language("bonjour !", "french24L") == "bonjour !"

    def test_french_replaces_narrow_nbsp(self):
        assert normalize_for_language("35 000", "french24L") == "35 000"


class TestSplitSentences:
    def test_splits_at_periods(self):
        sentences = split_sentences("Hello world. How are you?")
        assert len(sentences) == 2
        assert sentences[0].endswith(".")
        assert sentences[1].endswith("?")

    def test_handles_abbreviations(self):
        assert len(split_sentences("Dr. Smith arrived.")) == 1

    def test_single_uppercase_initial(self):
        assert len(split_sentences("J. Smith arrived.")) == 1

    def test_digit_adjacent_period(self):
        assert len(split_sentences("Scored 3.5 points today.")) == 1

    def test_no_split_on_smart_apostrophe(self):
        normalized = normalize_smart_quotes(
            "Avant d’aboutir nous devons l’essayer."
        )
        assert len(split_sentences(normalized)) == 1

    def test_no_split_on_raw_u2019(self):
        assert len(split_sentences("Avant d’aboutir nous devons l’essayer")) == 1

    def test_trailing_fragment_kept(self):
        sentences = split_sentences("Complete sentence. trailing fragment")
        assert sentences[-1] == "trailing fragment"

    def test_french_civility_abbreviations(self):
        sentences = split_sentences("M. Dupont est arrivé.", language="french24L")
        assert len(sentences) == 1

    def test_french_reference_abbreviations(self):
        sentences = split_sentences(
            "Voir p. 12 pour les détails.", language="french24L"
        )
        assert len(sentences) == 1

    def test_issue_584_sample1_single_sentence(self):
        text = normalize_smart_quotes(
            "Sa déclaration intervient après des propos récents de Téhéran "
            "évoquant une proposition susceptible d’aboutir à une trêve, "
            "lancée à la suite des bombardements américains et israéliens "
            "du 28 février."
        )
        sentences = split_sentences(text, language="french24L")
        assert len(sentences) == 1
        assert "d'aboutir" in text and "’" not in text


class TestClauseAndWordSplitting:
    def test_clause_split_at_commas(self):
        parts = split_at_clause_boundaries("combustibles, carburants et chauffage")
        assert len(parts) == 2

    def test_clause_split_preserves_numbers(self):
        assert split_at_clause_boundaries("about 3,500 units") == ["about 3,500 units"]

    def test_issue_584_sample1_two_clauses(self):
        text = (
            "Sa déclaration intervient après des propos récents de Téhéran "
            "évoquant une proposition susceptible d'aboutir à une trêve, "
            "lancée à la suite des bombardements américains et israéliens "
            "du 28 février."
        )
        assert len(split_at_clause_boundaries(text)) == 2

    def test_word_split_respects_budget(self):
        chunks = split_at_word_boundaries(
            "one two three four five six seven eight", word_tokens, 3
        )
        assert all(word_tokens(c) <= 3 for c in chunks)
        assert " ".join(chunks) == "one two three four five six seven eight"

    def test_word_split_donates_to_orphan_tail(self):
        # 7 words, budget 3 -> greedy [3,3,1]; donation makes the tail 2.
        chunks = split_at_word_boundaries(
            "alpha beta gamma delta epsilon zeta eta", word_tokens, 3
        )
        assert len(chunks[-1].split(" ")) >= 2

    def test_single_word_returned_as_is(self):
        assert split_at_word_boundaries("single", word_tokens, 3) == ["single"]


class TestChunkMetadata:
    def test_single_chunk_never_mid_sentence(self):
        chunks = chunk_text_with_metadata("Short text.", word_tokens, max_tokens=50)
        assert chunks == [TextChunk("Short text.", False)]

    def test_sentences_grouped_within_budget(self):
        chunks = chunk_text_with_metadata(
            "One two three. Four five six. Seven eight nine.",
            word_tokens, max_tokens=7,
        )
        assert all(word_tokens(c.text) <= 7 for c in chunks)
        assert all(not c.is_mid_sentence for c in chunks)

    def test_oversized_sentence_produces_mid_sentence_pieces(self):
        text = "alpha beta gamma, delta epsilon zeta, eta theta iota kappa"
        chunks = chunk_text_with_metadata(text, word_tokens, max_tokens=4)
        assert len(chunks) >= 2
        assert not chunks[0].is_mid_sentence
        assert any(c.is_mid_sentence for c in chunks[1:])

    def test_mid_sentence_pieces_do_not_merge_with_sentence_starts(self):
        text = (
            "alpha beta gamma delta epsilon zeta eta theta. Short one."
        )
        chunks = chunk_text_with_metadata(text, word_tokens, max_tokens=4)
        flags = [c.is_mid_sentence for c in chunks]
        # A sentence-start chunk never absorbs a mid-sentence continuation.
        for a, b in zip(chunks, chunks[1:]):
            if a.is_mid_sentence != b.is_mid_sentence:
                assert a.text != b.text  # boundary preserved (distinct chunks)
        assert flags[0] is False
