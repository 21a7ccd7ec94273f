"""Vocabulary rescoring: splice boosted terms into the TDT token stream.

Behavioral parity: reference `CustomVocabulary/Rescorer/VocabularyRescorer*`
(~2k LoC): BK-tree fuzzy candidate match per hypothesis word, Levenshtein
similarity gating (per-term or size-aware default), word-boundary-aware splice
of the corrected token ids, and confirmation boosts from CTC keyword spots.
"""

from __future__ import annotations

from dataclasses import dataclass

from fluidaudio_tpu.asr.chunk import TokenWindow
from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.asr.custom_vocab.bktree import _edit_distance
from fluidaudio_tpu.asr.custom_vocab.context import CustomVocabularyContext, VocabularyTerm
from fluidaudio_tpu.asr.custom_vocab.ctc_spotter import KeywordSpot
from fluidaudio_tpu.asr.tokenizer import Tokenizer

_WB = ASRConstants.SENTENCEPIECE_WORD_BOUNDARY

# confirmation from a CTC spot relaxes the similarity gate by this much
_SPOT_SIMILARITY_RELIEF = 0.1


@dataclass
class RescoreResult:
    tokens: list[TokenWindow]
    replacements: list[tuple[str, str]]  # (original word, term text)


class VocabularyRescorer:
    def __init__(self, context: CustomVocabularyContext, tokenizer: Tokenizer):
        self.context = context
        self.tokenizer = tokenizer
        if any(t.tdt_token_ids is None for t in context.terms):
            context.pretokenize(tokenizer)

    def rescore(
        self,
        tokens: list[TokenWindow],
        spots: list[KeywordSpot] | None = None,
    ) -> RescoreResult:
        spotted = {s.keyword.lower() for s in (spots or [])}
        words = self._group_words(tokens)
        out: list[TokenWindow] = []
        replacements: list[tuple[str, str]] = []

        for word_tokens in words:
            word = self._word_text(word_tokens)
            core = word.strip(".,!?;: ").lower()
            replaced = False
            if core:
                for term, sim in self.context.fuzzy_candidates(core):
                    gate = self.context.min_similarity(term)
                    matched_form = self._best_form(core, term)
                    if matched_form.lower() in spotted:
                        gate -= _SPOT_SIMILARITY_RELIEF
                    if sim >= gate and core != term.text.lower() and term.tdt_token_ids:
                        # all spliced tokens share the word's timestamp:
                        # base_ts + i could overrun the NEXT word's frames
                        # and break timestamp monotonicity for consumers
                        base_ts = word_tokens[0].timestamp
                        out.extend(
                            TokenWindow(tid, base_ts, word_tokens[0].confidence)
                            for tid in term.tdt_token_ids
                        )
                        # keep punctuation attached to the original word
                        # ('acme,' -> 'ACME,'): trailing non-word pieces
                        # are not part of the matched core
                        for tok in word_tokens:
                            piece = (self.tokenizer.piece(tok.token) or "").strip(_WB + " ")
                            if piece and all(not c.isalnum() for c in piece):
                                out.append(tok)
                        replacements.append((core, term.text))
                        replaced = True
                    break  # only the best candidate is considered
            if not replaced:
                out.extend(word_tokens)
        return RescoreResult(tokens=out, replacements=replacements)

    def _best_form(self, word: str, term: VocabularyTerm) -> str:
        return min(term.all_forms, key=lambda f: _edit_distance(word, f.lower()))

    def _group_words(self, tokens: list[TokenWindow]) -> list[list[TokenWindow]]:
        words: list[list[TokenWindow]] = []
        for tok in tokens:
            piece = self.tokenizer.piece(tok.token)
            if not words or piece.startswith(_WB) or piece.startswith(" "):
                words.append([tok])
            else:
                words[-1].append(tok)
        return words

    def _word_text(self, word_tokens: list[TokenWindow]) -> str:
        text = "".join(self.tokenizer.piece(t.token) for t in word_tokens)
        return text.replace(_WB, "").strip()
