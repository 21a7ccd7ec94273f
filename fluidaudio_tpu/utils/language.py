"""Script-aware token filtering for multilingual decode.

Behavioral parity: reference `Shared/TokenLanguageFilter.swift:4-45`:
`Language` enum (25+ locales) -> `Script` (latin/cyrillic/greek/cjk/...);
script-aware top-K token re-ranking for v3 decode so non-target-script tokens
are demoted, plus an English-word blocklist for non-English Latin languages.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from enum import Enum


class Script(Enum):
    LATIN = "latin"
    CYRILLIC = "cyrillic"
    GREEK = "greek"
    CJK = "cjk"
    ARABIC = "arabic"
    HEBREW = "hebrew"
    DEVANAGARI = "devanagari"
    HANGUL = "hangul"
    KANA = "kana"
    OTHER = "other"


LANGUAGE_SCRIPTS: dict[str, Script] = {
    **{l: Script.LATIN for l in (
        "en es fr it pt de nl pl cs ro hu sv da no fi tr id ms vi ca gl hr sk sl et lv lt".split()
    )},
    **{l: Script.CYRILLIC for l in "ru uk bg sr mk be".split()},
    "el": Script.GREEK,
    "zh": Script.CJK,
    "ja": Script.KANA,
    "ko": Script.HANGUL,
    "ar": Script.ARABIC,
    "he": Script.HEBREW,
    "hi": Script.DEVANAGARI,
}


def char_script(ch: str) -> Script:
    if not ch.isalpha():
        return Script.OTHER
    try:
        name = unicodedata.name(ch)
    except ValueError:
        return Script.OTHER
    if "CJK" in name or "IDEOGRAPH" in name:
        return Script.CJK
    for script in ("LATIN", "CYRILLIC", "GREEK", "ARABIC", "HEBREW", "DEVANAGARI",
                   "HANGUL"):
        if script in name:
            return Script[script]
    if "HIRAGANA" in name or "KATAKANA" in name:
        return Script.KANA
    return Script.OTHER


@dataclass
class TokenLanguageFilter:
    """Precomputes which token ids belong to a language's script."""

    language: str
    vocabulary: dict[int, str]
    english_blocklist: frozenset[str] = frozenset(
        "the and you that was for are with this have".split()
    )

    def __post_init__(self):
        self.script = LANGUAGE_SCRIPTS.get(self.language, Script.LATIN)
        self.allowed: set[int] = set()
        for tid, piece in self.vocabulary.items():
            core = piece.replace("▁", "").strip()
            if not core or all(not c.isalpha() for c in core):
                self.allowed.add(tid)  # punctuation/markers always allowed
                continue
            scripts = {char_script(c) for c in core if c.isalpha()}
            if self.script in scripts or scripts <= {Script.OTHER}:
                # English blocklist: demote common English words when the
                # target is non-English Latin
                if (
                    self.script is Script.LATIN
                    and self.language != "en"
                    and core.lower() in self.english_blocklist
                ):
                    continue
                self.allowed.add(tid)

    def rerank_top_k(self, token_ids: list[int], scores: list[float]) -> int:
        """Best allowed token from a top-K candidate list (fallback: argmax)."""
        best, best_score = None, float("-inf")
        for tid, s in zip(token_ids, scores):
            if tid in self.allowed and s > best_score:
                best, best_score = tid, s
        if best is not None:
            return best
        return token_ids[int(max(range(len(scores)), key=lambda i: scores[i]))]
