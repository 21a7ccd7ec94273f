"""Punctuation-aware committed/ghost text splitter for streaming UX.

Behavioral parity: reference `ASR/Shared/PunctuationCommitLayer.swift:4-55`:
partial text accumulates as "ghost" until punctuation (., !, ?) commits it;
a debounce timeout (default 3 s) optionally commits mid-sentence pauses;
explicit EOU and manual commits finalize everything. Python version is
synchronous: the caller supplies a monotonic clock and polls
`check_debounce()` (or calls `process_partial_text` again) instead of the
reference's actor + timer task.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

PUNCTUATION_MARKS = {".", "!", "?"}


@dataclass(frozen=True)
class CommitLayerUpdate:
    committed_text: str
    ghost_text: str
    total_text: str
    last_commit_reason: str | None  # "punctuation:<c>" | "debounce" | "manual" | "eou"
    timestamp: float


class PunctuationCommitLayer:
    def __init__(
        self,
        debounce_timeout: float = 3.0,
        commit_on_timeout: bool = True,
        punctuation_marks: set[str] | None = None,
        clock: Callable[[], float] = time.monotonic,
        on_update: Callable[[CommitLayerUpdate], None] | None = None,
    ):
        self.debounce_timeout = debounce_timeout
        self.commit_on_timeout = commit_on_timeout
        self.punctuation_marks = punctuation_marks or set(PUNCTUATION_MARKS)
        self._clock = clock
        self.on_update = on_update
        self._committed = ""
        self._ghost = ""
        self._last_update = clock()

    # ------------------------------------------------------------------ core

    def _update(self, reason: str | None) -> CommitLayerUpdate:
        total = (
            self._committed + self._ghost
            if self._committed and self._ghost
            else self._committed or self._ghost
        )
        update = CommitLayerUpdate(
            committed_text=self._committed,
            ghost_text=self._ghost,
            total_text=total,
            last_commit_reason=reason,
            timestamp=self._clock(),
        )
        if self.on_update:
            self.on_update(update)
        return update

    def process_partial_text(self, text: str) -> CommitLayerUpdate:
        self._last_update = self._clock()
        last_punc = max(
            (i for i, c in enumerate(text) if c in self.punctuation_marks), default=-1
        )
        if last_punc >= 0:
            commit_end = last_punc + 1
            ghost_start = commit_end
            while ghost_start < len(text) and text[ghost_start].isspace():
                ghost_start += 1
            whitespace = text[commit_end:ghost_start] or " "
            self._committed += text[:commit_end] + whitespace
            self._ghost = text[ghost_start:]
            return self._update(f"punctuation:{text[last_punc]}")
        self._ghost = text
        return self._update(None)

    def check_debounce(self) -> CommitLayerUpdate | None:
        """Commit the ghost when the debounce window expired (poll-based)."""
        if not self._ghost or self._clock() - self._last_update < self.debounce_timeout:
            return None
        if not self.commit_on_timeout:
            return None
        self._committed += self._ghost + " "
        self._ghost = ""
        self._last_update = self._clock()
        return self._update("debounce")

    def process_eou(self) -> CommitLayerUpdate:
        if self._ghost:
            self._committed += self._ghost + " "
            self._ghost = ""
        return self._update("eou")

    def manual_commit(self) -> CommitLayerUpdate:
        if self._ghost:
            self._committed += self._ghost + " "
            self._ghost = ""
        return self._update("manual")

    def reset(self) -> None:
        self._committed = ""
        self._ghost = ""
        self._last_update = self._clock()
