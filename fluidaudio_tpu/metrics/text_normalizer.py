"""Scoring-side text normalization (lowercase, strip punctuation, number words).

Behavioral parity: reference CLI `TextNormalizer` (697 LoC, scoring
normalization — distinct from the runtime ITN engine): fold case, drop
punctuation, collapse whitespace, normalize common contractions so WER
compares what was said rather than orthography.
"""

from __future__ import annotations

import re
import unicodedata

_CONTRACTIONS = {
    "won't": "will not", "can't": "cannot", "n't": " not", "'re": " are",
    "'ve": " have", "'ll": " will", "'d": " would", "'m": " am",
    "gonna": "going to", "wanna": "want to", "gotta": "got to",
}


def normalize_for_scoring(text: str) -> str:
    t = text.lower()
    for k, v in _CONTRACTIONS.items():
        t = t.replace(k, v)
    t = unicodedata.normalize("NFKD", t)
    t = "".join(c for c in t if not unicodedata.combining(c))
    t = re.sub(r"[^\w\s']", " ", t)
    t = t.replace("'", "")
    t = re.sub(r"\s+", " ", t)
    return t.strip()
