"""English grapheme-to-phoneme: lexicon + rule fallback.

Behavioral parity: reference Kokoro G2P path (`KokoroAne/G2P/`): Misaki
lexicon lookup with a BART seq2seq fallback per OOV word. Here: a built-in
mini-lexicon + deterministic letter-to-sound rules as the fallback; the
registry can supply a full lexicon JSON (`lexicon.json`: word -> IPA) and a
learned seq2seq fallback can be slotted in later (charsiu ByT5 analog).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

# minimal seed lexicon (IPA) — full lexicon loads from assets when cached
_SEED_LEXICON = {
    "the": "ðə", "a": "ə", "and": "ænd", "to": "tu", "of": "ʌv", "in": "ɪn",
    "is": "ɪz", "you": "ju", "that": "ðæt", "it": "ɪt", "he": "hi",
    "she": "ʃi", "was": "wʌz", "for": "fɔɹ", "are": "ɑɹ", "with": "wɪθ",
    "his": "hɪz", "they": "ðeɪ", "this": "ðɪs", "have": "hæv", "be": "bi",
    "not": "nɑt", "hello": "həˈloʊ", "world": "wɝld", "speech": "spitʃ",
    "test": "tɛst", "audio": "ˈɔdioʊ", "one": "wʌn", "two": "tu",
    "three": "θɹi", "four": "fɔɹ", "five": "faɪv",
}

# letter-to-sound fallback rules (digraphs first, longest match wins)
_RULES = [
    ("tion", "ʃən"), ("ough", "oʊ"), ("igh", "aɪ"), ("tch", "tʃ"),
    ("ch", "tʃ"), ("sh", "ʃ"), ("th", "θ"), ("ph", "f"), ("wh", "w"),
    ("ng", "ŋ"), ("ck", "k"), ("qu", "kw"), ("ee", "i"), ("oo", "u"),
    ("ea", "i"), ("ai", "eɪ"), ("ay", "eɪ"), ("ou", "aʊ"), ("ow", "oʊ"),
    ("oi", "ɔɪ"), ("oy", "ɔɪ"), ("ar", "ɑɹ"), ("er", "ɝ"), ("ir", "ɝ"),
    ("or", "ɔɹ"), ("ur", "ɝ"),
    ("a", "æ"), ("b", "b"), ("c", "k"), ("d", "d"), ("e", "ɛ"), ("f", "f"),
    ("g", "ɡ"), ("h", "h"), ("i", "ɪ"), ("j", "dʒ"), ("k", "k"), ("l", "l"),
    ("m", "m"), ("n", "n"), ("o", "ɑ"), ("p", "p"), ("r", "ɹ"), ("s", "s"),
    ("t", "t"), ("u", "ʌ"), ("v", "v"), ("w", "w"), ("x", "ks"),
    ("y", "j"), ("z", "z"),
]


class EnglishG2P:
    def __init__(self, lexicon_path: str | Path | None = None):
        self.lexicon = dict(_SEED_LEXICON)
        if lexicon_path and Path(lexicon_path).exists():
            self.lexicon.update(json.loads(Path(lexicon_path).read_text()))

    def word_to_phonemes(self, word: str) -> str:
        w = word.lower()
        if w in self.lexicon:
            return self.lexicon[w]
        out = []
        i = 0
        while i < len(w):
            for graph, phon in _RULES:
                if w.startswith(graph, i):
                    out.append(phon)
                    i += len(graph)
                    break
            else:
                i += 1  # drop unknown characters
        return "".join(out)

    def phonemize(self, text: str) -> str:
        """Text -> space-separated word phoneme string with punctuation kept."""
        parts = re.findall(r"[A-Za-z']+|[^\sA-Za-z']", text)
        phon = []
        for p in parts:
            if re.match(r"[A-Za-z']", p):
                phon.append(self.word_to_phonemes(p))
            else:
                phon.append(p)
        return " ".join(phon)
