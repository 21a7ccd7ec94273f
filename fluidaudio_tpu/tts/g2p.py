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


# --------------------------------------------------------------------------
# Multilingual seq2seq G2P (charsiu ByT5 analog)
# --------------------------------------------------------------------------

# language code -> prefix token offset (reference MultilingualG2PModel.swift:9
# conditions CharsiuG2P with a "<lang>: " prompt; here a learned prefix token)
G2P_LANGUAGES = {
    code: i for i, code in enumerate([
        "eng-us", "eng-uk", "fra", "deu", "spa", "ita", "por", "nld",
        "pol", "rus", "ukr", "ces", "slk", "ron", "hun", "bul", "ell",
        "tur", "ara", "heb", "hin", "ben", "tam", "tha", "vie", "ind",
        "msa", "jpn", "kor", "cmn", "yue", "swe", "nor", "dan", "fin",
    ])
}


class MultilingualG2P:
    """Batched multilingual word phonemizer over the byte-level seq2seq.

    Behavioral parity: reference `G2P/MultilingualG2PModel.swift:9`
    (ByT5 CharsiuG2P actor singleton with per-language prompts + result
    cache). Words batch into one jitted greedy decode; phoneme ids map to
    IPA codepoints via the model's output table. Without trained weights
    (registry cache empty) outputs are untrained-model noise — the API,
    batching, and caching layers are what this class pins down.
    """

    def __init__(self, params=None, rng_seed: int = 0):
        import jax
        import jax.numpy as jnp

        from fluidaudio_tpu.models.g2p_seq2seq import (
            G2P_BASE, G2pSeq2Seq, MAX_WORD_BYTES,
        )

        self.model = G2pSeq2Seq(G2P_BASE)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, MAX_WORD_BYTES), jnp.int32),
                jnp.ones((1,), jnp.int32),
                jnp.zeros((1, 4), jnp.int32),
            )
        self.params = params
        self._cache: dict[tuple[str, str], str] = {}

    # phoneme id -> IPA char: ids 3.. map to a compact IPA codepoint table
    _IPA_TABLE = (
        "abcdefghijklmnopqrstuvwxyz"
        "æɑɒɔəɚɛɜɝɪɨʊʉʌʏøœɶɐɯɤeiouy"
        "ŋɲɳɴʃʒʂʐɕʑçʝxɣχʁħʕhɦθðszfvɸβ"
        "pbtdkɡqɢʔmɱnɾrʀʙlɫʎʟjwɥɹɻˈˌːˑ̃"
    )

    def _ids_to_ipa(self, ids) -> str:
        from fluidaudio_tpu.models.g2p_seq2seq import BOS, EOS, PAD

        out = []
        for i in ids:
            i = int(i)
            if i in (BOS, PAD):
                continue
            if i == EOS:
                break
            idx = i - 3
            if 0 <= idx < len(self._IPA_TABLE):
                out.append(self._IPA_TABLE[idx])
        return "".join(out)

    def phonemize_words(self, words: list[str], language: str = "eng-us") -> list[str]:
        """Batch-phonemize; per-(word, language) results are cached."""
        import jax.numpy as jnp
        import numpy as np

        from fluidaudio_tpu.models.g2p_seq2seq import encode_word, g2p_greedy_decode

        lang_id = G2P_LANGUAGES.get(language)
        if lang_id is None:
            raise ValueError(f"unknown G2P language {language!r}; "
                             f"see G2P_LANGUAGES ({len(G2P_LANGUAGES)} codes)")
        todo = [w for w in words if (w, language) not in self._cache]
        if todo:
            rows, lens = zip(*(encode_word(w, language_prefix=lang_id) for w in todo))
            tokens, counts = g2p_greedy_decode(
                self.model, self.params,
                jnp.asarray(np.stack(rows)), jnp.asarray(np.array(lens, np.int32)),
            )
            for w, row in zip(todo, np.asarray(tokens)):
                self._cache[(w, language)] = self._ids_to_ipa(row)
        return [self._cache[(w, language)] for w in words]

    def phonemize(self, text: str, language: str = "eng-us") -> str:
        words = [w for w in re.split(r"[^\w']+", text.lower()) if w]
        return " ".join(self.phonemize_words(words, language))
