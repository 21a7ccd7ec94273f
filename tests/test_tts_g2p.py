"""Multilingual seq2seq G2P wrapper: batching, caching, language prefixes."""

import json

import pytest


class TestMultilingualG2P:
    @pytest.fixture(scope="class")
    def mg2p(self):
        from fluidaudio_tpu.tts.g2p import MultilingualG2P

        return MultilingualG2P()

    def test_batched_decode_and_cache(self, mg2p):
        out = mg2p.phonemize_words(["chat", "eau"], language="fra")
        assert len(out) == 2
        assert all(isinstance(p, str) for p in out)
        # cache hit returns identical strings without recompute
        again = mg2p.phonemize_words(["chat"], language="fra")
        assert again[0] == out[0]
        # different language conditions differently (cache keyed per language)
        assert ("chat", "deu") not in mg2p._cache

    def test_unknown_language_raises(self, mg2p):
        with pytest.raises(ValueError, match="unknown G2P language"):
            mg2p.phonemize_words(["hello"], language="xx-zz")

    def test_text_phonemize_splits_words(self, mg2p):
        out = mg2p.phonemize("hello, world!", language="eng-us")
        assert isinstance(out, str)
        assert len(out.split()) <= 2  # one group per word (may be empty)


class TestEnglishG2PResolution:
    """Reference KokoroAneEnglishPhonemizer word-resolution order."""

    def _g2p(self, tmp_path, **kw):
        from fluidaudio_tpu.tts.g2p import EnglishG2P

        cache = tmp_path / "us_lexicon_cache.json"
        cache.write_text(json.dumps({
            "lower": {"hello": ["h", "ə", "l", "ˈO"], "us": ["ʌ", "s"],
                      "nato": ["n", "ˈA", "t", "O"]},
            "caseSensitive": {"NATO": ["n", "ˈA", "t", "O"],
                              "A": ["ˈA"], "I": ["ˈI"], "U": ["jˈu"],
                              "S": ["ˈɛs"], "F": ["ˈɛf"], "B": ["bˈi"]},
        }))
        g2p = EnglishG2P(**kw)
        assert g2p.load_misaki_cache(cache)
        return g2p

    def test_misaki_case_sensitive_beats_lower(self, tmp_path):
        g2p = self._g2p(tmp_path)
        assert g2p.word_to_phonemes("NATO") == "nˈAtO"
        assert g2p.word_to_phonemes("hello") == "həlˈO"

    def test_letter_name_override_us(self, tmp_path):
        # uppercase US spells as letters; lowercase us keeps the weak form
        g2p = self._g2p(tmp_path)
        assert g2p.word_to_phonemes("US") == "jˈu ˈɛs"
        assert g2p.word_to_phonemes("us") == "ʌs"
        assert g2p.word_to_phonemes("AI") == "ˈA ˈI"

    def test_initialism_spelled_after_miss(self, tmp_path):
        g2p = self._g2p(tmp_path)
        assert g2p.word_to_phonemes("FBI") == "ˈɛf bˈi ˈI"
        # lexicon hit wins over initialism spelling
        assert g2p.word_to_phonemes("NATO") == "nˈAtO"

    def test_custom_lexicon_wins(self, tmp_path):
        g2p = self._g2p(tmp_path, custom_lexicon={"hello": "XXX"})
        assert g2p.word_to_phonemes("hello") == "XXX"

    def test_fallback_called_for_oov(self, tmp_path):
        calls = []

        def fb(w):
            calls.append(w)
            return "ZZ"

        g2p = self._g2p(tmp_path, fallback=fb)
        assert g2p.word_to_phonemes("zyzzyva") == "ZZ"
        assert calls == ["zyzzyva"]

    def test_punctuation_attaches_to_word(self, tmp_path):
        g2p = self._g2p(tmp_path)
        out = g2p.phonemize("hello, us!")
        assert out == "həlˈO, ʌs!"

    def test_split_words_contractions(self):
        from fluidaudio_tpu.tts.g2p import split_words

        assert split_words("don't stop, 'cause twenty-one!") == [
            "don't", "stop", ",", "'cause", "twenty-one", "!",
        ]


def test_multilingual_g2p_byt5_checkpoint_path(tmp_path):
    """With a converted ByT5 checkpoint cached, MultilingualG2P uses the
    real CharsiuG2P architecture and prompt format end-to-end."""
    import jax
    import numpy as np

    from fluidaudio_tpu.models.byt5_g2p import BYT5_TEST, ByT5G2P
    from fluidaudio_tpu.tts.g2p import MultilingualG2P
    from fluidaudio_tpu.utils.checkpoint import save_params

    model = ByT5G2P(BYT5_TEST)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), np.int32), np.ones((1, 8), bool),
        np.zeros((1, 4), np.int32),
    )
    save_params(tmp_path / "byt5.npz", params)
    cfg = {
        "vocab_size": 384, "d_model": 64, "d_kv": 16, "d_ff": 128,
        "num_layers": 2, "num_decoder_layers": 2, "num_heads": 4,
        "relative_attention_num_buckets": 8,
        "relative_attention_max_distance": 20,
        "tie_word_embeddings": False,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    g2p = MultilingualG2P(checkpoint_dir=tmp_path)
    assert g2p.byt5 is not None
    out = g2p.phonemize_words(["chat", "eau"], language="fra")
    assert len(out) == 2 and all(isinstance(o, str) for o in out)
    # cache hit returns identical strings
    assert g2p.phonemize_words(["chat"], language="fra") == [out[0]]


class TestEnglishPhonemizerScenarios:
    """Remaining `KokoroAneEnglishPhonemizerTests.swift` ports (weak forms,
    initialism fall-through, quote/contraction handling, error contract)."""

    def _g2p(self, tmp_path, *, letters=True, lower=None, **kw):
        import json as _json

        from fluidaudio_tpu.tts.g2p import EnglishG2P

        cache = tmp_path / "us_lexicon_cache.json"
        case_sensitive = {"NATO": ["n", "ˈA", "t", "O"]}
        if letters:
            case_sensitive.update({
                "A": ["ˈA"], "I": ["ˈI"], "U": ["jˈu"], "S": ["ˈɛs"],
                "F": ["ˈɛf"], "B": ["bˈi"], "Q": ["kjˈu"],
            })
        cache.write_text(_json.dumps({
            "lower": {
                "to": ["t", "ə"],  # Misaki weak form (issue #691)
                "us": ["ʌ", "s"],
                "hello": ["h", "ə", "l", "ˈO"],
                "don't": ["d", "ˈO", "n", "t"],
                "'cause": ["k", "ʌ", "z"],
                **(lower or {}),
            },
            "caseSensitive": case_sensitive,
        }))
        g2p = EnglishG2P(**kw)
        assert g2p.load_misaki_cache(cache)
        return g2p

    def test_function_word_to_uses_weak_form_not_g2p(self, tmp_path):
        calls = []
        g2p = self._g2p(tmp_path, fallback=lambda w: calls.append(w) or "XX")
        assert g2p.word_to_phonemes("to") == "tə"
        assert calls == []  # lexicon answered; G2P untouched

    def test_uppercase_to_still_resolves_weak_form(self, tmp_path):
        g2p = self._g2p(tmp_path)
        assert g2p.word_to_phonemes("TO") == "tə"
        assert g2p.word_to_phonemes("To") == "tə"

    def test_lowercase_us_stays_pronoun(self, tmp_path):
        g2p = self._g2p(tmp_path)
        assert g2p.word_to_phonemes("us") == "ʌs"

    def test_known_acronym_stays_lexicon_backed_not_spelled(self, tmp_path):
        g2p = self._g2p(tmp_path)
        # NATO has a caseSensitive entry; initialism spelling must not win
        assert g2p.word_to_phonemes("NATO") == "nˈAtO"

    def test_initialism_without_letter_entries_falls_through(self, tmp_path):
        calls = []
        g2p = self._g2p(tmp_path, letters=False,
                        fallback=lambda w: calls.append(w) or "ZZ")
        assert g2p.word_to_phonemes("FBI") == "ZZ"
        assert calls == ["fbi"]  # normalized spelling reaches G2P

    def test_override_falls_back_to_lexicon_when_letters_missing(self, tmp_path):
        g2p = self._g2p(tmp_path, letters=False)
        # US is a letter-name override, but with no letter entries the
        # lexicon weak form answers
        assert g2p.word_to_phonemes("US") == "ʌs"

    def test_long_all_caps_word_is_not_spelled(self, tmp_path):
        calls = []
        g2p = self._g2p(tmp_path, fallback=lambda w: calls.append(w) or "QQ")
        # 6+ letters is beyond the initialism range: reaches G2P whole
        assert g2p.word_to_phonemes("QQQQQQ") == "QQ"
        assert calls == ["qqqqqq"]

    def test_oov_reaches_g2p_with_normalized_spelling(self, tmp_path):
        calls = []
        g2p = self._g2p(tmp_path, fallback=lambda w: calls.append(w) or "YY")
        assert g2p.word_to_phonemes("Zyzzyva") == "YY"
        assert calls == ["zyzzyva"]

    def test_apostrophe_words_stay_intact(self, tmp_path):
        g2p = self._g2p(tmp_path)
        assert g2p.word_to_phonemes("don't") == "dˈOnt"

    def test_single_quotes_are_delimiters_not_lexicon_keys(self, tmp_path):
        from fluidaudio_tpu.tts.g2p import split_words

        # quotes around words split off; leading-apostrophe words survive
        assert "hello" in split_words("'hello'") or "'hello" in split_words("'hello'")
        g2p = self._g2p(tmp_path)
        out = g2p.phonemize("she said 'hello' loudly") if True else ""
        assert "həlˈO" in out

    def test_quoted_sentence_keeps_contractions_intact(self, tmp_path):
        g2p = self._g2p(tmp_path)
        out = g2p.phonemize("don't say 'cause")
        assert out.startswith("dˈOnt")
        assert "kʌz" in out

    def test_empty_input_raises(self, tmp_path):
        g2p = self._g2p(tmp_path)
        with pytest.raises(ValueError, match="empty input"):
            g2p.phonemize("")
        with pytest.raises(ValueError, match="empty input"):
            g2p.phonemize("   ")

    def test_nothing_resolved_raises(self, tmp_path):
        g2p = self._g2p(tmp_path, fallback=lambda w: None)
        # Greek letters survive normalize_key but match no lexicon tier and
        # no letter rule -> the whole input resolves to nothing
        with pytest.raises(ValueError, match="resolved"):
            g2p.phonemize("ωωω")
        # punctuation-only input has no words at all: empty output, no raise
        assert g2p.phonemize("...") == "..."

    def test_empty_lexicon_falls_back_to_g2p_for_every_word(self, tmp_path):
        import json as _json

        from fluidaudio_tpu.tts.g2p import EnglishG2P

        cache = tmp_path / "empty_cache.json"
        cache.write_text(_json.dumps({"lower": {}, "caseSensitive": {}}))
        calls = []
        g2p = EnglishG2P(fallback=lambda w: calls.append(w) or "AA")
        assert g2p.load_misaki_cache(cache)
        out = g2p.phonemize("zyzzyva qwertix")
        assert out == "AA AA"
        assert calls == ["zyzzyva", "qwertix"]
