"""Multilingual seq2seq G2P wrapper: batching, caching, language prefixes."""

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
