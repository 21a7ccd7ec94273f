"""Mandarin G2P: segmentation, sandhi, erhua, number reading."""

import json

import pytest

from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P, number_to_mandarin


@pytest.fixture(scope="module")
def g2p():
    return MandarinG2P()


class TestNumbers:
    def test_basic(self):
        assert number_to_mandarin(0) == "零"
        assert number_to_mandarin(5) == "五"
        assert number_to_mandarin(10) == "十"
        assert number_to_mandarin(11) == "十一"
        assert number_to_mandarin(25) == "二十五"
        assert number_to_mandarin(100) == "一百"
        assert number_to_mandarin(105) == "一百零五"
        assert number_to_mandarin(200) == "两百"
        assert number_to_mandarin(2500) == "两千五百"
        assert number_to_mandarin(10000) == "一万"
        assert number_to_mandarin(-3) == "负三"


class TestSegmentation:
    def test_longest_match(self, g2p):
        assert g2p.segment("你好我们") == ["你好", "我们"]
        assert g2p.segment("中国人") == ["中国", "人"]

    def test_unknown_chars_pass_through(self, g2p):
        segs = g2p.segment("好X好")
        assert "X" in segs


class TestSandhi:
    def test_third_tone_pair(self, g2p):
        # ni3 hao3 -> ni2 hao3
        assert g2p.apply_tone_sandhi(["ni3", "hao3"]) == ["ni2", "hao3"]

    def test_third_tone_chain(self, g2p):
        # 3 3 3 -> 2 2 3 (right-to-left resolution)
        assert g2p.apply_tone_sandhi(["wo3", "hen3", "hao3"]) == ["wo2", "hen2", "hao3"]

    def test_bu_sandhi(self, g2p):
        assert g2p.apply_tone_sandhi(["bu4", "shi4"]) == ["bu2", "shi4"]
        assert g2p.apply_tone_sandhi(["bu4", "hao3"]) == ["bu4", "hao3"]  # unchanged

    def test_yi_sandhi(self, g2p):
        assert g2p.apply_tone_sandhi(["yi1", "ge4"]) == ["yi2", "ge4"]
        assert g2p.apply_tone_sandhi(["yi1", "tian1"]) == ["yi4", "tian1"]


class TestErhua:
    def test_merge(self, g2p):
        assert g2p.apply_erhua(["hua1", "er5"]) == ["huar1"]
        assert g2p.apply_erhua(["wan2", "er5"]) == ["wanr2"]
        assert g2p.apply_erhua(["er5"]) == ["er5"]  # nothing to merge into


def test_phonemize_end_to_end(g2p):
    out = g2p.phonemize("你好")
    assert out == "ni2 hao3"  # sandhi applied
    out2 = g2p.phonemize("3个人")
    assert out2.startswith("san1 ge4")
    # numbers expand before lookup
    assert "ren2" in out2


class TestG2pwDisambiguation:
    def _build(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from fluidaudio_tpu.models.bert_g2pw import G2PW_TEST, BertG2pw
        from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P, MandarinG2pw
        from fluidaudio_tpu.utils.checkpoint import save_params

        model = BertG2pw(G2PW_TEST)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,), jnp.int32),
        )
        save_params(tmp_path / "g2pw.npz", params)
        (tmp_path / "config.json").write_text(json.dumps({
            "vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 64,
            "max_position_embeddings": 64, "type_vocab_size": 2,
            "num_labels": 16,
        }))
        vocab = ["[PAD]"] * 128
        vocab[101], vocab[102], vocab[100] = "[CLS]", "[SEP]", "[UNK]"
        vocab[5], vocab[6], vocab[7] = "行", "好", "了"
        (tmp_path / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
        (tmp_path / "polyphone_catalog.json").write_text(json.dumps(
            {"行": {"xing2": 1, "hang2": 2}}
        ), ensure_ascii=False) if False else (tmp_path / "polyphone_catalog.json").write_text(
            json.dumps({"行": {"xing2": 1, "hang2": 2}}, ensure_ascii=False),
            encoding="utf-8")
        g2pw = MandarinG2pw.load(tmp_path)
        assert g2pw is not None
        return MandarinG2P(g2pw=g2pw), g2pw

    def test_load_missing_returns_none(self, tmp_path):
        from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2pw

        assert MandarinG2pw.load(tmp_path) is None

    def test_disambiguate_picks_catalog_pinyin(self, tmp_path):
        g2p, g2pw = self._build(tmp_path)
        picks = g2pw.disambiguate("行了好", [0])
        assert set(picks) == {0}
        assert picks[0] in ("xing2", "hang2")
        # non-polyphonic target silently dropped
        assert g2pw.disambiguate("行了好", [1]) == {}

    def test_phonemize_applies_override(self, tmp_path):
        g2p, g2pw = self._build(tmp_path)
        out = g2p.phonemize("行")
        assert out in ("xing2", "hang2")
