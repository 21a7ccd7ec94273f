"""Mandarin G2P: segmentation, sandhi, erhua, number reading."""

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
