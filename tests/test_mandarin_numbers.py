"""Mandarin number normalizer + erhua/sandhi scenario parity suite.

Ports the reference's `MandarinNumberNormalizerTests.swift` (cardinal/
decimal/digit-string/percentage/fraction/currency/date/time) and the
erhua edge cases from `MandarinErhuaTests.swift`.
"""

from __future__ import annotations

import pytest

from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P
from fluidaudio_tpu.tts.mandarin_numbers import (
    mandarin_cardinal,
    mandarin_decimal,
    mandarin_digit_string,
    mandarin_normalize_numbers,
)


class TestCardinal:
    @pytest.mark.parametrize(
        "n,expected",
        [
            (0, "零"),
            (1, "一"),
            (9, "九"),
            (10, "十"),           # standalone 10 collapses to 十
            (12, "十二"),
            (19, "十九"),
            (20, "二十"),
            (45, "四十五"),
            (99, "九十九"),
            (100, "一百"),
            (101, "一百零一"),
            (110, "一百一十"),     # intra-number tens use 一十
            (123, "一百二十三"),
            (1000, "一千"),
            (1001, "一千零一"),
            (1010, "一千零一十"),
            (2345, "二千三百四十五"),
            (10_000, "一万"),
            (12_345, "一万二千三百四十五"),
            (100_000, "十万"),     # highest group's 10 collapses
            (100_001, "十万零一"),  # cross-group zero gap fills once
            (100_000_000, "一亿"),
            (123_456_789, "一亿二千三百四十五万六千七百八十九"),
            (-5, "负五"),
            (-1234, "负一千二百三十四"),
        ],
    )
    def test_values(self, n, expected):
        assert mandarin_cardinal(n) == expected


class TestDecimalAndDigits:
    def test_decimal_simple(self):
        assert mandarin_decimal("3.14") == "三点一四"

    def test_decimal_integer_only(self):
        assert mandarin_decimal("42") == "四十二"

    def test_decimal_strips_trailing_zeros(self):
        assert mandarin_decimal("5.50") == "五点五"
        assert mandarin_decimal("1.00") == "一"

    def test_decimal_preserves_interior_zero(self):
        assert mandarin_decimal("3.05") == "三点零五"

    def test_digit_string(self):
        assert mandarin_digit_string("2025") == "二零二五"
        assert mandarin_digit_string("007") == "零零七"


class TestNormalize:
    def test_integer_inline(self):
        assert mandarin_normalize_numbers("我有3只猫") == "我有三只猫"

    def test_multiple_integers(self):
        assert mandarin_normalize_numbers("买了10个苹果和5个梨") == "买了十个苹果和五个梨"

    def test_decimal(self):
        assert mandarin_normalize_numbers("圆周率是3.14") == "圆周率是三点一四"

    def test_percentage(self):
        assert mandarin_normalize_numbers("99%") == "百分之九十九"

    def test_decimal_percentage(self):
        assert mandarin_normalize_numbers("0.5%") == "百分之零点五"

    def test_fraction_denominator_first(self):
        assert mandarin_normalize_numbers("1/2") == "二分之一"
        assert mandarin_normalize_numbers("3/4") == "四分之三"

    def test_rmb(self):
        assert mandarin_normalize_numbers("¥120") == "一百二十元"
        assert mandarin_normalize_numbers("￥120") == "一百二十元"

    def test_usd(self):
        assert mandarin_normalize_numbers("$5.50") == "五点五美元"

    def test_eur(self):
        assert mandarin_normalize_numbers("€100") == "一百欧元"

    def test_gbp(self):
        assert mandarin_normalize_numbers("£25") == "二十五英镑"

    def test_chinese_date(self):
        assert mandarin_normalize_numbers("2025年5月3日") == "二零二五年五月三日"

    def test_chinese_date_hao(self):
        assert mandarin_normalize_numbers("2025年5月3号") == "二零二五年五月三日"

    def test_chinese_year_month(self):
        assert mandarin_normalize_numbers("2025年5月") == "二零二五年五月"

    def test_iso_date(self):
        assert mandarin_normalize_numbers("2025-05-03") == "二零二五年五月三日"

    def test_year_only(self):
        assert mandarin_normalize_numbers("2025年") == "二零二五年"

    def test_time_hm(self):
        assert mandarin_normalize_numbers("3:30") == "三点三十分"

    def test_time_hms(self):
        assert mandarin_normalize_numbers("12:05:09") == "十二点五分九秒"

    def test_passthrough(self):
        assert mandarin_normalize_numbers("没有数字") == "没有数字"


class TestErhuaEdgeCases:
    def test_merge_basic(self):
        assert MandarinG2P.apply_erhua(["zhe4", "er5"]) == ["zher4"]

    def test_merge_multi_syllable(self):
        assert MandarinG2P.apply_erhua(["xiao3", "hai2", "er5"]) == [
            "xiao3", "hair2"
        ]

    def test_merge_attaches_to_immediate_predecessor(self):
        assert MandarinG2P.apply_erhua(["yi1", "hui4", "er5"]) == ["yi1", "huir4"]

    def test_standalone_er_at_start_kept(self):
        assert MandarinG2P.apply_erhua(["er2", "zi5"]) == ["er2", "zi5"]

    def test_empty_and_single_noop(self):
        assert MandarinG2P.apply_erhua([]) == []
        assert MandarinG2P.apply_erhua(["ma1"]) == ["ma1"]

    def test_back_to_back_er_er_left_alone(self):
        assert MandarinG2P.apply_erhua(["er2", "er5"]) == ["er2", "er5"]

    def test_no_double_merge_into_erhua(self):
        assert MandarinG2P.apply_erhua(["hua1", "er5", "er5"]) == ["huar1", "er5"]

    def test_merge_runs_before_sandhi_for_3_plus_3(self):
        # hao3 + er5 + mei3: erhua first -> haor3 mei3, then 3+3 -> 2+3.
        merged = MandarinG2P.apply_erhua(["hao3", "er5", "mei3"])
        assert merged == ["haor3", "mei3"]
        toned = MandarinG2P.apply_tone_sandhi(merged)
        assert toned == ["haor2", "mei3"]


class TestPhonemizeWithNumbers:
    def test_phonemize_verbalizes_inline_numbers(self):
        g2p = MandarinG2P()
        out = g2p.phonemize("我有3个")
        # 3 -> 三 (san1); the pipeline reads it as pinyin.
        assert "san1" in out.split() or "san" in out
