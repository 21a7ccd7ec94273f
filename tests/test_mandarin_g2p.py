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


class TestBopomofo:
    """Pinyin -> bopomofo encoding (ref MandarinBopomofoMap.swift, misaki
    ZH_MAP parity)."""

    def test_basic_syllables(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        assert encode_bopomofo("hao", 3) == "ㄏㄠ3"
        assert encode_bopomofo("zhong", 1) == "ㄓ中1"
        assert encode_bopomofo("er", 2) == "ㄦ2"

    def test_sibilant_i(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        assert encode_bopomofo("zi", 4) == "ㄗㄭ4"   # ii
        assert encode_bopomofo("shi", 4) == "ㄕ十4"  # iii

    def test_jqx_umlaut(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        # qu is qü: must emit ㄑㄩ, not ㄑㄨ (ASR mishears 醋 for 去)
        assert encode_bopomofo("qu", 4) == "ㄑㄩ4"
        assert encode_bopomofo("xue", 2) == "ㄒ月2"  # ue -> ve (compound final)

    def test_contractions(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        assert encode_bopomofo("gui", 1) == "ㄍ为1"   # ui -> uei
        assert encode_bopomofo("dun", 4) == "ㄉ文4"   # un -> uen
        assert encode_bopomofo("liu", 2) == "ㄌ又2"   # iu -> iou

    def test_empty_initial_forms(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        assert encode_bopomofo("wo", 3) == "我3"      # uo
        assert encode_bopomofo("yi", 1) == "ㄧ1"
        assert encode_bopomofo("yuan", 2) == "元2"    # van

    def test_erhua_suffix_between_final_and_tone(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        assert encode_bopomofo("xiao", 3, erhua=True) == "ㄒ要ㄦ3"

    def test_unparseable_returns_none(self):
        from fluidaudio_tpu.tts.mandarin_g2p import encode_bopomofo

        assert encode_bopomofo("", 1) is None
        assert encode_bopomofo("qqq", 1) is None


class TestPhonemizeBopomofo:
    def test_sandhi_then_concat_no_separator(self, g2p):
        assert g2p.phonemize_bopomofo("你好") == "ㄋㄧ2ㄏㄠ3"

    def test_punctuation_breaks_sandhi_window(self, g2p):
        # 好 , 好: without the punctuation flush 3+3 would promote
        out = g2p.phonemize_bopomofo("好, 好")
        assert out == "ㄏㄠ3, ㄏㄠ3"

    def test_erhua_merge(self, g2p):
        assert g2p.phonemize_bopomofo("花儿") == "ㄏ穵ㄦ1"

    def test_numbers_verbalized(self, g2p):
        out = g2p.phonemize_bopomofo("三")
        assert out == g2p.phonemize_bopomofo("3")

    def test_ascii_literal_passthrough(self, g2p):
        assert "O" in g2p.phonemize_bopomofo("好OK")


class TestCustomLexicon:
    def test_pinyin_tokens_join_sandhi_window(self, g2p):
        # user entry ends tone-3, next dict word starts tone-3 -> promotion
        g2p.set_custom_lexicon({"你": ["ni3"]})
        assert g2p.phonemize_bopomofo("你好") == "ㄋㄧ2ㄏㄠ3"

    def test_bopomofo_escape_bypasses_sandhi(self, g2p):
        # default path sandhi-promotes 水(shui3) before 好(hao3)
        assert g2p.phonemize_bopomofo("水好") == "ㄕ为2ㄏㄠ3"
        # @-escape emits verbatim: no 3+3 promotion across the token
        g2p.set_custom_lexicon({"水": ["@ㄕㄨㄟ3"]})
        assert g2p.phonemize_bopomofo("水好") == "ㄕㄨㄟ3ㄏㄠ3"

    def test_user_entry_beats_equal_length_dict_entry(self, g2p):
        g2p.set_custom_lexicon({"你好": ["ni4", "hao4"]})
        assert g2p.phonemize_bopomofo("你好") == "ㄋㄧ4ㄏㄠ4"

    def test_longer_dict_word_wins_over_shorter_custom(self, g2p):
        g2p.set_custom_lexicon({"你": ["ni4"]})
        # "你好" (dict, len 2) starts at the same position: dict wins
        assert g2p.phonemize_bopomofo("你好") == "ㄋㄧ2ㄏㄠ3"

    def test_validation_rejects_bad_tokens(self, g2p):
        import pytest

        with pytest.raises(ValueError, match="does not encode"):
            g2p.set_custom_lexicon({"你": ["qqq9"]})
        with pytest.raises(ValueError, match="outside the zh vocab"):
            g2p.set_custom_lexicon({"你": ["@hello"]})
        with pytest.raises(ValueError, match="empty"):
            g2p.set_custom_lexicon({"你": []})

    def test_clear_with_empty_dict(self, g2p):
        g2p.set_custom_lexicon({"你": ["ni4"]})
        g2p.set_custom_lexicon({})
        assert g2p.phonemize_bopomofo("你好") == "ㄋㄧ2ㄏㄠ3"


def test_looks_like_hanzi():
    from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P

    assert MandarinG2P.looks_like_hanzi("你好")
    assert MandarinG2P.looks_like_hanzi("mixed 你 text")
    assert not MandarinG2P.looks_like_hanzi("ㄋㄧ3ㄏㄠ3")
    assert not MandarinG2P.looks_like_hanzi("hello!")
    assert not MandarinG2P.looks_like_hanzi("こんにちは")  # kana is not hanzi


# --------------------------------------------------------------------------
# Jieba BMES HMM (MandarinJiebaHmmTests.swift:73-236)
# --------------------------------------------------------------------------

HIGH, LOW, MED = 0.0, -100.0, -1.0


def toy_tables(group_chars, singleton_chars):
    """Synthetic 4-state tables: group_chars strongly prefer B/M/E (join
    into one word when contiguous), singleton_chars prefer S — the same
    fixture the reference tests build in-process."""
    from fluidaudio_tpu.tts.mandarin_g2p import JiebaHmmTables

    start = [HIGH, LOW, LOW, HIGH]  # B M E S
    trans = [
        [LOW, HIGH, MED, LOW],  # from B
        [LOW, MED, HIGH, LOW],  # from M
        [HIGH, LOW, LOW, MED],  # from E
        [HIGH, LOW, LOW, HIGH],  # from S
    ]
    emit = {}
    for ch in group_chars:
        emit[ch] = [HIGH, HIGH, HIGH, LOW]
    for ch in singleton_chars:
        emit[ch] = [LOW, LOW, LOW, HIGH]
    return JiebaHmmTables(start=start, trans=trans, emit=emit)


@pytest.fixture
def toy_hmm():
    from fluidaudio_tpu.tts.mandarin_g2p import MandarinJiebaHmm

    return MandarinJiebaHmm(toy_tables("特朗普", "他说了"))


class TestJiebaHmm:
    def test_empty_input_empty_output(self, toy_hmm):
        assert toy_hmm.segment("") == []

    def test_single_char_bypasses_viterbi(self, toy_hmm):
        assert toy_hmm.segment("特") == ["特"]

    def test_group_chars_collapse_into_word(self, toy_hmm):
        assert toy_hmm.segment("特朗普") == ["特朗普"]

    def test_singleton_chars_stay_separate(self, toy_hmm):
        assert toy_hmm.segment("他说") == ["他", "说"]

    def test_mixed_run_preserves_boundaries(self, toy_hmm):
        assert toy_hmm.segment("他特朗普说") == ["他", "特朗普", "说"]

    def test_output_always_concatenates_to_input(self, toy_hmm):
        for text in ("特朗普", "他说特朗普了", "特他朗说普", "朗朗普普"):
            assert "".join(toy_hmm.segment(text)) == text

    def test_unknown_chars_still_produce_something(self, toy_hmm):
        out = toy_hmm.segment("XY")
        assert "".join(out) == "XY"
        assert out  # no empty result on fully-OOV input

    def test_tables_validation(self):
        from fluidaudio_tpu.tts.mandarin_g2p import JiebaHmmTables

        with pytest.raises(ValueError, match="start"):
            JiebaHmmTables(start=[0.0], trans=[[0.0] * 4] * 4, emit={})
        with pytest.raises(ValueError, match="trans"):
            JiebaHmmTables(start=[0.0] * 4, trans=[[0.0] * 3] * 4, emit={})
        with pytest.raises(ValueError, match="emit"):
            JiebaHmmTables(start=[0.0] * 4, trans=[[0.0] * 4] * 4,
                           emit={"字": [0.0]})

    def test_json_roundtrip(self, tmp_path, toy_hmm):
        import json as _json

        from fluidaudio_tpu.tts.mandarin_g2p import MandarinJiebaHmm

        t = toy_hmm.tables
        p = tmp_path / "jieba_hmm.json"
        p.write_text(_json.dumps(
            {"start": t.start, "trans": t.trans, "emit": t.emit}
        ))
        loaded = MandarinJiebaHmm.load(p)
        assert loaded is not None
        assert loaded.segment("他特朗普说") == ["他", "特朗普", "说"]

    def test_load_missing_or_corrupt_returns_none(self, tmp_path):
        from fluidaudio_tpu.tts.mandarin_g2p import MandarinJiebaHmm

        assert MandarinJiebaHmm.load(tmp_path / "absent.json") is None
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        assert MandarinJiebaHmm.load(bad) is None
        wrong = tmp_path / "wrong.json"
        wrong.write_text('{"start": [0], "trans": [], "emit": {}}')
        assert MandarinJiebaHmm.load(wrong) is None


class TestJiebaHmmIntegration:
    """MandarinG2P.segment with/without the HMM post-pass
    (MandarinJiebaHmmTests.swift:200-236)."""

    def _g2p(self, hmm=None, extra_lexicon=None):
        import json as _json
        import tempfile

        from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P

        if extra_lexicon:
            f = tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False
            )
            _json.dump(extra_lexicon, f)
            f.close()
            return MandarinG2P(lexicon_path=f.name, jieba_hmm=hmm)
        return MandarinG2P(jieba_hmm=hmm)

    def test_without_hmm_keeps_per_char_fallback(self):
        g2p = self._g2p(hmm=None)
        # 特朗普 is not in the seed lexicon: per-char segments
        segs = g2p.segment("特朗普")
        assert segs == ["特", "朗", "普"]

    def test_with_hmm_retries_phrase_dict(self, toy_hmm):
        # phrase present in the dict but only reachable once the HMM
        # groups the run (FMM misses phrases that start mid-run)
        g2p = self._g2p(hmm=toy_hmm,
                        extra_lexicon={"特朗普": "te4 lang3 pu3"})
        assert "特朗普" in g2p.segment("他特朗普说")
        assert g2p.word_to_pinyin("特朗普") == ["te4", "lang3", "pu3"]

    def test_with_hmm_oov_word_falls_back_per_char(self, toy_hmm):
        g2p = self._g2p(hmm=toy_hmm)
        # HMM groups 特朗普 but it's not in the lexicon: per-char again
        segs = g2p.segment("特朗普")
        assert segs == ["特", "朗", "普"]

    def test_typed_segmentation_flushes_run_on_punctuation(self, toy_hmm):
        g2p = self._g2p(hmm=toy_hmm,
                        extra_lexicon={"特朗普": "te4 lang3 pu3"})
        segs = g2p._segment_typed("特朗,普")
        # the comma breaks the run: 特朗 and 普 can never regroup
        kinds = [k for k, _, _ in segs]
        assert "punct" in kinds
        assert ("word", "特朗普") not in [(k, v) for k, v, _ in segs]
        # without the punctuation the HMM joins the word across the run
        joined = g2p._segment_typed("特朗普")
        assert ("word", "特朗普") in [(k, v) for k, v, _ in joined]


class TestToneSandhiPOS:
    """MandarinToneSandhiPOSTests.swift:19-195 — POS-aware sandhi carve-outs
    on the tone-numbered pinyin representation."""

    @staticmethod
    def _apply(syllables, words, tags):
        from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P

        return MandarinG2P.apply_tone_sandhi_pos(syllables, words, tags)

    @staticmethod
    def _tones(syllables):
        return [int(s[-1]) for s in syllables]

    def test_yi_ordinal_keeps_tone_one_in_solo_numeral_word(self):
        out = self._apply(["di4", "yi1"], [(0, 1), (1, 2)], ["m", "m"])
        assert self._tones(out) == [4, 1]

    def test_yi_in_ordinal_before_tone1_word_keeps_tone_one(self):
        out = self._apply(["yi1", "yue1"], [(0, 1), (1, 2)], ["m", "m"])
        assert self._tones(out) == [1, 1]

    def test_yi_contextual_sandhi_still_fires_in_verb_context(self):
        out = self._apply(["yi1", "qi3"], [(0, 2)], ["d"])
        assert self._tones(out) == [4, 3]

    def test_yi_before_fourth_tone_verb_still_promotes_to_two(self):
        out = self._apply(["yi1", "ding4"], [(0, 2)], ["d"])
        assert self._tones(out) == [2, 4]

    def test_bu_reduplication_keeps_tone_four(self):
        out = self._apply(
            ["yao4", "bu4", "yao4"], [(0, 1), (1, 2), (2, 3)], ["v", "d", "v"]
        )
        assert self._tones(out) == [4, 4, 4]

    def test_bu_promotion_still_fires_for_non_reduplication(self):
        out = self._apply(["bu4", "yao4"], [(0, 2)], ["d"])
        assert self._tones(out) == [2, 4]

    def test_bu_reduplication_distinct_bases_triggers_promotion(self):
        out = self._apply(
            ["yao4", "bu4", "qu4"], [(0, 1), (1, 2), (2, 3)], ["v", "d", "v"]
        )
        assert self._tones(out) == [4, 2, 4]

    def test_in_word_run_promotes_all_but_last(self):
        out = self._apply(["wo3", "ye3", "xiang3"], [(0, 3)], ["v"])
        assert self._tones(out) == [2, 2, 3]

    def test_cross_word_pair_only_promotes_boundary(self):
        out = self._apply(
            ["wo3", "ye3", "xiang3", "qu4"],
            [(0, 1), (1, 2), (2, 4)],
            ["r", "d", "v"],
        )
        assert self._tones(out) == [2, 2, 3, 4]

    def test_cross_word_chain_stops_at_non_three(self):
        out = self._apply(
            ["wo3", "shi4", "ni3", "de5"],
            [(0, 1), (1, 2), (2, 3), (3, 4)],
            ["r", "v", "r", "u"],
        )
        assert self._tones(out) == [3, 4, 3, 5]

    def test_word_grouped_sandhi_beats_naive_run_rule(self):
        out = self._apply(
            ["ni3", "xiang3", "ma5"], [(0, 1), (1, 2), (2, 3)], ["r", "v", "y"]
        )
        assert self._tones(out) == [2, 3, 5]

    def test_single_word_range_matches_baseline_for_flat_run(self):
        out = self._apply(["ni3", "hao3"], [(0, 2)], ["a"])
        assert self._tones(out) == [2, 3]

    def test_empty_and_single_syllable_buffers_are_noops(self):
        assert self._apply([], [], []) == []
        assert self._apply(["ni3"], [(0, 1)], ["r"]) == ["ni3"]

    def test_mismatched_tags_count_raises(self):
        import pytest

        with pytest.raises(ValueError, match="must align"):
            self._apply(["ni3", "hao3"], [(0, 2)], [])

    def test_phonemize_routes_through_pos_sandhi_when_tagger_set(self):
        from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P

        # 一天 with a numeral tagger: solo 一 tagged `m` keeps tone 1;
        # the baseline promotes yi1 -> yi4 before the tone-1 successor.
        tagger = MandarinG2P(pos_lookup=lambda w: "m")
        baseline = MandarinG2P()
        assert tagger.phonemize("一天") == "yi1 tian1"
        assert baseline.phonemize("一天") == "yi4 tian1"


class TestPinyinNormalizer:
    """MandarinPinyinNormalizer parity (MandarinG2PTests.swift:18-52)."""

    @staticmethod
    def _norm(s):
        from fluidaudio_tpu.tts.mandarin_g2p import normalize_pinyin

        return normalize_pinyin(s)

    def test_tones_one_to_four(self):
        assert self._norm("mā") == "ma1"
        assert self._norm("má") == "ma2"
        assert self._norm("mǎ") == "ma3"
        assert self._norm("mà") == "ma4"

    def test_neutral_tone(self):
        assert self._norm("ma") == "ma5"
        assert self._norm("de") == "de5"

    def test_umlaut_collapses_to_v(self):
        assert self._norm("lǜ") == "lv4"
        assert self._norm("nü") == "nv5"
        assert self._norm("qiū") == "qiu1"


class TestPinyinBinaryDict:
    """MandarinPinyinDict round-trip (MandarinG2PTests.swift:283-330)."""

    def test_parses_singles(self):
        from fluidaudio_tpu.tts.mandarin_g2p import parse_pinyin_singles

        data = bytes([0x60, 0x4F, 0x00, 0x00])  # 你
        data += bytes([1])  # one reading
        data += bytes([2]) + b"ni"
        assert parse_pinyin_singles(data) == {0x4F60: ["ni"]}

    def test_parses_polyphone_singles(self):
        from fluidaudio_tpu.tts.mandarin_g2p import parse_pinyin_singles

        entry = bytes([0x50, 0x4F, 0x00, 0x00, 2])
        entry += bytes([len("háng".encode())]) + "háng".encode()
        entry += bytes([len("xíng".encode())]) + "xíng".encode()
        parsed = parse_pinyin_singles(entry)
        assert parsed[0x4F50] == ["háng", "xíng"]

    def test_parses_phrases(self):
        from fluidaudio_tpu.tts.mandarin_g2p import parse_pinyin_phrases

        phrase = "你好".encode()
        data = len(phrase).to_bytes(2, "little") + phrase + bytes([2])
        data += bytes([len("ní".encode())]) + "ní".encode()
        data += bytes([len("hǎo".encode())]) + "hǎo".encode()
        assert parse_pinyin_phrases(data) == {"你好": ["ní", "hǎo"]}

    def test_truncated_raises(self):
        from fluidaudio_tpu.tts.mandarin_g2p import (
            PinyinDictError,
            parse_pinyin_phrases,
            parse_pinyin_singles,
        )

        with pytest.raises(PinyinDictError, match="truncated"):
            parse_pinyin_singles(bytes([0x60, 0x4F]))
        with pytest.raises(PinyinDictError, match="truncated"):
            parse_pinyin_singles(bytes([0x60, 0x4F, 0, 0, 1, 5, 0x61]))
        with pytest.raises(PinyinDictError, match="truncated"):
            parse_pinyin_phrases(bytes([5, 0]))

    def test_load_dict_dir_merges_into_lexicon(self, tmp_path):
        from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P, load_pinyin_dict_dir

        phrase = "星期".encode()
        phrases = len(phrase).to_bytes(2, "little") + phrase + bytes([2])
        phrases += bytes([len("xīng".encode())]) + "xīng".encode()
        phrases += bytes([len("qī".encode())]) + "qī".encode()
        (tmp_path / "pinyin_phrases.bin").write_bytes(phrases)
        singles = ord("星").to_bytes(4, "little") + bytes([1])
        singles += bytes([len("xīng".encode())]) + "xīng".encode()
        (tmp_path / "pinyin_single.bin").write_bytes(singles)

        loaded = load_pinyin_dict_dir(tmp_path)
        assert loaded["星期"] == "xing1 qi1"
        assert loaded["星"] == "xing1"

        g2p = MandarinG2P(lexicon_path=tmp_path)
        assert g2p.phonemize("星期") == "xing1 qi1"


def test_normalize_text_fullwidth_punctuation():
    """MandarinG2PTests.swift:220-225."""
    from fluidaudio_tpu.tts.mandarin_g2p import MandarinG2P

    assert MandarinG2P.normalize_text("你好，世界。") == "你好,世界."
    assert MandarinG2P.normalize_text("！？；：") == "!?;:"


def test_phonemize_accepts_fullwidth_punctuation(g2p):
    # fullwidth comma breaks the sandhi window exactly like its halfwidth form
    assert g2p.phonemize("你好，你好") == g2p.phonemize("你好,你好")


class TestCustomLexiconFileFormat:
    """MandarinCustomLexiconTests.swift:65-145 — text-file parse format."""

    def test_parse_handles_comments_and_blank_lines(self):
        content = (
            "# user pronunciations\n"
            "\n"
            "字节跳动  zi4 jie2 tiao4 dong4\n"
            "   \n"
            "# another comment\n"
            "foo @ㄈㄨ4\n"
        )
        raw = MandarinG2P.parse_custom_lexicon(content)
        assert raw == {
            "字节跳动": ["zi4", "jie2", "tiao4", "dong4"],
            "foo": ["@ㄈㄨ4"],
        }

    def test_parse_rejects_zero_tokens(self):
        with pytest.raises(ValueError, match="no tokens"):
            MandarinG2P.parse_custom_lexicon("字节跳动\n")

    def test_parse_rejects_duplicate_word(self):
        with pytest.raises(ValueError, match="duplicate"):
            MandarinG2P.parse_custom_lexicon("你 ni3\n你 ni2\n")

    def test_load_validates_tokens(self, tmp_path, g2p):
        f = tmp_path / "lex.txt"
        f.write_text("你 qqq9\n", encoding="utf-8")
        with pytest.raises(ValueError, match="does not encode"):
            g2p.load_custom_lexicon(f)
        g2p.set_custom_lexicon({})

    def test_load_end_to_end(self, tmp_path, g2p):
        f = tmp_path / "lex.txt"
        f.write_text("# override\n好 hao4\n", encoding="utf-8")
        g2p.load_custom_lexicon(f)
        try:
            assert g2p.phonemize_bopomofo("好") == "ㄏㄠ4"
        finally:
            g2p.set_custom_lexicon({})

    def test_bare_at_token_rejected(self, g2p):
        with pytest.raises(ValueError, match="bopomofo"):
            g2p.set_custom_lexicon({"x": ["@"]})


class TestPolyphoneCatalog:
    """MandarinPolyphoneCatalogTests.swift:10-109 — POLYPHONIC_CHARS.txt."""

    SAMPLE = "行\tㄒㄧㄥˊ\n行\tㄏㄤˊ\n行\tㄒㄧㄥˋ\n了\tㄌㄜ˙\n了\tㄌㄧㄠˇ\n"

    def _parse(self, text=None):
        from fluidaudio_tpu.tts.mandarin_g2p import parse_polyphone_catalog

        return parse_polyphone_catalog(text if text is not None else self.SAMPLE)

    def test_parses_chars_in_order(self):
        cat = self._parse()
        assert cat.chars == ["行", "了"]
        assert cat.char_index == {"行": 0, "了": 1}

    def test_labels_are_sorted_unique(self):
        cat = self._parse(self.SAMPLE + "行\tㄏㄤˊ\n")  # duplicate row
        assert cat.labels == sorted(set(cat.labels))
        assert len(cat.candidates("行")) == 3  # dedup kept the mask compact

    def test_candidates_per_char(self):
        cat = self._parse()
        xing = cat.candidates("行")
        assert xing is not None and len(xing) == 3
        assert [cat.bopomofo(i) for i in xing] == ["ㄒㄧㄥˊ", "ㄏㄤˊ", "ㄒㄧㄥˋ"]
        assert cat.candidates("好") is None

    def test_bopomofo_reverse_lookup(self):
        cat = self._parse()
        for i, lb in enumerate(cat.labels):
            assert cat.bopomofo(i) == lb
        assert cat.bopomofo(99) is None

    def test_tone_digit_conversion(self):
        from fluidaudio_tpu.tts.mandarin_g2p import bopomofo_label_to_digit_form

        assert bopomofo_label_to_digit_form("ㄒㄧㄥˊ") == "ㄒㄧㄥ2"
        assert bopomofo_label_to_digit_form("ㄌㄧㄠˇ") == "ㄌㄧㄠ3"
        assert bopomofo_label_to_digit_form("ㄏㄤˋ") == "ㄏㄤ4"
        assert bopomofo_label_to_digit_form("ㄌㄜ˙") == "ㄌㄜ5"
        assert bopomofo_label_to_digit_form("ㄇㄚ") == "ㄇㄚ1"  # unmarked = tone 1

    def test_rejects_malformed_row(self):
        from fluidaudio_tpu.tts.mandarin_g2p import PinyinDictError

        with pytest.raises(PinyinDictError, match="parse error"):
            self._parse("行\n")

    def test_rejects_multi_hanzi_key(self):
        from fluidaudio_tpu.tts.mandarin_g2p import PinyinDictError

        with pytest.raises(PinyinDictError, match="single hanzi"):
            self._parse("行了\tㄒㄧㄥˊ\n")

    def test_handles_crlf_and_blanks(self):
        cat = self._parse("# c\r\n\r\n行\tㄒㄧㄥˊ\r\n行 ㄏㄤˊ\r\n")
        assert cat.chars == ["行"]
        assert len(cat.candidates("行")) == 2


def test_g2pw_drops_targets_beyond_truncation_window(tmp_path):
    """MandarinBertTokenizerTests truncation-from-the-right contract: a
    polyphone target past the [CLS]..[SEP] window is dropped, not indexed
    out of bounds."""
    suite = TestG2pwDisambiguation()
    g2p, g2pw = suite._build(tmp_path)
    long_text = "了" * 200 + "行"
    picks = g2pw.disambiguate(long_text, [200])
    assert picks == {}
    # an in-window polyphone still resolves
    picks2 = g2pw.disambiguate("行" + "了" * 200, [0])
    assert set(picks2) == {0}
