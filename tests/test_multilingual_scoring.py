"""Multilingual FLEURS scoring pipeline + nemotron-multilingual-fleurs CLI.

Covers reference parity for `NemotronMultilingualFleursBenchmark.swift`:
FLEURS-code -> prompt-key mapping, digit spell-out ITN (the reference's
NumberFormatter .spellOut pass over fr/de/es/it/pt), Whisper-basic
normalization, CJK character-level scoring, forced-prefix decoder seeding,
and the CLI harness end-to-end on a staged FLEURS tree with tiny models.
"""

import json
import wave

import numpy as np
import pytest

from fluidaudio_tpu.metrics.spellout import spell_out_number, spell_out_numbers
from fluidaudio_tpu.metrics.text_normalizer import (
    basic_normalize,
    cjk_chars,
    is_cjk_language,
)


class TestSpellOut:
    @pytest.mark.parametrize("n,want", [
        (0, "zéro"),
        (21, "vingt et un"),
        (71, "soixante et onze"),
        (76, "soixante seize"),
        (80, "quatre vingts"),
        (81, "quatre vingt un"),
        (99, "quatre vingt dix neuf"),
        (100, "cent"),
        (200, "deux cents"),
        (1976, "mille neuf cent soixante seize"),
        (2024, "deux mille vingt quatre"),
        (1000000, "un million"),
    ])
    def test_french(self, n, want):
        assert spell_out_number(n, "fr") == want

    @pytest.mark.parametrize("n,want", [
        (0, "null"),
        (1, "eins"),
        (21, "einundzwanzig"),
        (100, "einhundert"),
        (101, "einhunderteins"),
        (1976, "eintausendneunhundertsechsundsiebzig"),
        (2024, "zweitausendvierundzwanzig"),
        (1000000, "eine million"),
        (3000000, "drei millionen"),
    ])
    def test_german(self, n, want):
        assert spell_out_number(n, "de") == want

    @pytest.mark.parametrize("n,want", [
        (0, "cero"),
        (16, "dieciséis"),
        (21, "veintiuno"),
        (31, "treinta y uno"),
        (100, "cien"),
        (101, "ciento uno"),
        (500, "quinientos"),
        (1976, "mil novecientos setenta y seis"),
        (2024, "dos mil veinticuatro"),
        (1000000, "un millón"),
    ])
    def test_spanish(self, n, want):
        assert spell_out_number(n, "es") == want

    @pytest.mark.parametrize("n,want", [
        (0, "zero"),
        (21, "ventuno"),
        (23, "ventitré"),
        (28, "ventotto"),
        (100, "cento"),
        (180, "centottanta"),
        (1976, "millenovecentosettantasei"),
        (2024, "duemilaventiquattro"),
        (1000000, "un milione"),
    ])
    def test_italian(self, n, want):
        assert spell_out_number(n, "it") == want

    @pytest.mark.parametrize("n,want", [
        (0, "zero"),
        (21, "vinte e um"),
        (100, "cem"),
        (101, "cento e um"),
        (1976, "mil novecentos e setenta e seis"),
        (2010, "dois mil e dez"),
        (2100, "dois mil e cem"),
        (1000000, "um milhão"),
    ])
    def test_portuguese(self, n, want):
        assert spell_out_number(n, "pt") == want

    def test_text_replacement_and_passthrough(self):
        assert spell_out_numbers("em 1976 e 2024", "pt") == (
            "em mil novecentos e setenta e seis e dois mil e vinte e quatro")
        # unsupported/None language: unchanged (fleursToSpellOutLocale nil)
        assert spell_out_numbers("in 1976", None) == "in 1976"
        assert spell_out_numbers("in 1976", "en") == "in 1976"
        assert spell_out_numbers("in 1976", "ja") == "in 1976"


class TestBasicNormalize:
    def test_keeps_diacritics_strips_punct(self):
        assert basic_normalize("C'était déjà ÇA!") == "c était déjà ça"

    def test_removes_bracketed(self):
        assert basic_normalize("hola [ruido] mundo (risas)") == "hola mundo"

    def test_spell_out_integration(self):
        assert basic_normalize("El año 1976.", spell_out_lang="es") == (
            "el año mil novecientos setenta y seis")

    def test_nfkc(self):
        assert basic_normalize("ﬁn ①") == "ﬁn 1" or basic_normalize("ﬁn ①") == "fin 1"


class TestCjk:
    def test_language_detection(self):
        assert is_cjk_language("cmn_hans_cn")
        assert is_cjk_language("ja_jp")
        assert is_cjk_language("ko_kr")
        assert is_cjk_language("yue")
        assert is_cjk_language("th_th")
        assert not is_cjk_language("fr_fr")
        assert not is_cjk_language("kok")  # konkani: 'ko' prefix must not match

    def test_char_tokens(self):
        assert cjk_chars("你好, 世界!") == ["你", "好", "世", "界"]
        assert cjk_chars("日本語 テスト") == list("日本語テスト")


class TestFleursMapping:
    def test_mapping(self):
        from fluidaudio_tpu.asr.streaming_nemotron import (
            fleurs_to_multilingual_language as f,
        )

        assert f("en_us") == "en-US"
        assert f("cmn_hans_cn") == "zh-CN"
        assert f("es_419") == "es-ES"
        assert f("pt_br") == "pt-BR"
        assert f("ar_eg") == "ar-EG"
        assert f("de_de") == "de-DE"
        assert f("weird") == "weird"


def _write_wav(path, samples):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype(np.int16).tobytes())


@pytest.fixture()
def fleurs_tree(tmp_path):
    rs = np.random.RandomState(0)
    for lang, ref in [("fr_fr", "bonjour en 1976"), ("cmn_hans_cn", "你好世界")]:
        d = tmp_path / "fleurs" / lang
        d.mkdir(parents=True)
        _write_wav(d / "utt0.wav", rs.randn(16000) * 0.05)
        (d / "test.tsv").write_text(f"0\tutt0.wav\t{ref}\n")
    return tmp_path / "fleurs"


class TestCliHarness:
    def test_registered(self):
        from fluidaudio_tpu.cli.main import main

        with pytest.raises(SystemExit) as e:
            main(["nemotron-multilingual-fleurs"])
        assert e.value.code == 2

    def test_end_to_end_tiny(self, fleurs_tree, tmp_path, capsys, monkeypatch):
        from fluidaudio_tpu.asr.streaming_nemotron import StreamingNemotronAsrManager
        from fluidaudio_tpu.cli import families as fam
        from fluidaudio_tpu.cli.main import main
        from tests.test_nemotron import TINY_ENC, TINY_MULTI

        monkeypatch.setattr(
            fam, "_make_nemotron",
            lambda args, multilingual=None: StreamingNemotronAsrManager(
                TINY_MULTI, chunk_ms=560, enc_cfg=TINY_ENC),
        )
        dump = tmp_path / "dump.jsonl"
        out = tmp_path / "summary.json"
        rc = main([
            "nemotron-multilingual-fleurs", "--dataset-dir", str(fleurs_tree),
            "--chunk-ms", "560", "--dump-samples", str(dump),
            "--output", str(out),
        ])
        assert rc == 0
        summary = json.loads(out.read_text())
        assert set(summary["languages"]) == {"fr_fr", "cmn_hans_cn"}
        fr = summary["languages"]["fr_fr"]
        assert fr["prompt"] == "fr-FR"
        assert fr["processed"] == 1
        assert 0 <= fr["wer_pct"]
        assert summary["languages"]["cmn_hans_cn"]["prompt"] == "zh-CN"
        # CJK: char-level scoring makes wer == cer
        cn = summary["languages"]["cmn_hans_cn"]
        assert cn["wer_pct"] == cn["cer_pct"]
        assert "macro_wer_pct" in summary
        rows = [json.loads(l) for l in dump.read_text().splitlines()]
        assert len(rows) == 2
        assert {"hyp_raw", "ref_basic_itn", "wer"} <= set(rows[0])
        # reference digits were spelled out for the French row
        fr_row = next(r for r in rows if r["language"] == "fr_fr")
        assert "mille neuf cent soixante seize" in fr_row["ref_basic_itn"]

    def test_prompt_override_and_forced_prefix(self, fleurs_tree, tmp_path,
                                               capsys, monkeypatch):
        from fluidaudio_tpu.asr.streaming_nemotron import StreamingNemotronAsrManager
        from fluidaudio_tpu.cli import families as fam
        from fluidaudio_tpu.cli.main import main
        from tests.test_nemotron import TINY_ENC, TINY_MULTI

        seen = {}
        real_make_state = StreamingNemotronAsrManager.make_state

        def spy_make_state(self, forced_prefix=None):
            seen["forced_prefix"] = forced_prefix
            return real_make_state(self, forced_prefix=forced_prefix)

        monkeypatch.setattr(StreamingNemotronAsrManager, "make_state",
                            spy_make_state)
        monkeypatch.setattr(
            fam, "_make_nemotron",
            lambda args, multilingual=None: StreamingNemotronAsrManager(
                TINY_MULTI, chunk_ms=560, enc_cfg=TINY_ENC),
        )
        out = tmp_path / "s.json"
        rc = main([
            "nemotron-multilingual-fleurs", "--dataset-dir", str(fleurs_tree),
            "--languages", "fr_fr", "--chunk-ms", "560",
            "--prompt-override", "pt-PT", "--forced-prefix",
            "--output", str(out),
        ])
        assert rc == 0
        summary = json.loads(out.read_text())
        assert summary["languages"]["fr_fr"]["prompt"] == "pt-PT"
        assert summary["forced_prefix"] is True
        # tiny placeholder vocab has no <pt-PT> piece -> None fallback
        assert seen["forced_prefix"] is None


class TestForcedPrefixSeeding:
    def test_lang_tag_token_and_state_seed(self):
        from fluidaudio_tpu.asr.streaming_nemotron import StreamingNemotronAsrManager
        from tests.test_nemotron import TINY_ENC, TINY_MULTI

        mgr = StreamingNemotronAsrManager(TINY_MULTI, chunk_ms=560,
                                          enc_cfg=TINY_ENC)
        # inject a tag piece into the tokenizer to exercise the lookup
        mgr.tokenizer._piece_to_id["<fr-FR>"] = 7
        assert mgr.lang_tag_token("fr_fr") == 7
        assert mgr.lang_tag_token("fr-fr") == 7
        assert mgr.lang_tag_token("xx_yy") is None
        state = mgr.make_state(forced_prefix=7)
        assert int(state.dec_state.last_token[0]) == 7
        state0 = mgr.make_state()
        assert int(state0.dec_state.last_token[0]) == mgr.dcfg.blank_id
