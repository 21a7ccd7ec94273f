"""Native library: fastcluster vs scipy golden, ITN rules, sysinfo."""

import numpy as np
import pytest

from fluidaudio_tpu.native import load_native
from fluidaudio_tpu.native.fastcluster import centroid_linkage, cut_tree, native_available
from fluidaudio_tpu.native.sysinfo import current_rss_bytes, peak_rss_bytes
from fluidaudio_tpu.itn import TextNormalizer

needs_native = pytest.mark.skipif(not native_available(), reason="native lib not built")


def test_native_lib_loads():
    assert load_native() is not None, "libfluidaudio_native.so must be built (cmake -S native -B native/build)"


@needs_native
def test_centroid_linkage_matches_scipy():
    from scipy.cluster.hierarchy import linkage

    rng = np.random.RandomState(0)
    # three well-separated gaussian blobs
    pts = np.concatenate([
        rng.randn(10, 8) * 0.05 + 0,
        rng.randn(10, 8) * 0.05 + 3,
        rng.randn(10, 8) * 0.05 - 3,
    ])
    ours = centroid_linkage(pts)
    golden = linkage(pts, method="centroid")
    assert ours.shape == golden.shape
    # merge distances must match (order of equal-distance merges may differ)
    np.testing.assert_allclose(np.sort(ours[:, 2]), np.sort(golden[:, 2]), rtol=1e-8)
    # sizes of the last merge must cover everything
    assert ours[-1, 3] == 30


@needs_native
def test_cut_tree_recovers_blobs():
    rng = np.random.RandomState(1)
    pts = np.concatenate([
        rng.randn(12, 4) * 0.05,
        rng.randn(12, 4) * 0.05 + 5,
    ])
    Z = centroid_linkage(pts)
    labels = cut_tree(Z, len(pts), threshold=1.0)
    assert len(set(labels[:12])) == 1
    assert len(set(labels[12:])) == 1
    assert labels[0] != labels[12]
    # labels renumbered in order of first appearance
    assert labels[0] == 0 and labels[12] == 1


@needs_native
def test_centroid_linkage_rejects_nan():
    from fluidaudio_tpu.native.fastcluster import FastClusterError

    pts = np.zeros((4, 2))
    pts[1, 0] = np.nan
    with pytest.raises(FastClusterError, match="NaN"):
        centroid_linkage(pts)


@needs_native
@pytest.mark.parametrize(
    "spoken,written",
    [
        ("I have twenty three apples", "I have 23 apples"),
        ("one hundred and five people", "105 people"),
        ("three thousand two hundred", "3200"),
        ("five percent", "5%"),
        ("five dollars", "$5"),
        ("the twenty fifth of May", "the 25th of May"),
        ("minus forty degrees", "-40 degrees"),
        ("three point one four", "3.14"),
        ("call five five five one two one two now", "call 5551212 now"),
        ("no numbers here", "no numbers here"),
    ],
)
def test_itn_english(spoken, written):
    tn = TextNormalizer("en")
    assert tn.is_native_available
    assert tn.normalize(spoken) == written


@needs_native
def test_itn_passthrough_other_language():
    # Japanese has no grammar: identity passthrough, supports() False
    tn = TextNormalizer("ja")
    assert tn.normalize("にじゅうさん") == "にじゅうさん"
    assert not tn.supports("ja") and tn.supports("en")
    # German grew a grammar (compound decomposition)
    assert tn.supports("de")
    assert tn.normalize("einundzwanzig", "de") == "21"


def test_sysinfo_rss():
    peak = peak_rss_bytes()
    cur = current_rss_bytes()
    assert peak > 10 * 1024 * 1024  # a python+jax process is >10MB
    assert cur > 10 * 1024 * 1024
    assert peak >= cur / 2  # peak is at least in the vicinity


class TestItnMultilingual:
    """de/fr/es/pt/it/ru number grammars in the C++ engine."""

    @pytest.fixture(scope="class")
    def norm(self):
        from fluidaudio_tpu.itn.normalizer import TextNormalizer

        n = TextNormalizer()
        if not n.is_native_available:
            pytest.skip("native lib not built")
        return n

    @pytest.mark.parametrize("lang,src,want", [
        ("de", "dreihundertvierundzwanzig euro", "€324"),
        ("de", "zweitausendfünfhundert", "2500"),
        ("de", "einundzwanzig prozent", "21%"),
        ("de", "drei komma eins vier", "3.14"),
        ("fr", "vingt-trois euros", "€23"),
        ("fr", "quatre-vingt-dix-neuf", "99"),
        ("fr", "soixante-dix pour cent", "70%"),
        ("fr", "trois virgule cinq", "3.5"),
        ("es", "treinta y dos", "32"),
        ("es", "veintitrés euros", "€23"),
        ("es", "quinientos cuarenta por ciento", "540%"),
        ("es", "dos mil veinticinco", "2025"),
        ("es", "menos cinco coma tres", "-5.3"),
        ("pt", "vinte e três euros", "€23"),
        ("pt", "dois mil e quinze", "2015"),
        ("pt", "cinquenta por cento", "50%"),
        ("it", "ventitré euro", "€23"),
        ("it", "duecentotrentaquattro", "234"),
        ("it", "duemilaventicinque", "2025"),
        ("it", "novantanove per cento", "99%"),
        ("it", "tre virgola uno quattro", "3.14"),
        ("ru", "двадцать три рубля", "₽23"),
        ("ru", "две тысячи двадцать пять", "2025"),
        ("ru", "пятьдесят процентов", "50%"),
        ("ru", "двадцать один процент", "21%"),
        ("ru", "три запятая один четыре", "3.14"),
    ])
    def test_normalize(self, norm, lang, src, want):
        assert norm.normalize(src, lang) == want

    def test_supports_reports_new_languages(self, norm):
        for lang in ("de", "fr", "es", "pt", "it", "ru"):
            assert norm.supports(lang), lang
        assert not norm.supports("ja")

    def test_unsupported_language_is_identity(self, norm):
        assert norm.normalize("にじゅうさん", "ja") == "にじゅうさん"


class TestItnDatesTimesFractionsMoney:
    """Round-2 grammar depth: dates, times, fractions, money composition,
    and the ambiguity gate (reference `ITN/TextNormalizer.swift:21-133`;
    the gate stands in for its NLTagger pass)."""

    @pytest.fixture(scope="class")
    def norm(self):
        from fluidaudio_tpu.itn.normalizer import TextNormalizer

        n = TextNormalizer()
        if not n.is_native_available:
            pytest.skip("native lib not built")
        return n

    @pytest.mark.parametrize("lang,src,want", [
        # --- dates ---
        ("en", "june third twenty twenty five", "june 3 2025"),
        ("en", "march twenty first", "march 21"),
        ("en", "the twenty second of may", "the 22nd of may"),
        ("de", "dritter oktober zweitausendzwanzig", "3. oktober 2020"),
        ("fr", "le trois octobre deux mille vingt", "le 3 octobre 2020"),
        ("es", "tres de octubre de dos mil veinte", "3 de octubre de 2020"),
        ("pt", "três de outubro", "3 de outubro"),
        ("it", "tre ottobre duemilaventi", "3 ottobre 2020"),
        ("ru", "третьего марта", "3 марта"),
        # --- times ---
        ("en", "five thirty p m", "5:30 p.m."),
        ("en", "seven fifteen am", "7:15 a.m."),
        ("en", "ten o'clock", "10 o'clock"),
        ("en", "five pm", "5 p.m."),
        ("de", "drei uhr dreißig", "3:30 uhr"),
        ("fr", "trois heures trente", "3 h 30"),
        # --- fractions ---
        ("en", "three quarters of the cake", "3/4 of the cake"),
        ("en", "one half", "1/2"),
        ("en", "five and two thirds", "5 2/3"),
        # --- money composition ---
        ("en", "five dollars and thirty cents", "$5.30"),
        ("en", "three pounds fifty pence", "£3.50"),
        ("de", "drei euro und fünfzig cent", "€3.50"),
        ("fr", "trois euros et cinquante centimes", "€3.50"),
        ("es", "tres euros con cincuenta céntimos", "€3.50"),
        ("pt", "dois euros e vinte centavos", "€2.20"),
        ("it", "tre euro e cinquanta centesimi", "€3.50"),
        ("ru", "три рубля пятьдесят копеек", "₽3.50"),
    ])
    def test_vectors(self, norm, lang, src, want):
        assert norm.normalize(src, lang) == want

    @pytest.mark.parametrize("src", [
        "may i help you",          # month word with no day context
        "wait a second please",    # time-unit noun, not an ordinal
        "march on the city",       # verb, no day context
    ])
    def test_ambiguity_gate(self, norm, src):
        assert norm.normalize(src, "en") == src


class TestItnReviewRegressions:
    """Fixes from the round-2 review: ordinal lookback, decimal suffixes,
    bare connectives, single-token decimal digits."""

    def test_hundreds_ordinal_merge(self):
        from fluidaudio_tpu.itn import TextNormalizer

        tn = TextNormalizer("en")
        assert "125th" in tn.normalize("the one hundred twenty fifth anniversary")

    def test_comma_blocks_ordinal_merge(self):
        from fluidaudio_tpu.itn import TextNormalizer

        tn = TextNormalizer("en")
        out = tn.normalize("I counted twenty, fifth place")
        assert "20," in out and "5th" in out

    def test_decimal_keeps_sentence_period(self):
        from fluidaudio_tpu.itn import TextNormalizer

        assert "3.5." in TextNormalizer("en").normalize(
            "the price is three point five. next sentence")

    def test_french_bare_et_not_consumed(self):
        from fluidaudio_tpu.itn import TextNormalizer

        tn = TextNormalizer("fr")
        assert "et" in tn.normalize("soixante et quelques")
        assert "71" in tn.normalize("soixante et onze personnes")

    def test_spanish_leading_zero_decimal(self):
        from fluidaudio_tpu.itn import TextNormalizer

        assert "3.05" in TextNormalizer("es").normalize("tres coma cero cinco")


class TestCustomRules:
    """TextNormalizerTests.swift custom-rule surface
    (ITN/TextNormalizer.swift:289-330) against the native engine."""

    @pytest.fixture()
    def tn(self):
        from fluidaudio_tpu.itn import TextNormalizer

        t = TextNormalizer("en")
        if not t.is_native_available:
            pytest.skip("native ITN library not built")
        t.clear_rules()
        yield t
        t.clear_rules()

    def test_add_rule_applies_before_builtins(self, tn):
        tn.add_rule("gee pee tee", "GPT")
        assert tn.rule_count == 1
        assert tn.normalize("ask gee pee tee something") == "ask GPT something"

    def test_rule_matching_is_case_insensitive(self, tn):
        tn.add_rule("Gee Pee Tee", "GPT")
        assert tn.normalize("Gee pee TEE rocks") == "GPT rocks"

    def test_longer_phrase_wins(self, tn):
        tn.add_rule("open ai", "OpenAI")
        tn.add_rule("open ai whisper", "Whisper")
        assert tn.normalize("use open ai whisper now") == "use Whisper now"
        assert tn.normalize("use open ai now") == "use OpenAI now"

    def test_punctuation_preserved_around_match(self, tn):
        tn.add_rule("gee pee tee", "GPT")
        assert tn.normalize("(gee pee tee),") == "(GPT),"

    def test_remove_and_clear(self, tn):
        tn.add_rule("a b", "AB")
        tn.add_rule("c d", "CD")
        assert tn.rule_count == 2
        assert tn.remove_rule("a b") is True
        assert tn.remove_rule("a b") is False
        assert tn.rule_count == 1
        tn.clear_rules()
        assert tn.rule_count == 0
        assert tn.normalize("c d") == "c d"

    def test_readding_same_spoken_replaces(self, tn):
        tn.add_rule("x y", "XY")
        tn.add_rule("x y", "ZZ")
        assert tn.rule_count == 1
        assert tn.normalize("x y") == "ZZ"

    def test_rules_apply_in_unsupported_language(self, tn):
        tn.add_rule("nee how", "nihao")
        assert tn.normalize("say nee how", language="zz") == "say nihao"

    def test_rules_compose_with_number_taggers(self, tn):
        tn.add_rule("dollars", "USD")
        # rule runs first, so the currency tagger no longer sees "dollars"
        out = tn.normalize("five dollars")
        assert out == "5 USD"

    def test_version_string(self, tn):
        assert tn.version and "itn" in tn.version

    def test_ambiguous_words_catalog(self):
        from fluidaudio_tpu.itn.normalizer import AMBIGUOUS_WORDS, TextNormalizer

        assert "period" in AMBIGUOUS_WORDS and "percent" in AMBIGUOUS_WORDS
        # the filter preserves natural-language sentences verbatim
        s = "The period of history known as the Renaissance."
        assert TextNormalizer.filter_ambiguous_words(s) == s
