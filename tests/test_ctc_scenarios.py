"""CTC decode / ARPA LM / keyword-DP scenario parity suite.

Ports the reference's `CTC/CtcDecoderTests.swift` (greedy collapse rules,
beam-vs-greedy equivalence, log-add-exp identities), `CTC/
ARPALanguageModelTests.swift` (loading, backoff scoring, OOV penalty, LM
influence on beam search), and the behavioral core of
`CustomVocabulary/CtcDPAlgorithmTests.swift` (wildcards free, repeated
tokens require an intervening blank, below-min-score filtering).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from fluidaudio_tpu.asr.custom_vocab.context import WILDCARD_TOKEN_ID
from fluidaudio_tpu.asr.custom_vocab.ctc_spotter import ctc_keyword_dp, spot_keywords
from fluidaudio_tpu.ops.ctc_decode import (
    ARPALanguageModel,
    ctc_beam_search,
    ctc_greedy_decode,
)

BLANK = 0


def greedy_tokens(log_probs: np.ndarray) -> list[int]:
    import jax.numpy as jnp

    lp = jnp.asarray(log_probs[None])
    toks, _frames, counts = ctc_greedy_decode(
        lp, jnp.array([log_probs.shape[0]]), BLANK
    )
    n = int(counts[0])
    return [int(t) for t in np.asarray(toks[0][:n])]


def frame(v: int, V: int = 6, hi: float = 0.0, lo: float = -10.0) -> np.ndarray:
    row = np.full(V, lo, np.float32)
    row[v] = hi
    return row


class TestGreedy:
    def test_simple_sequence(self):
        lp = np.stack([frame(1), frame(2), frame(3)])
        assert greedy_tokens(lp) == [1, 2, 3]

    def test_collapses_repeats(self):
        lp = np.stack([frame(1), frame(1), frame(2), frame(2), frame(2)])
        assert greedy_tokens(lp) == [1, 2]

    def test_blank_allows_repeats(self):
        lp = np.stack([frame(1), frame(BLANK), frame(1)])
        assert greedy_tokens(lp) == [1, 1]

    def test_all_blanks(self):
        lp = np.stack([frame(BLANK)] * 4)
        assert greedy_tokens(lp) == []

    def test_zero_length_row(self):
        import jax.numpy as jnp

        lp = jnp.asarray(np.stack([frame(1), frame(2)])[None])
        _toks, _frames, counts = ctc_greedy_decode(lp, jnp.array([0]), BLANK)
        assert int(counts[0]) == 0


class TestBeam:
    def test_no_lm_matches_greedy(self):
        lp = np.stack([frame(1), frame(BLANK), frame(2), frame(3), frame(BLANK)])
        assert ctc_beam_search(lp, BLANK, beam_width=4) == [1, 2, 3]

    def test_all_blanks(self):
        lp = np.stack([frame(BLANK)] * 3)
        assert ctc_beam_search(lp, BLANK) == []

    def test_empty_input(self):
        lp = np.zeros((0, 6), np.float32)
        assert ctc_beam_search(lp, BLANK) == []

    def test_single_token(self):
        lp = np.stack([frame(4)])
        assert ctc_beam_search(lp, BLANK) == [4]

    def test_repeat_with_blank(self):
        lp = np.stack([frame(1), frame(BLANK), frame(1)])
        assert ctc_beam_search(lp, BLANK) == [1, 1]


ARPA_TEXT = """\
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\thello\t-0.3
-1.5\tworld\t-0.2
-2.0\tfriend\t-0.1

\\2-grams:
-0.4\thello world
-0.9\t<s> hello

\\end\\
"""


@pytest.fixture()
def arpa(tmp_path):
    path = tmp_path / "lm.arpa"
    path.write_text(ARPA_TEXT)
    return ARPALanguageModel.load(path)


class TestArpa:
    def test_load_orders_and_entries(self, arpa):
        assert arpa.order == 2
        assert ("hello",) in arpa.ngrams
        assert ("hello", "world") in arpa.ngrams

    def test_unigram_values(self, arpa):
        logp, backoff = arpa.ngrams[("hello",)]
        assert logp == pytest.approx(-1.2)
        assert backoff == pytest.approx(-0.3)

    def test_bigram_score(self, arpa):
        assert arpa.score(("hello",), "world") == pytest.approx(-0.4)

    def test_fallback_to_unigram_with_backoff(self, arpa):
        # "world friend" has no bigram: unigram(friend) + backoff(world).
        assert arpa.score(("world",), "friend") == pytest.approx(-2.0 + -0.2)

    def test_no_context_skips_backoff(self, arpa):
        assert arpa.score((), "world") == pytest.approx(-1.5)

    def test_oov_gets_unk_penalty(self, arpa):
        assert arpa.score(("hello",), "zebra") == pytest.approx(-99.0)

    def test_load_nonexistent_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ARPALanguageModel.load(tmp_path / "missing.arpa")

    def test_empty_arpa(self, tmp_path):
        path = tmp_path / "empty.arpa"
        path.write_text("\\data\\\n\\end\\\n")
        lm = ARPALanguageModel.load(path)
        assert lm.score((), "anything") == pytest.approx(-99.0)

    def test_lm_influences_beam_result(self, arpa):
        # Acoustics slightly prefer "friend"; the LM's hello-world bigram
        # flips the trailing word (reference finalize pass scores it).
        vocab = {1: "▁hello", 2: "▁friend", 3: "▁world"}
        V = 4
        lp = np.full((2, V), -10.0, np.float32)
        lp[0, 1] = 0.0  # "hello" clear
        lp[1, 2] = math.log(0.55)  # "friend" slightly ahead
        lp[1, 3] = math.log(0.45)
        no_lm = ctc_beam_search(lp, BLANK, beam_width=8, vocabulary=vocab)
        with_lm = ctc_beam_search(
            lp, BLANK, beam_width=8, vocabulary=vocab, lm=arpa, lm_weight=3.0
        )
        assert no_lm == [1, 2]
        assert with_lm == [1, 3]


class TestKeywordDp:
    V = 8

    def lp(self, rows: list[int], hi: float = 0.0, lo: float = -8.0) -> np.ndarray:
        out = np.full((len(rows), self.V), lo, np.float32)
        for t, v in enumerate(rows):
            out[t, v] = hi
        return out

    def test_basic_spot(self):
        lp = self.lp([BLANK, 3, 4, BLANK])
        spots = spot_keywords(lp, {"kw": [3, 4]}, BLANK, min_score=-5.0)
        assert spots and spots[0].keyword == "kw"
        assert spots[0].start_frame <= 1 <= spots[0].end_frame

    def test_below_min_score_filtered(self):
        lp = self.lp([BLANK, BLANK, BLANK, BLANK])  # keyword never appears
        spots = spot_keywords(lp, {"kw": [3, 4]}, BLANK, min_score=-1.0)
        assert spots == []

    def test_repeated_tokens_require_intervening_blank(self):
        # keyword [5, 5]: "5 5" frames WITHOUT a blank can't complete both
        # tokens (CTC repeat rule); "5 blank 5" can.
        no_blank = self.lp([5, 5])
        dp_nb, _ = ctc_keyword_dp(no_blank, [5, 5], BLANK)
        with_blank = self.lp([5, BLANK, 5])
        dp_wb, _ = ctc_keyword_dp(with_blank, [5, 5], BLANK)
        assert dp_wb[3, 2] > dp_nb[2, 2] + 1.0

    def test_wildcard_matches_free(self):
        lp = self.lp([3, 6, 4])  # middle frame is arbitrary
        spots = spot_keywords(
            lp, {"kw": [3, WILDCARD_TOKEN_ID, 4]}, BLANK, min_score=-5.0
        )
        assert spots and spots[0].keyword == "kw"

    def test_dp_score_monotonic_in_time(self):
        lp = self.lp([BLANK, 3, 4, BLANK, BLANK])
        dp, _ = ctc_keyword_dp(lp, [3, 4], BLANK)
        # Best score for the full keyword never decreases as t grows.
        best = -np.inf
        for t in range(dp.shape[0]):
            assert dp[t, 2] >= best - 1e-6 or dp[t, 2] <= -1e29
            best = max(best, dp[t, 2])

    def test_empty_keyword_and_empty_logprobs(self):
        assert spot_keywords(np.zeros((4, self.V), np.float32), {}, BLANK) == []
        assert spot_keywords(np.zeros((0, self.V), np.float32), {"kw": [3]}, BLANK) == []
