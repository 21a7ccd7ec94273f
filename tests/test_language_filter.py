"""Decode-time language filtering: vocab masks, in-jit rerank, and the
differential filtered-vs-unfiltered decode on a Cyrillic-vocab fixture
(reference `TdtDecoderV3.swift:33-78,620-700`,
`Shared/TokenLanguageFilter.swift:4-45`)."""

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.ops.tdt_decode import (
    TdtDecodeConfig,
    language_filter_rerank,
    make_initial_state,
    tdt_greedy_decode,
)
from fluidaudio_tpu.utils.language import TokenLanguageFilter


def test_mask_scripts_and_blocklist():
    vocab = {0: "▁привет", 1: "▁hello", 2: "▁the", 3: ",", 4: "▁мир", 5: "▁bonjour"}
    ru = TokenLanguageFilter("ru", vocab)
    assert {0, 3, 4} <= ru.allowed and 1 not in ru.allowed
    fr = TokenLanguageFilter("fr", vocab)
    # latin allowed, but English-blocklist word "the" demoted for non-en latin
    assert 1 in fr.allowed and 5 in fr.allowed and 2 not in fr.allowed
    en = TokenLanguageFilter("en", vocab)
    assert 2 in en.allowed  # blocklist only applies to non-English targets


def test_rerank_swaps_wrong_script_top1():
    # vocab: 0 cyrillic, 1 latin, 2 punct(allowed), 3 blank
    allowed = jnp.asarray([True, False, True, False])
    logits = jnp.asarray([[1.0, 3.0, 0.5, 0.2]])  # top-1 = latin (not allowed)
    k = jnp.argmax(logits, -1).astype(jnp.int32)
    conf = jnp.ones((1,))
    new_k, new_conf = language_filter_rerank(logits, k, conf, allowed, blank_id=3,
                                             top_k=3)
    assert int(new_k[0]) == 0  # best allowed candidate
    assert 0.0 < float(new_conf[0]) < 1.0
    # blank top-1 is never replaced
    logits_b = jnp.asarray([[0.1, 0.2, 0.3, 9.0]])
    kb = jnp.argmax(logits_b, -1).astype(jnp.int32)
    nk, _ = language_filter_rerank(logits_b, kb, conf, allowed, blank_id=3, top_k=3)
    assert int(nk[0]) == 3
    # no allowed candidate in top-K -> original stands
    none_allowed = jnp.asarray([False, False, False, False])
    nk2, _ = language_filter_rerank(logits, k, conf, none_allowed, blank_id=3,
                                    top_k=3)
    assert int(nk2[0]) == 1


def test_filtered_vs_unfiltered_decode_diverge():
    """Joint rigged so latin tokens edge out cyrillic ones: the ru-filtered
    decode must emit cyrillic tokens, the unfiltered one latin."""
    V = 6  # ids: 0..2 cyrillic, 3..4 latin, 5 blank
    blank = 5
    cfg = TdtDecodeConfig(blank_id=blank, durations=(0, 1, 2), max_symbols_per_step=3,
                          max_tokens=8)
    B, T, D, H = 1, 4, 4, 4

    def predictor_step(tokens, h, c):
        g = jnp.zeros((tokens.shape[0], H))
        return g, h, c

    bias = jnp.asarray([1.0, 0.9, 0.8, 1.2, 1.1, 0.0])  # latin 3 beats cyrillic 0

    def joint_logits(f, g):
        # token logits from the bias, blank fires when f sum negative
        tok = jnp.tile(bias[None, :], (f.shape[0], 1))
        blank_boost = jnp.where(f.sum(-1, keepdims=True) < 0, 10.0, 0.0)
        tok = tok.at[:, blank].add(blank_boost[:, 0])
        dur = jnp.tile(jnp.asarray([[0.0, 5.0, 0.0]]), (f.shape[0], 1))  # dur=1
        return jnp.concatenate([tok, dur], axis=-1)

    enc = jnp.ones((B, T, D))
    lengths = jnp.full((B,), T, jnp.int32)
    state = make_initial_state(cfg, 1, H, B)

    plain = tdt_greedy_decode(cfg, predictor_step, joint_logits, enc, lengths, state)
    allowed = jnp.asarray([True, True, True, False, False, False])  # ru mask
    filt = tdt_greedy_decode(cfg, predictor_step, joint_logits, enc, lengths,
                             make_initial_state(cfg, 1, H, B), allowed_mask=allowed)

    n_p, n_f = int(plain.counts[0]), int(filt.counts[0])
    assert n_p > 0 and n_f > 0
    assert all(int(t) == 3 for t in plain.tokens[0][:n_p])  # latin winner
    assert all(int(t) == 0 for t in filt.tokens[0][:n_f])  # swapped to cyrillic


def test_manager_transcribe_language_and_state(tiny_asr_manager=None):
    """transcribe(language=...) compiles a masked pipeline; decoder_state is
    returned and accepted back (caller-held carry)."""
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load("test-tiny", allow_random_init=True)
    mgr = AsrManager(models, ASRConfig())
    rng = np.random.RandomState(0)
    audio = (rng.randn(16_000) * 0.1).astype(np.float32)

    r1 = mgr.transcribe(audio, language="en")
    assert r1.decoder_state is not None
    r2 = mgr.transcribe(audio, language="en", decoder_state=r1.decoder_state)
    assert r2.decoder_state is not None
    # language key gets its own compiled pipeline
    assert any(k[-1] == "en" for k in mgr._pipeline_cache
               if isinstance(k, tuple) and len(k) >= 3)


class TestEnglishBlocklistScenarios:
    """EnglishBlocklistTests.swift:20-110 mapped onto the fused rerank:
    a blank top-1 is never substituted, a non-blocked label stands, and a
    blocked label with no allowed top-K alternative stands too."""

    BLANK = 7

    def _rerank(self, logits_row, allowed):
        import jax.numpy as jnp

        from fluidaudio_tpu.ops.tdt_decode import language_filter_rerank

        logits = jnp.asarray([logits_row], jnp.float32)
        k = jnp.argmax(logits, axis=-1)
        conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
        new_k, new_conf = language_filter_rerank(
            logits, k.astype(jnp.int32), conf,
            jnp.asarray(allowed, bool), self.BLANK, top_k=4,
        )
        return int(new_k[0]), float(new_conf[0])

    def test_no_substitution_when_label_is_blank(self):
        # blank wins; ids 0/1 are blocked English words — blank must stand
        logits = [1.0, 0.5, 0.1, 0.1, 0.1, 0.1, 0.1, 3.0]
        allowed = [False, False, True, True, True, True, True, False]
        k, _ = self._rerank(logits, allowed)
        assert k == self.BLANK

    def test_no_substitution_when_label_not_in_blocklist(self):
        # top-1 is an allowed token: stands with its own confidence
        logits = [0.1, 2.0, 1.0, 0.1, 0.1, 0.1, 0.1, 0.0]
        allowed = [False, True, True, True, True, True, True, False]
        k, _ = self._rerank(logits, allowed)
        assert k == 1

    def test_no_substitution_when_no_valid_alternative_in_top_k(self):
        # top-K holds only blocked tokens + blank: the original stands
        logits = [3.0, 2.0, 1.5, 1.0, 0.0, 0.0, 0.0, 0.5]
        allowed = [False, False, False, False, True, True, True, False]
        k, _ = self._rerank(logits, allowed)
        assert k == 0

    def test_substitutes_best_allowed_alternative(self):
        # blocked ' the' top-1 swaps for the best allowed candidate
        logits = [3.0, 2.0, 1.5, 0.1, 0.0, 0.0, 0.0, 0.2]
        allowed = [False, True, True, True, True, True, True, False]
        k, conf = self._rerank(logits, allowed)
        assert k == 1
        assert 0 < conf <= 1

    def test_english_blocklist_words_catalog(self):
        from fluidaudio_tpu.utils.language import TokenLanguageFilter

        f = TokenLanguageFilter("fr", {0: "▁le"})
        # full TdtDecoderV3.swift:40-78 word list
        for w in ("the", "would", "could", "these", "him", "whose"[:3]):
            assert w in f.english_blocklist
        assert "rendre" not in f.english_blocklist
        # French Latin words stay allowed; blocklisted English pieces drop
        fr = TokenLanguageFilter("fr", {0: "▁le", 1: "▁would", 2: "▁rendre"})
        assert 0 in fr.allowed and 2 in fr.allowed and 1 not in fr.allowed
