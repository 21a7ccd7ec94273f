"""Nemotron streaming ASR (tiny model): tiers, prompt conditioning."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.streaming_nemotron import (
    NEMOTRON_EN,
    NemotronSpec,
    StreamingNemotronAsrManager,
)
from fluidaudio_tpu.models.conformer_streaming import StreamingConformerConfig
from fluidaudio_tpu.registry import Repo

TINY_ENC = StreamingConformerConfig(
    d_model=64, n_layers=2, n_heads=4, att_context_left=16, subsampling_channels=16
)
TINY_EN = NemotronSpec("tiny-en", Repo.NEMOTRON_EN, vocab_size=32, d_model=64, n_layers=2)
TINY_MULTI = NemotronSpec(
    "tiny-multi", Repo.NEMOTRON_MULTILINGUAL, vocab_size=32, d_model=64, n_layers=2,
    multilingual=True,
)


@pytest.fixture(scope="module")
def manager():
    return StreamingNemotronAsrManager(TINY_EN, chunk_ms=560, enc_cfg=TINY_ENC)


def test_tier_chunking(manager):
    assert manager.chunk_samples == 8960
    rng = np.random.RandomState(0)
    state = manager.make_state()
    partials = manager.process((rng.randn(20_000) * 0.1).astype(np.float32), state)
    assert len(partials) == 2  # two full 560 ms chunks fit
    final = manager.finish(state)
    assert isinstance(final.text, str) and final.is_final


def test_multilingual_prompt_changes_output():
    m_es = StreamingNemotronAsrManager(
        TINY_MULTI, chunk_ms=560, enc_cfg=TINY_ENC, language="es"
    )
    rng = np.random.RandomState(1)
    audio = (rng.randn(10_000) * 0.1).astype(np.float32)
    s1 = m_es.make_state()
    m_es.process(audio, s1)
    tokens_es = list(s1.tokens)
    # same weights, different prompt
    m_fr = StreamingNemotronAsrManager(
        TINY_MULTI, chunk_ms=560, enc_cfg=TINY_ENC, language="fr"
    )
    s2 = m_fr.make_state()
    m_fr.process(audio, s2)
    # different language prompt conditions the encoder (usually different output)
    assert m_es.prompt_id != m_fr.prompt_id
