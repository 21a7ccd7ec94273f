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


def test_multilingual_metadata_prompt_resolution(tmp_path):
    import json

    from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

    meta = {
        "num_prompts": 128,
        "default_prompt_id": 101,
        "prompt_dictionary": {"auto": 101, "en-US": 3, "zh-CN": 7, "de-DE": 9},
        "lang_tag_token_ids": [13000, 13001],
    }
    f = tmp_path / "metadata.json"
    f.write_text(json.dumps(meta))
    m = NemotronMultilingualMetadata.load(f)
    assert m.prompt_id("en-US") == 3
    assert m.prompt_id("en_us") == 3       # underscore + casing fallback
    assert m.prompt_id("EN-us") == 3
    assert m.prompt_id("zh") == 7          # bare-prefix fallback
    assert m.prompt_id("auto") == 101
    assert m.prompt_id(None) == 101
    assert m.prompt_id("xx-YY") == 101     # unknown -> default
    assert 13000 in m.lang_tag_token_ids
    # missing file -> reference defaults
    d = NemotronMultilingualMetadata.load(tmp_path / "missing.json")
    assert d.default_prompt_id == 101 and d.prompt_dictionary == {"auto": 101}


def test_multilingual_lang_tag_filtering(tmp_path):
    """Lang-tag token ids are stripped from transcripts and surfaced as the
    detected language."""
    import json

    import numpy as np

    from fluidaudio_tpu.asr.streaming_nemotron import (
        NEMOTRON_MULTI_LATIN,
        StreamingNemotronAsrManager,
    )

    spec = NEMOTRON_MULTI_LATIN
    # tiny spec clone for CPU
    from dataclasses import replace

    tiny = replace(spec, vocab_size=32)
    (tmp_path / "metadata.json").write_text(json.dumps({
        "prompt_dictionary": {"auto": 5, "de-DE": 2},
        "default_prompt_id": 5,
        "num_prompts": 8,
        "lang_tag_token_ids": [3],
    }))
    from fluidaudio_tpu.models.conformer_streaming import StreamingConformerConfig

    mgr = StreamingNemotronAsrManager(
        tiny, chunk_ms=1120, language="de-DE", checkpoint_dir=tmp_path,
        enc_cfg=StreamingConformerConfig(d_model=64, n_layers=2, n_heads=4),
    )
    assert mgr.prompt_id == 2
    state = mgr.make_state()
    rng = np.random.RandomState(0)
    mgr.process(rng.randn(mgr.chunk_samples + 400).astype(np.float32) * 0.1, state)
    # any emitted lang-tag id must not appear in the transcript token list
    assert all(t != 3 for t in state.tokens)
