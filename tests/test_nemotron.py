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
    # missing file throws (reference testLoadNonExistentFileThrows);
    # the MANAGER falls back to the builtin locale table when no
    # metadata.json exists (_load_metadata existence check)
    with pytest.raises(OSError):
        NemotronMultilingualMetadata.load(tmp_path / "missing.json")


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


# --------------------------------------------------------------------------
# Metadata loading matrix (NemotronStreamingConfigTests.swift:37-210) +
# prompt-id resolution fallbacks (NemotronMultilingualTests.swift:70-104)
# --------------------------------------------------------------------------


class TestMetadataLoading:
    def _write(self, tmp_path, content):
        p = tmp_path / "metadata.json"
        p.write_text(content)
        return p

    def test_full_metadata_loads(self, tmp_path):
        import json

        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        p = self._write(tmp_path, json.dumps({
            "num_prompts": 64,
            "default_prompt_id": 7,
            "prompt_dictionary": {"en-US": 1, "de-DE": 2},
            "lang_tag_token_ids": [5, 6],
        }))
        m = NemotronMultilingualMetadata.load(p)
        assert m.num_prompts == 64
        assert m.default_prompt_id == 7
        assert m.prompt_dictionary == {"en-US": 1, "de-DE": 2}
        assert m.lang_tag_token_ids == frozenset({5, 6})

    def test_partial_json_uses_defaults(self, tmp_path):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        m = NemotronMultilingualMetadata.load(
            self._write(tmp_path, '{"num_prompts": 32}')
        )
        assert m.num_prompts == 32
        assert m.default_prompt_id == 101
        assert m.prompt_dictionary == {"auto": 101}
        assert m.lang_tag_token_ids == frozenset()

    def test_empty_json_all_defaults(self, tmp_path):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        m = NemotronMultilingualMetadata.load(self._write(tmp_path, "{}"))
        assert (m.num_prompts, m.default_prompt_id) == (128, 101)

    def test_invalid_json_raises(self, tmp_path):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        with pytest.raises(ValueError):
            NemotronMultilingualMetadata.load(self._write(tmp_path, "{not json"))

    def test_array_root_raises(self, tmp_path):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        with pytest.raises(ValueError, match="object"):
            NemotronMultilingualMetadata.load(self._write(tmp_path, "[1, 2]"))

    def test_missing_file_raises(self, tmp_path):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        with pytest.raises(OSError):
            NemotronMultilingualMetadata.load(tmp_path / "absent.json")

    def test_wrong_types_use_defaults(self, tmp_path):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        m = NemotronMultilingualMetadata.load(self._write(
            tmp_path,
            '{"num_prompts": "many", "default_prompt_id": true,'
            ' "prompt_dictionary": [1], "lang_tag_token_ids": {"a": 1}}',
        ))
        assert m.num_prompts == 128
        assert m.default_prompt_id == 101
        assert m.prompt_dictionary == {"auto": 101}
        assert m.lang_tag_token_ids == frozenset()


class TestPromptIdResolution:
    def _meta(self):
        from fluidaudio_tpu.asr.streaming_nemotron import NemotronMultilingualMetadata

        return NemotronMultilingualMetadata(
            prompt_dictionary={"en-US": 1, "de-DE": 2, "pt-BR": 3, "auto": 101},
        )

    def test_direct_lookup(self):
        assert self._meta().prompt_id("en-US") == 1

    def test_none_falls_back_to_default(self):
        assert self._meta().prompt_id(None) == 101
        assert self._meta().prompt_id("") == 101

    def test_underscore_normalization(self):
        assert self._meta().prompt_id("en_US") == 1

    def test_case_normalization(self):
        assert self._meta().prompt_id("EN-us") == 1

    def test_bare_language_prefix_fallback(self):
        assert self._meta().prompt_id("de") == 2
        assert self._meta().prompt_id("pt") == 3

    def test_unknown_language_returns_default(self):
        assert self._meta().prompt_id("xx-YY") == 101


def test_tier_raw_values_and_repo_mapping():
    """NemotronChunkSizeTests.swift:10-58 — tier table + ordering."""
    from fluidaudio_tpu.asr.streaming_nemotron import NEMOTRON_TIERS_MS

    assert NEMOTRON_TIERS_MS == (560, 1120, 2240)
    # chunk samples at 16 kHz
    assert [ms * 16 for ms in NEMOTRON_TIERS_MS] == [8960, 17920, 35840]
