"""StreamingModelVariant catalog scenario ports
(StreamingAsrManagerTests.swift:32-160)."""

import pytest

from fluidaudio_tpu.asr.streaming_variants import (
    STREAMING_VARIANTS,
    StreamingVariant,
    create_streaming_manager,
)
from fluidaudio_tpu.registry.model_names import Repo


def test_all_variants_count():
    # 3 EOU tiers + 3 Nemotron tiers + 4 unified streaming + offline = 11
    assert len(STREAMING_VARIANTS) == 11


def test_all_variants_have_display_name_and_repo():
    for key, v in STREAMING_VARIANTS.items():
        assert v.display_name
        assert isinstance(v.repo, Repo)
        assert v.key == key


def test_raw_value_round_trip():
    for key in STREAMING_VARIANTS:
        assert STREAMING_VARIANTS[key].key == key


def test_engine_family_grouping():
    fams = {}
    for v in STREAMING_VARIANTS.values():
        fams.setdefault(v.family, []).append(v.key)
    assert len(fams["eou"]) == 3
    assert len(fams["nemotron"]) == 3
    assert len(fams["unified"]) == 4
    assert len(fams["unified-offline"]) == 1


def test_eou_variants_have_chunk_size():
    for v in STREAMING_VARIANTS.values():
        if v.family == "eou":
            assert v.chunk_ms in (160, 320, 1280)
            assert v.chunk_seconds is None  # no unified-style windows


def test_nemotron_variants_have_chunk_size():
    for v in STREAMING_VARIANTS.values():
        if v.family == "nemotron":
            assert v.chunk_ms in (560, 1120, 2240)


def test_unified_variants_have_window_tiers_not_chunk_ms():
    for v in STREAMING_VARIANTS.values():
        if v.family == "unified":
            assert v.chunk_ms is None
            assert v.chunk_seconds and v.right_context_seconds is not None
            # advertised latency = chunk + right context
            assert v.latency_ms == round(
                (v.chunk_seconds + v.right_context_seconds) * 1000
            )


def test_repos_match_families():
    for v in STREAMING_VARIANTS.values():
        expected = {
            "eou": Repo.PARAKEET_EOU,
            "nemotron": Repo.NEMOTRON_EN,
            "unified": Repo.PARAKEET_UNIFIED,
            "unified-offline": Repo.PARAKEET_UNIFIED,
        }[v.family]
        assert v.repo is expected


def test_unknown_variant_raises():
    with pytest.raises(KeyError):
        create_streaming_manager("not-a-variant")


@pytest.mark.parametrize("key", ["parakeet-eou-160ms", "parakeet-unified-320ms",
                                 "parakeet-unified-offline-15s"])
def test_factory_creates_engines(key):
    m = create_streaming_manager(key)
    assert m is not None


def test_factory_accepts_variant_object():
    v = StreamingVariant("custom", "Custom", "eou", Repo.PARAKEET_EOU,
                         chunk_ms=320)
    m = create_streaming_manager(v)
    assert m is not None
