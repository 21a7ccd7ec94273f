"""Registry / download-validation scenario parity suite.

Ports the reference's `Shared/ModelRegistryTests.swift` (base-URL priority:
programmatic > REGISTRY_URL > MODEL_REGISTRY_URL > huggingface.co,
persistence), `DownloadArtifactValidationTests.swift` (HTML/XML error-page
detection vs binary weights and JSON), and `DownloadUtilsOfflineTests.swift`
(typed OfflineError under offline enforcement, cached files still served).
"""

from __future__ import annotations

import numpy as np
import pytest

from fluidaudio_tpu.registry import DownloadUtils, ModelRegistry, Repo
from fluidaudio_tpu.registry.download import _looks_like_html
from fluidaudio_tpu.registry.registry import OfflineError


@pytest.fixture(autouse=True)
def clean_registry(monkeypatch, tmp_path):
    monkeypatch.delenv("REGISTRY_URL", raising=False)
    monkeypatch.delenv("MODEL_REGISTRY_URL", raising=False)
    monkeypatch.delenv("FLUID_OFFLINE", raising=False)
    monkeypatch.setenv("FLUID_CACHE_DIR", str(tmp_path))
    ModelRegistry.set_base_url(None)
    ModelRegistry._offline = None
    yield
    ModelRegistry.set_base_url(None)
    ModelRegistry._offline = None


class TestBaseUrlPriority:
    def test_default_registry_url(self):
        assert ModelRegistry.base_url() == "https://huggingface.co"

    def test_registry_url_environment_variable(self, monkeypatch):
        monkeypatch.setenv("REGISTRY_URL", "https://mirror.example.com")
        assert ModelRegistry.base_url() == "https://mirror.example.com"

    def test_model_registry_url_environment_variable(self, monkeypatch):
        monkeypatch.setenv("MODEL_REGISTRY_URL", "https://alt.example.com")
        assert ModelRegistry.base_url() == "https://alt.example.com"

    def test_registry_url_wins_over_model_registry_url(self, monkeypatch):
        monkeypatch.setenv("MODEL_REGISTRY_URL", "https://alt.example.com")
        monkeypatch.setenv("REGISTRY_URL", "https://primary.example.com")
        assert ModelRegistry.base_url() == "https://primary.example.com"

    def test_programmatic_override_highest_priority(self, monkeypatch):
        monkeypatch.setenv("REGISTRY_URL", "https://mirror.example.com")
        ModelRegistry.set_base_url("https://programmatic.example.com")
        assert ModelRegistry.base_url() == "https://programmatic.example.com"

    def test_registry_url_persistence(self):
        ModelRegistry.set_base_url("https://sticky.example.com")
        assert ModelRegistry.base_url() == "https://sticky.example.com"
        assert ModelRegistry.base_url() == "https://sticky.example.com"
        ModelRegistry.set_base_url(None)
        assert ModelRegistry.base_url() == "https://huggingface.co"

    def test_cache_dir_override(self, tmp_path):
        assert ModelRegistry.cache_dir() == tmp_path
        assert ModelRegistry.models_dir() == tmp_path / "Models"


class TestArtifactValidation:
    def test_detects_doctype(self):
        assert _looks_like_html(b"<!DOCTYPE html><html>...")

    def test_detects_leading_whitespace_and_casing(self):
        assert _looks_like_html(b"  \n\t<!DocType HTML>")
        assert _looks_like_html(b"\n<HTML><head>")

    def test_detects_xml_proxy_envelope(self):
        assert _looks_like_html(b"<?xml version=\"1.0\"?><Error>")

    def test_allows_binary_weights(self):
        head = np.arange(16, dtype=np.float32).tobytes()
        assert not _looks_like_html(head)
        assert not _looks_like_html(b"PK\x03\x04npz-zip-header")

    def test_allows_json(self):
        assert not _looks_like_html(b'{"model_type": "bert"}')
        assert not _looks_like_html(b'  ["a", "b"]')


class TestOffline:
    def test_enforce_offline_raises_typed_error(self):
        ModelRegistry.enforce_offline(True)
        repo = list(Repo)[0]
        with pytest.raises(OfflineError):
            DownloadUtils.fetch_file(repo, "definitely-not-cached.bin")

    def test_offline_env_variable(self, monkeypatch):
        monkeypatch.setenv("FLUID_OFFLINE", "1")
        assert ModelRegistry.offline()

    def test_enforce_offline_false_overrides_env(self, monkeypatch):
        monkeypatch.setenv("FLUID_OFFLINE", "1")
        ModelRegistry.enforce_offline(False)
        assert not ModelRegistry.offline()

    def test_offline_serves_cached_files(self):
        ModelRegistry.enforce_offline(True)
        repo = list(Repo)[0]
        dest = DownloadUtils.repo_dir(repo) / "cached.bin"
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(b"weights")
        assert DownloadUtils.fetch_file(repo, "cached.bin") == dest

    def test_offline_error_message_names_repo(self):
        ModelRegistry.enforce_offline(True)
        repo = list(Repo)[0]
        with pytest.raises(OfflineError) as exc:
            DownloadUtils.fetch_file(repo, "missing.bin")
        assert repo.spec.name in str(exc.value)


class TestTokensAndProxies:
    def test_hf_token_from_env(self, monkeypatch):
        monkeypatch.delenv("HF_TOKEN", raising=False)
        monkeypatch.delenv("HUGGING_FACE_HUB_TOKEN", raising=False)
        assert ModelRegistry.hf_token() is None
        monkeypatch.setenv("HF_TOKEN", "hf_abc")
        assert ModelRegistry.hf_token() == "hf_abc"

    def test_proxies_parsed_from_env(self, monkeypatch):
        monkeypatch.delenv("http_proxy", raising=False)
        monkeypatch.delenv("https_proxy", raising=False)
        monkeypatch.delenv("HTTP_PROXY", raising=False)
        monkeypatch.delenv("HTTPS_PROXY", raising=False)
        assert ModelRegistry.proxies() == {}
        monkeypatch.setenv("https_proxy", "http://proxy:8080")
        assert ModelRegistry.proxies() == {"https": "http://proxy:8080"}


# --------------------------------------------------------------------------
# Model catalog surface (ModelNamesTests.swift:10-308, AsrModelsTests.swift)
# --------------------------------------------------------------------------


class TestModelCatalog:
    def test_repo_remote_path_contains_owner(self):
        from fluidaudio_tpu.registry.model_names import Repo

        for repo in Repo:
            assert repo.spec.name.startswith("FluidInference/"), repo

    def test_repo_names_non_empty_and_unique(self):
        from fluidaudio_tpu.registry.model_names import Repo

        names = [r.spec.name for r in Repo]
        folders = [r.folder_name for r in Repo]
        assert all(names) and all(folders)
        assert len(set(names)) == len(names)
        assert len(set(folders)) == len(folders)

    def test_folder_names_are_fs_safe(self):
        from fluidaudio_tpu.registry.model_names import Repo

        for r in Repo:
            assert "/" not in r.folder_name and " " not in r.folder_name

    def test_required_models_non_empty_for_core_families(self):
        from fluidaudio_tpu.registry.model_names import Repo, required_models

        for repo in (Repo.VAD, Repo.PARAKEET_V3, Repo.PARAKEET_V2,
                     Repo.DIARIZER, Repo.OFFLINE_DIARIZER, Repo.SORTFORMER,
                     Repo.KOKORO_ANE, Repo.POCKET_TTS):
            assert required_models(repo), repo

    def test_parakeet_required_models_structure(self):
        from fluidaudio_tpu.registry.model_names import Repo, required_models

        v3 = required_models(Repo.PARAKEET_V3)
        assert {"preprocessor", "encoder", "decoder", "joint", "vocab"} <= set(v3)
        # EOU uses a fused frontend: no separate preprocessor
        assert "preprocessor" not in required_models(Repo.PARAKEET_EOU)

    def test_offline_diarizer_required_models(self):
        from fluidaudio_tpu.registry.model_names import Repo, required_models

        assert set(required_models(Repo.OFFLINE_DIARIZER)) == {
            "segmentation", "fbank", "embedding", "plda_rho", "plda_parameters",
        }

    def test_kokoro_variant_repos_exist(self):
        from fluidaudio_tpu.registry.model_names import Repo

        assert Repo.KOKORO_ANE_ZH.folder_name == "kokoro-ane-zh"
        assert Repo.KOKORO_ANE_JA.folder_name == "kokoro-ane-ja"

    def test_catalog_covers_every_workload_family(self):
        from fluidaudio_tpu.registry.model_names import Repo

        folders = {r.folder_name for r in Repo}
        for needle in ("silero-vad", "parakeet-v3", "nemotron-en",
                       "sensevoice", "paraformer", "cohere-asr", "diarizer",
                       "sortformer", "ls-eend", "kokoro", "pocket-tts",
                       "styletts2", "supertonic3", "charsiu-g2p"):
            assert needle in folders, needle


# --------------------------------------------------------------------------
# Artifact validation matrix (DownloadArtifactValidationTests.swift:88-150)
# --------------------------------------------------------------------------


class TestArtifactValidation:
    def _file(self, tmp_path, data: bytes):
        p = tmp_path / "artifact.bin"
        p.write_bytes(data)
        return p

    def test_valid_artifact_passes(self, tmp_path):
        from fluidaudio_tpu.registry.download import validate_artifact

        p = self._file(tmp_path, b"\x00\x01weights")
        validate_artifact(p, expected_size=9, content_type="application/octet-stream")

    def test_unknown_size_skips_size_check(self, tmp_path):
        from fluidaudio_tpu.registry.download import validate_artifact

        p = self._file(tmp_path, b"\x00\x01weights")
        validate_artifact(p, expected_size=None)

    def test_rejects_html_content_type(self, tmp_path):
        from fluidaudio_tpu.registry.download import RegistryError, validate_artifact

        p = self._file(tmp_path, b"\x00\x01weights")
        with pytest.raises(RegistryError, match="text/html"):
            validate_artifact(p, content_type="text/html; charset=utf-8")

    def test_rejects_empty_body(self, tmp_path):
        from fluidaudio_tpu.registry.download import RegistryError, validate_artifact

        p = self._file(tmp_path, b"")
        with pytest.raises(RegistryError, match="empty"):
            validate_artifact(p)

    def test_rejects_html_body_served_as_binary(self, tmp_path):
        from fluidaudio_tpu.registry.download import RegistryError, validate_artifact

        p = self._file(tmp_path, b"<!DOCTYPE html><html>login</html>")
        with pytest.raises(RegistryError, match="HTML body"):
            validate_artifact(p, content_type="application/octet-stream")

    def test_rejects_truncated_body(self, tmp_path):
        from fluidaudio_tpu.registry.download import RegistryError, validate_artifact

        p = self._file(tmp_path, b"\x00\x01short")
        with pytest.raises(RegistryError, match="truncated"):
            validate_artifact(p, expected_size=100)

    def test_rejects_oversized_body(self, tmp_path):
        from fluidaudio_tpu.registry.download import RegistryError, validate_artifact

        p = self._file(tmp_path, b"\x00\x01waytoolongbody")
        with pytest.raises(RegistryError, match="oversized"):
            validate_artifact(p, expected_size=3)

    def test_error_messages_name_the_file(self, tmp_path):
        from fluidaudio_tpu.registry.download import RegistryError, validate_artifact

        p = self._file(tmp_path, b"")
        with pytest.raises(RegistryError, match="artifact.bin"):
            validate_artifact(p)
