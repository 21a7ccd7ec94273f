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

        # latency tiers / language packs share a remote repo under distinct
        # sub_paths, so (remote, sub_path) is the unique key — folders stay
        # globally unique since they are the cache layout
        # the offline diarizer set ships in the same repo (reference
        # variant "offline", ModelNames.swift:1311-1315) — the one
        # intentional (remote, sub_path) alias
        keys = [(r.spec.name, r.spec.sub_path) for r in Repo
                if r is not Repo.OFFLINE_DIARIZER]
        folders = [r.folder_name for r in Repo]
        assert all(n for n, _ in keys) and all(folders)
        assert len(set(keys)) == len(keys)
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
        assert {"encoder.npz", "predictor.npz", "joint.npz", "vocab.json"} <= set(v3)
        # our mel frontend is computed natively: no preprocessor artifact
        assert not any("preprocessor" in m for m in v3)
        assert not any("preprocessor" in m
                       for m in required_models(Repo.PARAKEET_EOU))

    def test_offline_diarizer_required_models(self):
        from fluidaudio_tpu.registry.model_names import Repo, required_models

        want = {"segmentation.npz", "fbank.npz", "embedding.npz",
                "plda_rho.npz", "plda-parameters.json"}
        assert set(required_models(Repo.OFFLINE_DIARIZER)) == want
        # reference fetches the VBx set from the online repo under
        # variant "offline" (ModelNames.swift:1311-1315)
        assert set(required_models(Repo.DIARIZER, "offline")) == want

    def test_variant_dispatch(self):
        from fluidaudio_tpu.registry.model_names import Repo, required_models

        # unified: offline variant swaps the encoder export
        streaming = set(required_models(Repo.PARAKEET_UNIFIED))
        offline = set(required_models(Repo.PARAKEET_UNIFIED, "offline"))
        assert "encoder_streaming.npz" in streaming
        assert "encoder.npz" in offline and "encoder_streaming.npz" not in offline
        # styletts2: bucket variants return just that bucket pair
        assert set(required_models(Repo.STYLETTS2, "t128")) == {
            "predictor_t128.npz", "decoder_t128.npz"}
        assert len(required_models(Repo.STYLETTS2, "all")) > len(
            required_models(Repo.STYLETTS2))
        # sortformer / ls-eend: explicit model-name variants
        assert required_models(Repo.SORTFORMER, "Sortformer_v2.1") == (
            "Sortformer_v2.1.npz",)
        assert required_models(Repo.LS_EEND_AMI) == ("model.npz",)

    def test_kokoro_variant_repos_exist(self):
        from fluidaudio_tpu.registry.model_names import Repo

        assert Repo.KOKORO_ANE_ZH.folder_name == "kokoro-ane-zh"
        assert Repo.KOKORO_ANE_JA.folder_name == "kokoro-ane-ja"
        # ANE packs are subdirectories of the one kokoro repo
        # (ModelNames.swift:45-47)
        assert Repo.KOKORO_ANE.remote_path == Repo.KOKORO_ANE_ZH.remote_path
        assert Repo.KOKORO_ANE.sub_path == "ANE"

    def test_latency_tier_repos(self):
        from fluidaudio_tpu.registry.model_names import Repo

        assert Repo.PARAKEET_EOU_320.sub_path == "320ms"
        assert Repo.NEMOTRON_EN_1120.sub_path == "nemotron_coreml_1120ms"
        assert Repo.LS_EEND_DIHARD3.sub_path == "optimized/dih3"
        # tiers share the remote repo with the base member
        assert (Repo.PARAKEET_EOU_160.remote_path
                == Repo.PARAKEET_EOU.remote_path)

    def test_every_repo_has_required_models(self):
        from fluidaudio_tpu.registry.model_names import Repo, required_models

        for repo in Repo:
            req = required_models(repo)
            assert req, f"{repo} has an empty required-model set"
            assert all("." in name for name in req), (repo, req)

    def test_catalog_covers_every_workload_family(self):
        from fluidaudio_tpu.registry.model_names import FAMILIES, Repo

        folders = {r.folder_name for r in Repo}
        for needle in ("silero-vad", "parakeet-v3", "nemotron-en",
                       "sensevoice", "paraformer-zh", "cohere-transcribe-q8",
                       "diarizer", "sortformer", "ls-eend", "kokoro",
                       "pocket-tts", "styletts2", "supertonic-3",
                       "charsiu-g2p"):
            assert needle in folders, needle
        # every repo belongs to exactly the families map's coverage
        in_families = {r for _, repos in FAMILIES.values() for r in repos}
        # OFFLINE_DIARIZER alias + base KOKORO are family members too
        assert in_families >= {Repo.VAD, Repo.PARAKEET_V3, Repo.SORTFORMER,
                               Repo.POCKET_TTS, Repo.SUPERTONIC3}
        # one member per reference Repo case (33) plus the three un-suffixed
        # tier roots (EOU / Nemotron-en / LS-EEND)
        assert len(Repo) == 36


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


# --------------------------------------------------------------------------
# Doctor: readiness report + corrupt-cache auto-recovery
# (AsrModels.loadWithAutoRecovery / DownloadUtils.loadModels cache check)
# --------------------------------------------------------------------------


class TestDoctor:
    def _stage(self, repo, names):
        import numpy as np

        d = DownloadUtils.repo_dir(repo)
        d.mkdir(parents=True, exist_ok=True)
        for n in names:
            p = d / n
            if n.endswith(".npz"):
                np.savez(p, w=np.zeros(3, np.float32))
            elif n.endswith(".json"):
                p.write_text("{}")
            else:
                p.write_bytes(b"x")
        return d

    def test_absent_repo_reports_all_missing(self):
        from fluidaudio_tpu.registry.doctor import check_repo

        st = check_repo(Repo.VAD)
        assert st.state == "absent"
        assert st.missing == ["silero_vad.npz"] and not st.ready

    def test_staged_repo_is_ready(self):
        from fluidaudio_tpu.registry.doctor import check_repo
        from fluidaudio_tpu.registry.model_names import required_models

        self._stage(Repo.VAD, required_models(Repo.VAD))
        st = check_repo(Repo.VAD)
        assert st.ready and st.state == "ready"

    def test_corrupt_npz_detected_deep_only(self):
        from fluidaudio_tpu.registry.doctor import check_repo

        d = self._stage(Repo.VAD, ())
        (d / "silero_vad.npz").write_bytes(b"<!doctype html>not a zip")
        assert check_repo(Repo.VAD).state == "corrupt"
        assert check_repo(Repo.VAD, deep=False).state == "ready"

    def test_offline_repair_raises_typed_error_naming_missing(self):
        from fluidaudio_tpu.registry.doctor import repair_repo

        ModelRegistry.enforce_offline(True)
        with pytest.raises(OfflineError, match="silero_vad.npz"):
            repair_repo(Repo.VAD)

    def test_ensure_repo_passes_through_when_ready(self):
        from fluidaudio_tpu.registry.doctor import ensure_repo
        from fluidaudio_tpu.registry.model_names import required_models

        d = self._stage(Repo.SORTFORMER, required_models(Repo.SORTFORMER))
        ModelRegistry.enforce_offline(True)  # must not need the network
        assert ensure_repo(Repo.SORTFORMER) == d

    def test_repair_refetches_corrupt_artifact(self, monkeypatch):
        import numpy as np

        from fluidaudio_tpu.registry import doctor
        from fluidaudio_tpu.registry.model_names import required_models

        d = self._stage(Repo.VAD, required_models(Repo.VAD))
        (d / "silero_vad.npz").write_bytes(b"corrupt")
        fetched = []

        def fake_fetch(repo, name, *, force=False):
            fetched.append((name, force))
            p = DownloadUtils.repo_dir(repo) / name
            np.savez(p, w=np.zeros(2, np.float32))
            return p

        monkeypatch.setattr(DownloadUtils, "fetch_file", staticmethod(fake_fetch))
        st = doctor.repair_repo(Repo.VAD)
        assert st.ready
        assert fetched == [("silero_vad.npz", True)]

    def test_readiness_report_covers_all_families(self):
        from fluidaudio_tpu.registry.doctor import readiness_report
        from fluidaudio_tpu.registry.model_names import FAMILIES

        rep = readiness_report(deep=False)
        assert rep["families_total"] == len(FAMILIES)
        assert set(rep["families"]) == set(FAMILIES)
        for fam in rep["families"].values():
            assert fam["repos"], fam["label"]
