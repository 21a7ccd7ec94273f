"""Dataset downloader staging logic (offline fixtures) + egress gating +
the new benchmark CLI commands (reference DatasetDownloader.swift:12-780)."""

import io
import json
import tarfile
import wave
import zipfile

import numpy as np
import pytest

from fluidaudio_tpu.cli.main import main
from fluidaudio_tpu.registry.datasets import DatasetDownloader
from fluidaudio_tpu.registry.registry import ModelRegistry, OfflineError


def write_wav(path, samples, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.asarray(samples) * 32767).astype(np.int16).tobytes())


def test_stage_ami_rttms(tmp_path):
    seg_xml = (
        '<?xml version="1.0"?><nite:root xmlns:nite="x">'
        '<segment transcriber_start="0.5" transcriber_end="2.0"/>'
        '<segment transcriber_start="3.0" transcriber_end="4.5"/>'
        "</nite:root>"
    ).replace("nite:root", "root")
    zpath = tmp_path / "ann.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("segments/ES2002a.A.segments.xml", seg_xml)
        zf.writestr("segments/ES2002a.B.segments.xml", seg_xml)
        zf.writestr("segments/OTHER1.A.segments.xml", seg_xml)

    dl = DatasetDownloader(root=tmp_path)
    out = tmp_path / "ami" / "sdm"
    written = dl.stage_ami_rttms(zpath, out, ("ES2002a",))
    assert len(written) == 1
    lines = written[0].read_text().strip().splitlines()
    assert len(lines) == 4  # 2 speakers x 2 segments
    assert lines[0].startswith("SPEAKER ES2002a 1 0.500 1.500")
    assert " A " in lines[0] or " B " in lines[0]


def test_stage_musan_caps_per_category(tmp_path):
    tpath = tmp_path / "musan.tar.gz"
    with tarfile.open(tpath, "w:gz") as tf:
        for cat in ("speech", "music", "noise"):
            for i in range(3):
                data = b"RIFFfakewav" + bytes(100)
                info = tarfile.TarInfo(f"musan/{cat}/sub/{cat}{i}.wav")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    dl = DatasetDownloader(root=tmp_path)
    n = dl.stage_musan(tpath, tmp_path / "musan", per_category=2)
    assert n == 6
    for cat in ("speech", "music", "noise"):
        assert len(list((tmp_path / "musan" / cat).glob("*.wav"))) == 2


def test_stage_hf_rows_text_and_labels(tmp_path):
    rows = [
        {"row": {"id": "f1", "transcript": "hello world",
                 "keywords": ["acme"], "duration": 3.2}},
        {"row": {"id": "f2", "text": "second file", "speaker": "S1"}},
    ]
    dl = DatasetDownloader(root=tmp_path)
    n = dl.stage_hf_rows(rows, tmp_path / "earnings22")
    assert n == 2
    assert (tmp_path / "earnings22" / "f1.txt").read_text() == "hello world"
    labels = json.loads((tmp_path / "earnings22" / "labels.json").read_text())
    assert labels["f1"]["keywords"] == ["acme"]
    assert labels["f2"]["speaker"] == "S1"


def test_downloads_egress_gated(tmp_path):
    dl = DatasetDownloader(root=tmp_path)
    ModelRegistry.enforce_offline(True)
    try:
        with pytest.raises(OfflineError):
            dl.download_musan("mini50")
        with pytest.raises(OfflineError):
            dl.fetch_hf_rows("x/y", "default", "test")
        with pytest.raises(OfflineError):
            dl.download_ami("sdm", meetings=("ES2002a",))
    finally:
        ModelRegistry.enforce_offline(False)


@pytest.fixture(scope="module")
def vad_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("vadset")
    rng = np.random.RandomState(0)
    t = np.arange(16000 * 2) / 16000
    for cat, sig in (
        ("speech", np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0) * 0.3),
        ("music", np.sin(2 * np.pi * 440 * t) * 0.2),
        ("noise", rng.randn(t.size) * 0.05),
    ):
        (root / cat).mkdir(parents=True)
        write_wav(root / cat / f"{cat}0.wav", sig)
    return root


def test_vad_benchmark_cli(vad_dataset, capsys):
    rc = main(["vad-benchmark", "--dataset-dir", str(vad_dataset)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] == 3
    assert 0 <= summary["accuracy_pct"] <= 100


def test_sortformer_benchmark_cli(tmp_path, capsys):
    t = np.arange(16000 * 4) / 16000
    x = np.where((t // 2).astype(int) % 2 == 0,
                 np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 660 * t)) * 0.3
    write_wav(tmp_path / "m.wav", x)
    (tmp_path / "m.rttm").write_text(
        "SPEAKER m 1 0.00 2.00 <NA> <NA> A <NA> <NA>\n"
        "SPEAKER m 1 2.00 2.00 <NA> <NA> B <NA> <NA>\n")
    rc = main(["sortformer-benchmark", "--dataset-dir", str(tmp_path),
               "--mode", "offline"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] == 1 and "der_pct" in summary


def test_ctc_earnings_benchmark_cli(tmp_path, capsys):
    rng = np.random.RandomState(0)
    write_wav(tmp_path / "f1.wav", rng.randn(16000) * 0.05)
    (tmp_path / "f1.txt").write_text("hello world")
    (tmp_path / "labels.json").write_text(json.dumps({"f1": {"keywords": []}}))
    rc = main(["ctc-earnings-benchmark", "--dataset-dir", str(tmp_path),
               "--version", "test-tiny", "--allow-random-init"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] == 1 and "wer_pct" in summary


def test_download_dataset_cli_offline(tmp_path, capsys):
    ModelRegistry.enforce_offline(True)
    try:
        rc = main(["download-dataset", "musan-mini50",
                   "--output-dir", str(tmp_path)])
    finally:
        ModelRegistry.enforce_offline(False)
    assert rc == 1
    assert "failed" in capsys.readouterr().out
