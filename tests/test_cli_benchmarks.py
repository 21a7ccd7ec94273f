"""Dataset benchmark CLI commands: LibriSpeech-layout WER + RTTM DER/JER."""

import json
import wave

import numpy as np
import pytest

from fluidaudio_tpu.cli.main import main


def write_wav(path, samples):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((samples * 32767).astype(np.int16).tobytes())


@pytest.fixture(scope="module")
def librispeech_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls") / "1" / "1"
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(2):
        utt = f"1-1-{i:04d}"
        write_wav(root / f"{utt}.wav", rng.randn(16000) * 0.05)
        lines.append(f"{utt} HELLO WORLD")
    (root / "1-1.trans.txt").write_text("\n".join(lines))
    return root.parent.parent


@pytest.fixture(scope="module")
def rttm_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("diar")
    t = np.arange(16000 * 4) / 16000
    x = np.where((t // 2).astype(int) % 2 == 0,
                 np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 660 * t)) * 0.3
    write_wav(root / "m.wav", x)
    (root / "m.rttm").write_text(
        "SPEAKER m 1 0.00 2.00 <NA> <NA> A <NA> <NA>\n"
        "SPEAKER m 1 2.00 2.00 <NA> <NA> B <NA> <NA>\n")
    return root


def test_asr_benchmark_summary(librispeech_dir, capsys):
    rc = main(["asr-benchmark", "--dataset-dir", str(librispeech_dir),
               "--version", "test-tiny", "--allow-random-init"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] == 2
    assert summary["reference_words"] == 4
    assert summary["wer_pct"] >= 0


def test_asr_benchmark_empty_dir(tmp_path, capsys):
    rc = main(["asr-benchmark", "--dataset-dir", str(tmp_path),
               "--version", "test-tiny", "--allow-random-init"])
    assert rc == 1
    assert "no utterances" in capsys.readouterr().out


def test_diarization_benchmark_summary(rttm_dir, capsys):
    rc = main(["diarization-benchmark", "--dataset-dir", str(rttm_dir),
               "--mode", "online"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] == 1
    # DER is unbounded above (fa/confusion can exceed reference speech,
    # especially with random-init weights) — just require a finite number
    assert summary["der_pct"] >= 0 and np.isfinite(summary["der_pct"])
    assert 0 <= summary["jer_pct"] <= 100


def test_diarization_benchmark_requires_input(capsys):
    rc = main(["diarization-benchmark"])
    assert rc == 1


def test_emission_delay_benchmark(capsys):
    rc = main(["emission-delay-benchmark", "--synthetic-seconds", "2",
               "--chunk-ms", "160"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["chunk_ms"] == 160
    assert summary["audio_seconds"] == 2.0
    # emission delay can never beat the chunk size + mel lookahead
    if summary["tokens"]:
        assert summary["emission_delay_p50_ms"] >= 0


@pytest.fixture(scope="module")
def fleurs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fleurs")
    rng = np.random.RandomState(1)
    for lang in ("en_us", "ru_ru"):
        d = root / lang
        (d / "audio").mkdir(parents=True)
        lines = []
        for i in range(2):
            fname = f"{i}.wav"
            write_wav(d / "audio" / fname, rng.randn(16000) * 0.05)
            lines.append(f"{i}\t{fname}\thello world\traw\textras")
        (d / "test.tsv").write_text("\n".join(lines))
    return root


def test_fleurs_benchmark_summary(fleurs_dir, capsys):
    rc = main(["fleurs-benchmark", "--dataset-dir", str(fleurs_dir),
               "--version", "test-tiny", "--allow-random-init"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(summary["languages"]) == {"en_us", "ru_ru"}
    assert summary["language_filter"] is True
    assert summary["macro_wer_pct"] >= 0


def test_fleurs_benchmark_language_subset(fleurs_dir, capsys):
    rc = main(["fleurs-benchmark", "--dataset-dir", str(fleurs_dir),
               "--languages", "en_us", "--no-filter",
               "--version", "test-tiny", "--allow-random-init"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(summary["languages"]) == {"en_us"}
    assert summary["language_filter"] is False
