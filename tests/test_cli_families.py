"""Per-family CLI commands (families.py): registration + smoke runs.

End-to-end runs swap the full-size managers for the *_TEST tiny configs via
monkeypatching the canonical module attributes (the commands import inside
their bodies), keeping the suite hermetic and fast.
"""

import json
import wave

import numpy as np
import pytest

from fluidaudio_tpu.cli.main import main

NEW_COMMANDS = [
    "sensevoice-transcribe", "paraformer-transcribe", "cohere-transcribe",
    "nemotron-transcribe", "parakeet-eou", "sortformer", "lseend", "process",
    "sensevoice-benchmark", "cohere-benchmark", "nemotron-benchmark",
    "nemotron-multilingual-benchmark", "nemotron-multilingual-multi-stream-bench",
    "unified-benchmark", "ja-benchmark", "lseend-benchmark", "g2p-benchmark",
]


@pytest.mark.parametrize("command", NEW_COMMANDS)
def test_command_registered(command):
    """Missing required args -> argparse exit 2 (proves registration)."""
    with pytest.raises(SystemExit) as e:
        main([command])
    assert e.value.code == 2


def _write_wav(path, samples):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype(np.int16).tobytes())


@pytest.fixture()
def wav_file(tmp_path):
    p = tmp_path / "a.wav"
    _write_wav(p, np.random.RandomState(0).randn(16000) * 0.05)
    return p


def test_sensevoice_transcribe_tiny(wav_file, capsys, monkeypatch):
    import fluidaudio_tpu.asr.sensevoice_manager as mod
    from fluidaudio_tpu.models.sensevoice import SENSEVOICE_TEST

    real = mod.SenseVoiceManager
    monkeypatch.setattr(mod, "SenseVoiceManager", lambda: real(SENSEVOICE_TEST))
    assert main(["sensevoice-transcribe", str(wav_file)]) == 0
    assert "rtfx" in capsys.readouterr().out


def test_sortformer_command_tiny(wav_file, capsys, monkeypatch):
    import fluidaudio_tpu.diarizer.sortformer as mod
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST

    real = mod.SortformerDiarizer
    monkeypatch.setattr(mod, "SortformerDiarizer", lambda: real(SORTFORMER_TEST))
    assert main(["sortformer", str(wav_file), "--rttm"]) == 0
    out = capsys.readouterr().out
    assert "segments" in out


def test_nemotron_transcribe_tiny(wav_file, capsys, monkeypatch):
    import fluidaudio_tpu.cli.families as fam
    from fluidaudio_tpu.asr.streaming_nemotron import StreamingNemotronAsrManager
    from tests.test_nemotron import TINY_EN, TINY_ENC

    monkeypatch.setattr(
        fam, "_make_nemotron",
        lambda args, multilingual=None: StreamingNemotronAsrManager(
            TINY_EN, chunk_ms=560, enc_cfg=TINY_ENC
        ),
    )
    assert main(["nemotron-transcribe", str(wav_file), "--chunk-ms", "560"]) == 0
    assert "rtfx" in capsys.readouterr().out


def test_g2p_benchmark(tmp_path, capsys):
    lex = tmp_path / "lex.tsv"
    lex.write_text("hello\tHH EH L OW\nworld\tW ER L D\n")
    assert main(["g2p-benchmark", str(lex)]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["words"] == 2
    assert summary["per_pct"] >= 0


def test_lseend_benchmark_tiny(tmp_path, capsys, monkeypatch):
    import fluidaudio_tpu.diarizer.lseend as mod
    from fluidaudio_tpu.models.lseend import LSEEND_TEST

    real = mod.LSEENDDiarizer
    monkeypatch.setattr(
        mod, "LSEENDDiarizer",
        lambda step_ms=500, variant="dih3": real(LSEEND_TEST, step_ms=step_ms),
    )
    _write_wav(tmp_path / "m.wav", np.random.RandomState(1).randn(16000 * 2) * 0.1)
    (tmp_path / "m.rttm").write_text(
        "SPEAKER m 1 0.00 1.00 <NA> <NA> A <NA> <NA>\n"
    )
    assert main(["lseend-benchmark", "--dataset-dir", str(tmp_path)]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] == 1
    assert "der_pct" in summary


def test_minimax_corpus_registered_and_offline(tmp_path, monkeypatch, capsys):
    """Command registered; offline mode surfaces a typed OfflineError."""
    from fluidaudio_tpu.registry import ModelRegistry
    from fluidaudio_tpu.registry.registry import OfflineError

    ModelRegistry.enforce_offline(True)
    try:
        with pytest.raises(OfflineError):
            main(["minimax-corpus", "--languages", "english",
                  "--out-dir", str(tmp_path)])
    finally:
        ModelRegistry.enforce_offline(False)


def test_minimax_corpus_conversion(tmp_path, monkeypatch, capsys):
    """Full command path with the HF fetch stubbed to a local file."""
    import fluidaudio_tpu.cli.families as fam
    from fluidaudio_tpu.registry import DownloadUtils

    raw = tmp_path / "raw.txt"
    raw.write_text("a.wav|First phrase.\nb.wav|Second one.\n\nno prefix line\n")
    monkeypatch.setattr(
        DownloadUtils, "fetch_hf_file",
        staticmethod(lambda *a, **kw: raw),
    )
    out = tmp_path / "corpus"
    assert main(["minimax-corpus", "--languages", "english",
                 "--out-dir", str(out)]) == 0
    body = (out / "english.txt").read_text()
    assert "First phrase." in body and "no prefix line" in body
    assert body.startswith("# MiniMax Multilingual TTS Test Set — english")
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["phrases"] == 3
