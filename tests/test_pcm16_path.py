"""int16 PCM end-to-end ASR path (half the host->device transfer bytes).

Contract: a PCM16 mono 16 kHz WAV rides int16 from the file reader through
the audio source into the device buffer; the jitted pipeline upcasts with
scale 1/32768 (a power of two, so `x * (1/32768)` on device is bit-identical
to the host's `x / 32768`), making the int16 path token-exact vs the f32
path. Mirrors the VAD/sortformer int16 contracts (vad/manager.py,
diarizer/sortformer.py).
"""

import numpy as np
import pytest

from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.models.zoo import AsrModels
from fluidaudio_tpu.utils.audio_io import read_wav_raw, write_wav
from fluidaudio_tpu.utils.audio_source import (
    ArrayAudioSource,
    DiskBackedAudioSampleSource,
    make_audio_source,
)


@pytest.fixture(scope="module")
def manager():
    models = AsrModels.load("test-tiny", allow_random_init=True)
    return AsrManager(models, ASRConfig(parallel_chunk_batch=2,
                                        tdt=TdtConfig(max_tokens_per_chunk=128)))


def _pcm16(rng, n):
    return (np.clip(rng.randn(n) * 0.1, -1, 1) * 32767.0).astype(np.int16)


def test_read_wav_raw_preserves_pcm16(tmp_path):
    rng = np.random.RandomState(0)
    pcm = _pcm16(rng, 4000)
    path = tmp_path / "a.wav"
    write_wav(path, pcm, 16_000, dtype="int16")
    raw, sr = read_wav_raw(path)
    assert sr == 16_000
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw[:, 0], pcm)


def test_array_source_int16_raw_and_f32_views():
    rng = np.random.RandomState(1)
    pcm = _pcm16(rng, 1000)
    src = ArrayAudioSource(pcm)
    raw = src.copy_samples_raw(0, 1000)
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw, pcm)
    f32 = src.copy_samples(0, 1000)
    assert f32.dtype == np.float32
    np.testing.assert_allclose(f32, pcm.astype(np.float32) / 32768.0)
    # zero-filled tail in both views
    assert src.copy_samples_raw(900, 200)[100:].max() == 0


def test_make_audio_source_int16_fast_path(tmp_path):
    rng = np.random.RandomState(2)
    pcm = _pcm16(rng, 20_000)
    path = tmp_path / "b.wav"
    write_wav(path, pcm, 16_000, dtype="int16")
    src = make_audio_source(path)
    assert src.copy_samples_raw(0, 10).dtype == np.int16
    np.testing.assert_array_equal(src.copy_samples_raw(0, 20_000), pcm)


def test_make_audio_source_int16_disk_backed(tmp_path):
    rng = np.random.RandomState(3)
    pcm = _pcm16(rng, 30_000)
    path = tmp_path / "c.wav"
    write_wav(path, pcm, 16_000, dtype="int16")
    src = make_audio_source(path, disk_backed_threshold=10_000)
    assert isinstance(src, DiskBackedAudioSampleSource)
    assert src.copy_samples_raw(0, 8).dtype == np.int16
    np.testing.assert_array_equal(src.copy_samples_raw(0, 30_000), pcm)
    np.testing.assert_allclose(
        src.copy_samples(100, 50), pcm[100:150].astype(np.float32) / 32768.0
    )


def test_make_audio_source_float_wav_keeps_f32(tmp_path):
    rng = np.random.RandomState(4)
    audio = (rng.randn(8000) * 0.1).astype(np.float32)
    path = tmp_path / "d.wav"
    write_wav(path, audio, 16_000, dtype="float32")
    src = make_audio_source(path)
    assert src.copy_samples_raw(0, 8).dtype == np.float32


def test_transcribe_int16_file_token_exact_vs_f32(manager, tmp_path):
    rng = np.random.RandomState(5)
    pcm = _pcm16(rng, 24_000)  # 1.5 s
    path = tmp_path / "e.wav"
    write_wav(path, pcm, 16_000, dtype="int16")

    r_int16 = manager.transcribe(path)
    r_f32 = manager.transcribe(pcm.astype(np.float32) / 32768.0)
    assert r_int16.text == r_f32.text
    assert [t.token_id for t in r_int16.token_timings] == [
        t.token_id for t in r_f32.token_timings
    ]


def test_transcribe_int16_array_direct(manager):
    rng = np.random.RandomState(6)
    pcm = _pcm16(rng, 24_000)
    r_int16 = manager.transcribe(pcm)
    r_f32 = manager.transcribe(pcm.astype(np.float32) / 32768.0)
    assert r_int16.text == r_f32.text


def test_transcribe_int16_chunked_long_form(manager, tmp_path):
    """>15 s forces the chunked path: int16 must survive window packing."""
    rng = np.random.RandomState(7)
    pcm = _pcm16(rng, 300_000)  # 18.75 s
    path = tmp_path / "f.wav"
    write_wav(path, pcm, 16_000, dtype="int16")
    r_int16 = manager.transcribe(path)
    r_f32 = manager.transcribe(pcm.astype(np.float32) / 32768.0)
    assert r_int16.text == r_f32.text
