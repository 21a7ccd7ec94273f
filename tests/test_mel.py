"""Mel frontend parity: JAX vs direct NumPy golden, plus NeMo conventions.

Mirrors reference `Tests/FluidAudioTests/.../AudioMelSpectrogramTests` (NeMo
parity of the native mel — SURVEY.md §4.1).
"""

import numpy as np
import pytest

from fluidaudio_tpu.ops.mel import (
    MelConfig,
    MelFrontend,
    NEMO_PARAKEET,
    hann_window,
    log_mel_numpy,
    slaney_mel_filterbank,
)


def _tone(n, freq=440.0, sr=16000, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_filterbank_shape_and_partition():
    fb = slaney_mel_filterbank(512, 128, 16000)
    assert fb.shape == (128, 257)
    assert np.all(fb >= 0)
    # every filter has positive area; DC bin belongs to no filter
    assert np.all(fb.sum(axis=1) > 0)
    assert fb[:, 0].sum() == pytest.approx(0.0, abs=1e-7)


def test_hann_symmetric_matches_torch_convention():
    w = hann_window(400, periodic=False)
    assert w[0] == pytest.approx(0.0, abs=1e-7)
    assert w[-1] == pytest.approx(0.0, abs=1e-7)
    assert w[200] == pytest.approx(np.max(w), rel=1e-3)
    wp = hann_window(400, periodic=True)
    assert wp[0] == pytest.approx(0.0, abs=1e-7)
    assert wp[-1] > 0  # periodic window is not symmetric


@pytest.mark.parametrize("normalize", [None, "per_feature"])
@pytest.mark.parametrize("n_samples", [4000, 24160])
def test_jax_matches_numpy_golden(n_samples, normalize):
    cfg = MelConfig(normalize=normalize)
    audio = _tone(n_samples) + 0.01 * np.random.RandomState(0).randn(n_samples).astype(np.float32)
    golden = log_mel_numpy(audio, cfg)
    frontend = MelFrontend(cfg)
    mel, mel_len = frontend(audio[None, :])
    mel = np.asarray(mel[0])
    assert int(mel_len[0]) == cfg.num_frames(n_samples)
    assert mel.shape == (128, cfg.num_frames(n_samples))
    if normalize is None:
        # log-domain parity where there is signal; power-domain parity everywhere.
        # (f32 DFT cancellations near the 2^-24 log floor diverge from the f64
        # golden in log space — NeMo's own f32 torch.stft behaves the same.)
        signal = golden > -12.0
        np.testing.assert_allclose(mel[signal], golden[signal], rtol=0, atol=2e-2)
        np.testing.assert_allclose(np.exp(mel), np.exp(golden), rtol=3e-2, atol=1e-6)
    else:
        signal = log_mel_numpy(audio, MelConfig()) > -12.0
        np.testing.assert_allclose(mel[signal], golden[signal], rtol=0, atol=1e-1)


def test_frame_count_nemo_convention():
    cfg = MelConfig()
    assert cfg.num_frames(240_000) == 1501  # 15 s → 1501 frames
    assert cfg.num_frames(160) == 2
    assert cfg.num_frames(4000) == 26


def test_batched_lengths_mask_padding():
    cfg = MelConfig(normalize="per_feature")
    frontend = MelFrontend(cfg)
    a = _tone(16000)
    b = _tone(8000, freq=880.0)
    batch = np.zeros((2, 16000), dtype=np.float32)
    batch[0] = a
    batch[1, :8000] = b
    mel, mel_len = frontend(batch, lengths=np.array([16000, 8000], dtype=np.int32))
    assert int(mel_len[1]) == cfg.num_frames(8000)
    # row 1's valid prefix must equal the standalone computation of b
    solo = log_mel_numpy(b, cfg)
    np.testing.assert_allclose(
        np.asarray(mel[1])[:, : solo.shape[1]], solo, rtol=5e-2, atol=3e-2
    )
    # padded tail is exactly zero
    assert np.all(np.asarray(mel[1])[:, int(mel_len[1]):] == 0.0)


def test_preemphasis_seed_sample_continuity():
    """Chunked mel with carried last sample matches whole-signal preemphasis."""
    cfg = MelConfig(center=False)
    audio = _tone(8000)
    golden_whole = log_mel_numpy(audio, cfg)
    part2 = log_mel_numpy(audio[4000:], cfg, last_sample=float(audio[3999]))
    t_off = 4000 // cfg.hop_length
    np.testing.assert_allclose(golden_whole[:, t_off : t_off + part2.shape[1]], part2, rtol=1e-4, atol=1e-4)
