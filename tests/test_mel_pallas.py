"""Pallas fused log-mel kernel vs the matmul-DFT reference (interpret mode on CPU)."""

import numpy as np
import pytest

from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.ops.mel_pallas import log_mel_pallas


@pytest.mark.parametrize("n_samples", [16000, 24160])
def test_pallas_matches_matmul_path(n_samples):
    cfg = MelConfig(normalize=None)
    rng = np.random.RandomState(0)
    audio = (rng.randn(2, n_samples) * 0.1).astype(np.float32)
    ref_frontend = MelFrontend(cfg, use_fft=False)
    ref, ref_len = ref_frontend(audio)
    out, out_len = log_mel_pallas(audio, cfg, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-3)


def test_pallas_respects_lengths():
    cfg = MelConfig(normalize=None)
    rng = np.random.RandomState(1)
    audio = np.zeros((2, 16000), np.float32)
    audio[0] = rng.randn(16000) * 0.1
    audio[1, :8000] = rng.randn(8000) * 0.1
    out, out_len = log_mel_pallas(
        audio, cfg, lengths=np.array([16000, 8000], np.int32), interpret=True
    )
    assert int(out_len[1]) == cfg.num_frames(8000)
    assert np.all(np.asarray(out)[1, :, int(out_len[1]):] == 0.0)
