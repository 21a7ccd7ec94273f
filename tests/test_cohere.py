"""Cohere encoder-decoder ASR: KV-cache decode, repetition/ngram controls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.asr.cohere_manager import CoherePipeline
from fluidaudio_tpu.models.cohere_asr import (
    COHERE_TEST,
    CohereConfig,
    cohere_greedy_decode,
)


@pytest.fixture(scope="module")
def pipeline():
    return CoherePipeline(COHERE_TEST)


def test_transcribe_smoke(pipeline):
    rng = np.random.RandomState(0)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    r = pipeline.transcribe(audio)
    assert r.duration == pytest.approx(1.0)
    assert isinstance(r.text, str)
    r2 = pipeline.transcribe(audio)
    assert r.text == r2.text  # deterministic


def test_decode_stops_at_eos():
    cfg = CohereConfig(
        vocab_size=8, d_model=8, n_heads=2, n_decoder_layers=1, n_encoder_layers=1,
        n_mels=4, max_decode_tokens=12, dtype="float32", bos_id=1, eos_id=2,
        no_repeat_ngram=0, repetition_penalty=1.0,
    )
    enc = jnp.zeros((1, 4, 8))
    mask = jnp.ones((1, 4), bool)
    # scripted step: emit token 5 three times then EOS
    def step(token, pos, k, v, e, m):
        logits = jnp.full((1, 8), -10.0)
        logits = logits.at[0, jnp.where(pos[0] < 3, 5, 2)].set(10.0)
        return logits, k, v

    result = cohere_greedy_decode(cfg, step, enc, mask)
    n = int(result.counts[0])
    ids = [int(t) for t in np.asarray(result.tokens[0][:n])]
    assert ids == [5, 5, 5, 2]


def test_no_repeat_ngram_bans_loop():
    cfg = CohereConfig(
        vocab_size=8, d_model=8, n_heads=2, n_decoder_layers=1, n_encoder_layers=1,
        n_mels=4, max_decode_tokens=12, dtype="float32", bos_id=1, eos_id=2,
        no_repeat_ngram=2, repetition_penalty=1.0,
    )
    enc = jnp.zeros((1, 4, 8))
    mask = jnp.ones((1, 4), bool)
    # adversarial step: always prefers the loop "3 4 3 4 ..." with EOS second choice
    def step(token, pos, k, v, e, m):
        logits = jnp.full((1, 8), -10.0)
        preferred = jnp.where(pos[0] % 2 == 0, 3, 4)
        logits = logits.at[0, preferred].set(10.0)
        logits = logits.at[0, 2].set(5.0)  # EOS fallback
        return logits, k, v

    result = cohere_greedy_decode(cfg, step, enc, mask)
    n = int(result.counts[0])
    ids = [int(t) for t in np.asarray(result.tokens[0][:n])]
    # without the ban this would be 3 4 3 4 3 4 ... forever; the 2-gram ban
    # must break the cycle (EOS fallback fires)
    assert 2 in ids
    assert len(ids) < 8
