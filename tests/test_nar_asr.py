"""SenseVoice + Paraformer (NAR families): LFR, CTC collapse, CIF, managers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.models.paraformer import PARAFORMER_TEST, cif_integrate
from fluidaudio_tpu.models.sensevoice import LFR_M, LFR_N, SENSEVOICE_TEST, lfr_stack
from fluidaudio_tpu.ops.ctc_decode import ARPALanguageModel, ctc_beam_search, ctc_greedy_decode


def test_lfr_stack_shapes_and_edges():
    mel = jnp.asarray(np.arange(2 * 4 * 20, dtype=np.float32).reshape(2, 4, 20))
    out, lengths = lfr_stack(mel, jnp.array([20, 13], jnp.int32))
    assert out.shape == (2, (20 + LFR_N - 1) // LFR_N, 4 * LFR_M)
    assert int(lengths[0]) == 4 and int(lengths[1]) == 3
    # first output frame stacks input frames 0..6
    first = np.asarray(out[0, 0]).reshape(LFR_M, 4)
    np.testing.assert_array_equal(first[0], np.asarray(mel[0, :, 0]))
    np.testing.assert_array_equal(first[6], np.asarray(mel[0, :, 6]))
    # last frame replicates the edge
    last = np.asarray(out[0, -1]).reshape(LFR_M, 4)
    np.testing.assert_array_equal(last[-1], np.asarray(mel[0, :, 19]))


def test_ctc_greedy_collapse():
    # logits engineered: blank=0; sequence a a _ a b b -> a a b after collapse
    V, T = 4, 6
    path = [1, 1, 0, 1, 2, 2]
    lp = np.full((1, T, V), -10.0, np.float32)
    for t, k in enumerate(path):
        lp[0, t, k] = 0.0
    tokens, frames, counts = ctc_greedy_decode(jnp.asarray(lp), jnp.array([T]), blank_id=0)
    n = int(counts[0])
    assert [int(x) for x in np.asarray(tokens[0][:n])] == [1, 1, 2]
    assert [int(x) for x in np.asarray(frames[0][:n])] == [0, 3, 4]


def test_ctc_beam_matches_greedy_on_peaked():
    rng = np.random.RandomState(0)
    T, V = 12, 8
    lp = np.log(np.full((T, V), 1e-4, np.float32))
    path = rng.randint(0, V, T)
    for t, k in enumerate(path):
        lp[t, k] = np.log(0.99)
    beam = ctc_beam_search(lp, blank_id=0, beam_width=4)
    tokens, _, counts = ctc_greedy_decode(
        jnp.asarray(lp)[None], jnp.array([T]), blank_id=0
    )
    greedy = [int(x) for x in np.asarray(tokens[0][: int(counts[0])])]
    assert beam == greedy


def test_arpa_lm_scoring(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\nngram 2=1\n\n"
        "\\1-grams:\n-1.0\tthe\t-0.5\n-2.0\tcat\t-0.3\n-3.0\tdog\n\n"
        "\\2-grams:\n-0.2\tthe cat\n\n\\end\\\n"
    )
    lm = ARPALanguageModel.load(arpa)
    assert lm.order == 2
    assert lm.score((), "the") == pytest.approx(-1.0)
    assert lm.score(("the",), "cat") == pytest.approx(-0.2)
    # backoff: P(dog | the) = backoff(the) + P(dog)
    assert lm.score(("the",), "dog") == pytest.approx(-0.5 + -3.0)


def test_cif_integrate():
    B, T, D, U = 1, 6, 4, 4
    h = jnp.asarray(np.eye(T, D, dtype=np.float32))[None]
    # alphas: 0.5 per frame -> 2 frames per token, 3 tokens total
    alphas = jnp.full((B, T), 0.5)
    emb, counts = cif_integrate(h, alphas, max_tokens=U)
    assert int(counts[0]) == 3
    # token 0 integrates frames 0+1 (each with weight 0.5)
    np.testing.assert_allclose(
        np.asarray(emb[0, 0]), 0.5 * (np.eye(T, D)[0] + np.eye(T, D)[1]), atol=1e-6
    )


def test_sensevoice_manager_smoke():
    from fluidaudio_tpu.asr.sensevoice_manager import SenseVoiceManager

    mgr = SenseVoiceManager(SENSEVOICE_TEST)
    rng = np.random.RandomState(0)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    result = mgr.transcribe(audio, language="en")
    assert result.duration == pytest.approx(1.0)
    assert "<|" not in result.text  # tags stripped
    r2 = mgr.transcribe(audio, language="en")
    assert result.text == r2.text


def test_paraformer_manager_smoke():
    from fluidaudio_tpu.asr.paraformer_manager import ParaformerManager

    mgr = ParaformerManager(PARAFORMER_TEST)
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    result = mgr.transcribe(audio)
    assert result.duration == pytest.approx(1.0)
    assert isinstance(result.text, str)
