"""Cohere encoder-decoder ASR: KV-cache decode, repetition/ngram controls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.asr.cohere_manager import CoherePipeline, merge_token_streams
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


def test_cohere_converters_tree_match_and_run():
    """Synthetic NeMo-conformer + transformer-decoder state dicts convert to
    trees that structurally match and run the full pipeline."""
    from fluidaudio_tpu.convert.cohere import (
        cohere_conformer_config,
        convert_cohere_decoder_state_dict,
        convert_cohere_encoder_state_dict,
    )
    from fluidaudio_tpu.models.cohere_asr import CohereDecoderStep, CohereEncoder
    from fluidaudio_tpu.models.predictor import PredictorConfig

    from tests.test_convert import synthetic_nemo_state_dict, tree_shapes

    cfg = COHERE_TEST
    ccfg = cohere_conformer_config(cfg)
    rng = np.random.RandomState(0)
    pcfg = PredictorConfig(vocab_size=8, pred_hidden=8, n_layers=1,
                           enc_hidden=ccfg.d_model, joint_hidden=8, n_durations=2)
    enc_sd = synthetic_nemo_state_dict(ccfg, pcfg, rng)
    enc_params = convert_cohere_encoder_state_dict(enc_sd, cfg)

    D, FF = cfg.d_model, cfg.d_model * 4
    dec_sd = {
        "decoder.embed_tokens.weight": rng.randn(cfg.vocab_size, D) * 0.05,
        "decoder.embed_positions.weight": rng.randn(cfg.max_decode_tokens, D) * 0.02,
        "decoder.layer_norm.weight": np.abs(rng.randn(D)) + 0.5,
        "decoder.layer_norm.bias": rng.randn(D) * 0.05,
    }
    for i in range(cfg.n_decoder_layers):
        b = f"decoder.layers.{i}"
        for ln in ("self_attn_layer_norm", "encoder_attn_layer_norm",
                   "final_layer_norm"):
            dec_sd[f"{b}.{ln}.weight"] = np.abs(rng.randn(D)) + 0.5
            dec_sd[f"{b}.{ln}.bias"] = rng.randn(D) * 0.05
        for att in ("self_attn", "encoder_attn"):
            src = D if att == "self_attn" else cfg.enc_hidden
            for m, insz in (("q_proj", D), ("k_proj", src), ("v_proj", src),
                            ("out_proj", D)):
                dec_sd[f"{b}.{att}.{m}.weight"] = rng.randn(D, insz) * 0.05
                dec_sd[f"{b}.{att}.{m}.bias"] = rng.randn(D) * 0.05
        dec_sd[f"{b}.fc1.weight"] = rng.randn(FF, D) * 0.05
        dec_sd[f"{b}.fc1.bias"] = rng.randn(FF) * 0.05
        dec_sd[f"{b}.fc2.weight"] = rng.randn(D, FF) * 0.05
        dec_sd[f"{b}.fc2.bias"] = rng.randn(D) * 0.05
    dec_params = convert_cohere_decoder_state_dict(dec_sd, cfg)

    encoder = CohereEncoder(cfg)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, 32).astype(np.float32) * 0.1)
    mlen = jnp.array([32], jnp.int32)
    want = jax.eval_shape(lambda: encoder.init(jax.random.PRNGKey(0), mel, mlen))
    assert tree_shapes(want) == tree_shapes(enc_params), (
        f"missing={set(tree_shapes(want)) - set(tree_shapes(enc_params))}\n"
        f"extra={set(tree_shapes(enc_params)) - set(tree_shapes(want))}")
    enc, mask = encoder.apply(enc_params, mel, mlen)
    assert enc.shape[-1] == cfg.enc_hidden

    decoder = CohereDecoderStep(cfg)
    L, H, Dh = cfg.n_decoder_layers, cfg.n_heads, cfg.head_dim
    M = cfg.max_decode_tokens
    k0 = jnp.zeros((L, 1, M, H, Dh), jnp.float32)
    want_d = jax.eval_shape(lambda: decoder.init(
        jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), k0, k0, enc, mask))
    assert tree_shapes(want_d) == tree_shapes(dec_params), (
        f"missing={set(tree_shapes(want_d)) - set(tree_shapes(dec_params))}\n"
        f"extra={set(tree_shapes(dec_params)) - set(tree_shapes(want_d))}")

    def step(token, pos, k, v, e, m):
        return decoder.apply(dec_params, token, pos, k, v, e, m)

    res = cohere_greedy_decode(cfg, step, enc, mask)
    assert np.asarray(res.tokens).shape == (1, M)


class TestLongFormMerge:
    """Ported from `CohereLongFormTests.swift`: LCS-substring seam merge
    with min-match 4 and a 32-token boundary window."""

    def test_merge_prefix_empty(self):
        assert merge_token_streams([], [1, 2, 3]) == [1, 2, 3]

    def test_merge_suffix_empty(self):
        assert merge_token_streams([1, 2, 3], []) == [1, 2, 3]

    def test_no_common_run_falls_back_to_concat(self):
        assert merge_token_streams([10, 11, 12, 13], [20, 21, 22, 23]) == [
            10, 11, 12, 13, 20, 21, 22, 23
        ]

    def test_short_match_below_threshold_falls_back_to_concat(self):
        # A common run of 3 tokens is below minMatch=4.
        assert merge_token_streams([1, 2, 3, 7, 8, 9], [7, 8, 9, 100, 200]) == [
            1, 2, 3, 7, 8, 9, 7, 8, 9, 100, 200
        ]

    def test_overlap_at_boundary(self):
        prefix = [1, 2, 3, 4, 50, 51, 52, 53, 54]
        suffix = [50, 51, 52, 53, 54, 60, 61, 62]
        assert merge_token_streams(prefix, suffix) == [
            1, 2, 3, 4, 50, 51, 52, 53, 54, 60, 61, 62
        ]

    def test_overlap_offset_within_window(self):
        prefix = [1, 2, 3, 90, 91, 92, 93, 94, 95]
        suffix = [91, 92, 93, 94, 95, 200, 201]
        assert merge_token_streams(prefix, suffix) == [
            1, 2, 3, 90, 91, 92, 93, 94, 95, 200, 201
        ]

    def test_prefers_longest_run(self):
        prefix = [1, 2, 3, 4, 7, 8, 9, 10, 11]
        suffix = [1, 2, 3, 4, 7, 8, 9, 10, 11, 99]
        assert merge_token_streams(prefix, suffix) == [
            1, 2, 3, 4, 7, 8, 9, 10, 11, 99
        ]

    def test_window_bounds_lcs_cost(self):
        lead_in = list(range(200))
        prefix = lead_in + [500, 501, 502, 503, 504]
        suffix = [500, 501, 502, 503, 504, 700, 701]
        assert merge_token_streams(prefix, suffix) == lead_in + [
            500, 501, 502, 503, 504, 700, 701
        ]


# --------------------------------------------------------------------------
# Config surface (CohereAsrConfigTests.swift:10-160)
# --------------------------------------------------------------------------


class TestCohereConfig:
    def test_base_dimensions(self):
        from fluidaudio_tpu.models.cohere_asr import COHERE_BASE

        assert COHERE_BASE.vocab_size == 16_384
        assert COHERE_BASE.max_decode_tokens == 108
        assert COHERE_BASE.max_audio_frames == 3500  # 35 s at 10 ms hop
        assert COHERE_BASE.enc_hidden == 1280
        assert COHERE_BASE.n_encoder_layers == 48
        assert COHERE_BASE.d_model == 1024
        assert COHERE_BASE.n_decoder_layers == 8

    def test_head_dim_matches_decoder_dimension(self):
        from fluidaudio_tpu.models.cohere_asr import COHERE_BASE

        assert COHERE_BASE.head_dim * COHERE_BASE.n_heads == COHERE_BASE.d_model
        assert COHERE_BASE.head_dim == 128

    def test_special_token_ids_in_range_and_unique(self):
        from fluidaudio_tpu.models.cohere_asr import COHERE_BASE

        ids = [COHERE_BASE.no_speech_id, COHERE_BASE.pad_id,
               COHERE_BASE.eos_id, COHERE_BASE.bos_id]
        assert all(0 <= t < COHERE_BASE.vocab_size for t in ids)
        assert len(set(ids)) == len(ids)
        assert COHERE_BASE.eos_id == 3
        assert COHERE_BASE.bos_id == 4

    def test_max_call_seconds(self):
        from fluidaudio_tpu.asr.cohere_manager import MAX_CALL_SECONDS

        assert MAX_CALL_SECONDS == 35.0
        # max samples at 16 kHz
        assert int(MAX_CALL_SECONDS * 16_000) == 560_000

    def test_language_catalog(self):
        from fluidaudio_tpu.models.cohere_asr import COHERE_LANGUAGES

        assert len(COHERE_LANGUAGES) == 14
        for code, name in COHERE_LANGUAGES.items():
            assert len(code) == 2 and code.islower()
            assert name and name[0].isupper()
        assert COHERE_LANGUAGES["en"] == "English"
        assert COHERE_LANGUAGES["ja"] == "Japanese"
        assert COHERE_LANGUAGES["zh"] == "Chinese"

    def test_decode_knobs(self):
        from fluidaudio_tpu.models.cohere_asr import COHERE_BASE

        assert COHERE_BASE.repetition_penalty == 1.3
        assert COHERE_BASE.no_repeat_ngram == 3
