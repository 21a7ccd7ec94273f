"""BART G2P architecture parity: flax model + converter vs the real
`transformers.BartForConditionalGeneration` forward/generate."""

import numpy as np
import pytest

from fluidaudio_tpu.convert.bart import config_from_hf, convert_bart_state_dict
from fluidaudio_tpu.models.bart_g2p import (
    BART_G2P_TEST,
    BartG2P,
    bart_greedy_decode,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    cfg = transformers.BartConfig(
        vocab_size=BART_G2P_TEST.vocab_size,
        d_model=BART_G2P_TEST.d_model,
        encoder_layers=BART_G2P_TEST.encoder_layers,
        decoder_layers=BART_G2P_TEST.decoder_layers,
        encoder_attention_heads=BART_G2P_TEST.encoder_attention_heads,
        decoder_attention_heads=BART_G2P_TEST.decoder_attention_heads,
        encoder_ffn_dim=BART_G2P_TEST.encoder_ffn_dim,
        decoder_ffn_dim=BART_G2P_TEST.decoder_ffn_dim,
        max_position_embeddings=BART_G2P_TEST.max_position_embeddings,
        scale_embedding=BART_G2P_TEST.scale_embedding,
        pad_token_id=BART_G2P_TEST.pad_token_id,
        bos_token_id=BART_G2P_TEST.bos_token_id,
        eos_token_id=BART_G2P_TEST.eos_token_id,
        decoder_start_token_id=BART_G2P_TEST.decoder_start_token_id,
        forced_eos_token_id=None,
        forced_bos_token_id=None,
        activation_function="gelu",
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.BartForConditionalGeneration(cfg).eval()
    params = convert_bart_state_dict(hf.state_dict(), BART_G2P_TEST)
    return hf, BartG2P(BART_G2P_TEST), params


def test_config_from_hf(hf_pair):
    hf, _, _ = hf_pair
    got = config_from_hf(hf.config.to_dict())
    assert got == BART_G2P_TEST


def test_logits_match_transformers(hf_pair):
    hf, model, params = hf_pair
    rng = np.random.RandomState(0)
    B, Te, Td = 2, 9, 6
    enc_ids = rng.randint(3, 70, (B, Te)).astype(np.int32)
    enc_mask = np.ones((B, Te), bool)
    dec_ids = np.concatenate(
        [np.full((B, 1), 2, np.int32), rng.randint(3, 70, (B, Td - 1)).astype(np.int32)],
        axis=1,
    )
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(enc_ids, dtype=torch.long),
            attention_mask=torch.tensor(enc_mask, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec_ids, dtype=torch.long),
        ).logits.numpy()
    got = np.asarray(model.apply(params, enc_ids, enc_mask, dec_ids))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_greedy_decode_matches_generate(hf_pair):
    hf, model, params = hf_pair
    rng = np.random.RandomState(3)
    enc_ids = rng.randint(3, 70, (1, 7)).astype(np.int32)
    enc_mask = np.ones((1, 7), bool)
    with torch.no_grad():
        ref_ids = hf.generate(
            input_ids=torch.tensor(enc_ids, dtype=torch.long),
            attention_mask=torch.tensor(enc_mask, dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1,
        ).numpy()[0]
    # HF emits [decoder_start, bos, tok...]; ours returns tok... after bos
    ref_tail = list(ref_ids[2:])
    got = list(np.asarray(bart_greedy_decode(model, params, enc_ids, enc_mask,
                                             max_steps=8))[0][: len(ref_tail)])
    assert got == ref_tail


def test_load_bart_fallback_end_to_end(hf_pair, tmp_path):
    """Cached bart.npz + config.json + vocab.json -> working OOV fallback."""
    import json

    from fluidaudio_tpu.tts.g2p import EnglishG2P, load_bart_fallback
    from fluidaudio_tpu.utils.checkpoint import save_params

    hf, model, params = hf_pair
    save_params(tmp_path / "bart.npz", params)
    (tmp_path / "config.json").write_text(json.dumps(hf.config.to_dict()))
    g2i = {c: 3 + i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz'")}
    i2p = {str(40 + i): p for i, p in enumerate(["æ", "b", "k", "d"])}
    (tmp_path / "vocab.json").write_text(json.dumps(
        {"grapheme_to_id": g2i, "id_to_phoneme": i2p, "unk_token_id": 3}
    ))
    fb = load_bart_fallback(tmp_path)
    assert fb is not None
    out = fb("zyzzyva")
    assert out is None or isinstance(out, str)
    assert fb("zyzzyva") == out  # cached

    g2p = EnglishG2P(fallback=fb)
    assert g2p.word_to_phonemes("the") == "ðə"  # lexicon still wins

    assert load_bart_fallback(tmp_path / "missing") is None
