"""ByT5 (CharsiuG2P) architecture parity: flax model + converter vs the
real `transformers.T5ForConditionalGeneration` forward."""

import numpy as np
import pytest

from fluidaudio_tpu.convert.byt5 import config_from_hf, convert_byt5_state_dict
from fluidaudio_tpu.models.byt5_g2p import (
    BYT5_TEST,
    ByT5G2P,
    byt5_greedy_decode,
    decode_bytes,
    encode_bytes,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    cfg = transformers.T5Config(
        vocab_size=BYT5_TEST.vocab_size,
        d_model=BYT5_TEST.d_model,
        d_kv=BYT5_TEST.d_kv,
        d_ff=BYT5_TEST.d_ff,
        num_layers=BYT5_TEST.num_layers,
        num_decoder_layers=BYT5_TEST.num_decoder_layers,
        num_heads=BYT5_TEST.num_heads,
        relative_attention_num_buckets=BYT5_TEST.relative_attention_num_buckets,
        relative_attention_max_distance=BYT5_TEST.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=False,
        decoder_start_token_id=0,
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()
    params = convert_byt5_state_dict(hf.state_dict(), BYT5_TEST)
    return hf, ByT5G2P(BYT5_TEST), params


def test_config_from_hf_roundtrip(hf_pair):
    hf, _, _ = hf_pair
    cfg = config_from_hf(hf.config.to_dict())
    assert cfg == BYT5_TEST


def test_logits_match_transformers(hf_pair):
    hf, model, params = hf_pair
    rng = np.random.RandomState(0)
    B, Te, Td = 2, 11, 7
    enc_ids = rng.randint(3, 300, (B, Te)).astype(np.int32)
    enc_ids[1, 8:] = 0  # padding on row 1
    enc_mask = enc_ids != 0
    dec_ids = np.concatenate(
        [np.zeros((B, 1), np.int32), rng.randint(3, 300, (B, Td - 1)).astype(np.int32)],
        axis=1,
    )

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(enc_ids, dtype=torch.long),
            attention_mask=torch.tensor(enc_mask, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec_ids, dtype=torch.long),
        ).logits.numpy()

    got = np.asarray(model.apply(params, enc_ids, enc_mask, dec_ids))
    # row 1 has padded encoder columns -> compare valid rows fully
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_greedy_decode_matches_generate(hf_pair):
    hf, model, params = hf_pair
    word = "<eng-us>: hello"
    ids, n = encode_bytes(word, 24)
    enc_ids = ids[None, :]
    enc_mask = enc_ids != 0

    with torch.no_grad():
        ref_ids = hf.generate(
            input_ids=torch.tensor(enc_ids, dtype=torch.long),
            attention_mask=torch.tensor(enc_mask, dtype=torch.long),
            max_new_tokens=10, do_sample=False, num_beams=1,
        ).numpy()[0][1:]  # drop decoder_start

    got = np.asarray(byt5_greedy_decode(model, params, enc_ids, enc_mask,
                                        max_steps=10))[0]
    # compare up to / including EOS
    ref_list = list(ref_ids)
    got_list = list(got[: len(ref_list)])
    assert got_list[: len(ref_list)] == ref_list[: len(got_list)]


def test_byte_tokenizer_roundtrip():
    ids, n = encode_bytes("héllo", 16)
    assert ids[n - 1] == 1  # EOS
    assert decode_bytes(ids) == "héllo"
