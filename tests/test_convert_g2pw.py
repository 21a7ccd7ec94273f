"""g2pW (BERT polyphone classifier) parity vs transformers BertModel."""

import numpy as np
import pytest

from fluidaudio_tpu.convert.g2pw import config_from_hf, convert_g2pw_state_dict
from fluidaudio_tpu.models.bert_g2pw import G2PW_TEST, BertG2pw

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    cfg = transformers.BertConfig(
        vocab_size=G2PW_TEST.vocab_size,
        hidden_size=G2PW_TEST.hidden_size,
        num_hidden_layers=G2PW_TEST.num_hidden_layers,
        num_attention_heads=G2PW_TEST.num_attention_heads,
        intermediate_size=G2PW_TEST.intermediate_size,
        max_position_embeddings=G2PW_TEST.max_position_embeddings,
        type_vocab_size=G2PW_TEST.type_vocab_size,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg, add_pooling_layer=False).eval()
    head = torch.nn.Linear(G2PW_TEST.hidden_size, G2PW_TEST.num_labels)
    sd = dict(hf.state_dict())
    sd["classifier.weight"] = head.weight
    sd["classifier.bias"] = head.bias
    params = convert_g2pw_state_dict(sd, G2PW_TEST)
    return hf, head, BertG2pw(G2PW_TEST), params


def test_config_from_hf(hf_pair):
    hf, _, _, _ = hf_pair
    cfg = config_from_hf(hf.config.to_dict(), num_labels=G2PW_TEST.num_labels)
    assert cfg == G2PW_TEST


def test_logits_match_transformers(hf_pair):
    hf, head, model, params = hf_pair
    rng = np.random.RandomState(0)
    B, T = 2, 13
    ids = rng.randint(5, 120, (B, T)).astype(np.int32)
    mask = np.ones((B, T), bool)
    mask[1, 10:] = False
    ids[1, 10:] = 0
    types = np.zeros((B, T), np.int32)
    target = np.array([3, 7], np.int32)

    with torch.no_grad():
        hidden = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).last_hidden_state
        gathered = hidden[torch.arange(B), torch.tensor(target, dtype=torch.long)]
        ref = head(gathered).numpy()

    got = np.asarray(model.apply(params, ids, mask, types, target))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
