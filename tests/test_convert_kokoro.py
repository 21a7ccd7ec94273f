"""Kokoro-82M converter: structural match + torch equivalence of the tricky
pieces (weight-norm folding, AdaIN resblocks, ALBERT vs HF, iSTFT head,
masked BiLSTM vs torch packed LSTM)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.convert.kokoro import (
    _adain_resblk,
    convert_kokoro_state_dict,
)
from fluidaudio_tpu.models.kokoro import (
    AdainResBlk1d,
    KokoroAudioProgram,
    KokoroConfig,
    KokoroTextProgram,
    istft_20,
    stft_20,
)


def tiny_cfg():
    return KokoroConfig(
        vocab_size=40,
        d_model=32,
        style_dim=16,
        n_layer=2,
        max_dur=8,
        albert_emb=16,
        albert_hidden=48,
        albert_heads=4,
        albert_inter=64,
        albert_layers=2,
        albert_max_pos=64,
        decoder_hidden=48,
        asr_res_ch=8,
        upsample_initial=32,
        max_frames=64,
    )


def tree_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(getattr(leaf, "shape", np.shape(leaf)))
    return out


def _wn(rng, out_shape, dim0):
    """weight_g [dim0,1,..] + weight_v entries for a weight-normed module."""
    v = rng.randn(*out_shape) * 0.05
    g = np.abs(rng.randn(dim0, *([1] * (len(out_shape) - 1))) * 0.2) + 0.9
    return g, v


def synthetic_kokoro_state_dict(cfg, rng):
    sd = {}

    def dense(prefix, o, i):
        sd[f"{prefix}.weight"] = rng.randn(o, i) * 0.05
        sd[f"{prefix}.bias"] = rng.randn(o) * 0.1

    def wn_conv(prefix, o, i, k, bias=True):
        g, v = _wn(rng, (o, i, k), o)
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = v
        if bias:
            sd[f"{prefix}.bias"] = rng.randn(o) * 0.1

    def conv(prefix, o, i, k):
        sd[f"{prefix}.weight"] = rng.randn(o, i, k) * 0.05
        sd[f"{prefix}.bias"] = rng.randn(o) * 0.1

    def ln(prefix, c):
        sd[f"{prefix}.weight"] = np.abs(rng.randn(c)) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c) * 0.1

    def lstm(prefix, i, h):
        for sfx in ("", "_reverse"):
            sd[f"{prefix}.weight_ih_l0{sfx}"] = rng.randn(4 * h, i) * 0.05
            sd[f"{prefix}.weight_hh_l0{sfx}"] = rng.randn(4 * h, h) * 0.05
            sd[f"{prefix}.bias_ih_l0{sfx}"] = rng.randn(4 * h) * 0.1
            sd[f"{prefix}.bias_hh_l0{sfx}"] = rng.randn(4 * h) * 0.1

    def resblk(prefix, din, dout, style, upsample=False):
        dense(f"{prefix}.norm1.fc", 2 * din, style)
        dense(f"{prefix}.norm2.fc", 2 * dout, style)
        wn_conv(f"{prefix}.conv1", dout, din, 3)
        wn_conv(f"{prefix}.conv2", dout, dout, 3)
        if din != dout:
            g, v = _wn(rng, (dout, din, 1), dout)
            sd[f"{prefix}.conv1x1.weight_g"] = g
            sd[f"{prefix}.conv1x1.weight_v"] = v
        if upsample:
            g, v = _wn(rng, (din, 1, 3), din)
            sd[f"{prefix}.pool.weight_g"] = g
            sd[f"{prefix}.pool.weight_v"] = v
            sd[f"{prefix}.pool.bias"] = rng.randn(din) * 0.1

    def snake(prefix, ch, k, style):
        for j in range(3):
            wn_conv(f"{prefix}.convs1.{j}", ch, ch, k)
            wn_conv(f"{prefix}.convs2.{j}", ch, ch, k)
            dense(f"{prefix}.adain1.{j}.fc", 2 * ch, style)
            dense(f"{prefix}.adain2.{j}.fc", 2 * ch, style)
            sd[f"{prefix}.alpha1.{j}"] = np.abs(rng.randn(1, ch, 1)) + 0.5
            sd[f"{prefix}.alpha2.{j}"] = np.abs(rng.randn(1, ch, 1)) + 0.5

    d, sty, hid = cfg.d_model, cfg.style_dim, cfg.albert_hidden

    # albert
    sd["bert.embeddings.word_embeddings.weight"] = rng.randn(cfg.vocab_size, cfg.albert_emb) * 0.1
    sd["bert.embeddings.position_embeddings.weight"] = rng.randn(cfg.albert_max_pos, cfg.albert_emb) * 0.1
    sd["bert.embeddings.token_type_embeddings.weight"] = rng.randn(2, cfg.albert_emb) * 0.1
    ln("bert.embeddings.LayerNorm", cfg.albert_emb)
    dense("bert.encoder.embedding_hidden_mapping_in", hid, cfg.albert_emb)
    al = "bert.encoder.albert_layer_groups.0.albert_layers.0"
    for m in ("query", "key", "value", "dense"):
        dense(f"{al}.attention.{m}", hid, hid)
    ln(f"{al}.attention.LayerNorm", hid)
    dense(f"{al}.ffn", cfg.albert_inter, hid)
    dense(f"{al}.ffn_output", hid, cfg.albert_inter)
    ln(f"{al}.full_layer_layer_norm", hid)
    dense("bert_encoder", d, hid)

    # predictor
    for i in range(cfg.n_layer):
        lstm(f"predictor.text_encoder.lstms.{2 * i}", d + sty, d // 2)
        dense(f"predictor.text_encoder.lstms.{2 * i + 1}.fc", 2 * d, sty)
    lstm("predictor.lstm", d + sty, d // 2)
    dense("predictor.duration_proj.linear_layer", cfg.max_dur, d)
    lstm("predictor.shared", d + sty, d // 2)
    for key in ("F0", "N"):
        resblk(f"predictor.{key}.0", d, d, sty)
        resblk(f"predictor.{key}.1", d, d // 2, sty, upsample=True)
        resblk(f"predictor.{key}.2", d // 2, d // 2, sty)
        conv(f"predictor.{key}_proj", 1, d // 2, 1)

    # text encoder
    sd["text_encoder.embedding.weight"] = rng.randn(cfg.vocab_size, d) * 0.1
    for i in range(cfg.n_layer):
        wn_conv(f"text_encoder.cnn.{i}.0", d, d, cfg.text_kernel)
        sd[f"text_encoder.cnn.{i}.1.gamma"] = np.abs(rng.randn(d)) + 0.5
        sd[f"text_encoder.cnn.{i}.1.beta"] = rng.randn(d) * 0.1
    lstm("text_encoder.lstm", d, d // 2)

    # decoder
    dh, rc, ui = cfg.decoder_hidden, cfg.asr_res_ch, cfg.upsample_initial
    wn_conv("decoder.F0_conv", 1, 1, 3)
    wn_conv("decoder.N_conv", 1, 1, 3)
    resblk("decoder.encode", d + 2, dh, sty)
    g, v = _wn(rng, (rc, d, 1), rc)
    sd["decoder.asr_res.0.weight_g"] = g
    sd["decoder.asr_res.0.weight_v"] = v
    sd["decoder.asr_res.0.bias"] = rng.randn(rc) * 0.1
    for i in range(3):
        resblk(f"decoder.decode.{i}", dh + 2 + rc, dh, sty)
    resblk("decoder.decode.3", dh + 2 + rc, ui, sty, upsample=True)

    # generator
    dense("decoder.generator.m_source.l_linear", 1, 9)
    chans = [ui // 2, ui // 4]
    nf2 = cfg.gen_n_fft + 2
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        cin = ui // (2**i)
        g, v = _wn(rng, (cin, chans[i], k), cin)
        sd[f"decoder.generator.ups.{i}.weight_g"] = g
        sd[f"decoder.generator.ups.{i}.weight_v"] = v
        sd[f"decoder.generator.ups.{i}.bias"] = rng.randn(chans[i]) * 0.1
    stride_f0 = cfg.upsample_rates[1]
    conv("decoder.generator.noise_convs.0", chans[0], nf2, 2 * stride_f0)
    snake("decoder.generator.noise_res.0", chans[0], 7, sty)
    conv("decoder.generator.noise_convs.1", chans[1], nf2, 1)
    snake("decoder.generator.noise_res.1", chans[1], 11, sty)
    for i in range(2):
        for j, k in enumerate(cfg.resblock_kernels):
            snake(f"decoder.generator.resblocks.{i * 3 + j}", chans[i], k, sty)
    wn_conv("decoder.generator.conv_post", nf2, chans[1], 7)
    return sd


def test_kokoro_converted_tree_matches_and_runs():
    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    sd = synthetic_kokoro_state_dict(cfg, rng)
    converted = convert_kokoro_state_dict(sd, cfg)

    T, F = 12, 16
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (1, T)), jnp.int32)
    lengths = jnp.array([T - 2], jnp.int32)
    s = jnp.asarray(rng.randn(1, cfg.style_dim), jnp.float32) * 0.1

    text = KokoroTextProgram(cfg)
    want = jax.eval_shape(
        lambda: text.init(jax.random.PRNGKey(0), ids, lengths, s)
    )
    assert tree_shapes(want) == tree_shapes(converted["text"]), (
        f"text mismatch:\n missing={set(tree_shapes(want)) - set(tree_shapes(converted['text']))}\n"
        f" extra={set(tree_shapes(converted['text'])) - set(tree_shapes(want))}"
    )
    duration, dvec, t_en = text.apply(converted["text"], ids, lengths, s)
    assert duration.shape == (1, T) and dvec.shape == (1, T, cfg.d_model + cfg.style_dim)
    assert t_en.shape == (1, T, cfg.d_model)
    assert np.isfinite(np.asarray(duration)).all()

    audio_prog = KokoroAudioProgram(cfg, deterministic=True)
    frame_idx = jnp.asarray(rng.randint(0, T - 2, (1, F)), jnp.int32)
    n_frames = jnp.array([F - 3], jnp.int32)
    want_a = jax.eval_shape(
        lambda: audio_prog.init(
            {"params": jax.random.PRNGKey(0)}, dvec, t_en, frame_idx, n_frames, s, s
        )
    )
    got_a = tree_shapes(converted["audio"])
    assert tree_shapes(want_a) == got_a, (
        f"audio mismatch:\n missing={set(tree_shapes(want_a)) - set(got_a)}\n"
        f" extra={set(got_a) - set(tree_shapes(want_a))}"
    )
    audio = audio_prog.apply(converted["audio"], dvec, t_en, frame_idx, n_frames, s, s)
    assert audio.shape == (1, F * 600)
    assert np.isfinite(np.asarray(audio)).all()


def test_kokoro_adain_resblk_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF
    from torch.nn.utils import weight_norm

    class TorchAdaIN(tnn.Module):
        def __init__(self, style, ch):
            super().__init__()
            self.norm = tnn.InstanceNorm1d(ch, affine=False)
            self.fc = tnn.Linear(style, ch * 2)

        def forward(self, x, s):
            h = self.fc(s)[..., None]
            gamma, beta = h.chunk(2, 1)
            return (1 + gamma) * self.norm(x) + beta

    class TorchBlk(tnn.Module):
        def __init__(self, din, dout, style, upsample):
            super().__init__()
            self.upsample = upsample
            self.norm1 = TorchAdaIN(style, din)
            self.norm2 = TorchAdaIN(style, dout)
            self.conv1 = weight_norm(tnn.Conv1d(din, dout, 3, 1, 1))
            self.conv2 = weight_norm(tnn.Conv1d(dout, dout, 3, 1, 1))
            if upsample:
                self.pool = weight_norm(
                    tnn.ConvTranspose1d(din, din, 3, stride=2, groups=din,
                                        padding=1, output_padding=1))
            self.learned_sc = din != dout
            if self.learned_sc:
                self.conv1x1 = weight_norm(tnn.Conv1d(din, dout, 1, bias=False))

        def forward(self, x, s):
            h = self.norm1(x, s)
            h = tF.leaky_relu(h, 0.2)
            if self.upsample:
                h = self.pool(h)
            h = self.conv1(h)
            h = self.norm2(h, s)
            h = tF.leaky_relu(h, 0.2)
            h = self.conv2(h)
            sc = x
            if self.upsample:
                sc = tF.interpolate(sc, scale_factor=2, mode="nearest")
            if self.learned_sc:
                sc = self.conv1x1(sc)
            return (h + sc) / math.sqrt(2)

    torch.manual_seed(0)
    din, dout, sty, T = 12, 6, 8, 10
    for upsample in (False, True):
        blk = TorchBlk(din, dout, sty, upsample).eval()
        sd = {f"blk.{k}": v.detach().numpy() for k, v in blk.state_dict().items()}
        params = _adain_resblk(sd, "blk", upsample=upsample)
        x = torch.randn(2, din, T)
        s = torch.randn(2, sty)
        with torch.no_grad():
            ref = blk(x, s).numpy()
        got = AdainResBlk1d(din, dout, upsample=upsample).apply(
            {"params": params},
            jnp.asarray(x.numpy().transpose(0, 2, 1)),
            jnp.asarray(s.numpy()),
        )
        got = np.asarray(got).transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_kokoro_albert_matches_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from fluidaudio_tpu.models.kokoro import Albert

    cfg = tiny_cfg()
    hf_cfg = transformers.AlbertConfig(
        vocab_size=cfg.vocab_size,
        embedding_size=cfg.albert_emb,
        hidden_size=cfg.albert_hidden,
        num_hidden_layers=cfg.albert_layers,
        num_attention_heads=cfg.albert_heads,
        intermediate_size=cfg.albert_inter,
        max_position_embeddings=cfg.albert_max_pos,
        hidden_act="gelu_new",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0,
    )
    model = transformers.AlbertModel(hf_cfg).eval()
    sd = {f"bert.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    # reuse just the albert sub-mapping from the full converter
    full = synthetic_kokoro_state_dict(cfg, np.random.RandomState(3))
    full.update(sd)
    params = convert_kokoro_state_dict(full, cfg)["text"]["params"]["albert"]

    rng = np.random.RandomState(1)
    T = 9
    ids = rng.randint(1, cfg.vocab_size, (2, T))
    lengths = np.array([T, T - 3])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        ref = model(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        Albert(cfg).apply(
            {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(lengths)
        )
    )
    # only valid positions are comparable
    for b in range(2):
        np.testing.assert_allclose(
            got[b, : lengths[b]], ref[b, : lengths[b]], atol=5e-5, rtol=1e-4
        )


def test_kokoro_stft_istft_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 300).astype(np.float32)
    mag, ph = stft_20(jnp.asarray(x))
    ref = torch.stft(
        torch.tensor(x), n_fft=20, hop_length=5, win_length=20,
        window=torch.hann_window(20), center=True, return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(mag), ref.abs().numpy().transpose(0, 2, 1), atol=1e-4)
    # istft round-trip through torch as the ground truth
    audio = istft_20(mag, ph)
    ref_audio = torch.istft(
        ref, n_fft=20, hop_length=5, win_length=20, window=torch.hann_window(20),
        center=True,
    ).numpy()
    np.testing.assert_allclose(np.asarray(audio), ref_audio, atol=1e-4)


def test_bilstm_matches_torch_packed():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from fluidaudio_tpu.models.rnn import BiLstm

    torch.manual_seed(0)
    I, H, T = 6, 5, 11
    lstm = tnn.LSTM(I, H, 1, batch_first=True, bidirectional=True).eval()
    sd = {f"l.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}
    from fluidaudio_tpu.convert.kokoro import _bilstm

    params = _bilstm(sd, "l")
    rng = np.random.RandomState(2)
    x = rng.randn(2, T, I).astype(np.float32)
    lengths = np.array([T, T - 4])
    packed = tnn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False,
    )
    with torch.no_grad():
        out, _ = lstm(packed)
    ref, _ = tnn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=T)
    ref = ref.numpy()
    got = np.asarray(
        BiLstm(H).apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
