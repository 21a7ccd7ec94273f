"""StyleTTS2 converter: structural match of all 4 program trees + torch
equivalence of the new pieces (spectral-norm folding, 2D style encoder,
ADPM2/Karras sampler vs a float64 reference, duration rounding)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.convert.styletts2 import (
    _fold_sn,
    config_from_state_dict,
    convert_styletts2_checkpoint,
    flatten_net,
)
from fluidaudio_tpu.models.styletts2 import (
    DIFFUSION_STEPS,
    STYLE_DIM,
    StyleEncoder2d,
    StyleTts2AcousticProgram,
    StyleTts2Config,
    StyleTts2PredictProgram,
    StyleTts2StyleProgram,
    StyleTts2TextProgram,
    adpm2_sample,
    karras_sigmas,
    round_durations,
)


def tiny_cfg():
    return StyleTts2Config(
        vocab_size=40, d_model=32, style_dim=16, n_layer=2, max_dur=8,
        albert_emb=16, albert_hidden=48, albert_heads=4, albert_inter=64,
        albert_layers=2, albert_max_pos=64,
        style_dim_in=8, style_max_conv_dim=16, n_mels=80,
        diff_width=32, diff_layers=1, diff_heads=2,
        decoder_hidden=48, asr_res_ch=8,
        upsample_rates=(10, 5, 3), upsample_kernels=(20, 11, 7),
        upsample_initial=32, resblock_kernels=(3, 7, 11),
        max_frames=64, max_tokens=64,
    )


def tree_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(getattr(leaf, "shape", np.shape(leaf)))
    return out


def _wn(rng, out_shape, dim0):
    v = rng.randn(*out_shape) * 0.05
    g = np.abs(rng.randn(dim0, *([1] * (len(out_shape) - 1))) * 0.2) + 0.9
    return g, v


def synthetic_styletts2_state_dict(cfg, rng):
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

    def sn_conv2d(prefix, o, i, kh, kw, bias=True):
        w = rng.randn(o, i, kh, kw) * 0.05
        # consistent power-iteration vectors so sigma = u.(Wv) is positive
        # and O(||W||) (random u/v would make the folded weight explode)
        wm = w.reshape(o, -1)
        v = rng.randn(i * kh * kw); v /= np.linalg.norm(v)
        u = wm @ v; u /= np.linalg.norm(u)
        sd[f"{prefix}.weight_orig"] = w
        sd[f"{prefix}.weight_u"] = u
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

    def snake(prefix, ch, k, style, n=3):
        for j in range(n):
            wn_conv(f"{prefix}.convs1.{j}", ch, ch, k)
            wn_conv(f"{prefix}.convs2.{j}", ch, ch, k)
            dense(f"{prefix}.adain1.{j}.fc", 2 * ch, style)
            dense(f"{prefix}.adain2.{j}.fc", 2 * ch, style)
            sd[f"{prefix}.alpha1.{j}"] = np.abs(rng.randn(1, ch, 1)) + 0.5
            sd[f"{prefix}.alpha2.{j}"] = np.abs(rng.randn(1, ch, 1)) + 0.5

    d, sty, hid = cfg.d_model, cfg.style_dim, cfg.albert_hidden

    # albert + bert_encoder
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

    # text encoder
    sd["text_encoder.embedding.weight"] = rng.randn(cfg.vocab_size, d) * 0.1
    for i in range(cfg.n_layer):
        wn_conv(f"text_encoder.cnn.{i}.0", d, d, cfg.text_kernel)
        sd[f"text_encoder.cnn.{i}.1.gamma"] = np.abs(rng.randn(d)) + 0.5
        sd[f"text_encoder.cnn.{i}.1.beta"] = rng.randn(d) * 0.1
    lstm("text_encoder.lstm", d, d // 2)

    # 2D style encoders
    for mod in ("style_encoder", "predictor_encoder"):
        dim = cfg.style_dim_in
        sn_conv2d(f"{mod}.shared.0", dim, 1, 3, 3)
        for i in range(4):
            dout = min(dim * 2, cfg.style_max_conv_dim)
            sn_conv2d(f"{mod}.shared.{i+1}.conv1", dim, dim, 3, 3)
            sn_conv2d(f"{mod}.shared.{i+1}.conv2", dout, dim, 3, 3)
            if dim != dout:
                sn_conv2d(f"{mod}.shared.{i+1}.conv1x1", dout, dim, 1, 1, bias=False)
            dim = dout
        sn_conv2d(f"{mod}.shared.6", dim, dim, 5, 5)
        dense(f"{mod}.unshared", cfg.style_dim, dim)

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

    # decoder (hifigan)
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

    dense("decoder.generator.m_source.l_linear", 1, 9)
    rates, kernels = cfg.upsample_rates, cfg.upsample_kernels
    n_up = len(rates)
    chans = [ui // (2 ** (i + 1)) for i in range(n_up)]
    for i, (r, k) in enumerate(zip(rates, kernels)):
        cin = ui if i == 0 else chans[i - 1]
        g, v = _wn(rng, (cin, chans[i], k), cin)
        sd[f"decoder.generator.ups.{i}.weight_g"] = g
        sd[f"decoder.generator.ups.{i}.weight_v"] = v
        sd[f"decoder.generator.ups.{i}.bias"] = rng.randn(chans[i]) * 0.1
        if i + 1 < n_up:
            stride_f0 = int(np.prod(rates[i + 1:]))
            conv(f"decoder.generator.noise_convs.{i}", chans[i], 1, 2 * stride_f0)
            snake(f"decoder.generator.noise_res.{i}", chans[i], 7, sty)
        else:
            conv(f"decoder.generator.noise_convs.{i}", chans[i], 1, 1)
            snake(f"decoder.generator.noise_res.{i}", chans[i], 11, sty)
        for j, rk in enumerate(cfg.resblock_kernels):
            snake(f"decoder.generator.resblocks.{i * len(cfg.resblock_kernels) + j}",
                  chans[i], rk, sty)
    wn_conv("decoder.generator.conv_post", 1, chans[-1], 7)
    return sd


def test_styletts2_converted_tree_matches_and_runs():
    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    sd = synthetic_styletts2_state_dict(cfg, rng)
    converted, dcfg = convert_styletts2_checkpoint(sd, cfg)
    assert dcfg.upsample_rates == cfg.upsample_rates
    assert dcfg.upsample_kernels == cfg.upsample_kernels

    T, F = 12, 16
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, (1, T)), jnp.int32)
    lengths = jnp.array([T - 2], jnp.int32)

    text = StyleTts2TextProgram(cfg)
    want = jax.eval_shape(lambda: text.init(jax.random.PRNGKey(0), ids, lengths))
    got = tree_shapes(converted["text"])
    assert tree_shapes(want) == got, (
        f"text:\n missing={set(tree_shapes(want)) - set(got)}\n"
        f" extra={set(got) - set(tree_shapes(want))}"
    )
    bert_dur, d_en, t_en = text.apply(converted["text"], ids, lengths)

    # style program: diffusion denoiser is partial (upstream tree unmapped),
    # so compare the mapped subtrees only and splice the seeded denoiser in
    style = StyleTts2StyleProgram(cfg)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, 96).astype(np.float32))
    mf = jnp.array([96], jnp.int32)
    ni = jnp.asarray(rng.randn(1, 2 * cfg.style_dim).astype(np.float32))
    na = jnp.asarray(rng.randn(DIFFUSION_STEPS - 1, 1, 2 * cfg.style_dim).astype(np.float32))
    init_s = style.init(jax.random.PRNGKey(1), mel, mf, bert_dur, lengths, ni, na)
    for enc in ("style_encoder", "predictor_encoder"):
        want_enc = tree_shapes(init_s["params"][enc])
        got_enc = tree_shapes(converted["style"]["params"][enc])
        assert want_enc == got_enc, (
            f"{enc}:\n missing={set(want_enc) - set(got_enc)}\n"
            f" extra={set(got_enc) - set(want_enc)}"
        )
    spliced = {"params": dict(converted["style"]["params"])}
    spliced["params"]["diffusion"] = init_s["params"]["diffusion"]
    s_pred, ref_s = style.apply(spliced, mel, mf, bert_dur, lengths, ni, na)
    assert np.isfinite(np.asarray(s_pred)).all()

    predict = StyleTts2PredictProgram(cfg)
    s128 = jnp.asarray(rng.randn(1, cfg.style_dim).astype(np.float32) * 0.1)
    want_p = jax.eval_shape(
        lambda: predict.init(jax.random.PRNGKey(2), d_en, s128, lengths)
    )
    got_p = tree_shapes(converted["predict"])
    assert tree_shapes(want_p) == got_p, (
        f"predict:\n missing={set(tree_shapes(want_p)) - set(got_p)}\n"
        f" extra={set(got_p) - set(tree_shapes(want_p))}"
    )
    d, dur_logits = predict.apply(converted["predict"], d_en, s128, lengths)
    assert dur_logits.shape == (1, T, cfg.max_dur)

    acoustic = StyleTts2AcousticProgram(cfg, deterministic=True)
    frame_idx = jnp.asarray(rng.randint(0, T - 2, (1, F)), jnp.int32)
    n_frames = jnp.array([F - 3], jnp.int32)
    want_a = jax.eval_shape(
        lambda: acoustic.init(
            {"params": jax.random.PRNGKey(3)}, d, t_en, frame_idx, n_frames, s128, s128
        )
    )
    got_a = tree_shapes(converted["acoustic"])
    assert tree_shapes(want_a) == got_a, (
        f"acoustic:\n missing={set(tree_shapes(want_a)) - set(got_a)}\n"
        f" extra={set(got_a) - set(tree_shapes(want_a))}"
    )
    from fluidaudio_tpu.models.styletts2 import generator_output_length

    audio = acoustic.apply(converted["acoustic"], d, t_en, frame_idx, n_frames, s128, s128)
    assert audio.shape == (1, generator_output_length(cfg, 2 * F))
    assert np.isfinite(np.asarray(audio)).all()


def test_spectral_norm_fold_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    from torch.nn.utils import spectral_norm

    torch.manual_seed(0)
    conv = spectral_norm(tnn.Conv2d(3, 5, 3, padding=1))
    # a few power iterations to move u/v off their random init
    x = torch.randn(2, 3, 8, 8)
    for _ in range(4):
        conv(x)
    conv = conv.eval()
    with torch.no_grad():
        ref = conv(x).numpy()
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    w = _fold_sn(sd, "c")  # [out, in, kh, kw]
    import torch.nn.functional as tF

    with torch.no_grad():
        got = tF.conv2d(x, torch.tensor(w), torch.tensor(sd["c.bias"]), padding=1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_style_encoder_2d_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    cfg = tiny_cfg()

    class TorchResBlk(tnn.Module):
        """upstream Models.ResBlk (normalize=False, downsample='half')."""

        def __init__(self, din, dout):
            super().__init__()
            self.conv1 = tnn.Conv2d(din, din, 3, 1, 1)
            self.conv2 = tnn.Conv2d(din, dout, 3, 1, 1)
            self.learned_sc = din != dout
            if self.learned_sc:
                self.conv1x1 = tnn.Conv2d(din, dout, 1, 1, 0, bias=False)

        def forward(self, x):
            h = tF.leaky_relu(x, 0.2)
            h = self.conv1(h)
            h = tF.avg_pool2d(h, 2)
            h = tF.leaky_relu(h, 0.2)
            h = self.conv2(h)
            s = self.conv1x1(x) if self.learned_sc else x
            s = tF.avg_pool2d(s, 2)
            return (h + s) / math.sqrt(2)

    class TorchStyleEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            blocks = [tnn.Conv2d(1, cfg.style_dim_in, 3, 1, 1)]
            dim = cfg.style_dim_in
            for _ in range(4):
                dout = min(dim * 2, cfg.style_max_conv_dim)
                blocks.append(TorchResBlk(dim, dout))
                dim = dout
            blocks += [tnn.LeakyReLU(0.2), tnn.Conv2d(dim, dim, 5, 1, 0),
                       tnn.AdaptiveAvgPool2d(1), tnn.LeakyReLU(0.2)]
            self.shared = tnn.Sequential(*blocks)
            self.unshared = tnn.Linear(dim, cfg.style_dim)

        def forward(self, mel):
            h = self.shared(mel).view(mel.size(0), -1)
            return self.unshared(h)

    torch.manual_seed(1)
    enc = TorchStyleEncoder().eval()
    sd = {f"e.{k}": v.detach().numpy() for k, v in enc.state_dict().items()}
    from fluidaudio_tpu.convert.styletts2 import _style_encoder_2d

    params = _style_encoder_2d(sd, "e")

    rng = np.random.RandomState(0)
    T = 96
    mel = rng.randn(2, cfg.n_mels, T).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.tensor(mel)[:, None]).numpy()
    got = np.asarray(
        StyleEncoder2d(cfg).apply(
            {"params": params}, jnp.asarray(mel), jnp.asarray([T, T], jnp.int32)
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_adpm2_sampler_matches_float64_reference():
    """ADPM2 ancestral stepping vs an independent float64 reference, using a
    closed-form linear 'denoiser' so both sides are exactly computable."""
    rng = np.random.RandomState(0)
    W = rng.randn(STYLE_DIM, STYLE_DIM).astype(np.float64) * 0.01

    def denoise_np(x, sigma):
        return x @ W.T / (1.0 + sigma[:, None])

    def denoise_jax(x, sigma):
        return jnp.asarray(
            denoise_np(np.asarray(x, np.float64), np.asarray(sigma, np.float64)),
            jnp.float32,
        )

    noise_init = rng.randn(1, STYLE_DIM).astype(np.float32)
    noises_aux = rng.randn(DIFFUSION_STEPS - 1, 1, STYLE_DIM).astype(np.float32)

    sigmas = karras_sigmas(DIFFUSION_STEPS).astype(np.float64)
    x = sigmas[0] * noise_init.astype(np.float64)
    for k in range(DIFFUSION_STEPS - 1):
        sigma, sigma_next = sigmas[k], sigmas[k + 1]
        sigma_up = math.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2)
        sigma_down = math.sqrt(sigma_next**2 - sigma_up**2)
        sigma_mid = (sigma + sigma_down) / 2
        d = (x - denoise_np(x, np.array([sigma]))) / sigma
        x_mid = x + d * (sigma_mid - sigma)
        d_mid = (x_mid - denoise_np(x_mid, np.array([sigma_mid]))) / sigma_mid
        x = x + d_mid * (sigma_down - sigma)
        x = x + noises_aux[k].astype(np.float64) * sigma_up

    got = np.asarray(
        adpm2_sample(denoise_jax, jnp.asarray(noise_init), jnp.asarray(noises_aux))
    )
    np.testing.assert_allclose(got, x, atol=1e-5, rtol=1e-4)


def test_karras_schedule_matches_reference_formula():
    s = karras_sigmas(5)
    assert len(s) == 6 and s[-1] == 0.0
    assert abs(s[0] - 3.0) < 1e-6 and abs(s[4] - 1e-4) < 1e-9
    assert np.all(np.diff(s) < 0)


def test_round_durations_semantics():
    # sum(sigmoid) across bins, round half away from zero, clamp >= 1
    logits = np.full((3, 4), -20.0)
    logits[1] = 20.0  # sigmoid sum = 4 -> 4 frames
    logits[2, :2] = 0.0  # 0.5+0.5 ~= 1 -> rounds to 1
    d = round_durations(logits, 3)
    assert list(d) == [1, 4, 1]


def test_flatten_net_nested_and_flat():
    nested = {"net": {"bert": {"module.a.weight": np.zeros(2)}}}
    flat = flatten_net(nested)
    assert "bert.a.weight" in flat
    assert "x.weight" in flatten_net({"module.x.weight": np.zeros(1)})


def test_config_from_state_dict_derives_rates():
    cfg = tiny_cfg()
    sd = synthetic_styletts2_state_dict(cfg, np.random.RandomState(1))
    derived = config_from_state_dict(sd)
    assert derived.upsample_rates == cfg.upsample_rates
    assert derived.upsample_initial == cfg.upsample_initial
    assert derived.resblock_kernels == cfg.resblock_kernels
