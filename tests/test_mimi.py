"""Mimi codec: streaming conv math, converter structure, torch equivalence of
the causal SEANet chain, ring-KV transformer vs full-sequence attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.convert.mimi import (
    convert_mimi_decoder_state_dict,
    convert_mimi_encoder_state_dict,
)
from fluidaudio_tpu.models.mimi import (
    MIMI_TEST,
    MimiConfig,
    MimiDecoder,
    MimiEncoder,
    causal_conv_step,
    causal_convtr_step,
    conv_state_size,
)


def tree_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(getattr(leaf, "shape", np.shape(leaf)))
    return out


def test_streaming_causal_conv_matches_full():
    rng = np.random.RandomState(0)
    B, C, O, k, dil = 2, 3, 5, 5, 2
    T = 24
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(k, C, O).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(O).astype(np.float32))

    # full causal conv: left-pad (k-1)*dil
    pad = (k - 1) * dil
    full = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (pad, 0), (0, 0))), w, (1,), "VALID",
        rhs_dilation=(dil,), dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b

    state = jnp.zeros((B, conv_state_size(k, 1, dil), C))
    outs = []
    for t0 in range(0, T, 4):
        y, state = causal_conv_step(x[:, t0 : t0 + 4], state, w, b, 1, dil)
        outs.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(full), atol=1e-5
    )


def test_streaming_causal_convtr_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    B, C, O, k, s = 2, 4, 3, 8, 4
    T = 12
    x = rng.randn(B, T, C).astype(np.float32)
    w = rng.randn(C, O, k).astype(np.float32) * 0.3  # torch convtr layout
    b = rng.randn(O).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x.transpose(0, 2, 1)), torch.tensor(w), torch.tensor(b),
        stride=s,
    ).numpy().transpose(0, 2, 1)
    # causal streaming emits exactly T*s samples; the torch full output's
    # first T*s samples (the rest is right-edge tail the stream carries)
    wj = jnp.asarray(np.transpose(w, (2, 0, 1)))
    state = jnp.zeros((B, k - s, O))
    outs = []
    for t0 in range(0, T, 3):
        y, state = causal_convtr_step(
            jnp.asarray(x[:, t0 : t0 + 3]), state, wj, jnp.asarray(b), s
        )
        outs.append(y)
    got = np.asarray(jnp.concatenate(outs, 1))
    np.testing.assert_allclose(got, ref[:, : T * s], atol=1e-5)


def synthetic_mimi_state_dict(cfg, rng):
    sd = {}

    def conv(base, o, i, k):
        sd[f"{base}.conv.conv.weight"] = rng.randn(o, i, k) * 0.1
        sd[f"{base}.conv.conv.bias"] = rng.randn(o) * 0.1

    def convtr(base, i, o, k):
        sd[f"{base}.convtr.convtr.weight"] = rng.randn(i, o, k) * 0.1
        sd[f"{base}.convtr.convtr.bias"] = rng.randn(o) * 0.1

    def trans(base, d, ff):
        for i_ in range(cfg.trans_layers):
            b = f"{base}.transformer.layers.{i_}"
            sd[f"{b}.norm1.weight"] = np.abs(rng.randn(d)) + 0.5
            sd[f"{b}.norm1.bias"] = rng.randn(d) * 0.1
            sd[f"{b}.norm2.weight"] = np.abs(rng.randn(d)) + 0.5
            sd[f"{b}.norm2.bias"] = rng.randn(d) * 0.1
            sd[f"{b}.self_attn.in_proj_weight"] = rng.randn(3 * d, d) * 0.1
            sd[f"{b}.self_attn.out_proj.weight"] = rng.randn(d, d) * 0.1
            sd[f"{b}.linear1.weight"] = rng.randn(ff, d) * 0.1
            sd[f"{b}.linear2.weight"] = rng.randn(d, ff) * 0.1
            sd[f"{b}.layer_scale_1.scale"] = np.abs(rng.randn(d)) * 0.1
            sd[f"{b}.layer_scale_2.scale"] = np.abs(rng.randn(d)) * 0.1

    mult = 2 ** len(cfg.ratios)
    # decoder
    sd["quantizer.output_proj.weight"] = rng.randn(cfg.dim, cfg.latent_dim, 1) * 0.1
    convtr("upsample", cfg.dim, 1, 4)  # depthwise [in, 1, k]
    sd["upsample.convtr.convtr.weight"] = rng.randn(cfg.dim, 1, 4) * 0.1
    sd["upsample.convtr.convtr.bias"] = rng.randn(cfg.dim) * 0.1
    trans("decoder_transformer", cfg.dim, cfg.trans_ff)
    conv("decoder.model.0", cfg.n_filters * mult, cfg.dim, cfg.kernel)
    ch = cfg.n_filters * mult
    for s_ in range(len(cfg.ratios)):
        r = cfg.ratios[s_]
        base = 1 + 3 * s_
        convtr(f"decoder.model.{base + 1}", ch, ch // 2, 2 * r)
        conv(f"decoder.model.{base + 2}.block.1", ch // 2 // cfg.compress, ch // 2,
             cfg.resid_kernel)
        conv(f"decoder.model.{base + 2}.block.3", ch // 2, ch // 2 // cfg.compress, 1)
        ch //= 2
    conv(f"decoder.model.{1 + 3 * len(cfg.ratios) + 1}", 1, ch, cfg.last_kernel)

    # encoder
    conv("encoder.model.0", cfg.n_filters, 1, cfg.kernel)
    ch = cfg.n_filters
    for s_ in range(len(cfg.ratios)):
        r = tuple(reversed(cfg.ratios))[s_]
        base = 1 + 3 * s_
        conv(f"encoder.model.{base}.block.1", ch // cfg.compress, ch, cfg.resid_kernel)
        conv(f"encoder.model.{base}.block.3", ch, ch // cfg.compress, 1)
        conv(f"encoder.model.{base + 2}", ch * 2, ch, 2 * r)
        ch *= 2
    conv(f"encoder.model.{1 + 3 * len(cfg.ratios) + 1}", cfg.dim, ch, cfg.last_kernel)
    sd["downsample.conv.conv.weight"] = rng.randn(cfg.dim, 1, 4) * 0.1
    sd["downsample.conv.conv.bias"] = rng.randn(cfg.dim) * 0.1
    trans("encoder_transformer", cfg.dim, cfg.trans_ff)
    sd["quantizer.input_proj.weight"] = rng.randn(cfg.latent_dim, cfg.dim, 1) * 0.1
    return sd


def test_mimi_decoder_converted_tree_matches_and_runs():
    cfg = MIMI_TEST
    rng = np.random.RandomState(0)
    sd = synthetic_mimi_state_dict(cfg, rng)
    params = convert_mimi_decoder_state_dict(sd, cfg)

    dec = MimiDecoder(cfg)
    state = dec.init_state(1)
    latent = jnp.asarray(rng.randn(1, cfg.latent_dim).astype(np.float32))
    want = jax.eval_shape(
        lambda: dec.init(jax.random.PRNGKey(0), latent, state)
    )
    assert tree_shapes(want) == tree_shapes(params), (
        f"missing={set(tree_shapes(want)) - set(tree_shapes(params))}\n"
        f"extra={set(tree_shapes(params)) - set(tree_shapes(want))}"
    )
    step = jax.jit(dec.apply)
    outs = []
    for _ in range(3):
        y, state = step(params, latent, state)
        outs.append(np.asarray(y))
    hop = cfg.hop
    assert outs[0].shape == (1, hop)
    assert np.isfinite(np.concatenate(outs, 1)).all()
    assert int(state["pos"][0]) == 3


def test_mimi_encoder_converted_tree_matches_and_runs():
    cfg = MIMI_TEST
    rng = np.random.RandomState(1)
    sd = synthetic_mimi_state_dict(cfg, rng)
    params = convert_mimi_encoder_state_dict(sd, cfg)

    enc = MimiEncoder(cfg)
    audio = jnp.asarray(rng.randn(1, cfg.hop * 5).astype(np.float32) * 0.1)
    want = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), audio))
    assert tree_shapes(want) == tree_shapes(params), (
        f"missing={set(tree_shapes(want)) - set(tree_shapes(params))}\n"
        f"extra={set(tree_shapes(params)) - set(tree_shapes(want))}"
    )
    lat = enc.apply(params, audio)
    assert lat.shape == (1, 5, cfg.latent_dim)
    assert np.isfinite(np.asarray(lat)).all()


def test_mimi_seanet_chain_matches_torch():
    """Conv-only decoder (trans_layers=0) streamed frame-by-frame must equal
    a torch full-sequence causal SEANet decoder on the same weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF

    cfg = MimiConfig(
        latent_dim=6, dim=16, n_filters=4, ratios=(4, 3), kernel=5,
        trans_layers=0, trans_heads=4, trans_ff=32, trans_context=8,
    )
    rng = np.random.RandomState(2)
    sd = synthetic_mimi_state_dict(cfg, rng)
    params = convert_mimi_decoder_state_dict(sd, cfg)

    N = 4  # frames
    latents = rng.randn(1, N, cfg.latent_dim).astype(np.float32)

    # torch reference: full-sequence causal pipeline
    def causal_conv(x, w, b, stride=1, dil=1, groups=1):
        pad = (w.shape[-1] - 1) * dil + 1 - stride
        x = tF.pad(x, (pad, 0))
        return tF.conv1d(x, w, b, stride=stride, dilation=dil, groups=groups)

    def causal_convtr(x, w, b, stride, groups=1):
        y = tF.conv_transpose1d(x, w, b, stride=stride, groups=groups)
        return y[..., : x.shape[-1] * stride]

    t = lambda k: torch.tensor(np.asarray(sd[k], np.float32))
    x = torch.tensor(latents.transpose(0, 2, 1))
    w = t("quantizer.output_proj.weight")
    x = tF.conv1d(x, w)
    x = causal_convtr(x, t("upsample.convtr.convtr.weight"),
                      t("upsample.convtr.convtr.bias"), 2, groups=cfg.dim)
    x = causal_conv(x, t("decoder.model.0.conv.conv.weight"),
                    t("decoder.model.0.conv.conv.bias"))
    ch = cfg.n_filters * 2 ** len(cfg.ratios)
    for s_, r in enumerate(cfg.ratios):
        base = 1 + 3 * s_
        x = tF.elu(x)
        x = causal_convtr(x, t(f"decoder.model.{base + 1}.convtr.convtr.weight"),
                          t(f"decoder.model.{base + 1}.convtr.convtr.bias"), r)
        res = tF.elu(x)
        res = causal_conv(res, t(f"decoder.model.{base + 2}.block.1.conv.conv.weight"),
                          t(f"decoder.model.{base + 2}.block.1.conv.conv.bias"))
        res = tF.elu(res)
        res = causal_conv(res, t(f"decoder.model.{base + 2}.block.3.conv.conv.weight"),
                          t(f"decoder.model.{base + 2}.block.3.conv.conv.bias"))
        x = x + res
        ch //= 2
    x = tF.elu(x)
    last = 1 + 3 * len(cfg.ratios) + 1
    x = causal_conv(x, t(f"decoder.model.{last}.conv.conv.weight"),
                    t(f"decoder.model.{last}.conv.conv.bias"))
    ref = x.detach().numpy()[:, 0, :]

    dec = MimiDecoder(cfg)
    state = dec.init_state(1)
    outs = []
    for f in range(N):
        y, state = dec.apply(params, jnp.asarray(latents[:, f]), state)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_mimi_ring_kv_matches_full_attention():
    """Streaming transformer steps (ring KV) == full-sequence causal
    attention with the same params, incl. after the ring wraps."""
    cfg = MimiConfig(
        latent_dim=4, dim=16, n_filters=4, ratios=(4, 3), kernel=5,
        trans_layers=2, trans_heads=4, trans_ff=32, trans_context=5,
    )
    rng = np.random.RandomState(3)
    sd = synthetic_mimi_state_dict(cfg, rng)
    params = convert_mimi_decoder_state_dict(sd, cfg)

    from fluidaudio_tpu.models.mimi import MimiTransformerLayer, _rope

    N = 9  # > context (5): exercises ring-wrap eviction
    xs = rng.randn(1, N, cfg.dim).astype(np.float32)

    # full-sequence reference in jnp with the same converted params
    def full_ref(layer_params):
        x = jnp.asarray(xs)
        B, T, D = x.shape
        H, Dh = cfg.trans_heads, cfg.head_dim
        pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        ln = lambda p, v: (v - v.mean(-1, keepdims=True)) / jnp.sqrt(
            v.var(-1, keepdims=True) + 1e-5) * p["scale"] + p["bias"]
        h = ln(layer_params["norm1"], x)
        qkv = h @ layer_params["in_proj"]["kernel"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope(q.reshape(B, T, H, Dh), pos)
        k = _rope(k.reshape(B, T, H, Dh), pos)
        v = v.reshape(B, T, H, Dh)
        causal = jnp.tril(jnp.ones((T, T), bool))
        window = (jnp.arange(T)[:, None] - jnp.arange(T)[None, :]) < cfg.trans_context
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(Dh)
        sc = jnp.where((causal & window)[None, None], sc, -1e9)
        att = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(sc, -1), v)
        att = att.reshape(B, T, D) @ layer_params["out_proj"]["kernel"]
        x = x + layer_params["layer_scale_1"] * att
        h = ln(layer_params["norm2"], x)
        h = h @ layer_params["mlp_in"]["kernel"]
        h = jax.nn.gelu(h, approximate=True)
        h = h @ layer_params["mlp_out"]["kernel"]
        return x + layer_params["layer_scale_2"] * h

    lp = params["params"]["tr_0"]
    ref = np.asarray(full_ref(lp))

    layer = MimiTransformerLayer(cfg)
    kv = jnp.zeros((2, 1, cfg.trans_context, cfg.trans_heads, cfg.head_dim))
    outs = []
    for i in range(N):
        y, kv = layer.apply(
            {"params": lp}, jnp.asarray(xs[:, i : i + 1]),
            jnp.array([i]), kv, jnp.array([i]),
        )
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_mimi_encoder_chain_matches_torch():
    """Conv-only encoder (trans_layers=0) must equal a torch full-sequence
    causal mirrored-SEANet encoder + x2 depthwise downsample + input_proj on
    the same weights — the voice-cloning path's numeric pin (reference
    `PocketTTS/PocketTtsVoiceCloner.swift` mimi encode), decoder analog:
    `test_mimi_seanet_chain_matches_torch`."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF

    cfg = MimiConfig(
        latent_dim=6, dim=16, n_filters=4, ratios=(4, 3), kernel=5,
        trans_layers=0, trans_heads=4, trans_ff=32, trans_context=8,
    )
    rng = np.random.RandomState(5)
    sd = synthetic_mimi_state_dict(cfg, rng)
    params = convert_mimi_encoder_state_dict(sd, cfg)

    hop = int(np.prod(cfg.ratios)) * 2
    N = hop * 6
    audio = (rng.randn(1, N) * 0.1).astype(np.float32)

    def causal_conv(x, w, b, stride=1, dil=1, groups=1):
        pad = (w.shape[-1] - 1) * dil + 1 - stride
        x = tF.pad(x, (pad, 0))
        return tF.conv1d(x, w, b, stride=stride, dilation=dil, groups=groups)

    t = lambda k: torch.tensor(np.asarray(sd[k], np.float32))
    x = torch.tensor(audio[:, None, :])
    x = causal_conv(x, t("encoder.model.0.conv.conv.weight"),
                    t("encoder.model.0.conv.conv.bias"))
    for s_ in range(len(cfg.ratios)):
        r = tuple(reversed(cfg.ratios))[s_]
        base = 1 + 3 * s_
        res = tF.elu(x)
        res = causal_conv(res, t(f"encoder.model.{base}.block.1.conv.conv.weight"),
                          t(f"encoder.model.{base}.block.1.conv.conv.bias"))
        res = tF.elu(res)
        res = causal_conv(res, t(f"encoder.model.{base}.block.3.conv.conv.weight"),
                          t(f"encoder.model.{base}.block.3.conv.conv.bias"))
        x = x + res
        x = tF.elu(x)
        x = causal_conv(x, t(f"encoder.model.{base + 2}.conv.conv.weight"),
                        t(f"encoder.model.{base + 2}.conv.conv.bias"), stride=r)
    x = tF.elu(x)
    last = 1 + 3 * len(cfg.ratios) + 1
    x = causal_conv(x, t(f"encoder.model.{last}.conv.conv.weight"),
                    t(f"encoder.model.{last}.conv.conv.bias"))
    x = causal_conv(x, t("downsample.conv.conv.weight"),
                    t("downsample.conv.conv.bias"), stride=2, groups=cfg.dim)
    x = tF.conv1d(x, t("quantizer.input_proj.weight"))
    ref = x.detach().numpy().transpose(0, 2, 1)  # [1, T, latent]

    enc = MimiEncoder(cfg)
    got = np.asarray(enc.apply(params, jnp.asarray(audio)))
    assert got.shape == ref.shape == (1, 6, cfg.latent_dim)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
