"""NeMo->npz converter: structural + shape match against the real flax trees,
and the converted params must actually run the pipeline."""

import numpy as np
import pytest

import jax

from fluidaudio_tpu.convert.parakeet import convert_parakeet_state_dict
from fluidaudio_tpu.models.zoo import ASR_VERSIONS, AsrModels


def synthetic_nemo_state_dict(ccfg, pcfg, rng):
    """Torch-layout state dict with NeMo FastConformer-TDT key names."""
    d, c = ccfg.d_model, ccfg.subsampling_channels
    f8 = ccfg.n_mels // 8
    ff = d * ccfg.ffn_expansion
    H, Dh = ccfg.n_heads, ccfg.head_dim
    sd = {
        "encoder.pre_encode.conv.0.weight": rng.randn(c, 1, 3, 3),
        "encoder.pre_encode.conv.0.bias": rng.randn(c),
        "encoder.pre_encode.conv.2.weight": rng.randn(c, 1, 3, 3),
        "encoder.pre_encode.conv.2.bias": rng.randn(c),
        "encoder.pre_encode.conv.3.weight": rng.randn(c, c, 1, 1),
        "encoder.pre_encode.conv.3.bias": rng.randn(c),
        "encoder.pre_encode.conv.5.weight": rng.randn(c, 1, 3, 3),
        "encoder.pre_encode.conv.5.bias": rng.randn(c),
        "encoder.pre_encode.conv.6.weight": rng.randn(c, c, 1, 1),
        "encoder.pre_encode.conv.6.bias": rng.randn(c),
        "encoder.pre_encode.out.weight": rng.randn(d, c * f8),
        "encoder.pre_encode.out.bias": rng.randn(d),
    }
    for i in range(ccfg.n_layers):
        b = f"encoder.layers.{i}"
        sd.update({
            f"{b}.norm_feed_forward1.weight": rng.randn(d),
            f"{b}.norm_feed_forward1.bias": rng.randn(d),
            f"{b}.feed_forward1.linear1.weight": rng.randn(ff, d),
            f"{b}.feed_forward1.linear1.bias": rng.randn(ff),
            f"{b}.feed_forward1.linear2.weight": rng.randn(d, ff),
            f"{b}.feed_forward1.linear2.bias": rng.randn(d),
            f"{b}.norm_self_att.weight": rng.randn(d),
            f"{b}.norm_self_att.bias": rng.randn(d),
            f"{b}.self_attn.linear_q.weight": rng.randn(d, d),
            f"{b}.self_attn.linear_q.bias": rng.randn(d),
            f"{b}.self_attn.linear_k.weight": rng.randn(d, d),
            f"{b}.self_attn.linear_k.bias": rng.randn(d),
            f"{b}.self_attn.linear_v.weight": rng.randn(d, d),
            f"{b}.self_attn.linear_v.bias": rng.randn(d),
            f"{b}.self_attn.linear_out.weight": rng.randn(d, d),
            f"{b}.self_attn.linear_out.bias": rng.randn(d),
            f"{b}.self_attn.linear_pos.weight": rng.randn(d, d),
            f"{b}.self_attn.pos_bias_u": rng.randn(H, Dh),
            f"{b}.self_attn.pos_bias_v": rng.randn(H, Dh),
            f"{b}.norm_conv.weight": rng.randn(d),
            f"{b}.norm_conv.bias": rng.randn(d),
            f"{b}.conv.pointwise_conv1.weight": rng.randn(2 * d, d, 1),
            f"{b}.conv.pointwise_conv1.bias": rng.randn(2 * d),
            f"{b}.conv.depthwise_conv.weight": rng.randn(d, 1, ccfg.conv_kernel),
            f"{b}.conv.batch_norm.weight": np.abs(rng.randn(d)) + 0.5,
            f"{b}.conv.batch_norm.bias": rng.randn(d),
            f"{b}.conv.batch_norm.running_mean": rng.randn(d) * 0.1,
            f"{b}.conv.batch_norm.running_var": np.abs(rng.randn(d)) + 0.5,
            f"{b}.conv.pointwise_conv2.weight": rng.randn(d, d, 1),
            f"{b}.conv.pointwise_conv2.bias": rng.randn(d),
            f"{b}.norm_feed_forward2.weight": rng.randn(d),
            f"{b}.norm_feed_forward2.bias": rng.randn(d),
            f"{b}.feed_forward2.linear1.weight": rng.randn(ff, d),
            f"{b}.feed_forward2.linear1.bias": rng.randn(ff),
            f"{b}.feed_forward2.linear2.weight": rng.randn(d, ff),
            f"{b}.feed_forward2.linear2.bias": rng.randn(d),
            f"{b}.norm_out.weight": rng.randn(d),
            f"{b}.norm_out.bias": rng.randn(d),
        })
    V, P, J, E = pcfg.vocab_size, pcfg.pred_hidden, pcfg.joint_hidden, pcfg.enc_hidden
    sd.update({
        "decoder.prediction.embed.weight": rng.randn(V + 1, P),
    })
    for l in range(pcfg.n_layers):
        in_dim = P
        sd.update({
            f"decoder.prediction.dec_rnn.lstm.weight_ih_l{l}": rng.randn(4 * P, in_dim),
            f"decoder.prediction.dec_rnn.lstm.weight_hh_l{l}": rng.randn(4 * P, P),
            f"decoder.prediction.dec_rnn.lstm.bias_ih_l{l}": rng.randn(4 * P),
            f"decoder.prediction.dec_rnn.lstm.bias_hh_l{l}": rng.randn(4 * P),
        })
    n_out = pcfg.num_token_logits + pcfg.n_durations
    sd.update({
        "joint.enc.weight": rng.randn(J, E),
        "joint.enc.bias": rng.randn(J),
        "joint.pred.weight": rng.randn(J, P),
        "joint.pred.bias": rng.randn(J),
        "joint.joint_net.2.weight": rng.randn(n_out, J),
        "joint.joint_net.2.bias": rng.randn(n_out),
    })
    return {k: (v * 0.05).astype(np.float32) if v.dtype != np.float32 else v
            for k, v in sd.items()}


def tree_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(np.shape(leaf))
    return out


def test_converted_tree_matches_flax_structure():
    spec = ASR_VERSIONS["test-tiny"]
    models = AsrModels.load("test-tiny", allow_random_init=True)
    rng = np.random.RandomState(0)
    sd = synthetic_nemo_state_dict(spec.conformer, spec.predictor, rng)
    converted = convert_parakeet_state_dict(sd, spec.conformer, spec.predictor)

    for part in ("encoder", "predictor", "joint"):
        want = tree_shapes(models.params[part])
        got = tree_shapes(converted[part])
        assert want == got, (
            f"{part} mismatch:\n missing={set(want) - set(got)}\n"
            f" extra={set(got) - set(want)}\n"
            f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
        )


def test_converted_params_run_pipeline():
    from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
    from fluidaudio_tpu.asr.manager import AsrManager

    spec = ASR_VERSIONS["test-tiny"]
    models = AsrModels.load("test-tiny", allow_random_init=True)
    rng = np.random.RandomState(1)
    sd = synthetic_nemo_state_dict(spec.conformer, spec.predictor, rng)
    models.params = jax.tree_util.tree_map(
        lambda x: np.asarray(x),
        convert_parakeet_state_dict(sd, spec.conformer, spec.predictor),
    )
    manager = AsrManager(models, ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)))
    result = manager.transcribe((rng.randn(16000) * 0.1).astype(np.float32))
    assert result.duration == pytest.approx(1.0)


def synthetic_wespeaker_state_dict(cfg, rng):
    """Torch-layout state dict with wespeaker ResNet key names."""
    chans = cfg.channels

    def bn(c):
        return {
            "weight": np.abs(rng.randn(c)) + 0.5,
            "bias": rng.randn(c),
            "running_mean": rng.randn(c) * 0.1,
            "running_var": np.abs(rng.randn(c)) + 0.5,
        }

    sd = {"conv1.weight": rng.randn(chans[0], 1, 3, 3)}
    sd.update({f"bn1.{k}": v for k, v in bn(chans[0]).items()})
    in_ch = chans[0]
    for si, depth in enumerate(cfg.blocks_per_stage):
        ch = chans[si]
        for bi in range(depth):
            t = f"layer{si + 1}.{bi}"
            blk_in = in_ch if bi == 0 else ch
            stride_change = bi == 0 and si > 0
            sd[f"{t}.conv1.weight"] = rng.randn(ch, blk_in, 3, 3)
            sd.update({f"{t}.bn1.{k}": v for k, v in bn(ch).items()})
            sd[f"{t}.conv2.weight"] = rng.randn(ch, ch, 3, 3)
            sd.update({f"{t}.bn2.{k}": v for k, v in bn(ch).items()})
            if stride_change or blk_in != ch:
                sd[f"{t}.shortcut.0.weight"] = rng.randn(ch, blk_in, 1, 1)
                sd.update({f"{t}.shortcut.1.{k}": v for k, v in bn(ch).items()})
        in_ch = ch
    # trunk output freq bins: n_mels / 2^3 (three strided stages)
    stats = 2 * (cfg.n_mels // 8) * chans[-1]
    sd["seg_1.weight"] = rng.randn(cfg.embedding_dim, stats)
    sd["seg_1.bias"] = rng.randn(cfg.embedding_dim)
    return {k: np.asarray(v, np.float32) * (0.05 if v_is_w(k) else 1.0)
            for k, v in sd.items()}


def v_is_w(key):
    return key.endswith(".weight") and "bn" not in key and "shortcut.1" not in key


def test_wespeaker_converted_tree_matches_flax_structure():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.wespeaker import convert_wespeaker_state_dict
    from fluidaudio_tpu.models.wespeaker import WeSpeakerConfig, WeSpeakerEmbedder

    cfg = WeSpeakerConfig.tiny()
    model = WeSpeakerEmbedder(cfg)
    mel = jnp.zeros((1, 64, cfg.n_mels))
    weights = jnp.ones((1, 64))
    live = jax.jit(model.init)(jax.random.PRNGKey(0), mel, weights)["params"]

    rng = np.random.RandomState(0)
    sd = synthetic_wespeaker_state_dict(cfg, rng)
    converted = convert_wespeaker_state_dict(sd, cfg)

    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )


def test_wespeaker_bn_fold_matches_torch_batchnorm():
    """Folded affine == torch BatchNorm2d eval mode on the same stats."""
    import torch

    from fluidaudio_tpu.convert.wespeaker import convert_wespeaker_state_dict
    from fluidaudio_tpu.models.wespeaker import WeSpeakerConfig, WeSpeakerEmbedder

    cfg = WeSpeakerConfig.tiny()
    rng = np.random.RandomState(3)
    sd = synthetic_wespeaker_state_dict(cfg, rng)
    params = convert_wespeaker_state_dict(sd, cfg)

    c = cfg.channels[0]
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(sd["bn1.weight"]))
        bn.bias.copy_(torch.tensor(sd["bn1.bias"]))
        bn.running_mean.copy_(torch.tensor(sd["bn1.running_mean"]))
        bn.running_var.copy_(torch.tensor(sd["bn1.running_var"]))
        x = torch.randn(2, c, 5, 7)
        ref = bn(x).numpy()
    scale = params["stem_bn"]["bn_scale"][None, :, None, None]
    bias = params["stem_bn"]["bn_bias"][None, :, None, None]
    ours = x.numpy() * scale + bias
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_wespeaker_converted_params_run():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.wespeaker import convert_wespeaker_state_dict
    from fluidaudio_tpu.models.wespeaker import WeSpeakerConfig, WeSpeakerEmbedder

    cfg = WeSpeakerConfig.tiny()
    rng = np.random.RandomState(1)
    params = convert_wespeaker_state_dict(synthetic_wespeaker_state_dict(cfg, rng), cfg)
    model = WeSpeakerEmbedder(cfg)
    mel = jnp.asarray(rng.randn(2, 64, cfg.n_mels), jnp.float32)
    weights = jnp.ones((2, 64))
    emb = jax.jit(model.apply)({"params": params}, mel, weights)
    assert emb.shape == (2, cfg.embedding_dim)
    assert np.all(np.isfinite(np.asarray(emb)))


def synthetic_pyannote_state_dict(cfg, rng):
    """Torch-layout state dict with pyannote PyanNet key names."""
    F, C, H = cfg.sinc_filters, cfg.conv_channels, cfg.lstm_hidden
    sd = {
        "sincnet.wav_norm1d.weight": rng.randn(1),
        "sincnet.wav_norm1d.bias": rng.randn(1),
        "sincnet.conv1d.0.filterbank.low_hz_": np.abs(rng.randn(F, 1)) * 500,
        "sincnet.conv1d.0.filterbank.band_hz_": np.abs(rng.randn(F, 1)) * 200,
        "sincnet.norm1d.0.weight": rng.randn(F),
        "sincnet.norm1d.0.bias": rng.randn(F),
        "sincnet.conv1d.1.weight": rng.randn(C, F, cfg.conv_kernel) * 0.05,
        "sincnet.conv1d.1.bias": rng.randn(C) * 0.05,
        "sincnet.norm1d.1.weight": rng.randn(C),
        "sincnet.norm1d.1.bias": rng.randn(C),
        "sincnet.conv1d.2.weight": rng.randn(C, C, cfg.conv_kernel) * 0.05,
        "sincnet.conv1d.2.bias": rng.randn(C) * 0.05,
        "sincnet.norm1d.2.weight": rng.randn(C),
        "sincnet.norm1d.2.bias": rng.randn(C),
        "linear.0.weight": rng.randn(cfg.linear_dims[0], 2 * H) * 0.05,
        "linear.0.bias": rng.randn(cfg.linear_dims[0]) * 0.05,
        "linear.1.weight": rng.randn(cfg.linear_dims[1], cfg.linear_dims[0]) * 0.05,
        "linear.1.bias": rng.randn(cfg.linear_dims[1]) * 0.05,
        "classifier.weight": rng.randn(cfg.n_classes, cfg.linear_dims[-1]) * 0.05,
        "classifier.bias": rng.randn(cfg.n_classes) * 0.05,
    }
    for l in range(cfg.lstm_layers):
        in_dim = C if l == 0 else 2 * H
        for sfx in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{l}{sfx}"] = rng.randn(4 * H, in_dim) * 0.05
            sd[f"lstm.weight_hh_l{l}{sfx}"] = rng.randn(4 * H, H) * 0.05
            sd[f"lstm.bias_ih_l{l}{sfx}"] = rng.randn(4 * H) * 0.05
            sd[f"lstm.bias_hh_l{l}{sfx}"] = rng.randn(4 * H) * 0.05
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_pyannet_converted_tree_matches_and_runs():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.pyannote import convert_pyannote_state_dict
    from fluidaudio_tpu.models.pyannote_seg import (
        NUM_FRAMES, POWERSET_CLASSES, PyanNet, PyanNetConfig,
    )

    cfg = PyanNetConfig(lstm_layers=2)  # smaller for test speed
    model = PyanNet(cfg)
    wav = jnp.zeros((1, 160_000))
    live = jax.jit(model.init)(jax.random.PRNGKey(0), wav)["params"]

    rng = np.random.RandomState(0)
    converted = convert_pyannote_state_dict(synthetic_pyannote_state_dict(cfg, rng), cfg)
    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )

    wav = jnp.asarray(rng.randn(1, 160_000) * 0.1, jnp.float32)
    logits = jax.jit(model.apply)({"params": converted}, wav)
    assert logits.shape == (1, NUM_FRAMES, POWERSET_CLASSES)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_sinc_filters_are_bandpass():
    from fluidaudio_tpu.convert.pyannote import materialize_sinc_filters

    low_hz = np.array([[200.0], [1000.0]])
    band_hz = np.array([[300.0], [500.0]])
    filt = materialize_sinc_filters(low_hz, band_hz, 251)
    assert filt.shape == (2, 251)
    # bandpass: near-zero DC response, peak magnitude inside the band
    spectrum = np.abs(np.fft.rfft(filt, n=4096, axis=1))
    freqs = np.fft.rfftfreq(4096, d=1 / 16000)
    for i, (lo, bw) in enumerate([(250.0, 350.0), (1050.0, 550.0)]):
        assert spectrum[i, 0] < 0.05 * spectrum[i].max()
        peak = freqs[np.argmax(spectrum[i])]
        assert lo - 100 < peak < lo + bw + 100, f"filter {i} peak {peak}"


def test_pyannet_bilstm_matches_torch():
    """One BiLSTM layer through converted weights == torch.nn.LSTM."""
    import jax.numpy as jnp
    import torch

    from fluidaudio_tpu.convert.pyannote import _lstm_dir
    from fluidaudio_tpu.models.pyannote_seg import _LstmLayer

    rng = np.random.RandomState(5)
    I, H, T = 12, 16, 9
    lstm = torch.nn.LSTM(I, H, num_layers=1, bidirectional=True, batch_first=True)
    sd = {f"lstm.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}
    x = rng.randn(2, T, I).astype(np.float32)
    with torch.no_grad():
        ref, _ = lstm(torch.tensor(x))
    fwd_params = _lstm_dir(sd, 0, reverse=False)
    bwd_params = _lstm_dir(sd, 0, reverse=True)
    layer = _LstmLayer(H)
    xf = jnp.asarray(x)
    fwd = layer.apply({"params": fwd_params}, xf)
    bwd = layer.apply({"params": bwd_params}, xf[:, ::-1])[:, ::-1]
    ours = np.concatenate([np.asarray(fwd), np.asarray(bwd)], axis=-1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def synthetic_silero_state_dict(cfg, rng):
    """Torch-layout state dict with silero-vad v5 jit key names."""
    n_bins = cfg.stft_kernel // 2 + 1
    sd = {"_model.stft.forward_basis_buffer":
          rng.randn(2 * n_bins, 1, cfg.stft_kernel) * 0.05}
    in_ch = n_bins
    for i, d in enumerate(cfg.encoder_dims):
        sd[f"_model.encoder.{i}.reparam_conv.weight"] = rng.randn(d, in_ch, 3) * 0.05
        sd[f"_model.encoder.{i}.reparam_conv.bias"] = rng.randn(d) * 0.05
        in_ch = d
    H = cfg.hidden
    sd.update({
        "_model.decoder.rnn.weight_ih": rng.randn(4 * H, H) * 0.05,
        "_model.decoder.rnn.weight_hh": rng.randn(4 * H, H) * 0.05,
        "_model.decoder.rnn.bias_ih": rng.randn(4 * H) * 0.05,
        "_model.decoder.rnn.bias_hh": rng.randn(4 * H) * 0.05,
        "_model.decoder.decoder.2.weight": rng.randn(1, H, 1) * 0.05,
        "_model.decoder.decoder.2.bias": rng.randn(1) * 0.05,
    })
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_silero_v5_converted_tree_matches_and_runs():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.silero import convert_silero_state_dict
    from fluidaudio_tpu.models.silero_vad import SileroV5Config, SileroVadV5

    cfg = SileroV5Config()
    model = SileroVadV5(cfg)
    frame = jnp.zeros((2, cfg.context_size + cfg.frame_size))
    h = jnp.zeros((2, cfg.hidden))
    live = jax.jit(model.init)(jax.random.PRNGKey(0), frame, h, h)["params"]

    rng = np.random.RandomState(0)
    converted = convert_silero_state_dict(synthetic_silero_state_dict(cfg, rng), cfg)
    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )

    frame = jnp.asarray(rng.randn(2, 576) * 0.1, jnp.float32)
    prob, h2, c2 = jax.jit(model.apply)({"params": converted}, frame, h, h)
    assert prob.shape == (2,) and h2.shape == (2, cfg.hidden)
    assert np.all((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1))
    # state must actually evolve
    assert not np.allclose(np.asarray(h2), 0)


def test_silero_lstm_cell_matches_torch():
    import jax.numpy as jnp
    import torch

    from fluidaudio_tpu.convert.silero import convert_silero_state_dict
    from fluidaudio_tpu.models.silero_vad import SileroV5Config, _LstmCellDense

    cfg = SileroV5Config()
    rng = np.random.RandomState(2)
    sd = synthetic_silero_state_dict(cfg, rng)
    params = convert_silero_state_dict(sd, cfg)

    H = cfg.hidden
    cell = torch.nn.LSTMCell(H, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(sd["_model.decoder.rnn.weight_ih"]))
        cell.weight_hh.copy_(torch.tensor(sd["_model.decoder.rnn.weight_hh"]))
        cell.bias_ih.copy_(torch.tensor(sd["_model.decoder.rnn.bias_ih"]))
        cell.bias_hh.copy_(torch.tensor(sd["_model.decoder.rnn.bias_hh"]))
        x = torch.randn(3, H)
        h0 = torch.randn(3, H)
        c0 = torch.randn(3, H)
        h_ref, c_ref = cell(x, (h0, c0))
    lstm = _LstmCellDense(H)
    h_j, c_j = lstm.apply({"params": params["lstm"]},
                          jnp.asarray(x.numpy()), jnp.asarray(h0.numpy()),
                          jnp.asarray(c0.numpy()))
    np.testing.assert_allclose(np.asarray(h_j), h_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_ref.numpy(), rtol=1e-5, atol=1e-6)


def synthetic_sortformer_state_dict(cfg, rng):
    """Torch-layout state dict with NeMo sortformer key names (encoder keys
    reuse the parakeet conformer generator with the right dims)."""
    from fluidaudio_tpu.models.conformer import ConformerConfig

    ccfg = ConformerConfig(
        n_mels=cfg.n_mels, d_model=cfg.encoder_d_model,
        n_layers=cfg.n_encoder_layers, n_heads=cfg.n_heads,
        subsampling_channels=(256 if cfg.encoder_d_model >= 256
                              else cfg.encoder_d_model),
    )

    class _P:  # reuse the conformer key generator, drop decoder/joint keys
        vocab_size, pred_hidden, joint_hidden, enc_hidden = 8, 8, 8, 8
        num_token_logits, n_durations, n_layers = 9, 2, 1

    sd = {k: v for k, v in synthetic_nemo_state_dict(ccfg, _P, rng).items()
          if k.startswith("encoder.")}
    d = cfg.d_model
    sd["sortformer_modules.encoder_proj.weight"] = rng.randn(d, cfg.encoder_d_model)
    sd["sortformer_modules.encoder_proj.bias"] = rng.randn(d)
    for i in range(cfg.n_transformer_layers):
        b = f"transformer_encoder.layers.{i}"
        for net in ("query_net", "key_net", "value_net", "out_projection"):
            sd[f"{b}.first_sub_layer.{net}.weight"] = rng.randn(d, d)
            sd[f"{b}.first_sub_layer.{net}.bias"] = rng.randn(d)
        sd[f"{b}.layer_norm_1.weight"] = rng.randn(d)
        sd[f"{b}.layer_norm_1.bias"] = rng.randn(d)
        sd[f"{b}.layer_norm_2.weight"] = rng.randn(d)
        sd[f"{b}.layer_norm_2.bias"] = rng.randn(d)
        sd[f"{b}.second_sub_layer.dense_in.weight"] = rng.randn(4 * d, d)
        sd[f"{b}.second_sub_layer.dense_in.bias"] = rng.randn(4 * d)
        sd[f"{b}.second_sub_layer.dense_out.weight"] = rng.randn(d, 4 * d)
        sd[f"{b}.second_sub_layer.dense_out.bias"] = rng.randn(d)
    sd["sortformer_modules.first_hidden_to_hidden.weight"] = rng.randn(d, d)
    sd["sortformer_modules.first_hidden_to_hidden.bias"] = rng.randn(d)
    sd["sortformer_modules.single_hidden_to_spks.weight"] = rng.randn(4, d)
    sd["sortformer_modules.single_hidden_to_spks.bias"] = rng.randn(4)
    return {k: np.asarray(v, np.float32) * 0.05 if "batch_norm" not in k
            else np.asarray(v, np.float32) for k, v in sd.items()}


def test_sortformer_converted_tree_matches_and_runs():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.sortformer import convert_sortformer_state_dict
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST, SortformerModel

    cfg = SORTFORMER_TEST
    model = SortformerModel(cfg)
    mel = jnp.zeros((1, cfg.n_mels, 64))
    live = jax.jit(model.init)(jax.random.PRNGKey(0), mel)["params"]

    rng = np.random.RandomState(0)
    converted = convert_sortformer_state_dict(
        synthetic_sortformer_state_dict(cfg, rng), cfg)
    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )

    mel = jnp.asarray(rng.randn(1, cfg.n_mels, 64), jnp.float32)
    preds = jax.jit(model.apply)({"params": converted}, mel)
    assert preds.shape[0] == 1 and preds.shape[2] == 4
    assert np.all((np.asarray(preds) >= 0) & (np.asarray(preds) <= 1))


def synthetic_sensevoice_state_dict(cfg, rng):
    """Torch-layout state dict with FunASR SenseVoiceSmall key names."""
    D, F, FF = cfg.d_model, 560, cfg.ffn_dim

    def block(base, in_size):
        return {
            f"{base}.self_attn.linear_q_k_v.weight": rng.randn(3 * D, in_size) * 0.05,
            f"{base}.self_attn.linear_q_k_v.bias": rng.randn(3 * D) * 0.05,
            f"{base}.self_attn.fsmn_block.weight": rng.randn(D, 1, cfg.fsmn_kernel) * 0.05,
            f"{base}.self_attn.linear_out.weight": rng.randn(D, D) * 0.05,
            f"{base}.self_attn.linear_out.bias": rng.randn(D) * 0.05,
            f"{base}.norm1.weight": rng.randn(in_size),
            f"{base}.norm1.bias": rng.randn(in_size),
            f"{base}.norm2.weight": rng.randn(D),
            f"{base}.norm2.bias": rng.randn(D),
            f"{base}.feed_forward.w_1.weight": rng.randn(FF, D) * 0.05,
            f"{base}.feed_forward.w_1.bias": rng.randn(FF) * 0.05,
            f"{base}.feed_forward.w_2.weight": rng.randn(D, FF) * 0.05,
            f"{base}.feed_forward.w_2.bias": rng.randn(D) * 0.05,
        }

    sd = {"embed.weight": rng.randn(cfg.n_special_tokens, F) * 0.05}
    sd.update(block("encoder.encoders0.0", F))
    for i in range(cfg.n_layers - 1):
        sd.update(block(f"encoder.encoders.{i}", D))
    for i in range(cfg.tp_blocks):
        sd.update(block(f"encoder.tp_encoders.{i}", D))
    sd["encoder.tp_norm.weight"] = rng.randn(D)
    sd["encoder.tp_norm.bias"] = rng.randn(D)
    sd["encoder.after_norm.weight"] = rng.randn(D)
    sd["encoder.after_norm.bias"] = rng.randn(D)
    sd["ctc.ctc_lo.weight"] = rng.randn(cfg.vocab_size, D) * 0.05
    sd["ctc.ctc_lo.bias"] = rng.randn(cfg.vocab_size) * 0.05
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_sensevoice_converted_tree_matches_and_runs():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.sensevoice import convert_sensevoice_state_dict
    from fluidaudio_tpu.models.sensevoice import SENSEVOICE_TEST, SenseVoiceEncoder

    cfg = SENSEVOICE_TEST
    model = SenseVoiceEncoder(cfg)
    lfr = jnp.zeros((1, 10, 560))
    lengths = jnp.array([10], jnp.int32)
    lang = jnp.array([3], jnp.int32)
    live = jax.jit(model.init)(jax.random.PRNGKey(0), lfr, lengths, lang)["params"]

    rng = np.random.RandomState(0)
    converted = convert_sensevoice_state_dict(
        synthetic_sensevoice_state_dict(cfg, rng), cfg)
    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )

    lfr = jnp.asarray(rng.randn(2, 10, 560) * 0.1, jnp.float32)
    lp = jax.jit(model.apply)({"params": converted}, lfr,
                              jnp.array([10, 7], jnp.int32),
                              jnp.array([3, 4], jnp.int32))
    assert lp.shape == (2, 14, cfg.vocab_size)  # 4 prompt slots + 10 frames
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)


def test_sensevoice_fsmn_matches_torch_depthwise_conv():
    """FSMN memory conv == torch Conv1d(groups=D, bias=False) with the
    FunASR (left, right) padding split."""
    import torch

    D, k, T = 8, 11, 16
    rng = np.random.RandomState(4)
    w = rng.randn(D, 1, k).astype(np.float32) * 0.2
    x = rng.randn(1, T, D).astype(np.float32)

    left = (k - 1) // 2
    conv = torch.nn.Conv1d(D, D, k, groups=D, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w))
        xt = torch.tensor(x).transpose(1, 2)  # [1, D, T]
        xt = torch.nn.functional.pad(xt, (left, k - 1 - left))
        ref = conv(xt).transpose(1, 2).numpy()

    import flax.linen as nn
    import jax.numpy as jnp

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(D, (k,), padding=((left, k - 1 - left),),
                           feature_group_count=D, use_bias=False, name="c")(x)

    m = M()
    params = {"c": {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0)))}}
    ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def synthetic_paraformer_state_dict(cfg, rng):
    """Torch-layout state dict with FunASR Paraformer key names."""
    from tests.test_convert import synthetic_sensevoice_state_dict  # self-import ok

    D, FF, k = cfg.d_model, cfg.ffn_dim, cfg.fsmn_kernel
    sv = cfg.sanm()
    enc = {kk: v for kk, v in synthetic_sensevoice_state_dict(sv, rng).items()
           if kk.startswith("encoder.")}
    sd = dict(enc)

    def dec_ffn(base):
        return {
            f"{base}.w_1.weight": rng.randn(FF, D) * 0.05,
            f"{base}.w_1.bias": rng.randn(FF) * 0.05,
            f"{base}.norm.weight": rng.randn(FF),
            f"{base}.norm.bias": rng.randn(FF),
            f"{base}.w_2.weight": rng.randn(D, FF) * 0.05,
        }

    sd["predictor.cif_conv1d.weight"] = rng.randn(D, D, 3) * 0.05
    sd["predictor.cif_conv1d.bias"] = rng.randn(D) * 0.05
    sd["predictor.cif_output.weight"] = rng.randn(1, D) * 0.05
    sd["predictor.cif_output.bias"] = rng.randn(1) * 0.05
    for i in range(cfg.n_decoder_layers):
        b = f"decoder.decoders.{i}"
        sd[f"{b}.self_attn.fsmn_block.weight"] = rng.randn(D, 1, k) * 0.05
        sd[f"{b}.src_attn.linear_q.weight"] = rng.randn(D, D) * 0.05
        sd[f"{b}.src_attn.linear_q.bias"] = rng.randn(D) * 0.05
        sd[f"{b}.src_attn.linear_k_v.weight"] = rng.randn(2 * D, D) * 0.05
        sd[f"{b}.src_attn.linear_k_v.bias"] = rng.randn(2 * D) * 0.05
        sd[f"{b}.src_attn.linear_out.weight"] = rng.randn(D, D) * 0.05
        sd[f"{b}.src_attn.linear_out.bias"] = rng.randn(D) * 0.05
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{n}.weight"] = rng.randn(D)
            sd[f"{b}.{n}.bias"] = rng.randn(D)
        sd.update(dec_ffn(f"{b}.feed_forward"))
    sd["decoder.decoders3.0.norm1.weight"] = rng.randn(D)
    sd["decoder.decoders3.0.norm1.bias"] = rng.randn(D)
    sd.update(dec_ffn("decoder.decoders3.0.feed_forward"))
    sd["decoder.after_norm.weight"] = rng.randn(D)
    sd["decoder.after_norm.bias"] = rng.randn(D)
    sd["decoder.output_layer.weight"] = rng.randn(cfg.vocab_size, D) * 0.05
    sd["decoder.output_layer.bias"] = rng.randn(cfg.vocab_size) * 0.05
    return {kk: np.asarray(v, np.float32) for kk, v in sd.items()}


def test_paraformer_converted_tree_matches_and_runs():
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.paraformer import convert_paraformer_state_dict
    from fluidaudio_tpu.models.paraformer import PARAFORMER_TEST, Paraformer

    cfg = PARAFORMER_TEST
    model = Paraformer(cfg)
    lfr = jnp.zeros((1, 12, 560))
    lengths = jnp.array([12], jnp.int32)
    live = jax.jit(model.init)(jax.random.PRNGKey(0), lfr, lengths)["params"]

    rng = np.random.RandomState(0)
    converted = convert_paraformer_state_dict(
        synthetic_paraformer_state_dict(cfg, rng), cfg)
    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )

    lfr = jnp.asarray(rng.randn(2, 12, 560) * 0.1, jnp.float32)
    logits, counts = jax.jit(model.apply)(
        {"params": converted}, lfr, jnp.array([12, 9], jnp.int32))
    assert logits.shape == (2, cfg.max_tokens, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_streaming_conformer_converted_tree_matches():
    """The streaming encoder consumes the same NeMo keys as the offline one;
    only the subsampling nesting differs."""
    import jax.numpy as jnp
    from fluidaudio_tpu.convert.streaming import convert_streaming_conformer_state_dict
    from fluidaudio_tpu.models.conformer import ConformerConfig
    from fluidaudio_tpu.models.conformer_streaming import (
        StreamingCaches, StreamingConformerConfig, StreamingConformerEncoder,
        init_caches,
    )

    cfg = StreamingConformerConfig(
        n_mels=16, d_model=32, n_layers=2, n_heads=4,
        att_context_left=8, subsampling_channels=16,
    )
    model = StreamingConformerEncoder(cfg)
    caches = init_caches(cfg, 1)
    mel = jnp.zeros((1, cfg.n_mels, 16))
    live = jax.jit(model.init)(jax.random.PRNGKey(0), mel, caches)["params"]

    ccfg = ConformerConfig(
        n_mels=cfg.n_mels, d_model=cfg.d_model, n_layers=cfg.n_layers,
        n_heads=cfg.n_heads, subsampling_channels=cfg.subsampling_channels,
    )

    class _P:
        vocab_size, pred_hidden, joint_hidden, enc_hidden = 8, 8, 8, 8
        num_token_logits, n_durations, n_layers = 9, 2, 1

    rng = np.random.RandomState(0)
    sd = {k: v for k, v in synthetic_nemo_state_dict(ccfg, _P, rng).items()
          if k.startswith("encoder.")}
    converted = convert_streaming_conformer_state_dict(sd, cfg)
    want, got = tree_shapes(live), tree_shapes(converted)
    assert want == got, (
        f"missing={set(want) - set(got)}\n extra={set(got) - set(want)}\n"
        f" shapes={[k for k in want if k in got and want[k] != got[k]]}"
    )

    mel = jnp.asarray(rng.randn(1, cfg.n_mels, 16) * 0.1, jnp.float32)
    enc, new_caches = jax.jit(model.apply)({"params": converted}, mel, caches)
    assert np.all(np.isfinite(np.asarray(enc)))
