"""Assembled-encoder convention parity vs a hand-written torch NeMo oracle.

The converter tests in test_convert.py pin tricky SUBMODULES against torch
(BiLSTM packing, BN fold, LSTM cells); this file pins the ASSEMBLED
FastConformer encoder — the one graph the reference treats as opaque
(`TDT/AsrManager+Pipeline.swift:45`) — against a from-scratch torch
implementation of NeMo's exact conventions, so a convention bug (rel-pos
sign/offset/shift, sinusoid layout, subsampling flatten order, xscale,
conv padding, BN/LN eps) cannot survive to weights day.

The oracle below is written from NeMo's PUBLIC semantics (ConformerEncoder /
RelPositionMultiHeadAttention / ConvSubsampling dw_striding), not copied:
  * rel-pos sinusoid: positions T-1 .. -(T-1), sin at EVEN feature indices,
    cos at ODD (interleaved) — RelPositionalEncoding.create_pe
  * xscale: subsampled features * sqrt(d_model) — xscaling=True default
  * rel_shift: pad one column left, view [2T, T], drop first row, view back
    [T, 2T-1], truncate to T key columns
  * scores = ((q+u)k^T + shift((q+w)p^T)) / sqrt(d_head)
  * conv module: LN -> pw1(2d) -> GLU -> zero padded frames -> depthwise(k,
    groups=d, bias folded through BN) -> BN(eval) -> SiLU -> pw2
  * dw_striding subsampling: Conv2d(1->C, 3x3, s2, p1) + ReLU, then 2x
    [depthwise 3x3 s2 p1 + pointwise 1x1 + ReLU], flatten CHANNEL-major,
    Linear -> d_model
  * residual factors 0.5 on both FFNs, final LayerNorm per block (norm_out)

This found real bugs when introduced: a rel_shift that mixed query rows, a
concatenated (not interleaved) sinusoid layout, a freq-major subsampling
flatten, and a missing xscale.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fluidaudio_tpu.convert.parakeet import convert_conformer_encoder
from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch oracle (NeMo conventions, written from public semantics)
# --------------------------------------------------------------------------


class OracleSubsampling(torch.nn.Module):
    def __init__(self, n_mels, channels, d_model):
        super().__init__()
        c = channels
        self.conv0 = torch.nn.Conv2d(1, c, 3, stride=2, padding=1)
        self.conv2 = torch.nn.Conv2d(c, c, 3, stride=2, padding=1, groups=c)
        self.conv3 = torch.nn.Conv2d(c, c, 1)
        self.conv5 = torch.nn.Conv2d(c, c, 3, stride=2, padding=1, groups=c)
        self.conv6 = torch.nn.Conv2d(c, c, 1)
        f8 = n_mels
        for _ in range(3):
            f8 = (f8 + 2 - 3) // 2 + 1
        self.out = torch.nn.Linear(c * f8, d_model)

    def forward(self, x):  # x [B, T, F]
        x = x.unsqueeze(1)  # [B, 1, T, F]
        x = F.relu(self.conv0(x))
        x = F.relu(self.conv3(self.conv2(x)))
        x = F.relu(self.conv6(self.conv5(x)))
        b, c, t, f = x.shape
        # NeMo: transpose(1, 2) then flatten -> CHANNEL-major (c, f) features
        x = x.transpose(1, 2).reshape(b, t, c * f)
        return self.out(x)


def rel_sinusoid_torch(T, d_model):
    """NeMo RelPositionalEncoding.create_pe: interleaved sin/cos."""
    pos = torch.arange(T - 1, -T, -1, dtype=torch.float32).unsqueeze(1)
    div = torch.exp(
        torch.arange(0, d_model, 2, dtype=torch.float32)
        * -(np.log(10000.0) / d_model)
    )
    pe = torch.zeros(2 * T - 1, d_model)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


class OracleRelPosMHSA(torch.nn.Module):
    def __init__(self, d_model, n_heads):
        super().__init__()
        self.h, self.dk = n_heads, d_model // n_heads
        self.linear_q = torch.nn.Linear(d_model, d_model)
        self.linear_k = torch.nn.Linear(d_model, d_model)
        self.linear_v = torch.nn.Linear(d_model, d_model)
        self.linear_out = torch.nn.Linear(d_model, d_model)
        self.linear_pos = torch.nn.Linear(d_model, d_model, bias=False)
        self.pos_bias_u = torch.nn.Parameter(torch.randn(self.h, self.dk) * 0.1)
        self.pos_bias_v = torch.nn.Parameter(torch.randn(self.h, self.dk) * 0.1)

    def rel_shift(self, x):
        b, h, qlen, pos_len = x.shape
        x = F.pad(x, (1, 0))
        x = x.view(b, h, -1, qlen)
        return x[:, :, 1:].reshape(b, h, qlen, pos_len)

    def forward(self, x, pos_emb, mask):  # mask True where INVALID
        B, T, D = x.shape
        q = self.linear_q(x).view(B, T, self.h, self.dk)
        k = self.linear_k(x).view(B, T, self.h, self.dk)
        v = self.linear_v(x).view(B, T, self.h, self.dk)
        p = self.linear_pos(pos_emb).view(-1, self.h, self.dk)

        qu = (q + self.pos_bias_u).transpose(1, 2)  # [B, h, T, dk]
        qw = (q + self.pos_bias_v).transpose(1, 2)
        kt = k.transpose(1, 2)
        matrix_ac = torch.matmul(qu, kt.transpose(-2, -1))
        matrix_bd = torch.matmul(qw, p.permute(1, 0, 2).unsqueeze(0).transpose(-2, -1))
        matrix_bd = self.rel_shift(matrix_bd)[:, :, :, : matrix_ac.size(-1)]
        scores = (matrix_ac + matrix_bd) / np.sqrt(self.dk)
        scores = scores.masked_fill(mask[:, None, :, :], -10000.0)
        attn = torch.softmax(scores, dim=-1)
        out = torch.matmul(attn, v.transpose(1, 2))
        out = out.transpose(1, 2).reshape(B, T, D)
        return self.linear_out(out)


class OracleConvModule(torch.nn.Module):
    def __init__(self, d_model, kernel):
        super().__init__()
        self.pointwise_conv1 = torch.nn.Conv1d(d_model, 2 * d_model, 1)
        self.depthwise_conv = torch.nn.Conv1d(
            d_model, d_model, kernel, padding=(kernel - 1) // 2, groups=d_model
        )
        self.batch_norm = torch.nn.BatchNorm1d(d_model)
        # non-trivial eval-mode running stats so the BN fold is exercised
        with torch.no_grad():
            self.batch_norm.running_mean.normal_(0, 0.1)
            self.batch_norm.running_var.uniform_(0.5, 1.5)
            self.batch_norm.weight.uniform_(0.5, 1.5)
            self.batch_norm.bias.normal_(0, 0.1)
        self.pointwise_conv2 = torch.nn.Conv1d(d_model, d_model, 1)

    def forward(self, x, pad_mask):  # pad_mask True where INVALID
        x = x.transpose(1, 2)  # [B, D, T]
        x = F.glu(self.pointwise_conv1(x), dim=1)
        x = x.masked_fill(pad_mask.unsqueeze(1), 0.0)
        x = self.depthwise_conv(x)
        x = self.batch_norm(x)
        x = F.silu(x)
        x = self.pointwise_conv2(x)
        return x.transpose(1, 2)


class OracleFFN(torch.nn.Module):
    def __init__(self, d_model, d_ff):
        super().__init__()
        self.linear1 = torch.nn.Linear(d_model, d_ff)
        self.linear2 = torch.nn.Linear(d_ff, d_model)

    def forward(self, x):
        return self.linear2(F.silu(self.linear1(x)))


class OracleConformerLayer(torch.nn.Module):
    def __init__(self, d_model, n_heads, d_ff, kernel):
        super().__init__()
        self.norm_feed_forward1 = torch.nn.LayerNorm(d_model)
        self.feed_forward1 = OracleFFN(d_model, d_ff)
        self.norm_self_att = torch.nn.LayerNorm(d_model)
        self.self_attn = OracleRelPosMHSA(d_model, n_heads)
        self.norm_conv = torch.nn.LayerNorm(d_model)
        self.conv = OracleConvModule(d_model, kernel)
        self.norm_feed_forward2 = torch.nn.LayerNorm(d_model)
        self.feed_forward2 = OracleFFN(d_model, d_ff)
        self.norm_out = torch.nn.LayerNorm(d_model)

    def forward(self, x, pos_emb, att_mask, pad_mask):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb, att_mask)
        x = x + self.conv(self.norm_conv(x), pad_mask)
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class OracleEncoder(torch.nn.Module):
    def __init__(self, n_mels, channels, d_model, n_heads, n_layers, kernel,
                 xscale=True):
        super().__init__()
        self.pre_encode = OracleSubsampling(n_mels, channels, d_model)
        self.layers = torch.nn.ModuleList(
            OracleConformerLayer(d_model, n_heads, d_model * 4, kernel)
            for _ in range(n_layers)
        )
        self.xscale = np.sqrt(d_model) if xscale else None
        self.d_model = d_model

    def forward(self, mel, lengths):  # mel [B, F, T]
        x = self.pre_encode(mel.transpose(1, 2))  # [B, T', D]
        if self.xscale:
            x = x * self.xscale
        T = x.shape[1]
        out_len = lengths
        for _ in range(3):
            out_len = torch.div(out_len + 2 - 3, 2, rounding_mode="floor") + 1
        valid = torch.arange(T)[None, :] < out_len[:, None]  # [B, T]
        pad_mask = ~valid
        att_mask = ~(valid[:, :, None] & valid[:, None, :])  # True=INVALID
        pos_emb = rel_sinusoid_torch(T, self.d_model)
        for layer in self.layers:
            x = layer(x, pos_emb, att_mask, pad_mask)
        return x, out_len

    def nemo_state_dict(self):
        """Own params renamed to NeMo checkpoint keys (converter input)."""
        sd = {}
        pre = {
            "conv0": "pre_encode.conv.0", "conv2": "pre_encode.conv.2",
            "conv3": "pre_encode.conv.3", "conv5": "pre_encode.conv.5",
            "conv6": "pre_encode.conv.6", "out": "pre_encode.out",
        }
        for mine, nemo in pre.items():
            mod = getattr(self.pre_encode, mine)
            sd[f"encoder.{nemo}.weight"] = mod.weight.detach().numpy()
            sd[f"encoder.{nemo}.bias"] = mod.bias.detach().numpy()
        for i, layer in enumerate(self.layers):
            b = f"encoder.layers.{i}"
            pairs = {
                f"{b}.norm_feed_forward1": layer.norm_feed_forward1,
                f"{b}.feed_forward1.linear1": layer.feed_forward1.linear1,
                f"{b}.feed_forward1.linear2": layer.feed_forward1.linear2,
                f"{b}.norm_self_att": layer.norm_self_att,
                f"{b}.self_attn.linear_q": layer.self_attn.linear_q,
                f"{b}.self_attn.linear_k": layer.self_attn.linear_k,
                f"{b}.self_attn.linear_v": layer.self_attn.linear_v,
                f"{b}.self_attn.linear_out": layer.self_attn.linear_out,
                f"{b}.norm_conv": layer.norm_conv,
                f"{b}.conv.pointwise_conv1": layer.conv.pointwise_conv1,
                f"{b}.conv.depthwise_conv": layer.conv.depthwise_conv,
                f"{b}.conv.pointwise_conv2": layer.conv.pointwise_conv2,
                f"{b}.norm_feed_forward2": layer.norm_feed_forward2,
                f"{b}.feed_forward2.linear1": layer.feed_forward2.linear1,
                f"{b}.feed_forward2.linear2": layer.feed_forward2.linear2,
                f"{b}.norm_out": layer.norm_out,
            }
            for key, mod in pairs.items():
                sd[f"{key}.weight"] = mod.weight.detach().numpy()
                if mod.bias is not None:
                    sd[f"{key}.bias"] = mod.bias.detach().numpy()
            sd[f"{b}.self_attn.linear_pos.weight"] = (
                layer.self_attn.linear_pos.weight.detach().numpy())
            sd[f"{b}.self_attn.pos_bias_u"] = (
                layer.self_attn.pos_bias_u.detach().numpy())
            sd[f"{b}.self_attn.pos_bias_v"] = (
                layer.self_attn.pos_bias_v.detach().numpy())
            bn = layer.conv.batch_norm
            sd[f"{b}.conv.batch_norm.weight"] = bn.weight.detach().numpy()
            sd[f"{b}.conv.batch_norm.bias"] = bn.bias.detach().numpy()
            sd[f"{b}.conv.batch_norm.running_mean"] = bn.running_mean.numpy()
            sd[f"{b}.conv.batch_norm.running_var"] = bn.running_var.numpy()
        return sd


# --------------------------------------------------------------------------
# parity tests
# --------------------------------------------------------------------------

CFG = ConformerConfig(
    n_mels=32, d_model=64, n_layers=2, n_heads=4, conv_kernel=9,
    subsampling_channels=16, dtype="float32", attention_backend="xla",
    xscale=True,
)


@pytest.fixture(scope="module")
def oracle_and_flax():
    torch.manual_seed(7)
    oracle = OracleEncoder(
        CFG.n_mels, CFG.subsampling_channels, CFG.d_model, CFG.n_heads,
        CFG.n_layers, CFG.conv_kernel, xscale=True,
    ).eval()
    params = convert_conformer_encoder(oracle.nemo_state_dict(), CFG)
    return oracle, ConformerEncoder(CFG), {"params": params}


def test_assembled_encoder_matches_nemo_oracle(oracle_and_flax):
    """Full stack (subsampling -> 2 blocks), full-length rows, elementwise."""
    oracle, model, variables = oracle_and_flax
    rng = np.random.RandomState(0)
    B, T_mel = 2, 64
    mel = rng.randn(B, CFG.n_mels, T_mel).astype(np.float32)
    lengths = np.array([T_mel, T_mel], np.int32)

    with torch.no_grad():
        ref, ref_len = oracle(torch.from_numpy(mel), torch.from_numpy(lengths))
    got, got_len = model.apply(variables, jnp.asarray(mel), jnp.asarray(lengths))

    np.testing.assert_array_equal(np.asarray(got_len), ref_len.numpy())
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), atol=2e-4, rtol=2e-3,
        err_msg="assembled FastConformer diverges from NeMo conventions",
    )


def test_assembled_encoder_matches_oracle_with_padding(oracle_and_flax):
    """Ragged batch: valid frames of the short row must match the oracle."""
    oracle, model, variables = oracle_and_flax
    rng = np.random.RandomState(1)
    B, T_mel = 2, 64
    mel = rng.randn(B, CFG.n_mels, T_mel).astype(np.float32)
    lengths = np.array([T_mel, 40], np.int32)
    mel[1, :, 40:] = 0.0  # padded region zeroed in both frameworks

    with torch.no_grad():
        ref, ref_len = oracle(torch.from_numpy(mel), torch.from_numpy(lengths))
    got, got_len = model.apply(variables, jnp.asarray(mel), jnp.asarray(lengths))

    np.testing.assert_array_equal(np.asarray(got_len), ref_len.numpy())
    L1 = int(np.asarray(got_len)[1])
    np.testing.assert_allclose(
        np.asarray(got)[0], ref.numpy()[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got)[1, :L1], ref.numpy()[1, :L1], atol=2e-4, rtol=2e-3)


def test_rel_shift_is_nemo_exact():
    """Index-level pin: _rel_shift == bd[t, (T-1)+(s-t)] (decodable probe)."""
    from fluidaudio_tpu.models.conformer import _rel_shift

    T = 7
    bd = np.zeros((1, 1, T, 2 * T - 1), np.float32)
    for t in range(T):
        for r in range(2 * T - 1):
            bd[0, 0, t, r] = 1000 * t + r
    out = np.asarray(_rel_shift(jnp.asarray(bd)))[0, 0]
    want_r = np.arange(T)[None, :] - np.arange(T)[:, None] + (T - 1)
    want = 1000 * np.arange(T)[:, None] + want_r
    np.testing.assert_array_equal(out.astype(np.int64), want)


def test_rel_sinusoid_is_interleaved():
    """Layout pin: sin at even, cos at odd feature indices (NeMo create_pe)."""
    from fluidaudio_tpu.models.conformer import _rel_sinusoid

    T, D = 5, 16
    got = np.asarray(_rel_sinusoid(T, D))
    want = rel_sinusoid_torch(T, D).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_streaming_sinusoid_is_interleaved():
    from fluidaudio_tpu.models.conformer_streaming import _sinusoid_offsets

    D = 16
    # offsets -4..4 == positions 4..-4 reversed
    got = np.asarray(_sinusoid_offsets(9, 4, D))
    want = rel_sinusoid_torch(5, D).numpy()[::-1]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_xscale_contract():
    """xscale=True multiplies subsampled features by sqrt(d_model)."""
    from dataclasses import replace

    rng = np.random.RandomState(2)
    mel = rng.randn(1, CFG.n_mels, 32).astype(np.float32)
    lengths = np.array([32], np.int32)

    cfg_on = replace(CFG, n_layers=0)
    cfg_off = replace(CFG, n_layers=0, xscale=False)
    model_on, model_off = ConformerEncoder(cfg_on), ConformerEncoder(cfg_off)
    p = model_on.init(jax.random.PRNGKey(0), jnp.asarray(mel), jnp.asarray(lengths))
    out_on, _ = model_on.apply(p, jnp.asarray(mel), jnp.asarray(lengths))
    out_off, _ = model_off.apply(p, jnp.asarray(mel), jnp.asarray(lengths))
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off) * np.sqrt(CFG.d_model),
        rtol=1e-5, atol=1e-5)
