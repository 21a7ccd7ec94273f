"""Kokoro-82M parallel TTS, real architecture, TPU-native.

The reference runs Kokoro as 7 opaque CoreML stages
(`/root/reference/Sources/FluidAudio/TTS/KokoroAne/Pipeline/KokoroAneSynthesizer.swift:17-160`):
  Albert -> PostAlbert (duration) -> Alignment -> Prosody (F0/N) -> Noise
  (harmonic source) -> Vocoder -> Tail iSTFT
Those stages are cuts through the StyleTTS2-derived Kokoro-82M graph: a
custom ALBERT phoneme encoder, a style-conditioned duration/prosody predictor
(DurationEncoder of interleaved BiLSTM+AdaLayerNorm, shared BiLSTM, AdaIN
residual F0/N heads), a conv+BiLSTM text encoder, and an iSTFTNet decoder
(AdaIN resblocks + harmonic-plus-noise source + 2-stage transposed-conv
upsampler + snake resblocks + iSTFT head).

TPU re-design: the 7 stages collapse into TWO jitted programs (the fp16/fp32
ANE boundary shuffling dissolves under XLA; SURVEY.md §7.7):

  KokoroTextProgram : (input_ids, lengths, style_s, speed)
                      -> (duration[B,T], d[B,T,640], t_en[B,T,512])
                      == Albert + PostAlbert stages
  KokoroAudioProgram: (d, t_en, frame_idx, n_frames, style_s, style_timbre)
                      -> audio [B, 600*F]
                      == Alignment (a device gather over the static frame
                         grid instead of a one-hot matmul) + Prosody + Noise
                         + Vocoder + Tail iSTFT

Duration rounding/clamping stays host-side exactly like the reference
(`KokoroAneSynthesizer.swift:74-86`: round, clamp >= 1, cap at
maxAcousticFrames=2000). All sequence ops are static-shape over padded
buckets with explicit length masks (masked BiLSTMs, masked instance norms)
so padding never contaminates the valid region.

Weight layout matches `convert/kokoro.py`, which maps the upstream
kokoro-v1_0 torch checkpoint (module prefixes bert/bert_encoder/predictor/
text_encoder/decoder) onto this tree, folding torch weight_norm g*v/||v||
into plain kernels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.rnn import BiLstm

SAMPLE_RATE = 24_000
MAX_TOKENS = 512  # reference: <=512 IPA tokens per call w/ auto-chunking
MAX_FRAMES = 2_000  # reference KokoroAneConstants.maxAcousticFrames
HOP = 600  # samples per acoustic frame: prod(upsample_rates)*istft_hop*2
STYLE_DIM = 256  # voice-pack row: style_timbre[:128] + style_s[128:]


@dataclass(frozen=True)
class KokoroConfig:
    # text / predictor (kokoro-v1_0 config.json)
    vocab_size: int = 178
    d_model: int = 512  # hidden_dim
    style_dim: int = 128  # each half of the 256-d voice-pack row
    n_layer: int = 3  # DurationEncoder layers == TextEncoder conv depth
    max_dur: int = 50
    text_kernel: int = 5
    # plbert (custom ALBERT)
    albert_emb: int = 128
    albert_hidden: int = 768
    albert_heads: int = 12
    albert_inter: int = 2048
    albert_layers: int = 12
    albert_max_pos: int = 512
    # istftnet decoder
    decoder_hidden: int = 1024
    asr_res_ch: int = 64
    upsample_rates: tuple[int, ...] = (10, 6)
    upsample_kernels: tuple[int, ...] = (20, 12)
    upsample_initial: int = 512
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    gen_n_fft: int = 20
    gen_hop: int = 5
    max_frames: int = MAX_FRAMES
    # inference frame-grid buckets (None = powers-of-two fractions of
    # max_frames). The generator's AdaIN instance-norm statistics are
    # computed over the WHOLE padded grid (matching the torch reference,
    # which always runs exact-length graphs and has no masking), so a
    # checkpoint is only valid on the grid regime it was trained with:
    # trained-from-scratch fixtures train on one fixed grid and must pin
    # that same grid here, e.g. (160,).
    frame_buckets: tuple[int, ...] | None = None
    dtype: str = "float32"
    # output scale of the prosody F0 head, in Hz per unit of raw head
    # output. The shipping kokoro-v1_0 weights emit Hz directly (1.0);
    # trained-from-scratch fixture configs set ~500 so a 1x1-conv head with
    # O(1) activations can reach the fixture corpus's multi-kHz tones
    # within Adam-sized steps (gradient conditioning, not a graph change).
    f0_scale: float = 1.0
    # output scale of the generator's sin() phase head, in radians. The
    # shipping weights were GAN-trained against the ±1 rad convention
    # (StyleTTS2 hifigan.py `phase = torch.sin(x)`), so 1.0 = parity.
    # Trained-from-scratch fixtures set pi: with phases clamped to ±1 rad,
    # a bin-0-dominant LOW tone is unrepresentable (its negative
    # half-cycles need bin-0 phase near pi), and magnitude-only training
    # provably collapses to a mid-band compromise tone (observed: every
    # word rendered ~800 Hz).
    phase_scale: float = 1.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------


def conv_transpose_1d(x, kernel, stride, pad, out_pad=0, groups=1):
    """torch-semantics ConvTranspose1d on feature-last [B, T, C] input.

    `kernel` is [k, in/groups, out]. Realized as an input-dilated conv with a
    time-flipped kernel: identical to torch's
    out_len = (T-1)*stride - 2*pad + k + out_pad.
    """
    k = kernel.shape[0]
    w = jnp.flip(kernel, axis=0)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=((k - 1 - pad, k - 1 - pad + out_pad),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def linear_resize(x, out_len):
    """F.interpolate(mode='linear', align_corners=False) over axis 1."""
    in_len = x.shape[1]
    scale = in_len / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_len - 1)
    hi = jnp.clip(lo + 1, 0, in_len - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)
    xl = jnp.take(x, lo, axis=1)
    xh = jnp.take(x, hi, axis=1)
    return xl + (xh - xl) * frac.reshape((1, out_len) + (1,) * (x.ndim - 2))


def _hann(n):
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def stft_20(x, n_fft=20, hop=5):
    """torch.stft(center=True) at the tiny iSTFT-head size.

    x [B, L] -> (mag, phase) each [B, L//hop + 1, n_fft//2 + 1].
    """
    B, L = x.shape
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = L // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx] * _hann(n_fft)[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec), jnp.angle(spec)


def istft_20(mag, phase, n_fft=20, hop=5):
    """torch.istft(center=True): [B, F, n_fft//2+1] x2 -> [B, (F-1)*hop]."""
    B, F, _ = mag.shape
    spec = mag * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, F, n_fft]
    win = _hann(n_fft)
    frames = frames * win[None, None, :]
    out_len = (F - 1) * hop + n_fft
    starts = jnp.arange(F) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # [F, n_fft]
    flat = idx.reshape(-1)
    audio = jnp.zeros((B, out_len), mag.dtype).at[:, flat].add(
        frames.reshape(B, -1)
    )
    wsum = jnp.zeros((out_len,), mag.dtype).at[flat].add(
        jnp.tile(win**2, (F,))
    )
    audio = audio / jnp.maximum(wsum, 1e-11)[None, :]
    pad = n_fft // 2
    return audio[:, pad : out_len - pad]


class AdaLayerNorm(nn.Module):
    """Style-conditioned LayerNorm over channels (StyleTTS2 AdaLayerNorm).

    x [B, T, C], s [B, style] -> (1+gamma)*LN(x) + beta.
    """

    channels: int

    @nn.compact
    def __call__(self, x, s):
        h = nn.Dense(2 * self.channels, name="fc")(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return (1 + gamma[:, None, :]) * xn + beta[:, None, :]


class AdaIN1d(nn.Module):
    """Style-conditioned InstanceNorm over time (masked).

    x [B, T, C], s [B, style], mask [B, T, 1] -> (1+gamma)*IN(x) + beta.
    Instance-norm statistics are computed over valid frames only so the
    padded static-shape bucket matches the reference's exact-length graphs.
    """

    channels: int

    @nn.compact
    def __call__(self, x, s, mask=None):
        h = nn.Dense(2 * self.channels, name="fc")(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        if mask is None:
            mean = jnp.mean(x, 1, keepdims=True)
            var = jnp.var(x, 1, keepdims=True)
        else:
            n = jnp.maximum(jnp.sum(mask, 1, keepdims=True), 1.0)
            mean = jnp.sum(x * mask, 1, keepdims=True) / n
            var = jnp.sum(((x - mean) * mask) ** 2, 1, keepdims=True) / n
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return (1 + gamma[:, None, :]) * xn + beta[:, None, :]


class AdainResBlk1d(nn.Module):
    """StyleTTS2 AdainResBlk1d on [B, T, C] (optionally 2x time upsample).

    residual: AdaIN -> lrelu(0.2) -> [depthwise ConvT x2] -> conv k3
              -> AdaIN -> lrelu -> conv k3
    shortcut: [nearest x2] -> conv 1x1 when dim changes; out = sum/sqrt(2).
    """

    dim_in: int
    dim_out: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x, s, mask=None):
        def up_mask(m):
            if m is None:
                return None
            return jnp.repeat(m, 2, axis=1)

        h = AdaIN1d(self.dim_in, name="norm1")(x, s, mask)
        h = nn.leaky_relu(h, 0.2)
        if self.upsample:
            pool_k = self.param(
                "pool_kernel",
                nn.initializers.lecun_normal(),
                (3, 1, self.dim_in),
            )
            h = conv_transpose_1d(h, pool_k, 2, 1, out_pad=1, groups=self.dim_in)
            pool_b = self.param("pool_bias", nn.initializers.zeros, (self.dim_in,))
            h = h + pool_b
            mask_r = up_mask(mask)
        else:
            mask_r = mask
        h = nn.Conv(self.dim_out, (3,), padding=1, name="conv1")(h)
        h = AdaIN1d(self.dim_out, name="norm2")(h, s, mask_r)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim_out, (3,), padding=1, name="conv2")(h)

        sc = x
        if self.upsample:
            sc = jnp.repeat(sc, 2, axis=1)  # nearest x2
        if self.dim_in != self.dim_out:
            sc = nn.Conv(self.dim_out, (1,), use_bias=False, name="conv1x1")(sc)
        out = (h + sc) / math.sqrt(2.0)
        if mask_r is not None:
            out = out * mask_r
        return out


class AdaINResBlock1(nn.Module):
    """iSTFTNet generator resblock: dilated convs + AdaIN + Snake activation
    (x + (1/a)*sin^2(a*x)); on [B, T, C]."""

    channels: int
    kernel: int
    dilations: tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, s, mask=None):
        for i, d in enumerate(self.dilations):
            a1 = self.param(f"alpha1_{i}", nn.initializers.ones, (1, 1, self.channels))
            a2 = self.param(f"alpha2_{i}", nn.initializers.ones, (1, 1, self.channels))
            xt = AdaIN1d(self.channels, name=f"adain1_{i}")(x, s, mask)
            xt = xt + (1.0 / a1) * jnp.sin(a1 * xt) ** 2
            pad = (self.kernel * d - d) // 2
            xt = nn.Conv(
                self.channels, (self.kernel,), kernel_dilation=(d,),
                padding=pad, name=f"conv1_{i}",
            )(xt)
            xt = AdaIN1d(self.channels, name=f"adain2_{i}")(xt, s, mask)
            xt = xt + (1.0 / a2) * jnp.sin(a2 * xt) ** 2
            xt = nn.Conv(self.channels, (self.kernel,), padding=(self.kernel - 1) // 2,
                         name=f"conv2_{i}")(xt)
            x = x + xt
        if mask is not None:
            x = x * mask
        return x


# ---------------------------------------------------------------------------
# text side: ALBERT + TextEncoder + DurationEncoder
# ---------------------------------------------------------------------------


class AlbertLayer(nn.Module):
    hidden: int
    heads: int
    inter: int

    @nn.compact
    def __call__(self, x, bias):
        B, T, H = x.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="q")(x).reshape(B, T, self.heads, hd)
        k = nn.Dense(self.hidden, name="k")(x).reshape(B, T, self.heads, hd)
        v = nn.Dense(self.hidden, name="v")(x).reshape(B, T, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, self.hidden)
        attn = nn.Dense(self.hidden, name="o")(ctx)
        x = nn.LayerNorm(epsilon=1e-12, name="attn_ln")(x + attn)
        f = nn.Dense(self.inter, name="ffn_in")(x)
        f = nn.gelu(f, approximate=True)
        f = nn.Dense(self.hidden, name="ffn_out")(f)
        return nn.LayerNorm(epsilon=1e-12, name="out_ln")(x + f)


class Albert(nn.Module):
    """Custom ALBERT phoneme encoder: one parameter-shared layer applied
    `albert_layers` times. (ids, lengths) -> last hidden [B, T, 768]."""

    cfg: KokoroConfig

    @nn.compact
    def __call__(self, ids, lengths):
        cfg = self.cfg
        B, T = ids.shape
        we = nn.Embed(cfg.vocab_size, cfg.albert_emb, name="word_emb")(ids)
        pe = nn.Embed(cfg.albert_max_pos, cfg.albert_emb, name="pos_emb")(
            jnp.arange(T)
        )
        te = nn.Embed(2, cfg.albert_emb, name="type_emb")(jnp.zeros_like(ids))
        x = nn.LayerNorm(epsilon=1e-12, name="emb_ln")(we + pe[None] + te)
        x = nn.Dense(cfg.albert_hidden, name="map_in")(x)
        valid = jnp.arange(T)[None, :] < lengths[:, None]
        bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :]  # [B,1,1,T]
        layer = AlbertLayer(
            cfg.albert_hidden, cfg.albert_heads, cfg.albert_inter, name="layer"
        )
        for _ in range(cfg.albert_layers):
            x = layer(x, bias)
        return x


class TextEncoder(nn.Module):
    """Kokoro TextEncoder: embed -> depth x (conv k5 + LN + lrelu) -> BiLSTM.
    (ids, lengths) -> t_en [B, T, 512]."""

    cfg: KokoroConfig

    @nn.compact
    def __call__(self, ids, lengths):
        cfg = self.cfg
        B, T = ids.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")(ids)
        for i in range(cfg.n_layer):
            x = x * mask
            x = nn.Conv(cfg.d_model, (cfg.text_kernel,),
                        padding=cfg.text_kernel // 2, name=f"conv_{i}")(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = x * mask
        x = BiLstm(cfg.d_model // 2, name="lstm")(x, lengths)
        return x * mask


class DurationEncoder(nn.Module):
    """StyleTTS2 DurationEncoder: n_layer x (BiLSTM(d+sty -> d) then
    AdaLayerNorm(d) + re-append style). (d_en, s, lengths) -> d [B,T,640]."""

    cfg: KokoroConfig

    @nn.compact
    def __call__(self, d_en, s, lengths):
        cfg = self.cfg
        B, T, _ = d_en.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        sb = jnp.broadcast_to(s[:, None, :], (B, T, cfg.style_dim))
        x = jnp.concatenate([d_en, sb], axis=-1) * mask
        for i in range(cfg.n_layer):
            x = BiLstm(cfg.d_model // 2, name=f"lstm_{i}")(x, lengths)
            x = AdaLayerNorm(cfg.d_model, name=f"adaln_{i}")(x, s)
            x = jnp.concatenate([x, sb], axis=-1) * mask
        return x


class KokoroTextProgram(nn.Module):
    """Albert + PostAlbert stages as one jitted program.

    (input_ids [B,T], lengths [B], style_s [B,128], speed []) ->
      duration [B,T] (sigmoid-summed, speed-divided; host rounds/clamps),
      d    [B,T,640] (DurationEncoder output),
      t_en [B,T,512] (TextEncoder output).
    Ref: `KokoroAneSynthesizer.swift:46-90` (albert/postAlbert stage I/O).
    """

    cfg: KokoroConfig = field(default_factory=KokoroConfig)

    @nn.compact
    def __call__(self, ids, lengths, style_s, speed=1.0):
        cfg = self.cfg
        bert_dur = Albert(cfg, name="albert")(ids, lengths)
        d_en = nn.Dense(cfg.d_model, name="bert_encoder")(bert_dur)
        d = DurationEncoder(cfg, name="dur_encoder")(d_en, style_s, lengths)
        x = BiLstm(cfg.d_model // 2, name="pred_lstm")(d, lengths)
        dur = nn.Dense(cfg.max_dur, name="duration_proj")(x)
        duration = jnp.sum(jax.nn.sigmoid(dur), axis=-1) / speed
        t_en = TextEncoder(cfg, name="text_encoder")(ids, lengths)
        return duration, d, t_en


# ---------------------------------------------------------------------------
# audio side: alignment gather + prosody + iSTFTNet decoder
# ---------------------------------------------------------------------------


class Prosody(nn.Module):
    """F0Ntrain: shared BiLSTM then 3 AdaIN resblocks (2x upsample in the
    middle one) + 1x1 proj, for each of F0 and N.
    (en [B,F,640], s, n_frames) -> (F0 [B,2F], N [B,2F])."""

    cfg: KokoroConfig

    @nn.compact
    def __call__(self, en, s, n_frames):
        cfg = self.cfg
        d = cfg.d_model
        B, F, _ = en.shape
        mask = (jnp.arange(F)[None, :] < n_frames[:, None])[..., None].astype(en.dtype)
        x = BiLstm(d // 2, name="shared")(en, n_frames)

        outs = []
        for head in ("f0", "n"):
            h = AdainResBlk1d(d, d, name=f"{head}_0")(x, s, mask)
            h = AdainResBlk1d(d, d // 2, upsample=True, name=f"{head}_1")(h, s, mask)
            mask2 = jnp.repeat(mask, 2, axis=1)
            h = AdainResBlk1d(d // 2, d // 2, name=f"{head}_2")(h, s, mask2)
            h = nn.Conv(1, (1,), name=f"{head}_proj")(h)
            # Prosody is shared with StyleTTS2, whose config carries no
            # f0_scale (it always ships real weights; Hz head, scale 1)
            scale = getattr(cfg, "f0_scale", 1.0) if head == "f0" else 1.0
            outs.append(h[..., 0] * mask2[..., 0] * scale)
        return outs[0], outs[1]


class SourceModule(nn.Module):
    """SourceModuleHnNSF: harmonic sine source from the (sample-rate) F0
    track. f0_up [B, L] -> harmonic source [B, L].

    Matches istftnet SineGen: per-harmonic instantaneous frequency, random
    initial phase per harmonic (except the fundamental), frame-rate cumsum
    re-upsampled linearly, tanh(linear(sines)). `deterministic=True` zeroes
    the random phase and additive noise (for equivalence tests).
    """

    cfg: KokoroConfig
    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0
    deterministic: bool = False

    @nn.compact
    def __call__(self, f0_up):
        cfg = self.cfg
        B, L = f0_up.shape
        upscale = int(np.prod(cfg.upsample_rates)) * cfg.gen_hop  # 300
        n_h = self.harmonic_num + 1
        fn = f0_up[..., None] * jnp.arange(1, n_h + 1)[None, None, :]
        rad = (fn / SAMPLE_RATE) % 1.0
        if not self.deterministic:
            key = self.make_rng("noise")
            k1, k2 = jax.random.split(key)
            rand_ini = jax.random.uniform(k1, (B, n_h)).at[:, 0].set(0.0)
            rad = rad.at[:, 0, :].add(rand_ini)
        else:
            k2 = None
        # downsample instantaneous freq to frame rate, accumulate phase,
        # re-upsample (linear, x upscale)
        rad_f = linear_resize(rad, L // upscale)
        phase = jnp.cumsum(rad_f, axis=1) * 2.0 * jnp.pi
        phase = linear_resize(phase * upscale, L)
        sines = jnp.sin(phase) * self.sine_amp
        uv = (f0_up > self.voiced_threshold).astype(f0_up.dtype)[..., None]
        if self.deterministic:
            sine_waves = sines * uv
        else:
            noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
            noise = noise_amp * jax.random.normal(k2, sines.shape)
            sine_waves = sines * uv + noise
        merged = jnp.tanh(nn.Dense(1, name="l_linear")(sine_waves))
        return merged[..., 0]


class Generator(nn.Module):
    """iSTFTNet generator: 2-stage transposed-conv upsampling with
    harmonic-source injection (STFT-domain noise convs + AdaIN snake
    resblocks), snake resblocks per stage, conv_post -> (log-mag, phase)
    -> iSTFT. (x [B,2F,512], s_timbre, f0_curve [B,2F]) -> audio [B,600F]."""

    cfg: KokoroConfig
    deterministic: bool = False
    with_spec: bool = False

    @nn.compact
    def __call__(self, x, s, f0_curve):
        cfg = self.cfg
        rates = cfg.upsample_rates
        n_up = len(rates)
        upscale = int(np.prod(rates)) * cfg.gen_hop

        # harmonic source at sample rate -> STFT-domain [B, frames, n_fft+2]
        f0_up = jnp.repeat(f0_curve, upscale, axis=1)  # nearest x300
        har = SourceModule(cfg, deterministic=self.deterministic, name="m_source")(
            f0_up
        )
        mag, ph = stft_20(har, cfg.gen_n_fft, cfg.gen_hop)
        har_spec = jnp.concatenate([mag, ph], axis=-1)  # [B, 120F+1, 22]

        ch = cfg.upsample_initial
        for i, (r, k) in enumerate(zip(rates, cfg.upsample_kernels)):
            c_cur = cfg.upsample_initial // (2 ** (i + 1))
            x = nn.leaky_relu(x, 0.1)
            if i + 1 < n_up:
                stride_f0 = int(np.prod(rates[i + 1 :]))
                xs = nn.Conv(
                    c_cur, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=(stride_f0 + 1) // 2, name=f"noise_conv_{i}",
                )(har_spec)
                xs = AdaINResBlock1(c_cur, 7, (1, 3, 5), name=f"noise_res_{i}")(xs, s)
            else:
                xs = nn.Conv(c_cur, (1,), name=f"noise_conv_{i}")(har_spec)
                xs = AdaINResBlock1(c_cur, 11, (1, 3, 5), name=f"noise_res_{i}")(xs, s)
            up_k = self.param(
                f"up_kernel_{i}", nn.initializers.lecun_normal(), (k, ch, c_cur)
            )
            up_b = self.param(f"up_bias_{i}", nn.initializers.zeros, (c_cur,))
            x = conv_transpose_1d(x, up_k, r, (k - r) // 2) + up_b
            if i == n_up - 1:
                # reflection_pad (1, 0): prepend a mirror frame
                x = jnp.concatenate([x[:, 1:2, :], x], axis=1)
            x = x + xs
            acc = 0.0
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernels, cfg.resblock_dilations)
            ):
                acc = acc + AdaINResBlock1(
                    c_cur, rk, tuple(rd), name=f"resblock_{i}_{j}"
                )(x, s)
            x = acc / len(cfg.resblock_kernels)
            ch = c_cur

        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(cfg.gen_n_fft + 2, (7,), padding=3, name="conv_post")(x)
        n_bins = cfg.gen_n_fft // 2 + 1
        # numeric guard: log-magnitudes of real audio in a 20-point STFT sit
        # well inside (-30, 8); clipping only prevents inf/NaN at random init
        # (exp(8)=2981 would already be a ~300x-over-full-scale waveform)
        spec = jnp.exp(jnp.clip(x[..., :n_bins], -30.0, 8.0))
        phase = jnp.sin(x[..., n_bins:]) * cfg.phase_scale
        audio = istft_20(spec, phase, cfg.gen_n_fft, cfg.gen_hop)
        if self.with_spec:
            # training hook: expose the iSTFT head's (mag, phase) so a
            # fixture loss can supervise them at head resolution. Within one
            # acoustic frame every generator input EXCEPT the harmonic
            # source is piecewise-constant, so a spectral loss on the AUDIO
            # alone lets the phase head ignore the source and emit
            # feature-periodic output (the observed tone quantization) or
            # collapse quiet. Direct delta-phase supervision forces the head
            # to encode the true per-frame phase advance. Inference
            # (with_spec=False) is untouched.
            return audio, spec, phase
        return audio


class Decoder(nn.Module):
    """iSTFTNet Decoder wrapper: F0/N stride-2 convs, encode block, 3+1
    AdaIN decode blocks with (asr_res,F0,N) re-injection, then Generator.
    (asr [B,F,512], F0_curve [B,2F], N [B,2F], s_timbre) -> audio."""

    cfg: KokoroConfig
    deterministic: bool = False
    with_spec: bool = False

    @nn.compact
    def __call__(self, asr, f0_curve, n_curve, s, n_frames):
        cfg = self.cfg
        B, F, _ = asr.shape
        mask = (jnp.arange(F)[None, :] < n_frames[:, None])[..., None].astype(asr.dtype)

        # Feature branch sees F0 in units of f0_scale (O(1) for the trained
        # fixture configs; f0_scale=1.0 for the shipping weights makes this
        # an identity). The Hz-scale curve still drives the harmonic source
        # below — only the conv FEATURE conditioning is normalized, which is
        # what kept fixture training from exploding (raw multi-kHz values as
        # conv inputs put the log-magnitude head's exp() past float range).
        f0 = nn.Conv(1, (3,), strides=(2,), padding=1, name="f0_conv")(
            (f0_curve / cfg.f0_scale)[..., None]
        )
        nn_ = nn.Conv(1, (3,), strides=(2,), padding=1, name="n_conv")(
            n_curve[..., None]
        )
        dh, rc = cfg.decoder_hidden, cfg.asr_res_ch
        x = jnp.concatenate([asr, f0, nn_], axis=-1) * mask
        x = AdainResBlk1d(cfg.d_model + 2, dh, name="encode")(x, s, mask)
        asr_res = nn.Conv(rc, (1,), name="asr_res")(asr)

        blocks = [
            AdainResBlk1d(dh + 2 + rc, dh, name="decode_0"),
            AdainResBlk1d(dh + 2 + rc, dh, name="decode_1"),
            AdainResBlk1d(dh + 2 + rc, dh, name="decode_2"),
            AdainResBlk1d(dh + 2 + rc, cfg.upsample_initial, upsample=True,
                          name="decode_3"),
        ]
        for blk in blocks:
            x = jnp.concatenate([x, asr_res, f0, nn_], axis=-1)
            x = blk(x, s, mask)
        return Generator(cfg, deterministic=self.deterministic,
                         with_spec=self.with_spec, name="generator")(
            x, s, f0_curve
        )


class KokoroAudioProgram(nn.Module):
    """Alignment + Prosody + Noise + Vocoder + Tail stages as one program.

    (d [B,T,640], t_en [B,T,512], frame_idx [B,F] (token per frame),
     n_frames [B], style_s [B,128], style_timbre [B,128]) -> audio [B, 600*F].
    The reference's one-hot alignment matmul (`KokoroAneSynthesizer.swift:
    92-101` Alignment stage) becomes a gather over the padded frame grid.
    """

    cfg: KokoroConfig = field(default_factory=KokoroConfig)
    deterministic: bool = False

    @nn.compact
    def __call__(self, d, t_en, frame_idx, n_frames, style_s, style_timbre,
                 with_prosody: bool = False, stop_f0_grad: bool = False,
                 with_spec: bool = False, teacher_f0=None):
        B, F = frame_idx.shape
        mask = (jnp.arange(F)[None, :] < n_frames[:, None])[..., None].astype(d.dtype)
        en = jnp.take_along_axis(d, frame_idx[..., None], axis=1) * mask
        asr = jnp.take_along_axis(t_en, frame_idx[..., None], axis=1) * mask
        f0, n_ = Prosody(self.cfg, name="prosody")(en, style_s, n_frames)
        # stop_f0_grad (training-only; identity in inference): the spectral
        # loss's gradient through the harmonic source's sine phase is
        # oscillatory with magnitude growing in t, and it FIGHTS the direct
        # F0 supervision (observed: f0 MSE diverged after ~600 steps).
        # FastSpeech2-style decoupling — pitch trains only from its own MSE,
        # the decoder trains treating F0 as given. `teacher_f0` (training
        # only) feeds the GROUND-TRUTH pitch track to the decoder instead of
        # the prediction: the harmonic source's phase is a cumsum of f0, so
        # even a 0.2% prediction error drifts multiple cycles across a word
        # and makes waveform/absolute-phase targets unreachable; with the
        # true track the source phase is exactly the target's. Standard
        # FastSpeech2 teacher forcing; inference (teacher_f0=None) uses the
        # converged prediction and is untouched.
        if teacher_f0 is not None:
            f0_dec = teacher_f0
        else:
            f0_dec = jax.lax.stop_gradient(f0) if stop_f0_grad else f0
        audio = Decoder(self.cfg, deterministic=self.deterministic,
                        with_spec=with_spec, name="decoder")(
            asr, f0_dec, n_, style_timbre, n_frames
        )
        if with_spec:
            audio, mag, phase = audio
            if with_prosody:
                return audio, f0, n_, mag, phase
            return audio, mag, phase
        if with_prosody:
            # training hook: expose the F0/N tracks (2x frame rate) so a
            # fixture/finetune loss can supervise pitch directly — the
            # `uv = f0 > threshold` gate in SourceModule has zero gradient,
            # so F0 is unlearnable from a spectral loss alone.
            return audio, f0, n_
        return audio


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------


def expand_durations(durations: np.ndarray, max_frames: int) -> tuple[np.ndarray, int]:
    """Round/clamp durations and expand to a per-frame token-index map.

    Mirrors `KokoroAneSynthesizer.swift:74-86`: round, clamp >= 1, cap total
    at max_frames. Returns (frame_idx [max_frames], total_frames).
    """
    pred = np.maximum(np.rint(durations).astype(np.int64), 1)
    total = int(pred.sum())
    if total > max_frames:
        scale = max_frames / total
        pred = np.maximum((pred * scale).astype(np.int64), 1)
        total = int(min(pred.sum(), max_frames))
    idx = np.zeros(max_frames, np.int32)
    idx[:total] = np.repeat(np.arange(len(pred), dtype=np.int32), pred)[:total]
    return idx, total
