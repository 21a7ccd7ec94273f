"""StyleTTS2 LibriTTS (iteration_3), real architecture, TPU-native.

The reference runs StyleTTS2 as 8 opaque CoreML stages
(`/root/reference/Sources/FluidAudio/TTS/StyleTTS2/Pipeline/Synthesize/StyleTTS2Synthesizer.swift:33-133`):
  text_encoder -> bert(+bert_encoder) -> ref_encoder -> fused_diffusion_sampler
  -> duration_predictor -> fused_f0n_har_source -> decoder_pre -> decoder_upsample
Those stages are cuts through the upstream yl4579/StyleTTS2 LibriTTS graph:
PL-BERT phoneme encoder, conv+BiLSTM text encoder, 2D-conv style encoders
(acoustic + prosody halves of the 256-d `ref_s`), a transformer style-diffusion
denoiser sampled with ADPM2 over a Karras sigma schedule, the StyleTTS2
ProsodyPredictor (DurationEncoder + duration proj + F0/N AdaIN heads), and a
HiFi-GAN decoder with harmonic-plus-noise source injection.

TPU re-design (mirrors the Kokoro 2-program split, SURVEY.md §7.7): the 8
stages collapse into FOUR jitted programs —

  StyleTts2TextProgram   : (ids, lengths) -> (bert_dur [B,T,768],
                            d_en [B,T,512], t_en [B,T,512])
                           == text_encoder + bert + bert_encoder stages
  StyleTts2StyleProgram  : (ref_mel, mel_frames, bert_dur, lengths,
                            noise_init, noises_aux) -> (s_pred, ref_s) [B,256]
                           == ref_encoder + fused_diffusion_sampler stages
                           (ADPM2/Karras loop unrolled under jit — 5 steps)
  StyleTts2PredictProgram: (d_en, s128, lengths) -> (d [B,T,640],
                            dur_logits [B,T,50])
                           == duration_predictor stage
  StyleTts2AcousticProgram: (d, t_en, frame_idx, n_frames, s128, ref128)
                           -> audio [B, ~600*F]
                           == fused_f0n_har_source + decoder_pre +
                              decoder_upsample stages (alignment one-hot
                              matmul becomes a gather; the causal
                              `_hifigan_shift` is a static frame roll)

Host-side glue keeps reference semantics exactly: sigmoid-summed duration
rounding with clamp >= 1 (`StyleTTS2GlueOps.swift:23-46`), alpha/beta style
blending of the 128/128 split (`StyleTTS2GlueOps.swift:147-161`), 50-sample
tail trim (`StyleTTS2Synthesizer.swift:127-131`).

Weight layout matches `convert/styletts2.py` (upstream torch checkpoint,
module prefixes bert/bert_encoder/predictor/text_encoder/decoder/
style_encoder/predictor_encoder/diffusion). The HiFi-GAN upsample
rates/kernels default to (10,5,3,2)/(20,11,7,4) — a 300x factorization over
the 2F x_pre frames, i.e. 600 samples per duration frame, consistent with
the reference's hopSamples=300 per x_pre frame
(`StyleTTS2Constants.swift:16`, `StyleTTS2Synthesizer.swift:120-125`); the
converter re-derives the factorization from checkpoint tensor shapes, so a
checkpoint with different rates overrides the default.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.kokoro import (
    Prosody as KokoroProsody,
    AdaINResBlock1,
    AdainResBlk1d,
    Albert,
    DurationEncoder,
    TextEncoder,
    conv_transpose_1d,
)
from fluidaudio_tpu.models.rnn import BiLstm

SAMPLE_RATE = 24_000
# Samples per duration frame: the predictor's 2x upsample (F -> 2F x_pre
# frames) times the generator's 300x factorization = 600. The reference's
# hopSamples=300 (`StyleTTS2Constants.swift:16`) counts per x_pre frame
# ([1, 512, totalFrames*2], `StyleTTS2Synthesizer.swift:120-125`).
HOP = 600
STYLE_DIM = 256  # ref/prosody halves of 128 each (refSplit)
DIFFUSION_STEPS = 5
SIGMA_MIN = 1e-4
SIGMA_MAX = 3.0
RHO = 9.0
SIGMA_DATA = 0.2  # KDiffusion EDM preconditioning (upstream sigma_data)
MAX_FRAMES = 2_000


@dataclass(frozen=True)
class StyleTts2Config:
    # text / predictor (upstream config_libritts.yml: hidden_dim 512,
    # style_dim 128, n_layer 3, max_dur 50, n_token 178)
    vocab_size: int = 178
    d_model: int = 512
    style_dim: int = 128
    n_layer: int = 3
    max_dur: int = 50
    text_kernel: int = 5
    # plbert (same custom ALBERT the Kokoro fork kept)
    albert_emb: int = 128
    albert_hidden: int = 768
    albert_heads: int = 12
    albert_inter: int = 2048
    albert_layers: int = 12
    albert_max_pos: int = 512
    # style encoders (StarGANv2 ResBlk stack)
    style_dim_in: int = 64
    style_max_conv_dim: int = 512
    n_mels: int = 80
    # style diffusion denoiser (transformer)
    diff_width: int = 512
    diff_layers: int = 3
    diff_heads: int = 8
    # hifigan decoder
    decoder_hidden: int = 1024
    asr_res_ch: int = 64
    # HiFi-GAN factorization: 300x over the 2F x_pre frames. Kernels follow
    # the upstream convention k = 2r (even r) / k = 2r+1 (odd r), which keeps
    # every stage's length arithmetic aligned with the harmonic-source
    # noise convs. The converter re-derives these from checkpoint shapes.
    upsample_rates: tuple[int, ...] = (10, 5, 3, 2)
    upsample_kernels: tuple[int, ...] = (20, 11, 7, 4)
    upsample_initial: int = 512
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    max_frames: int = MAX_FRAMES
    max_tokens: int = 512
    dtype: str = "float32"
    # F0 head output scale in Hz (shared ProsodyF0N reads it via getattr).
    # 1.0 = upstream parity (real checkpoints carry Hz-scale weights); the
    # trained tiny fixture sets 500.0 so the head reaches the fixture
    # corpus's 240 Hz..4.2 kHz tone grid from O(1) conv outputs (same
    # rationale as KokoroConfig.f0_scale).
    f0_scale: float = 1.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


STYLETTS2_BASE = StyleTts2Config()
STYLETTS2_TEST = StyleTts2Config(
    d_model=32, style_dim=16, n_layer=1, max_dur=8,
    albert_emb=8, albert_hidden=24, albert_heads=2, albert_inter=32,
    albert_layers=2,
    style_dim_in=8, style_max_conv_dim=16,
    diff_width=32, diff_layers=1, diff_heads=2,
    decoder_hidden=32, asr_res_ch=8,
    upsample_rates=(10, 5), upsample_kernels=(20, 11),
    upsample_initial=16, resblock_kernels=(3,),
    resblock_dilations=((1, 3),),
    max_frames=64, max_tokens=64,
)


# ---------------------------------------------------------------------------
# ref_encoder: two StarGANv2-style 2D-conv style encoders over the ref mel
# ---------------------------------------------------------------------------


class ResBlk2d(nn.Module):
    """StarGANv2 ResBlk (normalize=False): lrelu->conv3x3->pool, /sqrt(2).

    Upstream applies spectral_norm at train time; at inference the folded
    weight is a plain conv (convert/styletts2.py folds sigma).
    """

    dim_in: int
    dim_out: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        h = nn.leaky_relu(x, 0.2)
        h = nn.Conv(self.dim_in, (3, 3), padding=1, name="conv1")(h)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, name="conv2")(h)
        sc = x
        if self.downsample:
            sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        if self.dim_in != self.dim_out:
            sc = nn.Conv(self.dim_out, (1, 1), use_bias=False, name="conv1x1")(sc)
        return (h + sc) / math.sqrt(2.0)


class StyleEncoder2d(nn.Module):
    """mel [B, n_mels, T] (+frames) -> style [B, style_dim].

    Upstream StyleEncoder: conv3x3 stem -> 4 downsampling ResBlks ->
    lrelu -> conv5x5 (valid) -> masked global average pool -> linear.
    The adaptive-avg-pool over the padded static bucket is made exact with
    a frame-validity mask carried through the 16x time downsampling.
    """

    cfg: StyleTts2Config

    @nn.compact
    def __call__(self, mel: jax.Array, mel_frames: jax.Array) -> jax.Array:
        cfg = self.cfg
        # lay out as a [B, freq, time, 1] image (NHWC)
        x = mel[..., None]  # [B, n_mels, T, 1]
        x = nn.Conv(cfg.style_dim_in, (3, 3), padding=1, name="stem")(x)
        dim = cfg.style_dim_in
        for i in range(4):
            dim_out = min(dim * 2, cfg.style_max_conv_dim)
            x = ResBlk2d(dim, dim_out, name=f"res{i}")(x)
            dim = dim_out
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(dim, (5, 5), padding="VALID", name="conv5")(x)
        # masked adaptive average pool over (freq', time'): valid time cols
        # after 4 stride-2 pools and the valid 5x5 conv are
        # floor(frames/16) - 4 (clamped >= 1)
        Bt = x.shape[2]
        n_freq = x.shape[1]
        valid_t = jnp.maximum(mel_frames // 16 - 4, 1)
        tmask = (jnp.arange(Bt)[None, :] < valid_t[:, None]).astype(x.dtype)
        x = jnp.sum(x * tmask[:, None, :, None], axis=(1, 2))
        x = x / (n_freq * jnp.maximum(valid_t, 1).astype(x.dtype))[:, None]
        x = nn.leaky_relu(x, 0.2)  # upstream post-pool activation
        return nn.Dense(cfg.style_dim, name="unshared")(x)


# ---------------------------------------------------------------------------
# style diffusion: transformer denoiser + ADPM2 / Karras sampler
# ---------------------------------------------------------------------------


def karras_sigmas(n: int, sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX, rho=RHO):
    """`StyleTTS2DiffusionSchedule.karrasSigmas` (+0.0 pad terminator)."""
    i = np.arange(n, dtype=np.float64)
    s = (sigma_max ** (1 / rho) + i / (n - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


class StyleDenoiser(nn.Module):
    """Transformer denoiser for the 256-d style vector (StyleTransformer1d
    contract: x [B,256] at noise level sigma, cross-attending to the BERT
    token sequence, FiLM-conditioned on (sigma, ref_s features)).

    EDM preconditioning (c_skip/c_out/c_in/c_noise, sigma_data 0.2) matches
    the upstream KDiffusion wrapper, so the net learns the residual target.
    """

    cfg: StyleTts2Config

    @nn.compact
    def __call__(self, x, sigma, embedding, emb_mask, features):
        cfg = self.cfg
        d = cfg.diff_width
        B = x.shape[0]

        c_skip = SIGMA_DATA**2 / (sigma**2 + SIGMA_DATA**2)
        c_out = sigma * SIGMA_DATA * jax.lax.rsqrt(sigma**2 + SIGMA_DATA**2)
        c_in = jax.lax.rsqrt(sigma**2 + SIGMA_DATA**2)
        c_noise = jnp.log(jnp.maximum(sigma, 1e-20)) * 0.25

        # time + features mapping
        half = d // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
        t = jnp.concatenate(
            [jnp.sin(c_noise[:, None] * freqs), jnp.cos(c_noise[:, None] * freqs)],
            axis=-1,
        )
        t = nn.silu(nn.Dense(d, name="time_in")(t))
        f = nn.silu(nn.Dense(d, name="feat_in")(features))
        mapping = nn.Dense(d, name="map_out")(nn.silu(nn.Dense(d, name="map_in")(t + f)))

        # style vector as a length-256 sequence of scalars
        h = nn.Dense(d, name="to_in")((c_in[:, None] * x)[..., None])
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (2 * cfg.style_dim, d), jnp.float32)
        h = h + pos[None]
        ctx = nn.Dense(d, name="ctx_proj")(embedding)
        ctx_mask = emb_mask[:, None, None, :]  # [B, 1, 1(q), Tk] broadcast

        for i in range(cfg.diff_layers):
            m = nn.Dense(2 * d, name=f"mod{i}")(nn.silu(mapping))
            scale, shift = jnp.split(m[:, None, :], 2, axis=-1)
            hn = nn.LayerNorm(name=f"ln_a{i}")(h) * (1 + scale) + shift
            h = h + nn.SelfAttention(num_heads=cfg.diff_heads, name=f"self{i}")(hn)
            hn = nn.LayerNorm(name=f"ln_c{i}")(h)
            h = h + nn.MultiHeadDotProductAttention(
                num_heads=cfg.diff_heads, name=f"cross{i}"
            )(hn, ctx, mask=ctx_mask)
            hn = nn.LayerNorm(name=f"ln_f{i}")(h)
            ff = nn.Dense(2 * d, name=f"ff1_{i}")(hn)
            h = h + nn.Dense(d, name=f"ff2_{i}")(nn.gelu(ff))

        out = nn.Dense(1, name="to_out")(nn.LayerNorm(name="ln_out")(h))[..., 0]
        return c_skip[:, None] * x + c_out[:, None] * out


def adpm2_sample(denoise_fn, noise_init, noises_aux, num_steps=DIFFUSION_STEPS):
    """ADPM2 (DPM-Solver-2 ancestral) over the Karras schedule.

    Mirrors the fused CoreML sampler contract
    (`StyleTTS2Synthesizer.swift:236-283`): `noise_init` [B,256] seeds
    x = sigma_max * noise; each of the `num_steps - 1` iterations consumes
    one `noises_aux[k]` [B,256]. Unrolled under jit (4 trips).
    """
    sigmas = karras_sigmas(num_steps)
    x = sigmas[0] * noise_init
    for k in range(num_steps - 1):
        sigma, sigma_next = float(sigmas[k]), float(sigmas[k + 1])
        sig = jnp.full((x.shape[0],), sigma, x.dtype)
        sigma_up = math.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2)
        sigma_down = math.sqrt(sigma_next**2 - sigma_up**2)
        sigma_mid = (sigma + sigma_down) / 2  # ADPM2Sampler rho=1 midpoint
        d = (x - denoise_fn(x, sig)) / sigma
        x_mid = x + d * (sigma_mid - sigma)
        sig_mid = jnp.full((x.shape[0],), sigma_mid, x.dtype)
        d_mid = (x_mid - denoise_fn(x_mid, sig_mid)) / sigma_mid
        x = x + d_mid * (sigma_down - sigma)
        x = x + noises_aux[k] * sigma_up
    return x


# ---------------------------------------------------------------------------
# prosody predictor (duration + F0/N) — StyleTTS2 ProsodyPredictor
# ---------------------------------------------------------------------------


# F0Ntrain is byte-identical in both graphs (Kokoro-82M forked StyleTTS2);
# reuse the kokoro module (it reads only cfg.d_model, so either config works).
ProsodyF0N = KokoroProsody


# ---------------------------------------------------------------------------
# HiFi-GAN decoder (waveform head, harmonic source injection)
# ---------------------------------------------------------------------------


class HifiSourceModule(nn.Module):
    """SourceModuleHnNSF at 24 kHz: 8 harmonics + fundamental, tanh(linear).

    `deterministic=True` zeroes random phase + additive noise for
    equivalence tests (same convention as kokoro.SourceModule)."""

    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0
    deterministic: bool = False

    @nn.compact
    def __call__(self, f0_up):  # [B, L] sample-rate F0 track
        B, L = f0_up.shape
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
        # keep the sin argument bounded in [0,1) cycles (upstream SineGen's
        # `cumsum % 1` bound): an unbounded sample-rate cumsum reaches
        # thousands of radians on long utterances, where f32 sin() spacing
        # drifts the harmonic phase audibly
        phase = (jnp.cumsum(rad, axis=1) % 1.0) * 2.0 * jnp.pi
        sines = jnp.sin(phase) * self.sine_amp
        uv = (f0_up > self.voiced_threshold).astype(f0_up.dtype)[..., None]
        if self.deterministic:
            sine_waves = sines * uv
        else:
            noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
            sine_waves = sines * uv + noise_amp * jax.random.normal(k2, sines.shape)
        return jnp.tanh(nn.Dense(1, name="l_linear")(sine_waves))[..., 0]


class HifiGenerator(nn.Module):
    """StyleTTS2 hifigan.py Generator: transposed-conv upsampling with raw
    harmonic-waveform noise-conv injection + AdaIN snake resblocks, then
    lrelu -> reflection_pad(1,0) -> conv_post(k7) -> tanh.
    (x [B,2F,512], s, f0_curve [B,2F]) -> audio [B, 2F*prod(rates)+1]."""

    cfg: StyleTts2Config
    deterministic: bool = False

    @nn.compact
    def __call__(self, x, s, f0_curve):
        cfg = self.cfg
        rates = cfg.upsample_rates
        n_up = len(rates)
        upscale = int(np.prod(rates))

        f0_up = jnp.repeat(f0_curve, upscale, axis=1)
        har = HifiSourceModule(deterministic=self.deterministic, name="m_source")(f0_up)
        har = har[..., None]  # [B, L, 1]

        ch = cfg.upsample_initial
        for i, (r, k) in enumerate(zip(rates, cfg.upsample_kernels)):
            c_cur = cfg.upsample_initial // (2 ** (i + 1))
            x = nn.leaky_relu(x, 0.1)
            if i + 1 < n_up:
                stride_f0 = int(np.prod(rates[i + 1:]))
                xs = nn.Conv(
                    c_cur, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=(stride_f0 + 1) // 2, name=f"noise_conv_{i}",
                )(har)
                xs = AdaINResBlock1(c_cur, 7, (1, 3, 5), name=f"noise_res_{i}")(xs, s)
            else:
                xs = nn.Conv(c_cur, (1,), name=f"noise_conv_{i}")(har)
                xs = AdaINResBlock1(c_cur, 11, (1, 3, 5), name=f"noise_res_{i}")(xs, s)
            up_k = self.param(
                f"up_kernel_{i}", nn.initializers.lecun_normal(), (k, ch, c_cur)
            )
            up_b = self.param(f"up_bias_{i}", nn.initializers.zeros, (c_cur,))
            x = conv_transpose_1d(x, up_k, r, (k - r) // 2) + up_b
            # (upstream hifigan.py adds the source to the UNPADDED x and
            # reflection-pads only after the loop before conv_post — the
            # in-loop pad belongs to the iSTFTNet graph in kokoro.py, where
            # the +1 STFT frame makes lengths align)
            x = x + xs
            acc = 0.0
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernels, cfg.resblock_dilations)):
                acc = acc + AdaINResBlock1(c_cur, rk, tuple(rd), name=f"resblock_{i}_{j}")(x, s)
            x = acc / len(cfg.resblock_kernels)
            ch = c_cur

        x = nn.leaky_relu(x, 0.01)
        x = jnp.concatenate([x[:, 1:2, :], x], axis=1)  # ReflectionPad1d((1,0))
        x = nn.Conv(1, (7,), padding=3, name="conv_post")(x)
        return jnp.tanh(x[..., 0])


class HifiDecoder(nn.Module):
    """hifigan.py Decoder: F0/N stride-2 convs, encode block, 3+1 AdaIN
    decode blocks with (asr_res, F0, N) re-injection, then HifiGenerator.
    (asr [B,F,512], F0_curve [B,2F], N [B,2F], s_ref, n_frames) -> audio."""

    cfg: StyleTts2Config
    deterministic: bool = False

    @nn.compact
    def __call__(self, asr, f0_curve, n_curve, s, n_frames):
        cfg = self.cfg
        B, F, _ = asr.shape
        mask = (jnp.arange(F)[None, :] < n_frames[:, None])[..., None].astype(asr.dtype)

        f0 = nn.Conv(1, (3,), strides=(2,), padding=1, name="f0_conv")(f0_curve[..., None])
        nn_ = nn.Conv(1, (3,), strides=(2,), padding=1, name="n_conv")(n_curve[..., None])
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
        return HifiGenerator(cfg, deterministic=self.deterministic, name="generator")(
            x, s, f0_curve
        )


# ---------------------------------------------------------------------------
# the four jitted programs
# ---------------------------------------------------------------------------


class StyleTts2TextProgram(nn.Module):
    """text_encoder + bert + bert_encoder stages.

    (ids [B,T], lengths [B]) -> (bert_dur [B,T,768], d_en [B,T,512],
    t_en [B,T,512]). Ref stage I/O: `StyleTTS2Synthesizer.swift:55-67`."""

    cfg: StyleTts2Config = field(default_factory=StyleTts2Config)

    @nn.compact
    def __call__(self, ids, lengths):
        cfg = self.cfg
        bert_dur = Albert(cfg, name="albert")(ids, lengths)
        d_en = nn.Dense(cfg.d_model, name="bert_encoder")(bert_dur)
        t_en = TextEncoder(cfg, name="text_encoder")(ids, lengths)
        return bert_dur, d_en, t_en


class StyleTts2StyleProgram(nn.Module):
    """ref_encoder + fused_diffusion_sampler stages.

    (ref_mel [B,80,Tm], mel_frames [B], bert_dur [B,T,768], lengths [B],
    noise_init [B,256], noises_aux [S-1,B,256]) -> (s_pred, ref_s) [B,256].
    ref_s = concat(style_encoder, predictor_encoder) halves
    (`StyleTTS2Constants.swift:71-77`)."""

    cfg: StyleTts2Config = field(default_factory=StyleTts2Config)

    @nn.compact
    def __call__(self, ref_mel, mel_frames, bert_dur, lengths, noise_init, noises_aux):
        cfg = self.cfg
        acoustic = StyleEncoder2d(cfg, name="style_encoder")(ref_mel, mel_frames)
        prosodic = StyleEncoder2d(cfg, name="predictor_encoder")(ref_mel, mel_frames)
        ref_s = jnp.concatenate([acoustic, prosodic], axis=-1)

        T = bert_dur.shape[1]
        emb_mask = jnp.arange(T)[None, :] < lengths[:, None]
        denoiser = StyleDenoiser(cfg, name="diffusion")

        def denoise(x, sig):
            return denoiser(x, sig, bert_dur, emb_mask, ref_s)

        s_pred = adpm2_sample(denoise, noise_init, noises_aux)
        return s_pred, ref_s


class StyleTts2PredictProgram(nn.Module):
    """duration_predictor stage: (d_en [B,T,512], s128 prosody style,
    lengths) -> (d [B,T,640], dur_logits [B,T,max_dur]).
    Host rounds sum(sigmoid(logits)) per token (`GlueOps.roundDurations`)."""

    cfg: StyleTts2Config = field(default_factory=StyleTts2Config)

    @nn.compact
    def __call__(self, d_en, s, lengths):
        cfg = self.cfg
        d = DurationEncoder(cfg, name="dur_encoder")(d_en, s, lengths)
        x = BiLstm(cfg.d_model // 2, name="pred_lstm")(d, lengths)
        dur_logits = nn.Dense(cfg.max_dur, name="duration_proj")(x)
        return d, dur_logits


class StyleTts2AcousticProgram(nn.Module):
    """fused_f0n_har_source + decoder_pre + decoder_upsample stages.

    (d [B,T,640], t_en [B,T,512], frame_idx [B,F], n_frames [B],
    s128 prosody, ref128 acoustic) -> audio [B, F*300 + 1].
    The one-hot alignment matmul becomes a gather; the causal
    `_hifigan_shift` (`StyleTTS2GlueOps.swift:121-134`) is a static
    first-frame-preserving roll applied to both en and asr."""

    cfg: StyleTts2Config = field(default_factory=StyleTts2Config)
    deterministic: bool = False

    @nn.compact
    def __call__(self, d, t_en, frame_idx, n_frames, s, ref,
                 with_prosody: bool = False, stop_f0_grad: bool = False,
                 teacher_f0=None):
        B, F = frame_idx.shape
        mask = (jnp.arange(F)[None, :] < n_frames[:, None])[..., None].astype(d.dtype)
        en = jnp.take_along_axis(d, frame_idx[..., None], axis=1) * mask
        asr = jnp.take_along_axis(t_en, frame_idx[..., None], axis=1) * mask
        # hifigan causal shift: out[:,0]=in[:,0]; out[:,t]=in[:,t-1]
        en = jnp.concatenate([en[:, :1], en[:, :-1]], axis=1)
        asr = jnp.concatenate([asr[:, :1], asr[:, :-1]], axis=1)
        f0, n_ = ProsodyF0N(self.cfg, name="prosody")(en, s, n_frames)
        # FastSpeech2-style decoupling for the fixture trainer: pitch trains
        # only from its own MSE; the decoder treats F0 as given. teacher_f0
        # (training only) replaces the prediction with the ground-truth
        # track so the harmonic source's cumsum phase exactly matches the
        # waveform target (see kokoro.KokoroAudioProgram for the full
        # rationale); inference passes None and is untouched.
        if teacher_f0 is not None:
            f0_dec = teacher_f0
        else:
            f0_dec = jax.lax.stop_gradient(f0) if stop_f0_grad else f0
        audio = HifiDecoder(self.cfg, deterministic=self.deterministic,
                            name="decoder")(asr, f0_dec, n_, ref, n_frames)
        if with_prosody:
            # training hook (same convention as KokoroAudioProgram): expose
            # the F0/N tracks (2x frame rate) so a fixture loss can
            # supervise pitch directly. Inference path is untouched.
            return audio, f0, n_
        return audio


def blend_style(s_pred, ref_s, alpha=0.3, beta=0.7):
    """alpha/beta blend of the 128/128 style split
    (`StyleTTS2GlueOps.blendStyle`): ref = a*s_pred[:,:128]+(1-a)*ref_s[:,:128],
    s = b*s_pred[:,128:]+(1-b)*ref_s[:,128:]. Returns (ref128, s128)."""
    half = s_pred.shape[-1] // 2
    ref = alpha * s_pred[:, :half] + (1 - alpha) * ref_s[:, :half]
    s = beta * s_pred[:, half:] + (1 - beta) * ref_s[:, half:]
    return ref, s


def generator_output_length(cfg: StyleTts2Config, in_frames: int) -> int:
    """Exact HifiGenerator output length for `in_frames` (=2F) input frames
    (transposed-conv arithmetic + the final ReflectionPad1d((1,0)))."""
    L = in_frames
    for r, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        p = (k - r) // 2
        L = (L - 1) * r - 2 * p + k
    return L + 1


def round_durations(dur_logits: np.ndarray, n_tokens: int) -> np.ndarray:
    """`GlueOps.roundDurations`: sum(sigmoid) over the duration-bin axis,
    round half-away-from-zero, clamp >= 1. dur_logits [T, max_dur] -> [n]."""
    x = np.asarray(dur_logits[:n_tokens], np.float64)
    s = np.sum(1.0 / (1.0 + np.exp(-x)), axis=-1)
    return np.maximum(np.floor(s + 0.5).astype(np.int64), 1)
