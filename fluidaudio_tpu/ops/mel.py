"""Log-mel spectrogram frontend with NeMo numerical parity, TPU-first.

Behavioral parity: reference `Shared/AudioMelSpectrogram.swift:2-17,59-330`
(native reimplementation of NeMo's AudioToMelSpectrogramPreprocessor):
  - preemphasis 0.97 (seedable with the previous chunk's last sample)
  - center zero-padding by n_fft/2 ('constant', NOT reflect)
  - symmetric Hann window of win_length=400 centered inside the n_fft=512 frame
  - power spectrum |FFT|^2, 257 bins
  - Slaney-normalized mel filterbank, 128 bins, fmin 0, fmax sr/2
  - log with additive floor 2^-24 (or clamped mode)
  - optional NeMo 'per_feature' normalization (ddof=1 over valid frames)

TPU design: framing is a strided gather; the windowed STFT is ONE
[T, win] x [win, 2*bins] MXU matmul at `Precision.HIGHEST` (the default MXU
f32 is bf16-pass-based and blows up on cancellation-prone near-silence bins;
HIGHEST restores true-f32 accumulation). Measured on v5e vs `jnp.fft.rfft`
per 32x15 s batch: 8.3 ms vs 10.9 ms with max log-domain deviation 0.008 —
faster AND f32-accurate, so the matmul is the default. `use_fft=True`
selects rfft; `use_fft="ct"` is a two-stage Cooley-Tukey matmul variant
(fastest, but default-precision MXU passes make it inaccurate on device).
The [T, bins] x [bins, n_mels] filterbank matmul also runs at HIGHEST.
All static-shape, jit/vmap/pjit-compatible.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Filterbank / window construction (host-side constants)
# ---------------------------------------------------------------------------


def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    mels = f / f_sp
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = m * f_sp
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def slaney_mel_filterbank(
    n_fft: int, n_mels: int, sample_rate: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """Triangular mel filterbank with Slaney area normalization.

    Matches librosa.filters.mel(htk=False, norm='slaney') and the reference's
    `AudioMelSpectrogram.createMelFilterbank`. Returns [n_mels, n_fft//2+1] f32.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_length: int, periodic: bool = False) -> np.ndarray:
    """Hann window; symmetric by default (NeMo), periodic for librosa paths."""
    if periodic:
        n = np.arange(win_length, dtype=np.float64)
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    else:
        if win_length == 1:
            w = np.ones(1)
        else:
            n = np.arange(win_length, dtype=np.float64)
            w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16_000
    n_mels: int = 128
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    preemph: float = 0.97
    log_floor: float = 2.0**-24
    log_floor_mode: str = "additive"  # "additive" | "clamped"
    window_periodic: bool = False
    center: bool = True  # constant (zero) center padding by n_fft//2
    normalize: str | None = None  # None | "per_feature"
    mag_power: float = 2.0
    f_max: float | None = None  # mel filterbank upper edge (None = sr/2)

    @property
    def n_freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        """NeMo frame-count convention: center pad n_fft//2 each side."""
        if self.center:
            return num_samples // self.hop_length + 1
        return max(0, 1 + (num_samples - self.win_length) // self.hop_length)


# NeMo-parity presets for the model families (SURVEY.md §2.4: three mel recipes)
NEMO_PARAKEET = MelConfig(normalize="per_feature")
NEMO_EOU = MelConfig(normalize=None)  # parakeet_realtime_eou_120m: normalize "NA"


# ---------------------------------------------------------------------------
# NumPy golden reference (direct per-frame FFT) — used by tests
# ---------------------------------------------------------------------------


def log_mel_numpy(audio: np.ndarray, cfg: MelConfig, last_sample: float = 0.0) -> np.ndarray:
    """Direct (slow) implementation. Returns [n_mels, T] float32."""
    x = np.asarray(audio, dtype=np.float32).copy()
    if cfg.preemph > 0 and x.size:
        shifted = np.concatenate([[np.float32(last_sample)], x[:-1]])
        x = x - cfg.preemph * shifted
    pad = cfg.n_fft // 2 if cfg.center else 0
    xp = np.pad(x, (pad, pad))
    T = cfg.num_frames(audio.shape[0])
    win = hann_window(cfg.win_length, cfg.window_periodic)
    off = (cfg.n_fft - cfg.win_length) // 2
    fb = slaney_mel_filterbank(cfg.n_fft, cfg.n_mels, cfg.sample_rate, f_max=cfg.f_max)
    out = np.zeros((cfg.n_mels, T), dtype=np.float32)
    for t in range(T):
        frame = np.zeros(cfg.n_fft, dtype=np.float32)
        start = t * cfg.hop_length + off
        seg = xp[start : start + cfg.win_length]
        frame[off : off + seg.size] = seg * win[: seg.size]
        spec = np.fft.rfft(frame)
        power = (spec.real**2 + spec.imag**2).astype(np.float32)
        if cfg.mag_power != 2.0:
            power = power ** (cfg.mag_power / 2.0)
        mel = fb @ power
        if cfg.log_floor_mode == "additive":
            out[:, t] = np.log(mel + cfg.log_floor)
        else:
            out[:, t] = np.log(np.maximum(mel, cfg.log_floor))
    if cfg.normalize == "per_feature" and T > 1:
        mean = out.mean(axis=1, keepdims=True)
        std = out.std(axis=1, ddof=1, keepdims=True)
        out = (out - mean) / (std + 1e-5)
    return out


# ---------------------------------------------------------------------------
# JAX implementation (jittable, batched, MXU-mapped)
# ---------------------------------------------------------------------------


class MelFrontend:
    """Precomputes DFT/mel matrices once; `__call__` is jit-compiled.

    The windowed real DFT is folded into a single [win, 2*bins] matrix:
      W[i, f]        = hann[i] * cos(2*pi*f*(i+off)/n_fft)
      W[i, bins + f] = -hann[i] * sin(2*pi*f*(i+off)/n_fft)
    so power = re^2 + im^2 comes from one frames@W matmul.
    """

    def __init__(self, cfg: MelConfig = MelConfig(), use_fft: bool | str = False,
                 precision: str = "highest"):
        """use_fft: False (default) = windowed-DFT matmul; True = jnp.fft.rfft;
        "ct" = Cooley-Tukey two-stage matmul FFT; "conv" = strided-conv DFT
        (no gather/frame materialization — fastest on TPU).
        precision: "highest" (6-pass f32, bit-parity with numpy f32),
        "high" (3-pass bf16 sum, ~1e-5 log-mel error, ~2x faster on TPU)."""
        self.cfg = cfg
        self.use_fft = use_fft
        self._prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                      else jax.lax.Precision.HIGH)
        self._window = jnp.asarray(hann_window(cfg.win_length, cfg.window_periodic))
        if use_fft == "ct":
            self._ct = _cooley_tukey_matrices(cfg)
        win = hann_window(cfg.win_length, cfg.window_periodic).astype(np.float64)
        off = (cfg.n_fft - cfg.win_length) // 2
        f = np.arange(cfg.n_freq_bins, dtype=np.float64)
        i = np.arange(cfg.win_length, dtype=np.float64) + off
        phase = 2.0 * np.pi * np.outer(i, f) / cfg.n_fft  # [win, bins]
        dft = np.concatenate([win[:, None] * np.cos(phase), -win[:, None] * np.sin(phase)], axis=1)
        self._dft = jnp.asarray(dft, dtype=jnp.float32)  # [win, 2*bins]
        self._melfb_t = jnp.asarray(
            slaney_mel_filterbank(cfg.n_fft, cfg.n_mels, cfg.sample_rate, f_max=cfg.f_max).T
        )  # [bins, n_mels]

    def num_frames(self, num_samples: int) -> int:
        return self.cfg.num_frames(num_samples)

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(
        self,
        audio: jax.Array,
        lengths: jax.Array | None = None,
        last_samples: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """audio [B, N] f32 (+ lengths [B]) -> (mel [B, n_mels, T], mel_lengths [B]).

        Frames beyond a row's valid length are forced to the log floor and
        excluded from per-feature normalization, matching NeMo's masked stats.
        """
        cfg = self.cfg
        if audio.ndim == 1:
            audio = audio[None, :]
        B, N = audio.shape
        if lengths is None:
            lengths = jnp.full((B,), N, dtype=jnp.int32)
        if last_samples is None:
            last_samples = jnp.zeros((B,), dtype=audio.dtype)

        # zero out samples beyond each row's length so pad never leaks energy
        sample_idx = jnp.arange(N, dtype=jnp.int32)[None, :]
        valid = sample_idx < lengths[:, None]
        x = jnp.where(valid, audio, 0.0)

        if cfg.preemph > 0:
            shifted = jnp.concatenate([last_samples[:, None], x[:, :-1]], axis=1)
            x = x - cfg.preemph * jnp.where(valid, shifted, 0.0)

        pad = cfg.n_fft // 2 if cfg.center else 0
        xp = jnp.pad(x, ((0, 0), (pad, pad)))

        T = cfg.num_frames(N)
        off = (cfg.n_fft - cfg.win_length) // 2
        nb = cfg.n_freq_bins
        if self.use_fft == "conv":
            # strided conv with the windowed-DFT matrix as kernel: no
            # materialized [B, T, win] frame tensor, no XLA gather — the
            # framing is implicit in the conv's stride (TPU: direct MXU).
            Lp = xp.shape[1]
            need = off + (T - 1) * cfg.hop_length + cfg.win_length
            if need > Lp:
                xp = jnp.pad(xp, ((0, 0), (0, need - Lp)))
            spec = jax.lax.conv_general_dilated(
                xp[:, off:, None],
                self._dft.reshape(cfg.win_length, 1, 2 * nb),
                window_strides=(cfg.hop_length,),
                padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=self._prec,
                preferred_element_type=jnp.float32,
            )[:, :T, :]  # [B, T, 2*bins]
            power = spec[..., :nb] ** 2 + spec[..., nb:] ** 2
            frames = None
        else:
            starts = jnp.arange(T, dtype=jnp.int32) * cfg.hop_length + off
            gather_idx = starts[:, None] + jnp.arange(cfg.win_length, dtype=jnp.int32)[None, :]
            gather_idx = jnp.minimum(gather_idx, xp.shape[1] - 1)
            frames = xp[:, gather_idx]  # [B, T, win]

        if self.use_fft == "conv":
            pass
        elif self.use_fft == "ct":
            # two-stage matmul FFT (power is shift-invariant, so the windowed
            # frame goes at offset 0 with trailing zeros)
            windowed = frames * self._window[None, None, :]
            windowed = jnp.pad(
                windowed, ((0, 0), (0, 0), (0, cfg.n_fft - cfg.win_length))
            )
            power = _ct_power(windowed, self._ct, self._prec)
        elif self.use_fft:
            windowed = frames * self._window[None, None, :]
            lpad = off
            rpad = cfg.n_fft - cfg.win_length - off
            windowed = jnp.pad(windowed, ((0, 0), (0, 0), (lpad, rpad)))
            spec_c = jnp.fft.rfft(windowed, axis=-1)
            power = jnp.real(spec_c) ** 2 + jnp.imag(spec_c) ** 2
        else:
            spec = jnp.einsum(
                "btw,wf->btf", frames, self._dft,
                preferred_element_type=jnp.float32,
                precision=self._prec,
            )  # [B, T, 2*bins]
            power = spec[..., :nb] ** 2 + spec[..., nb:] ** 2
        if cfg.mag_power != 2.0:
            power = power ** (cfg.mag_power / 2.0)
        mel = jnp.einsum(
            "btf,fm->btm", power, self._melfb_t,
            preferred_element_type=jnp.float32,
            precision=self._prec,
        )  # [B, T, n_mels]

        if cfg.log_floor_mode == "additive":
            logmel = jnp.log(mel + cfg.log_floor)
        else:
            logmel = jnp.log(jnp.maximum(mel, cfg.log_floor))

        mel_lengths = jnp.minimum(
            (lengths // cfg.hop_length + 1) if cfg.center
            else jnp.maximum(0, 1 + (lengths - cfg.win_length) // cfg.hop_length),
            T,
        ).astype(jnp.int32)

        frame_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < mel_lengths[:, None]  # [B, T]
        if cfg.normalize == "per_feature":
            mask = frame_valid[..., None].astype(logmel.dtype)
            n = jnp.maximum(mel_lengths.astype(logmel.dtype)[:, None, None], 2.0)
            mean = jnp.sum(logmel * mask, axis=1, keepdims=True) / n
            var = jnp.sum(((logmel - mean) * mask) ** 2, axis=1, keepdims=True) / (n - 1.0)
            logmel = (logmel - mean) / (jnp.sqrt(var) + 1e-5)

        logmel = jnp.where(frame_valid[..., None], logmel, 0.0)
        return jnp.transpose(logmel, (0, 2, 1)), mel_lengths  # [B, n_mels, T]


# ---------------------------------------------------------------------------
# Cooley-Tukey two-stage matmul FFT (N = N1 x N2, decimation in time)
# ---------------------------------------------------------------------------


def _cooley_tukey_matrices(cfg: MelConfig, n1: int = 16):
    """Matrices for X[k] = sum_b W_N^{bk} * (sum_a x[N2*a+b] W_{N1}^{a(k%N1)}).

    Returns (C16 [n1,n1], S16, G_re [N,bins], G_im) with the outer stage's
    m==k%n1 selection folded into sparse [N, bins] matmul operands — every
    stage is an MXU matmul; per-output accumulation is n1 + N/n1 terms instead
    of the naive DFT's win_length, which is what restores precision on the
    bf16-pass MXU.
    """
    N = cfg.n_fft
    n2 = N // n1
    nb = cfg.n_freq_bins
    a = np.arange(n1)
    m = np.arange(n1)
    ang1 = 2.0 * np.pi * np.outer(a, m) / n1
    C16 = np.cos(ang1).astype(np.float32)
    S16 = (-np.sin(ang1)).astype(np.float32)

    b = np.arange(n2)
    k = np.arange(nb)
    ang2 = 2.0 * np.pi * np.outer(b, k) / N  # [n2, nb]
    M_re = np.cos(ang2)
    M_im = -np.sin(ang2)
    G_re = np.zeros((n2 * n1, nb), np.float32)
    G_im = np.zeros((n2 * n1, nb), np.float32)
    mmap = k % n1
    for bb in range(n2):
        G_re[bb * n1 + mmap, k] = M_re[bb, k]
        G_im[bb * n1 + mmap, k] = M_im[bb, k]
    return (
        jnp.asarray(C16), jnp.asarray(S16), jnp.asarray(G_re), jnp.asarray(G_im), n1, n2,
    )


def _ct_power(x512: jax.Array, mats, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """x512 [B, T, N] real -> power [B, T, bins] via two matmul FFT stages.

    `precision` matters on TPU: the default bf16 matmul accumulation puts
    ~4.5 absolute error on the log-mel floor; HIGHEST restores f32 parity.
    """
    C16, S16, G_re, G_im, n1, n2 = mats
    B, T, N = x512.shape
    # n = n2*a + b: reshape to [B, T, a(n1), b(n2)] then inner DFT over a
    x3 = x512.reshape(B, T, n1, n2)
    xt = jnp.swapaxes(x3, 2, 3)  # [B, T, b, a]
    A_re = jnp.einsum("ztca,am->ztcm", xt, C16, preferred_element_type=jnp.float32, precision=precision)
    A_im = jnp.einsum("ztca,am->ztcm", xt, S16, preferred_element_type=jnp.float32, precision=precision)
    Ar = A_re.reshape(B, T, n2 * n1)
    Ai = A_im.reshape(B, T, n2 * n1)
    X_re = (
        jnp.einsum("ztn,nk->ztk", Ar, G_re, preferred_element_type=jnp.float32, precision=precision)
        - jnp.einsum("ztn,nk->ztk", Ai, G_im, preferred_element_type=jnp.float32, precision=precision)
    )
    X_im = (
        jnp.einsum("ztn,nk->ztk", Ar, G_im, preferred_element_type=jnp.float32, precision=precision)
        + jnp.einsum("ztn,nk->ztk", Ai, G_re, preferred_element_type=jnp.float32, precision=precision)
    )
    return X_re**2 + X_im**2
