"""Fused Pallas log-mel kernel: framing + windowed DFT + power + mel + log.

The SURVEY.md north-star fusion: one kernel turns padded/pre-emphasized audio
into log-mel without materializing the [B, T, 514] spectrum in HBM. Per grid
cell (b, frame-tile) it DMAs one overlapping audio slice HBM->VMEM, builds the
strided frame matrix in VMEM scratch, then runs two MXU matmuls
(frames @ windowed-DFT, power @ mel-filterbank) and the log floor in-register.

Precision: both matmuls run at `Precision.HIGHEST` (6-pass f32 emulation),
matching MelFrontend's default matmul-DFT path — measured on v5e this is both
faster than rfft (8.3 vs 10.9 ms per 32x15 s batch) and f32-accurate (max
log-domain deviation 0.008).

Environment note: this container's remote-compile relay (chipless Mosaic AOT)
rejects the kernel's unaligned dynamic lane slices (HTTP 500 with no
diagnostics; bisected to `ref[.., pl.ds(dyn_off, 400)]` row fills — plain
matmul/grid kernels compile fine). The kernel is validated in interpret mode
(tests/test_mel_pallas.py) and compiles with a standard local libtpu; on this
relay use `MelFrontend` (fft or matmul-DFT) instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidaudio_tpu.ops.mel import MelConfig, hann_window, slaney_mel_filterbank

TILE_T = 128  # frames per grid cell


def _build_dft(cfg: MelConfig) -> np.ndarray:
    win = hann_window(cfg.win_length, cfg.window_periodic).astype(np.float64)
    off = (cfg.n_fft - cfg.win_length) // 2
    f = np.arange(cfg.n_freq_bins, dtype=np.float64)
    i = np.arange(cfg.win_length, dtype=np.float64) + off
    phase = 2.0 * np.pi * np.outer(i, f) / cfg.n_fft
    return np.concatenate(
        [win[:, None] * np.cos(phase), -win[:, None] * np.sin(phase)], axis=1
    ).astype(np.float32)  # [win, 2*bins]


def _mel_kernel(
    audio_ref,  # VMEM [1, 1, N_pad] (whole row; <=1 MB for a 15 s window)
    dft_ref,  # VMEM [win, 2*bins]
    fb_ref,  # VMEM [bins, n_mels]
    out_ref,  # VMEM [1, TILE_T, n_mels]
    frames_vmem,  # scratch [TILE_T, win]
    *,
    hop: int,
    win: int,
    window_offset: int,
    n_bins: int,
    log_floor: float,
    clamped: bool,
):
    tt = pl.program_id(1)
    start = tt * TILE_T * hop

    def fill(i, _):
        frames_vmem[i, :] = audio_ref[0, 0, pl.ds(start + i * hop + window_offset, win)]
        return 0

    jax.lax.fori_loop(0, TILE_T, fill, 0)

    spec = jnp.dot(frames_vmem[:], dft_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2  # [TILE_T, bins]
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if clamped:
        out = jnp.log(jnp.maximum(mel, log_floor))
    else:
        out = jnp.log(mel + log_floor)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnums=(1,))
def _preprocess(audio: jax.Array, cfg: MelConfig, last_samples, lengths):
    B, N = audio.shape
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < lengths[:, None]
    x = jnp.where(valid, audio, 0.0)
    if cfg.preemph > 0:
        shifted = jnp.concatenate([last_samples[:, None], x[:, :-1]], axis=1)
        x = x - cfg.preemph * jnp.where(valid, shifted, 0.0)
    pad = cfg.n_fft // 2 if cfg.center else 0
    return jnp.pad(x, ((0, 0), (pad, pad)))


def log_mel_pallas(
    audio: jax.Array,
    cfg: MelConfig = MelConfig(),
    lengths: jax.Array | None = None,
    last_samples: jax.Array | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """audio [B, N] -> (logmel [B, n_mels, T], mel_lengths [B]).

    Matches MelFrontend(use_fft=False) numerics; normalization (if any) is the
    caller's job (it needs global statistics).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    B, N = audio.shape
    if lengths is None:
        lengths = jnp.full((B,), N, jnp.int32)
    if last_samples is None:
        last_samples = jnp.zeros((B,), audio.dtype)

    xp = _preprocess(audio, cfg, last_samples, lengths)
    T = cfg.num_frames(N)
    off = (cfg.n_fft - cfg.win_length) // 2
    t_tiles = -(-T // TILE_T)
    T_pad = t_tiles * TILE_T

    # audio slice per tile: frames [0, TILE_T) at hop strides + centered-window
    # offset + window width, rounded to 128 lanes for clean DMA
    audio_tile = (TILE_T - 1) * cfg.hop_length + off + cfg.win_length
    audio_tile = -(-audio_tile // 128) * 128
    # guarantee in-range DMA for the last tile
    need = (t_tiles - 1) * TILE_T * cfg.hop_length + audio_tile
    xp = jnp.pad(xp, ((0, 0), (0, max(0, need - xp.shape[1]))))

    dft = jnp.asarray(_build_dft(cfg))
    fb_j = jnp.asarray(
        slaney_mel_filterbank(cfg.n_fft, cfg.n_mels, cfg.sample_rate).T
    )  # [bins, mels]

    kernel = functools.partial(
        _mel_kernel,
        hop=cfg.hop_length,
        win=cfg.win_length,
        window_offset=off,
        n_bins=cfg.n_freq_bins,
        log_floor=cfg.log_floor,
        clamped=cfg.log_floor_mode == "clamped",
    )
    n_pad = xp.shape[1]
    xp3 = xp[:, None, :]  # [B, 1, N]: block (1, 1, N) satisfies tiling rules
    out = pl.pallas_call(
        kernel,
        grid=(B, t_tiles),
        in_specs=[
            # one audio row per grid cell; Mosaic's pipeline keeps it resident
            # across the frame-tile dimension of the same row
            pl.BlockSpec((1, 1, n_pad), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.win_length, 2 * cfg.n_freq_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_freq_bins, cfg.n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, cfg.n_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, cfg.n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_T, cfg.win_length), jnp.float32),
        ],
        interpret=interpret,
    )(xp3, dft, fb_j)

    mel_lengths = jnp.minimum(
        lengths // cfg.hop_length + 1 if cfg.center
        else jnp.maximum(0, 1 + (lengths - cfg.win_length) // cfg.hop_length),
        T,
    ).astype(jnp.int32)
    logmel = jnp.transpose(out[:, :T, :], (0, 2, 1))
    frame_valid = jnp.arange(T)[None, :] < mel_lengths[:, None]
    logmel = jnp.where(frame_valid[:, None, :], logmel, 0.0)
    return logmel, mel_lengths
