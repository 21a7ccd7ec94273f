"""On-TPU throughput benchmarks for the per-workload paths (VAD, Sortformer).

Measures the single-dispatch redesigns against the reference's MacBook
numbers (reference Documentation/Benchmarks.md:290-326 VAD ~1,230x RT;
:752-760 Sortformer offline 2,884x RT) on the real chip:

    python scripts/tpu_workload_bench.py [--which vad,sortformer]

Two tiers per workload:
  *_rtfx          end-to-end through the public API (includes host packing +
                  the axon tunnel's host<->device transfer — bandwidth-bound
                  here; a locally-attached chip pays PCIe instead)
  *_device_rtfx   the jitted program alone with inputs pre-staged on device
                  and a forced scalar readback (`block_until_ready` alone
                  under-reports through the tunnel)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _speechish(rng: np.random.RandomState, seconds: float, sr: int = 16000) -> np.ndarray:
    """AM-modulated noise with syllabic envelope — exercises both VAD states."""
    t = np.arange(int(seconds * sr)) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t)) * (0.3 + 0.7 * (np.sin(2 * np.pi * 0.31 * t) > 0))
    return (rng.randn(t.size) * 0.1 * (0.05 + env)).astype(np.float32)


def _timed(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_vad() -> dict:
    import jax
    import jax.numpy as jnp

    from fluidaudio_tpu.vad import VadManager
    from fluidaudio_tpu.vad.manager import CONTEXT_SIZE, FRAME_SIZE

    rng = np.random.RandomState(0)
    m = VadManager()

    def pcm(x):
        return np.clip(x * 32768, -32768, 32767).astype(np.int16)

    utt60 = pcm(_speechish(rng, 60.0))
    batch8 = [pcm(_speechish(rng, 60.0)) for _ in range(8)]
    m.process(utt60)  # warm
    m.process_batch(batch8)

    t_single = _timed(lambda: m.process(utt60))
    t_batch = _timed(lambda: m.process_batch(batch8))

    # device-only: 60 s -> 235 chunks -> bucket 256 -> 2048 frames
    n_frames = 2048
    out = {}
    for B, tag in ((1, "b1"), (8, "b8")):
        audio = jnp.asarray(
            np.random.RandomState(B).randn(B, CONTEXT_SIZE + n_frames * FRAME_SIZE)
            .astype(np.float32) * 0.1)
        h = jnp.zeros((B, 128))
        c = jnp.zeros((B, 128))
        last = jnp.full((B,), n_frames - 1, jnp.int32)
        fn = m._frame_program(B, n_frames)
        float(jnp.sum(fn(m.params, audio, h, c, last)[0]))  # warm
        t = _timed(lambda: float(jnp.sum(fn(m.params, audio, h, c, last)[0])))
        out[f"vad_device_{tag}_ms"] = round(t * 1e3, 2)
        out[f"vad_device_{tag}_rtfx"] = round(B * 65.5 / t, 1)

    out.update({
        "vad_single_60s_ms": round(t_single * 1e3, 2),
        "vad_single_rtfx": round(60.0 / t_single, 1),
        "vad_batch8_rtfx": round(8 * 60.0 / t_batch, 1),
    })
    return out


def bench_sortformer() -> dict:
    import jax
    import jax.numpy as jnp

    from fluidaudio_tpu.diarizer.sortformer import OFFLINE_WINDOW_MEL, SortformerDiarizer

    rng = np.random.RandomState(1)
    m = SortformerDiarizer()

    audio10m = _speechish(rng, 600.0)
    audio10m_i16 = np.clip(audio10m * 32768, -32768, 32767).astype(np.int16)
    audio2m = _speechish(rng, 120.0)
    m.process_offline(audio10m)  # warm f32 (21 windows -> bucket 32)
    m.process_offline(audio10m_i16)  # warm int16 transfer path
    m.process(audio2m)  # warm streaming scan (25 chunks -> bucket 32)

    t_off = _timed(lambda: m.process_offline(audio10m), n=3)
    t_off16 = _timed(lambda: m.process_offline(audio10m_i16), n=3)
    t_stream = _timed(lambda: m.process(audio2m), n=3)

    # device-only fused program: bucket 32 windows = 983 s of audio staged
    window_samples = OFFLINE_WINDOW_MEL * 160
    step = window_samples - 64 * 1280
    flat = jnp.asarray(np.random.RandomState(2).randn(33 * step).astype(np.float32) * 0.1)
    fn = m._offline_fused(32, step, window_samples)
    float(jnp.sum(fn(m.params, flat)))  # warm
    t_dev = _timed(lambda: float(jnp.sum(fn(m.params, flat))), n=3)
    audio_s = 32 * step / 16000 + 64 * 1280 / 16000

    return {
        "sortformer_offline_600s_ms": round(t_off * 1e3, 1),
        "sortformer_offline_rtfx": round(600.0 / t_off, 1),
        "sortformer_offline_int16_rtfx": round(600.0 / t_off16, 1),
        "sortformer_device_w32_ms": round(t_dev * 1e3, 1),
        "sortformer_device_rtfx": round(audio_s / t_dev, 1),
        "sortformer_stream_120s_ms": round(t_stream * 1e3, 1),
        "sortformer_stream_rtfx": round(120.0 / t_stream, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="vad,sortformer")
    args = ap.parse_args()
    out = {}
    for which in args.which.split(","):
        t0 = time.perf_counter()
        out.update({"vad": bench_vad, "sortformer": bench_sortformer}[which]())
        out[f"{which}_total_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
