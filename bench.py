"""Flagship benchmark: Parakeet TDT v3 batch ASR throughput per TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference FluidAudio overall RTFx 155.6x on M4 Pro (LibriSpeech
test-clean, Documentation/Benchmarks.md:50-51; BASELINE.md "ASR — batch").
North star (BASELINE.json): >=50x real-time per v5e chip.

Runs the full pipeline (log-mel -> 24x1024 FastConformer -> batched greedy
TDT decode) on synthetic 15 s windows with seeded random weights — identical
FLOPs/memory traffic to the real checkpoint, no network needed. Emitted-token
count with random weights is input-independent enough to make decode work
realistic (max_symbols caps pathological loops).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fluidaudio_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128  # v5e sweep(HIGHEST-mel): 128 -> 6038x; rfft-mel: 128 -> 5739x, 64 -> 5207x
    window = 240_000  # 15 s @ 16 kHz
    iters = 5

    import os
    quant = os.environ.get("FLUID_BENCH_QUANT") or (
        "int8" if "int8" in sys.argv else None
    )
    models = AsrModels.load("v3", allow_random_init=True, quantization=quant)
    manager = AsrManager(models, ASRConfig(parallel_chunk_batch=batch))
    fn = jax.jit(manager.build_pipeline(batch))

    rng = np.random.RandomState(0)
    # speech-shaped input: band-limited noise with syllabic amplitude modulation
    t = np.arange(window) / 16000.0
    am = 0.5 * (1.0 + np.sin(2 * np.pi * 4.0 * t))
    audio_np = (rng.randn(batch, window).astype(np.float32) * 0.1 * am).astype(np.float32)
    audio = jnp.asarray(audio_np)
    lengths = jnp.full((batch,), window, jnp.int32)

    result, _ = fn(models.params, audio, lengths)
    jax.block_until_ready(result.tokens)  # compile + warmup

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result, _ = fn(models.params, audio, lengths)
        jax.block_until_ready(result.tokens)
        best = min(best, time.perf_counter() - t0)

    audio_seconds = batch * window / 16000.0
    rtfx = audio_seconds / best
    baseline = 155.6  # reference overall RTFx, M4 Pro
    print(
        json.dumps(
            {
                "metric": "parakeet_tdt_v3_batch_rtfx_per_chip",
                "value": round(rtfx, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
