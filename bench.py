"""Flagship benchmark: Parakeet TDT v3 batch ASR throughput per TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: reference FluidAudio overall RTFx 155.6x on M4 Pro (LibriSpeech
test-clean, Documentation/Benchmarks.md:50-51; BASELINE.md "ASR — batch").
North star (BASELINE.json): >=50x real-time per v5e chip.

Runs the full pipeline (log-mel -> 24x1024 FastConformer -> batched greedy
TDT decode) on synthetic 15 s windows with seeded random weights — identical
FLOPs/memory traffic to the real checkpoint, no network needed.

Decode honesty: real speech makes Parakeet v3 emit ~9-12 tokens/s, and every
emission costs a predictor+joint step, so an under-emitting random-weight
decode would flatter RTFx. Before timing, the joint's blank-logit bias is
CALIBRATED (bisection; params-only change, no recompile) until the decode
emits in that band, and the measured tokens/s is printed next to RTFx so the
claim is checkable in every BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_TOK_PER_S = (9.0, 12.0)  # LibriSpeech-like emission band for v3


def _calibrate_blank_bias(fn, models, audio, lengths, audio_seconds):
    """Bisect the joint blank-logit bias until emission lands in the speech
    band. Monotone: higher blank bias -> fewer emissions. Returns (params,
    tokens_per_second)."""
    import jax
    import jax.numpy as jnp

    lo, hi = -12.0, 12.0  # bias window: plenty to swing 0..max_tokens
    params = models.params
    bias_path = params["joint"]["params"]["out"]["bias"]
    blank = models.blank_id

    def with_bias(b):
        new_bias = bias_path.at[blank].set(jnp.asarray(b, bias_path.dtype))
        joint = dict(params["joint"])
        joint_p = dict(joint["params"])
        out = dict(joint_p["out"])
        out["bias"] = new_bias
        joint_p["out"] = out
        joint["params"] = joint_p
        return {**params, "joint": joint}

    best = None
    for _ in range(10):
        mid = 0.5 * (lo + hi)
        p = with_bias(mid)
        result, _ = fn(p, audio, lengths)
        toks = float(jax.device_get(result.counts).sum())
        tps = toks / audio_seconds
        best = (p, tps)
        if TARGET_TOK_PER_S[0] <= tps <= TARGET_TOK_PER_S[1]:
            break
        if tps > TARGET_TOK_PER_S[1]:
            lo = mid  # emitting too much -> raise blank bias
        else:
            hi = mid
    return best


def main() -> None:
    import jax

    from fluidaudio_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

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

    audio_seconds = batch * window / 16000.0
    params, tok_per_s = _calibrate_blank_bias(
        fn, models, audio, lengths, audio_seconds
    )

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result, _ = fn(params, audio, lengths)
        jax.block_until_ready(result.tokens)
        best = min(best, time.perf_counter() - t0)

    rtfx = audio_seconds / best
    baseline = 155.6  # reference overall RTFx, M4 Pro
    print(
        json.dumps(
            {
                "metric": "parakeet_tdt_v3_batch_rtfx_per_chip",
                "value": round(rtfx, 1),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / baseline, 3),
                "tokens_per_second": round(tok_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
