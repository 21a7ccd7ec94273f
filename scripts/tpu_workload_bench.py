"""On-TPU throughput benchmarks for the per-workload paths (VAD, Sortformer).

Measures the single-dispatch redesigns against the reference's MacBook
numbers (reference Documentation/Benchmarks.md:290-326 VAD ~1,230x RT;
:752-760 Sortformer offline 2,884x RT) on the real chip. Run via axon relay:

    python scripts/tpu_workload_bench.py [--which vad,sortformer]

Timing notes (measured round-2 relay behavior, see BENCHMARKS.md):
`block_until_ready` alone can under-report through the tunnel — every
timed section ends by forcing a scalar `float(...)` readback.
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


def bench_vad() -> dict:
    from fluidaudio_tpu.vad import VadManager

    rng = np.random.RandomState(0)
    m = VadManager()
    utt60 = _speechish(rng, 60.0)

    # warm both shapes (compile excluded from timing)
    m.process(utt60)
    batch8 = [_speechish(rng, 60.0) for _ in range(8)]
    m.process_batch(batch8)

    def timed(fn, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            # results are host floats already (process converts); just fence
            assert out is not None
            best = min(best, time.perf_counter() - t0)
        return best

    t_single = timed(lambda: m.process(utt60))
    t_batch = timed(lambda: m.process_batch(batch8))
    return {
        "vad_single_60s_ms": round(t_single * 1e3, 2),
        "vad_single_rtfx": round(60.0 / t_single, 1),
        "vad_batch8_60s_ms": round(t_batch * 1e3, 2),
        "vad_batch8_rtfx": round(8 * 60.0 / t_batch, 1),
    }


def bench_sortformer() -> dict:
    from fluidaudio_tpu.diarizer.sortformer import SortformerDiarizer

    rng = np.random.RandomState(1)
    m = SortformerDiarizer()

    audio10m = _speechish(rng, 600.0)
    audio2m = _speechish(rng, 120.0)
    m.process_offline(audio10m)  # warm (21 windows -> bucket 32)
    m.process(audio2m)  # warm streaming scan (25 chunks -> bucket 32)

    def timed(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_off = timed(lambda: m.process_offline(audio10m))
    t_stream = timed(lambda: m.process(audio2m))
    return {
        "sortformer_offline_600s_ms": round(t_off * 1e3, 1),
        "sortformer_offline_rtfx": round(600.0 / t_off, 1),
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
