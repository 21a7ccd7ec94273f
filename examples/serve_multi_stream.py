"""Ragged multi-stream streaming-ASR serving demo.

Simulates the realistic serving shape the reference handles with N
independent manager instances (`MultiStreamCommand.swift`): callers join
and leave mid-session and deliver audio at unequal rates. Here all N slots
run as ONE jitted chunk step per tick — rows without a full buffered chunk
carry a False entry in the step's active mask, so their caches/decoder
state freeze and per-stream transcripts are identical to solo runs
(tests/test_multi_stream.py pins that invariance).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/serve_multi_stream.py
(or plain `python` on the TPU host).
"""

import os
import sys

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import time

import numpy as np

from fluidaudio_tpu.asr.multi_stream import MultiStreamEouManager
from fluidaudio_tpu.models.conformer_streaming import StreamingConformerConfig

# small config keeps the demo snappy; drop enc_cfg for the real 120M model
TINY = StreamingConformerConfig(
    d_model=64, n_layers=2, n_heads=4, att_context_left=16, subsampling_channels=16
)

rng = np.random.RandomState(0)
manager = MultiStreamEouManager(n_streams=4, chunk_ms=320, enc_cfg=TINY)

# three callers with different rates; slot 3 joins late
manager.streams[3].ended = True
rates = [1.0, 0.5, 2.0]  # seconds of audio delivered per tick
clock = 0

t0 = time.perf_counter()
for tick in range(8):
    for idx, rate in enumerate(rates):
        manager.feed(idx, (rng.randn(int(16000 * rate)) * 0.1).astype(np.float32))
    if tick == 3:
        late = manager.open_stream()
        print(f"tick {tick}: caller joined -> slot {late}")
        rates.append(1.0)
    if tick == 5:
        manager.close_stream(1)
        print(f"tick {tick}: caller left  -> slot 1 freed")
        rates[1] = 0.0
    while manager.ready:
        manager.tick()
        clock += 1

dt = time.perf_counter() - t0
for i in range(manager.n):
    text = manager.transcript(i)
    print(f"slot {i}: {len(text.split())} words  {text[:60]!r}")
print(f"{clock} batched ticks for 4 ragged streams in {dt:.2f}s "
      "(one device call per tick, all slots)")
