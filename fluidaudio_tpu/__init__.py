"""FluidAudio-TPU: a TPU-native local audio AI stack in JAX/XLA/Pallas.

Capability parity target: FluidInference/FluidAudio (Swift/CoreML/ANE) —
ASR (batch + streaming), TTS, VAD, speaker diarization, speaker embedding/ID,
and ITN. The opaque CoreML graphs of the reference become explicit JAX models;
the decode loops become `lax.scan`/`lax.while_loop`; long-form audio is handled
by windowing expressed as a batch dimension over a `jax.sharding.Mesh`.

Layering (mirrors reference SURVEY.md §1, re-designed TPU-first):
  registry/   model + dataset catalog, cache, offline mode
  utils/      audio I/O, resampling, ring buffers, logging, timing
  ops/        frontends (STFT/log-mel), decode loops (TDT/RNN-T/CTC), DSP
  models/     explicit JAX networks (conformer, LSTM predictor+joint, VAD, ...)
  parallel/   mesh construction, sharding rules, collectives, train step
  asr/ vad/ diarizer/ tts/ itn/   workload managers (public API)
  cli/        command-line dispatcher + benchmarks
"""

__version__ = "0.1.0"

from fluidaudio_tpu.utils.logging import get_logger  # noqa: F401

# Persistent XLA compilation cache, on by default: first compiles of the big
# pipelines are minutes-scale on this class of hardware; every later process
# must start warm. FLUID_NO_JAX_CACHE=1 opts out. (Measured: 46 s -> 11 s for
# a mid-size pipeline's first call; 240 s -> ~1 s for the 0.6B long-form
# pipeline.)
from fluidaudio_tpu.utils.compilation_cache import enable_compilation_cache as _ecc

_ecc()
del _ecc
