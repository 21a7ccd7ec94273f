"""TTS -> ASR round-trip verification harness.

Behavioral parity: reference `tts-asr-verify` CLI command +
`KokoroAneAsrRoundtripTests` (SURVEY §4.6): synthesize text, transcribe it
with ASR, score WER between the input text and the transcript — a
model-level consistency check that works identically on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fluidaudio_tpu.metrics import normalize_for_scoring, wer
from fluidaudio_tpu.utils.converter import resample


@dataclass
class RoundTripResult:
    text: str
    transcript: str
    wer: float
    audio_seconds: float


def tts_asr_roundtrip(tts_manager, asr_manager, text: str, **tts_kwargs) -> RoundTripResult:
    """Synthesize `text` with `tts_manager`, transcribe with `asr_manager`,
    return the WER between normalized input and transcript."""
    synth = tts_manager.synthesize(text, **tts_kwargs)
    samples = np.asarray(synth.samples, np.float32)
    sr = getattr(synth, "sample_rate", 24_000)
    audio16k = resample(samples, sr, 16_000)
    result = asr_manager.transcribe(audio16k)
    ref = normalize_for_scoring(text)
    hyp = normalize_for_scoring(result.text)
    breakdown = wer(ref, hyp)
    return RoundTripResult(
        text=text,
        transcript=result.text,
        wer=breakdown.rate,
        audio_seconds=samples.size / sr,
    )
