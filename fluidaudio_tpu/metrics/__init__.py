from fluidaudio_tpu.metrics.wer import wer, cer, levenshtein, WerBreakdown
from fluidaudio_tpu.metrics.text_normalizer import normalize_for_scoring
from fluidaudio_tpu.metrics.rttm import parse_rttm, write_rttm

__all__ = [
    "wer",
    "cer",
    "levenshtein",
    "WerBreakdown",
    "normalize_for_scoring",
    "parse_rttm",
    "write_rttm",
]
