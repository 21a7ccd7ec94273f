"""Inverse text normalization public API.

Behavioral parity: reference `ITN/TextNormalizer.swift:21,76-133` — binds the
native rule engine (`nemo_normalize`) with graceful degradation when the
library is absent (`is_native_available == False` => passthrough); single
expression and sentence sliding-window modes.
"""

from __future__ import annotations

import ctypes
import re

from fluidaudio_tpu.native import load_native


class TextNormalizer:
    def __init__(self, language: str = "en"):
        self.language = language
        self._lib = load_native()
        # the full ABI triple must be present — a version-skewed library
        # with only some symbols degrades to passthrough, not AttributeError
        needed = ("nemo_normalize", "nemo_normalize_free", "nemo_normalize_supports")
        if self._lib is not None and all(hasattr(self._lib, n) for n in needed):
            self._lib.nemo_normalize.restype = ctypes.c_void_p
            self._lib.nemo_normalize.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            self._lib.nemo_normalize_free.argtypes = [ctypes.c_void_p]
            self._lib.nemo_normalize_supports.restype = ctypes.c_int
            self._lib.nemo_normalize_supports.argtypes = [ctypes.c_char_p]
        else:
            self._lib = None

    @property
    def is_native_available(self) -> bool:
        return self._lib is not None

    def supports(self, language: str | None = None) -> bool:
        lang = (language or self.language).encode()
        if self._lib is None:
            return False
        return bool(self._lib.nemo_normalize_supports(lang))

    def normalize(self, text: str, language: str | None = None) -> str:
        """Single-expression normalization; passthrough when native is absent."""
        if self._lib is None or not text:
            return text
        lang = (language or self.language).encode()
        ptr = self._lib.nemo_normalize(text.encode("utf-8"), lang)
        if not ptr:
            return text
        try:
            return ctypes.string_at(ptr).decode("utf-8")
        finally:
            self._lib.nemo_normalize_free(ptr)

    def normalize_sentences(self, text: str, language: str | None = None) -> str:
        """Sentence sliding-window mode: normalize sentence by sentence so one
        bad span cannot corrupt the whole transcript."""
        if self._lib is None or not text:
            return text
        parts = re.split(r"(?<=[.!?])\s+", text)
        return " ".join(self.normalize(p, language) for p in parts)
