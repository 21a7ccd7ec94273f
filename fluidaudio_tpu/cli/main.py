"""CLI dispatcher.

Behavioral parity: reference `FluidAudioCLI.swift:32-108` (~35 commands) with
peak-RSS report on exit (:183-221). Commands land incrementally; unknown
commands list what exists.
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time

import numpy as np


def cmd_transcribe(args: argparse.Namespace) -> int:
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load(args.version, allow_random_init=args.allow_random_init)
    manager = AsrManager(models, ASRConfig(parallel_chunk_batch=args.batch))
    for path in args.audio:
        result = manager.transcribe(path)
        print(f"{path}: {result.text}")
        print(
            f"  duration {result.duration:.2f}s  rtfx {result.rtfx:.1f}x  "
            f"confidence {result.confidence:.3f}"
        )
    return 0


def cmd_vad_analyze(args: argparse.Namespace) -> int:
    from fluidaudio_tpu.utils.converter import AudioConverter
    from fluidaudio_tpu.vad.manager import VadManager
    from fluidaudio_tpu.vad.types import VadConfig, VadSegmentationConfig

    manager = VadManager(VadConfig(default_threshold=args.threshold))
    conv = AudioConverter()
    for path in args.audio:
        samples = conv.resample_file(path)
        t0 = time.perf_counter()
        segments = manager.segment_speech(samples, VadSegmentationConfig())
        dt = time.perf_counter() - t0
        dur = samples.size / 16000
        print(f"{path}: {len(segments)} speech segments  ({dur:.1f}s audio, {dur/dt:.0f}x RT)")
        for seg in segments:
            print(f"  {seg.start_time:8.2f} - {seg.end_time:8.2f}  ({seg.duration:.2f}s)")
    return 0


def cmd_download(args: argparse.Namespace) -> int:
    from fluidaudio_tpu.registry import DownloadUtils, Repo, required_models

    repo = Repo[args.repo.upper().replace("-", "_")]
    files = tuple(f"{m}.npz" for m in required_models(repo))
    print(f"downloading {repo.spec.name} -> {DownloadUtils.repo_dir(repo)}")
    DownloadUtils.download_repo(repo, files)
    return 0


def cmd_multi_stream(args: argparse.Namespace) -> int:
    """Transcribe N files as one batch (reference multi-stream command)."""
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load(args.version, allow_random_init=args.allow_random_init)
    manager = AsrManager(
        models, ASRConfig(parallel_chunk_batch=max(2, len(args.audio)))
    )
    t0 = time.perf_counter()
    results = [manager.transcribe(p) for p in args.audio]
    dt = time.perf_counter() - t0
    total = sum(r.duration for r in results)
    for path, r in zip(args.audio, results):
        print(f"{path}: {r.text[:80]}")
    print(f"total {total:.1f}s audio in {dt:.2f}s = {total/dt:.1f}x RT")
    return 0


def _peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="fluidaudio", description="TPU-native audio AI CLI")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("transcribe", help="batch ASR on audio files")
    p.add_argument("audio", nargs="+")
    p.add_argument("--version", default="v3")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--allow-random-init", action="store_true")
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("multi-stream", help="transcribe N files in parallel")
    p.add_argument("audio", nargs="+")
    p.add_argument("--version", default="v3")
    p.add_argument("--allow-random-init", action="store_true")
    p.set_defaults(fn=cmd_multi_stream)

    p = sub.add_parser("vad-analyze", help="voice activity segmentation")
    p.add_argument("audio", nargs="+")
    p.add_argument("--threshold", type=float, default=0.85)
    p.set_defaults(fn=cmd_vad_analyze)

    p = sub.add_parser("download", help="fetch model assets into the cache")
    p.add_argument("repo")
    p.set_defaults(fn=cmd_download)

    args = parser.parse_args(argv)
    try:
        code = args.fn(args)
    finally:
        print(f"peak memory: {_peak_rss_mb():.1f} MB", file=sys.stderr)
    return code


if __name__ == "__main__":
    sys.exit(main())
