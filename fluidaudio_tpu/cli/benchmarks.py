"""Dataset benchmark commands: ASR WER (LibriSpeech layout) and diarization
DER/JER (RTTM references).

Behavioral parity: reference `Commands/.../AsrBenchmark.swift` (LibriSpeech
test-clean/test-other WER + RTFx table) and `DiarizationBenchmark.swift`
(DER/JER vs RTTM with collar). Dataset download is egress-gated in this
environment, so both commands consume a local directory; the expected layouts
are documented in --help.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def _iter_librispeech(dataset_dir: Path):
    """Yield (utt_id, wav_path, reference_text) from a LibriSpeech-style tree:
    any `*.trans.txt` with lines `<utt-id> <TRANSCRIPT>` and `<utt-id>.wav`
    (or .flac pre-converted to wav) next to it."""
    for trans in sorted(dataset_dir.rglob("*.trans.txt")):
        for line in trans.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            utt_id, _, text = line.partition(" ")
            wav = trans.parent / f"{utt_id}.wav"
            if wav.exists():
                yield utt_id, wav, text


def cmd_asr_benchmark(args: argparse.Namespace) -> int:
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.metrics.text_normalizer import normalize_for_scoring
    from fluidaudio_tpu.metrics.wer import WerBreakdown, levenshtein
    from fluidaudio_tpu.models.zoo import AsrModels

    dataset_dir = Path(args.dataset_dir)
    utts = list(_iter_librispeech(dataset_dir))
    if args.max_files:
        utts = utts[: args.max_files]
    if not utts:
        print(f"no utterances found under {dataset_dir} "
              "(expected LibriSpeech layout: *.trans.txt + <utt>.wav; "
              "convert .flac to .wav first — no flac decoder in this env)")
        return 1

    models = AsrModels.load(args.version, allow_random_init=args.allow_random_init)
    manager = AsrManager(models, ASRConfig(parallel_chunk_batch=args.batch))

    agg = WerBreakdown(0, 0, 0, 0, 0)
    total_audio = 0.0
    total_wall = 0.0
    rows = []
    for utt_id, wav, ref in utts:
        t0 = time.perf_counter()
        result = manager.transcribe(wav)
        wall = time.perf_counter() - t0
        ref_n = normalize_for_scoring(ref).split()
        hyp_n = normalize_for_scoring(result.text).split()
        b = levenshtein(ref_n, hyp_n)
        agg = WerBreakdown(
            agg.errors + b.errors,
            agg.substitutions + b.substitutions,
            agg.insertions + b.insertions,
            agg.deletions + b.deletions,
            agg.reference_length + b.reference_length,
        )
        total_audio += result.duration
        total_wall += wall
        rows.append((utt_id, b.rate, result.duration / max(wall, 1e-9)))
        if args.verbose:
            print(f"  {utt_id}: wer {b.rate * 100:.2f}%  "
                  f"rtfx {result.duration / max(wall, 1e-9):.1f}x")

    summary = {
        "files": len(rows),
        "wer_pct": round(agg.rate * 100, 3),
        "substitutions": agg.substitutions,
        "deletions": agg.deletions,
        "insertions": agg.insertions,
        "reference_words": agg.reference_length,
        "audio_seconds": round(total_audio, 2),
        "rtfx": round(total_audio / max(total_wall, 1e-9), 1),
        "version": args.version,
    }
    print(json.dumps(summary))
    return 0


def _pair_rttm(dataset_dir: Path):
    """Yield (wav, rttm) pairs by matching basenames under a directory."""
    for rttm in sorted(dataset_dir.rglob("*.rttm")):
        wav = rttm.with_suffix(".wav")
        if wav.exists():
            yield wav, rttm


def cmd_diarization_benchmark(args: argparse.Namespace) -> int:
    from fluidaudio_tpu.diarizer.metrics import compute_der
    from fluidaudio_tpu.metrics.rttm import parse_rttm
    from fluidaudio_tpu.utils.converter import AudioConverter

    if args.audio and args.rttm:
        pairs = [(Path(args.audio), Path(args.rttm))]
    elif args.dataset_dir:
        pairs = list(_pair_rttm(Path(args.dataset_dir)))
    else:
        print("provide --audio + --rttm, or --dataset-dir with <name>.wav/<name>.rttm pairs")
        return 1
    if not pairs:
        print("no (wav, rttm) pairs found")
        return 1

    if args.mode == "offline":
        from fluidaudio_tpu.diarizer.offline import OfflineDiarizerManager

        manager = OfflineDiarizerManager()
    else:
        from fluidaudio_tpu.diarizer import DiarizerManager

        manager = DiarizerManager()

    conv = AudioConverter()
    ders, jers, rows = [], [], []
    total_audio = 0.0
    total_wall = 0.0
    for wav, rttm in pairs:
        samples = conv.resample_file(wav)
        reference = parse_rttm(rttm)
        t0 = time.perf_counter()
        result = manager.process(samples)
        wall = time.perf_counter() - t0
        der = compute_der(reference, result.segments, collar=args.collar)
        ders.append(der.der)
        jers.append(der.jer)
        total_audio += samples.size / 16000
        total_wall += wall
        rows.append((wav.name, der))
        if args.verbose:
            print(f"  {wav.name}: DER {der.der * 100:.2f}%  JER {der.jer * 100:.2f}%  "
                  f"(miss {der.miss * 100:.1f}% fa {der.false_alarm * 100:.1f}% "
                  f"conf {der.confusion * 100:.1f}%)")

    summary = {
        "files": len(rows),
        "der_pct": round(sum(ders) / len(ders) * 100, 3),
        "jer_pct": round(sum(jers) / len(jers) * 100, 3),
        "collar": args.collar,
        "mode": args.mode,
        "audio_seconds": round(total_audio, 2),
        "rtfx": round(total_audio / max(total_wall, 1e-9), 1),
    }
    print(json.dumps(summary))
    return 0


def register(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "asr-benchmark",
        help="WER benchmark over a local LibriSpeech-layout directory",
    )
    p.add_argument("--dataset-dir", required=True,
                   help="dir with *.trans.txt + <utt>.wav (LibriSpeech layout)")
    p.add_argument("--version", default="v3")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--max-files", type=int, default=0)
    p.add_argument("--allow-random-init", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_asr_benchmark)

    p = sub.add_parser(
        "diarization-benchmark",
        help="DER/JER benchmark vs RTTM references",
    )
    p.add_argument("--audio", help="single wav file")
    p.add_argument("--rttm", help="reference RTTM for --audio")
    p.add_argument("--dataset-dir", help="dir with <name>.wav/<name>.rttm pairs")
    p.add_argument("--mode", choices=["online", "offline"], default="offline")
    p.add_argument("--collar", type=float, default=0.25)
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_diarization_benchmark)

    p = sub.add_parser(
        "emission-delay-benchmark",
        help="streaming token emission-delay distribution (EOU pipeline)",
    )
    p.add_argument("--audio", help="wav file (default: synthetic tone bursts)")
    p.add_argument("--chunk-ms", type=int, default=160, choices=[160, 320, 1280])
    p.add_argument("--synthetic-seconds", type=float, default=8.0)
    p.set_defaults(fn=cmd_emission_delay_benchmark)


def cmd_emission_delay_benchmark(args: argparse.Namespace) -> int:
    """Streaming emission-delay benchmark (reference EmissionDelayBenchmark):
    for each token, delay = audio-time available when it was emitted minus the
    token's own audio timestamp; plus per-chunk compute latency."""
    import numpy as np

    from fluidaudio_tpu.asr.streaming_eou import StreamingEouAsrManager

    manager = StreamingEouAsrManager(chunk_ms=args.chunk_ms)
    chunk_ms = args.chunk_ms

    if args.audio:
        from fluidaudio_tpu.utils.converter import AudioConverter

        samples = AudioConverter().resample_file(args.audio)
    else:
        rng = np.random.RandomState(0)
        t = np.arange(int(16000 * args.synthetic_seconds)) / 16000.0
        # modulated tone bursts — produces nonzero mel energy patterns
        samples = (np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 1.5 * t) > 0)
                   * 0.3 + rng.randn(t.size) * 0.01).astype(np.float32)

    state = manager.make_state()
    feed = int(16000 * chunk_ms / 1000)
    delays, chunk_walls = [], []
    fed_ms = 0.0
    seen_tokens = 0
    for off in range(0, samples.size - feed + 1, feed):
        t0 = time.perf_counter()
        results = manager.process(samples[off : off + feed], state)
        chunk_walls.append((time.perf_counter() - t0) * 1000)
        fed_ms += chunk_ms
        for r in results:
            for ts in r.timestamps_ms[seen_tokens:]:
                delays.append(fed_ms - ts)
            seen_tokens = len(r.timestamps_ms)
    final = manager.finish(state)

    summary = {
        "tokens": len(delays),
        "emission_delay_p50_ms": round(float(np.percentile(delays, 50)), 1) if delays else None,
        "emission_delay_p90_ms": round(float(np.percentile(delays, 90)), 1) if delays else None,
        "emission_delay_mean_ms": round(float(np.mean(delays)), 1) if delays else None,
        "chunk_ms": chunk_ms,
        "chunk_compute_mean_ms": round(float(np.mean(chunk_walls)), 2) if chunk_walls else None,
        "audio_seconds": round(samples.size / 16000, 2),
        "final_text_len": len(final.text),
    }
    print(json.dumps(summary))
    return 0
