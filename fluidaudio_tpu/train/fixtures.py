"""Trained-tiny-fixture evaluation: the egress-free functional proof.

The reference proves its value with measured quality tables on real
checkpoints (`/root/reference/Documentation/Benchmarks.md:44-52` WER 2.5%,
`:570-591` DER 10.6%). Real weights are egress-gated in this environment, so
the committed fixtures (`fluidaudio_tpu/assets/trained_tiny/`, produced by
`scripts/train_tiny_fixtures.py` with the in-repo TDT loss on the
deterministic corpora in `train/tiny_corpus.py`) carry the functional proof
instead: tiny models that demonstrably transcribe / detect speech / diarize
through the FULL public manager paths — chunked windows, overlap merge,
hysteresis, stitching and all.

These evaluators are shared by the `synthetic-guardrail` CLI battery (real
quality gates, reference `offline-pipeline.yml` CI analog) and
`tests/test_trained_fixtures.py`. All corpora are seeded: scores reproduce
bit-identically per backend.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from fluidaudio_tpu.train import tiny_corpus as tc

#: quality gates the committed fixtures must clear (guardrail + tests)
ASR_WER_GATE = 0.02  # trained tiny TDT decodes its language at ~0 WER
VAD_F1_GATE = 0.90
DIAR_DER_GATE = 0.05
#: online diarizer gate is looser: the 900 ms warmup suppression and 500 ms
#: step granularity cost a few points even on a perfectly-fit corpus
LSEEND_DER_GATE = 0.10


def trained_assets_dir() -> Path:
    return Path(__file__).resolve().parent.parent / "assets" / "trained_tiny"


_CORE_FAMILIES = ("asr", "vad", "sortformer")

_FIXTURE_FILES = {
    "asr": ("asr/encoder.npz", "asr/predictor.npz", "asr/joint.npz",
            "asr/vocab.json"),
    "vad": ("vad/silero_vad.npz",),
    "sortformer": ("sortformer/encoder.npz",),
    "sensevoice": ("sensevoice/encoder.npz", "sensevoice/vocab.json"),
    "paraformer": ("paraformer/model.npz", "paraformer/vocab.json"),
    "cohere": ("cohere/encoder.npz", "cohere/decoder.npz", "cohere/vocab.json"),
    "eou": ("eou/encoder.npz", "eou/predictor.npz", "eou/joint.npz",
            "eou/vocab.json"),
    "lseend": ("lseend/model.npz",),
    "offline": ("offline/segmentation.npz", "offline/embedding.npz",
                "offline/plda_rho.npz"),
}


def fixtures_available(*families: str) -> bool:
    """No args = the three core families (ASR/VAD/sortformer)."""
    base = trained_assets_dir()
    for fam in families or _CORE_FAMILIES:
        if not all((base / f).exists() for f in _FIXTURE_FILES[fam]):
            return False
    return True


# ------------------------------------------------------------------------
# Tiny per-family fixture conventions (shared by the training script, the
# guardrail, and tests — one source of truth for token-id maps and configs).
# ------------------------------------------------------------------------

#: SenseVoice: CTC blank is id 0 (FunASR convention), words at 1..16
SENSEVOICE_WORD_OFFSET = 1
#: Paraformer: id 0 reserved as pad, words at 1..16
PARAFORMER_WORD_OFFSET = 1
#: Cohere: ids 0-4 are special (pad 2, eos 3, bos 4), words at 5..20
COHERE_WORD_OFFSET = 5


def cohere_tiny_config():
    """COHERE_TEST widened to a usable audio window (5.12 s) so multi-word
    utterances fit, and to 32 mel bins — 16 bins over 0-8 kHz cannot separate
    the two lowest tone words (240 vs 290 Hz land in one bin). Everything
    else stays test-tiny."""
    from dataclasses import replace

    from fluidaudio_tpu.models.cohere_asr import COHERE_TEST

    return replace(COHERE_TEST, max_audio_frames=512, max_decode_tokens=16,
                   n_mels=32)


def write_family_vocab(path: Path, offset: int, specials: dict[int, str]) -> None:
    """id -> piece JSON: 16 tone words at `offset`, named specials, fillers."""
    import json

    vocab = dict(specials)
    for i in range(tc.N_WORDS):
        vocab[offset + i] = "▁" + tc.word_text(i)
    for i in range(64):
        vocab.setdefault(i, f"▁unused{i}")
    path.write_text(json.dumps({str(k): v for k, v in sorted(vocab.items())},
                               ensure_ascii=False))


def eval_asr_fixture(
    n_words: tuple[int, ...] = (5, 40), seed: int = 12345, batch: int = 2
) -> dict[str, float]:
    """WER through the FULL AsrManager.transcribe path (chunked long-form,
    silence-aligned starts, seam merge) on held-out utterances of the
    trained 16-tone-word language. Returns per-length + average WER."""
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.metrics.wer import wer
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load(
        "test-tiny", checkpoint_dir=trained_assets_dir() / "asr",
        allow_random_init=False,
    )
    mgr = AsrManager(models, ASRConfig(parallel_chunk_batch=batch))
    rs = np.random.RandomState(seed)
    out: dict[str, float] = {}
    rates = []
    for n in n_words:
        ids = rs.randint(0, tc.N_WORDS, size=n)
        audio = tc.make_utterance(ids, rs)
        r = wer(tc.transcript_text(ids), mgr.transcribe(audio).text).rate
        out[f"wer_{n}w"] = r
        rates.append(r)
    out["wer_avg"] = float(np.mean(rates))
    return out


def eval_vad_fixture(seed: int = 777, clips: int = 12) -> float:
    """Clip-level F1 of the trained tiny Silero through VadManager.process
    on held-out synthetic speech/nonspeech."""
    from fluidaudio_tpu.vad import VadManager

    mgr = VadManager(checkpoint_dir=trained_assets_dir() / "vad")
    rs = np.random.RandomState(seed)
    tp = fp = fn = 0
    for i in range(clips):
        speech = i % 2 == 0
        if speech:
            clip = tc.speechish(2.0, rs) if i % 4 == 0 else tc.make_utterance(
                rs.randint(0, tc.N_WORDS, size=4), rs, noise=0.0)
        else:
            clip = (rs.randn(32000) * 0.003).astype(np.float32)
        results = mgr.process(clip)
        pred = bool(np.mean([r.probability for r in results]) >= 0.5)
        tp += pred and speech
        fp += pred and not speech
        fn += (not pred) and speech
    return 2 * tp / max(2 * tp + fp + fn, 1)


def eval_sortformer_fixture(seed: int = 4242, seconds: float = 60.0) -> float:
    """DER of the trained tiny Sortformer through the full offline pipeline
    (windowing, speaker-slot tracking, segment reconstruction) on a held-out
    2-speaker synthetic mixture."""
    from fluidaudio_tpu.diarizer.metrics import compute_der
    from fluidaudio_tpu.diarizer.sortformer import SortformerDiarizer
    from fluidaudio_tpu.diarizer.types import TimedSpeakerSegment
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST

    rs = np.random.RandomState(seed)
    mix, ref, _ = tc.diarizer_mixture(rs, seconds, overlap_prob=0.0)
    diar = SortformerDiarizer(
        SORTFORMER_TEST, checkpoint_dir=trained_assets_dir() / "sortformer"
    )
    result = diar.process_offline(mix)
    refs = [TimedSpeakerSegment(speaker_id=s, start_time=a, end_time=b)
            for s, a, b in ref]
    return compute_der(refs, result.segments, collar=0.25).der


def eval_sensevoice_fixture(seed: int = 321, n_utts: int = 6) -> float:
    """WER through SenseVoiceManager.transcribe (mel -> LFR -> SANM -> CTC
    greedy, bucketed shapes, tag stripping) on held-out utterances."""
    from fluidaudio_tpu.asr.sensevoice_manager import SenseVoiceManager
    from fluidaudio_tpu.metrics.wer import wer
    from fluidaudio_tpu.models.sensevoice import SENSEVOICE_TEST

    mgr = SenseVoiceManager(SENSEVOICE_TEST,
                            checkpoint_dir=trained_assets_dir() / "sensevoice")
    rs = np.random.RandomState(seed)
    rates = []
    for _ in range(n_utts):
        ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 9)))
        audio = tc.make_utterance(ids, rs)
        hyp = mgr.transcribe(audio).text
        rates.append(wer(tc.transcript_text(ids), hyp).rate)
    return float(np.mean(rates))


def eval_paraformer_fixture(seed: int = 654, n_utts: int = 6) -> float:
    """WER through ParaformerManager.transcribe (LFR -> SANM -> CIF ->
    parallel decoder) on held-out utterances."""
    from fluidaudio_tpu.asr.paraformer_manager import ParaformerManager
    from fluidaudio_tpu.metrics.wer import wer
    from fluidaudio_tpu.models.paraformer import PARAFORMER_TEST

    mgr = ParaformerManager(PARAFORMER_TEST,
                            checkpoint_dir=trained_assets_dir() / "paraformer")
    rs = np.random.RandomState(seed)
    rates = []
    for _ in range(n_utts):
        ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 9)))
        audio = tc.make_utterance(ids, rs)
        hyp = mgr.transcribe(audio).text
        rates.append(wer(tc.transcript_text(ids), hyp).rate)
    return float(np.mean(rates))


def eval_eou_fixture(seed: int = 2468, n_utts: int = 6) -> dict[str, float]:
    """WER + EOU-detection rate through the FULL StreamingEouAsrManager path
    (chunked feed, mel pre-cache, conformer channel/time caches, incremental
    RNN-T decode, finish() flush) on held-out utterances at the trained
    320 ms tier. The EOU token must fire (debounced flag) for each utterance
    and must NOT leak into the transcript text."""
    from fluidaudio_tpu.asr.streaming_eou import EOU_TEST, StreamingEouAsrManager
    from fluidaudio_tpu.metrics.wer import wer

    eou_events: list = []
    mgr = StreamingEouAsrManager(
        chunk_ms=320, spec=EOU_TEST,
        checkpoint_dir=trained_assets_dir() / "eou",
        on_eou=lambda p: eou_events.append(p),
    )
    rs = np.random.RandomState(seed)
    rates, detected = [], 0
    # EOU is silence-driven (reference ParakeetEouCommand.swift:22): in a
    # live stream the mic stays open after the speaker stops, so each
    # utterance is followed by ~1.3 s of open-mic silence — the trained
    # detection deadline is ~1 s after utterance end
    tail = np.zeros(int(1.28 * 16_000), np.float32)
    for _ in range(n_utts):
        ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 8)))
        audio = np.concatenate([tc.make_utterance(ids, rs), tail])
        state = mgr.make_state()
        eou_events.clear()
        mgr.process(audio, state)
        final = mgr.finish(state)
        rates.append(wer(tc.transcript_text(ids), final.text).rate)
        detected += bool(eou_events)
    return {"wer_avg": float(np.mean(rates)),
            "eou_detect_rate": detected / n_utts}


def offline_tiny_configs():
    """(SegmentationConfig, WeSpeakerConfig) for the trained offline-diarizer
    fixture: same topologies as the shipping models (powerset conv+attention
    segmentation, ResNet+TSTP embedder), reduced widths/depths."""
    from fluidaudio_tpu.models.pyannote_seg import SegmentationConfig
    from fluidaudio_tpu.models.wespeaker import WeSpeakerConfig

    seg = SegmentationConfig(conv_channels=(16, 32, 32, 32), d_model=32,
                             n_attention_layers=1, n_heads=4)
    emb = WeSpeakerConfig(channels=(8, 16, 32, 32),
                          blocks_per_stage=(1, 1, 1, 1), embedding_dim=32)
    return seg, emb


def eval_offline_diarizer_fixture(seed: int = 13579,
                                  seconds: float = 60.0) -> float:
    """DER through the FULL offline pipeline on trained tiny models:
    batched powerset segmentation -> masked-stats embeddings -> fitted PLDA
    -> AHC warm start -> VBx HMM refinement -> segment reconstruction
    (reference OfflineDiarizerManager.process, Benchmarks.md:570-591)."""
    from fluidaudio_tpu.diarizer.metrics import compute_der
    from fluidaudio_tpu.diarizer.offline.manager import OfflineDiarizerManager
    from fluidaudio_tpu.diarizer.types import TimedSpeakerSegment

    seg_cfg, emb_cfg = offline_tiny_configs()
    mgr = OfflineDiarizerManager(
        checkpoint_dir=trained_assets_dir() / "offline",
        seg_config=seg_cfg, emb_config=emb_cfg,
    )
    rs = np.random.RandomState(seed)
    mix, ref, _ = tc.diarizer_mixture(rs, seconds, overlap_prob=0.0)
    result = mgr.process(mix)
    refs = [TimedSpeakerSegment(speaker_id=s, start_time=a, end_time=b)
            for s, a, b in ref]
    return compute_der(refs, result.segments, collar=0.25).der


def eval_lseend_fixture(seed: int = 8642, seconds: float = 60.0) -> float:
    """DER of the trained tiny LS-EEND through the FULL LSEENDDiarizer.process
    path (16 kHz resample -> per-step mel+CMN -> recurrent attractor steps ->
    segment reconstruction) on a held-out 2-speaker mixture. Online model:
    the 900 ms warmup suppression is part of the measured DER."""
    from fluidaudio_tpu.diarizer.lseend import LSEENDDiarizer
    from fluidaudio_tpu.diarizer.metrics import compute_der
    from fluidaudio_tpu.diarizer.types import TimedSpeakerSegment
    from fluidaudio_tpu.models.lseend import LSEEND_TEST

    rs = np.random.RandomState(seed)
    mix, ref, _ = tc.diarizer_mixture(rs, seconds, overlap_prob=0.0)
    diar = LSEENDDiarizer(LSEEND_TEST, step_ms=500,
                          checkpoint_dir=trained_assets_dir() / "lseend")
    result = diar.process(mix)
    refs = [TimedSpeakerSegment(speaker_id=s, start_time=a, end_time=b)
            for s, a, b in ref]
    return compute_der(refs, result.segments, collar=0.25).der


def eval_cohere_fixture(seed: int = 987, n_utts: int = 6) -> float:
    """WER through CoherePipeline.transcribe (conformer encoder -> KV-cache
    AR decode with repetition penalty) on held-out utterances."""
    from fluidaudio_tpu.asr.cohere_manager import CoherePipeline
    from fluidaudio_tpu.metrics.wer import wer

    mgr = CoherePipeline(cohere_tiny_config(),
                         checkpoint_dir=trained_assets_dir() / "cohere")
    rs = np.random.RandomState(seed)
    rates = []
    for _ in range(n_utts):
        ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 8)))
        audio = tc.make_utterance(ids, rs)
        hyp = mgr.transcribe(audio).text
        rates.append(wer(tc.transcript_text(ids), hyp).rate)
    return float(np.mean(rates))
