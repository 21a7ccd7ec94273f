"""Tour of every workload family through the public API.

Runs with seeded random weights (no assets/network needed) on CPU or TPU:

    python examples/demo_all_workloads.py
"""

import numpy as np

from fluidaudio_tpu.utils import write_wav
from fluidaudio_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()
rng = np.random.RandomState(0)
speech_like = (rng.randn(16000 * 4) * 0.1).astype(np.float32)

# --- batch ASR (Parakeet TDT) ----------------------------------------------
from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.models.zoo import AsrModels

asr = AsrManager(
    AsrModels.load("test-tiny", allow_random_init=True),
    ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)),
)
result = asr.transcribe(speech_like)
print(f"[asr]        {result.duration:.1f}s -> {len(result.token_timings)} tokens, "
      f"{result.rtfx:.1f}x RT")

# --- VAD ---------------------------------------------------------------------
from fluidaudio_tpu.vad import VadManager

vad = VadManager()
segments = vad.segment_speech(speech_like)
print(f"[vad]        {len(segments)} speech segments")

# --- diarization (offline + timeline) ---------------------------------------
from fluidaudio_tpu.diarizer.offline import OfflineDiarizerManager

diar = OfflineDiarizerManager()
dresult = diar.process((rng.randn(16000 * 12) * 0.1).astype(np.float32))
print(f"[diarizer]   {len(dresult.segments)} segments, "
      f"{dresult.speaker_count} speakers, bottleneck={dresult.timings.bottleneck_stage}")

# --- speaker verification -----------------------------------------------------
from fluidaudio_tpu.diarizer.speaker_id import SpeakerVerifier

verifier = SpeakerVerifier()
verifier.enroll("demo", speech_like[:32000])
check = verifier.verify("demo", speech_like[:32000])
print(f"[speaker-id] same-audio similarity {check.similarity:.3f} "
      f"(match={check.is_match})")

# --- streaming ASR with EOU ---------------------------------------------------
from fluidaudio_tpu.asr.streaming_eou import StreamingEouAsrManager

eou = StreamingEouAsrManager(chunk_ms=320)
state = eou.make_state()
for piece in np.array_split(speech_like, 8):
    eou.process(piece, state)
final = eou.finish(state)
print(f"[streaming]  {len(final.token_ids)} final tokens")

# --- TTS + round trip ---------------------------------------------------------
from fluidaudio_tpu.tts import KokoroManager, tts_asr_roundtrip

tts = KokoroManager()
synth = tts.synthesize("hello from the TPU audio stack", voice="af_heart")
write_wav("/tmp/demo_tts.wav", synth.samples, synth.sample_rate)
rt = tts_asr_roundtrip(tts, asr, "testing one two three")
print(f"[tts]        {synth.duration:.2f}s audio -> /tmp/demo_tts.wav; "
      f"round-trip WER {rt.wer:.2f} (random weights)")

# --- other TTS backends (test-size configs keep the tour fast) ---------------
from fluidaudio_tpu.models.styletts2 import STYLETTS2_TEST
from fluidaudio_tpu.models.supertonic3 import SUPERTONIC3_TEST
from fluidaudio_tpu.tts.styletts2_manager import StyleTTS2Manager
from fluidaudio_tpu.tts.supertonic_manager import Supertonic3Manager

st2 = StyleTTS2Manager(STYLETTS2_TEST).synthesize("style transfer check")
s3 = Supertonic3Manager(SUPERTONIC3_TEST, total_steps=2).synthesize(
    "flow matching check", language="en")
print(f"[tts-alt]    styletts2 {st2.duration:.2f}s @ {st2.sample_rate} Hz; "
      f"supertonic3 {s3.duration:.2f}s @ {s3.sample_rate} Hz")

# --- ITN ----------------------------------------------------------------------
from fluidaudio_tpu.itn import TextNormalizer

tn = TextNormalizer()
print(f"[itn]        {tn.normalize('pay twenty five dollars on june third')!r}")

print("demo complete")
