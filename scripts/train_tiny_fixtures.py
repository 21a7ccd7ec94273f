"""Train the committed tiny fixtures (functional end-to-end proof).

Trains three tiny models with the in-repo losses on the deterministic
synthetic corpora (`train/tiny_corpus.py`) and writes their checkpoints to
`fluidaudio_tpu/assets/trained_tiny/{asr,vad,sortformer}/`:

  asr        zoo `test-tiny` TDT stack (conformer + LSTM predictor + joint)
             trained with `train.transducer_loss.tdt_loss` on the 16-tone-word
             language at the EXACT long-form chunk window (239,360 samples) so
             the chunked AsrManager path decodes it at ~0 WER.
  vad        Silero-V5-topology network trained with frame BCE on synthetic
             speech/nonspeech.
  sortformer SORTFORMER_TEST trained with arrival-order BCE on 2-speaker
             mixtures (30.72 s offline windows).

After each family trains, the script evaluates through the FULL public
manager (AsrManager.transcribe chunked + merged, VadManager.process,
SortformerDiarizer.process_offline) and prints WER / F1 / DER. Run on any
backend; checkpoints are plain npz (f32) and load everywhere.

Usage: python scripts/train_tiny_fixtures.py [asr|vad|sortformer|all] [--steps N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ASSETS = REPO / "fluidaudio_tpu" / "assets" / "trained_tiny"

import jax
import jax.numpy as jnp
import optax

from fluidaudio_tpu.train import tiny_corpus as tc
from fluidaudio_tpu.utils.checkpoint import save_params

CHUNK_WINDOW = 239_360  # ChunkLayout.window_samples for the long-form path


# ------------------------------------------------------------------- ASR


def train_asr(steps: int, batch: int = 8, lr: float = 2e-3, seed: int = 0) -> Path:
    from dataclasses import replace

    from fluidaudio_tpu.models.zoo import ASR_VERSIONS
    from fluidaudio_tpu.ops.mel import MelFrontend
    from fluidaudio_tpu.parallel.train import create_tdt_train_state, make_tdt_train_step

    spec = ASR_VERSIONS["test-tiny"]
    ccfg = replace(spec.conformer, attention_backend="xla")  # differentiable path
    pcfg = spec.predictor
    mel = MelFrontend(spec.mel)
    mel_frames = CHUNK_WINDOW // spec.mel.hop_length + 1

    rng = jax.random.PRNGKey(seed)
    state, modules, tx = create_tdt_train_state(rng, ccfg, pcfg, mel_frames, lr)
    durations = (0, 1, 2, 3, 4)
    step_fn = jax.jit(make_tdt_train_step(modules, pcfg, tx, durations))
    mel_fn = jax.jit(lambda a, l: mel(a, l))

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        b = tc.asr_batch(rs, batch, CHUNK_WINDOW)
        m, mlen = mel_fn(jnp.asarray(b["audio"]), jnp.asarray(b["audio_lengths"]))
        state, metrics = step_fn(
            state,
            {
                "mel": m,
                "mel_lengths": mlen,
                "labels": jnp.asarray(b["labels"]),
                "label_lengths": jnp.asarray(b["label_lengths"]),
            },
        )
        if i % 25 == 0 or i == steps - 1:
            print(f"asr step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = ASSETS / "asr"
    out.mkdir(parents=True, exist_ok=True)
    for part in ("encoder", "predictor", "joint"):
        save_params(out / f"{part}.npz", jax.device_get(state.params[part]))
    tc.write_vocab_json(out / "vocab.json")
    print(f"asr checkpoints -> {out}")
    return out


def eval_asr(ckpt_dir: Path, seed: int = 12345) -> float:
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.metrics.wer import wer
    from fluidaudio_tpu.models.zoo import AsrModels

    models = AsrModels.load("test-tiny", checkpoint_dir=ckpt_dir,
                            allow_random_init=False)
    mgr = AsrManager(models, ASRConfig(parallel_chunk_batch=2))
    rs = np.random.RandomState(seed)
    rates = []
    # short single-window + long chunked utterances
    for n_words in (5, 40, 90):
        ids = rs.randint(0, tc.N_WORDS, size=n_words)
        audio = tc.make_utterance(ids, rs)
        ref = tc.transcript_text(ids)
        hyp = mgr.transcribe(audio).text
        r = wer(ref, hyp).rate
        rates.append(r)
        print(f"asr eval {n_words} words ({audio.size/16000:.1f}s): WER {r*100:.2f}%")
        if r > 0:
            print(f"  ref: {ref}")
            print(f"  hyp: {hyp}")
    avg = float(np.mean(rates))
    print(f"asr eval avg WER {avg*100:.2f}%")
    return avg


# ------------------------------------------------------------------- VAD


def train_vad(steps: int, batch: int = 16, n_frames: int = 64,
              lr: float = 1e-3, seed: int = 0) -> Path:
    from fluidaudio_tpu.models.silero_vad import SileroV5Config, SileroVadV5, vad_frame_program

    cfg = SileroV5Config()
    model = SileroVadV5(cfg)
    rng = jax.random.PRNGKey(seed)
    params = model.init(
        rng, jnp.zeros((1, cfg.window_size)), jnp.zeros((1, cfg.hidden)),
        jnp.zeros((1, cfg.hidden)),
    )
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    def loss_fn(p, audio, labels):
        h0 = jnp.zeros((audio.shape[0], cfg.hidden))
        probs, _, _ = vad_frame_program(model, p, audio, h0, h0)
        probs = jnp.clip(probs, 1e-6, 1 - 1e-6)
        bce = -(labels * jnp.log(probs) + (1 - labels) * jnp.log1p(-probs))
        return jnp.mean(bce)

    @jax.jit
    def step_fn(p, o, audio, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, audio, labels)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        audio, labels = tc.vad_batch(rs, batch, n_frames)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(audio), jnp.asarray(labels))
        if i % 50 == 0 or i == steps - 1:
            print(f"vad step {i}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    out = ASSETS / "vad"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "silero_vad.npz", jax.device_get(params))
    print(f"vad checkpoint -> {out}")
    return out


def eval_vad(ckpt_dir: Path, seed: int = 777) -> float:
    from fluidaudio_tpu.vad import VadManager

    mgr = VadManager(checkpoint_dir=ckpt_dir)
    rs = np.random.RandomState(seed)
    tp = fp = fn = tn = 0
    for i in range(12):
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
        tn += (not pred) and not speech
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    print(f"vad eval: clip F1 {f1*100:.1f}% (tp={tp} fp={fp} fn={fn} tn={tn})")
    return f1


# ------------------------------------------------------------- sortformer


def train_sortformer(steps: int, batch: int = 4, lr: float = 1e-3,
                     seed: int = 0) -> Path:
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST, SortformerModel
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend

    cfg = SORTFORMER_TEST
    model = SortformerModel(cfg)
    mel = MelFrontend(MelConfig(n_mels=cfg.n_mels, normalize=None))
    mel_window = 3072  # 30.72 s offline window

    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, cfg.n_mels, mel_window)))
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    def loss_fn(p, mel_x, labels):
        preds = model.apply(p, mel_x)  # [B, T, 4] sigmoid
        T = min(preds.shape[1], labels.shape[1])
        pr = jnp.clip(preds[:, :T], 1e-6, 1 - 1e-6)
        lb = labels[:, :T]
        return jnp.mean(-(lb * jnp.log(pr) + (1 - lb) * jnp.log1p(-pr)))

    @jax.jit
    def step_fn(p, o, audio, labels):
        lens = jnp.full((audio.shape[0],), audio.shape[1], jnp.int32)
        mel_x, _ = mel(audio, lens)
        loss, grads = jax.value_and_grad(loss_fn)(p, mel_x[:, :, :mel_window], labels)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        audio, labels = tc.sortformer_batch(rs, batch, mel_window)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(audio), jnp.asarray(labels))
        if i % 25 == 0 or i == steps - 1:
            print(f"sortformer step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "sortformer"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "encoder.npz", jax.device_get(params))
    print(f"sortformer checkpoint -> {out}")
    return out


def eval_sortformer(ckpt_dir: Path, seed: int = 4242) -> float:
    from fluidaudio_tpu.diarizer.metrics import compute_der
    from fluidaudio_tpu.diarizer.sortformer import SortformerDiarizer
    from fluidaudio_tpu.diarizer.types import TimedSpeakerSegment
    from fluidaudio_tpu.models.sortformer import SORTFORMER_TEST

    rs = np.random.RandomState(seed)
    mix, ref, _ = tc.diarizer_mixture(rs, 60.0, overlap_prob=0.0)
    diar = SortformerDiarizer(SORTFORMER_TEST, checkpoint_dir=ckpt_dir)
    result = diar.process_offline(mix)
    refs = [TimedSpeakerSegment(speaker_id=s, start_time=a, end_time=b)
            for s, a, b in ref]
    der = compute_der(refs, result.segments, collar=0.25)
    print(f"sortformer eval: DER {der.der*100:.2f}% "
          f"({len(result.segments)} segments, {result.speaker_count} speakers)")
    return der.der


# ------------------------------------------------------------------ main


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("family", nargs="?", default="all",
                    choices=["asr", "vad", "sortformer", "all"])
    ap.add_argument("--steps", type=int, default=0, help="override step count")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    fams = ["asr", "vad", "sortformer"] if args.family == "all" else [args.family]
    defaults = {"asr": 700, "vad": 500, "sortformer": 500}
    print(f"backend: {jax.default_backend()}")
    for fam in fams:
        steps = args.steps or defaults[fam]
        out = ASSETS / fam
        if not args.eval_only:
            if fam == "asr":
                out = train_asr(steps)
            elif fam == "vad":
                out = train_vad(steps)
            else:
                out = train_sortformer(steps)
        if fam == "asr":
            eval_asr(out)
        elif fam == "vad":
            eval_vad(out)
        else:
            eval_sortformer(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
