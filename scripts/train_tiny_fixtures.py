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


# ----------------------------------------------------------- sensevoice


def train_sensevoice(steps: int, batch: int = 8, lr: float = 2e-3,
                     seed: int = 0) -> Path:
    """Tiny SANM+CTC on the tone-word language (optax.ctc_loss, blank 0)."""
    from fluidaudio_tpu.models.sensevoice import (
        SENSEVOICE_TEST, SenseVoiceEncoder, lfr_stack,
    )
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
    from fluidaudio_tpu.train import fixtures as fx

    cfg = SENSEVOICE_TEST
    enc = SenseVoiceEncoder(cfg)
    mel = MelFrontend(MelConfig(n_mels=80, normalize="per_feature"))
    window = 5 * 16000  # 5 s bucket
    u_max = 10

    params = jax.jit(enc.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16, 560), jnp.float32),
        jnp.array([16], jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    def loss_fn(p, audio, lengths, labels, label_lens):
        m, mlen = mel(audio, lengths)
        lfr, lfr_len = lfr_stack(m, mlen)
        log_probs = enc.apply(p, lfr, lfr_len, jnp.zeros_like(lengths))
        total = lfr_len + 4  # PROMPT_LEN rows also produce (blank) frames
        T = log_probs.shape[1]
        logit_pad = (jnp.arange(T)[None, :] >= total[:, None]).astype(jnp.float32)
        label_pad = (jnp.arange(labels.shape[1])[None, :]
                     >= label_lens[:, None]).astype(jnp.float32)
        per = optax.ctc_loss(log_probs, logit_pad, labels, label_pad, blank_id=0)
        return jnp.mean(per / jnp.maximum(label_lens, 1))

    @jax.jit
    def step_fn(p, o, audio, lengths, labels, label_lens):
        loss, grads = jax.value_and_grad(loss_fn)(p, audio, lengths, labels,
                                                  label_lens)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        b = tc.asr_batch(rs, batch, window, min_words=2, max_words=8, u_max=u_max)
        labels = np.where(
            np.arange(u_max)[None, :] < b["label_lengths"][:, None],
            b["labels"] + fx.SENSEVOICE_WORD_OFFSET, 0,
        )
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(b["audio"]),
            jnp.asarray(b["audio_lengths"]), jnp.asarray(labels),
            jnp.asarray(b["label_lengths"]),
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"sensevoice step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "sensevoice"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "encoder.npz", jax.device_get(params))
    fx.write_family_vocab(out / "vocab.json", fx.SENSEVOICE_WORD_OFFSET,
                          {0: "<blank>"})
    print(f"sensevoice checkpoint -> {out}")
    return out


def eval_sensevoice(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    w = fx.eval_sensevoice_fixture()
    print(f"sensevoice eval avg WER {w*100:.2f}%")
    return w


# ----------------------------------------------------------- paraformer


def train_paraformer(steps: int, batch: int = 8, lr: float = 2e-3,
                     seed: int = 0) -> Path:
    """Tiny SANM+CIF+decoder: CE on decoder logits (CIF length-scaled to the
    label count during training) + FunASR quantity MAE on the fire count."""
    from fluidaudio_tpu.models.paraformer import PARAFORMER_TEST, Paraformer
    from fluidaudio_tpu.models.sensevoice import lfr_stack
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
    from fluidaudio_tpu.train import fixtures as fx

    cfg = PARAFORMER_TEST
    model = Paraformer(cfg)
    mel = MelFrontend(MelConfig(n_mels=80, normalize="per_feature"))
    window = 5 * 16000
    u_max = 10

    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16, 560), jnp.float32),
        jnp.array([16], jnp.int32),
    )
    # cosine decay: late-training stability matters for CIF — the fire count
    # must be exact at inference, so the end state must sit in a minimum
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, audio, lengths, labels, label_lens):
        m, mlen = mel(audio, lengths)
        lfr, lfr_len = lfr_stack(m, mlen)
        logits, _, alpha_sum = model.apply(p, lfr, lfr_len,
                                           target_lengths=label_lens)
        U = cfg.max_tokens
        lab = jnp.zeros((labels.shape[0], U), jnp.int32)
        lab = lab.at[:, : labels.shape[1]].set(labels)
        mask = jnp.arange(U)[None, :] < label_lens[:, None]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
        ce = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)
        qty = jnp.mean(jnp.abs(alpha_sum - label_lens))
        return ce + 0.5 * qty

    @jax.jit
    def step_fn(p, o, audio, lengths, labels, label_lens):
        loss, grads = jax.value_and_grad(loss_fn)(p, audio, lengths, labels,
                                                  label_lens)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        b = tc.asr_batch(rs, batch, window, min_words=2, max_words=8, u_max=u_max)
        labels = np.where(
            np.arange(u_max)[None, :] < b["label_lengths"][:, None],
            b["labels"] + fx.PARAFORMER_WORD_OFFSET, 0,
        )
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(b["audio"]),
            jnp.asarray(b["audio_lengths"]), jnp.asarray(labels),
            jnp.asarray(b["label_lengths"]),
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"paraformer step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "paraformer"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "model.npz", jax.device_get(params))
    fx.write_family_vocab(out / "vocab.json", fx.PARAFORMER_WORD_OFFSET,
                          {0: "<pad>"})
    print(f"paraformer checkpoint -> {out}")
    return out


def eval_paraformer(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    w = fx.eval_paraformer_fixture()
    print(f"paraformer eval avg WER {w*100:.2f}%")
    return w


# --------------------------------------------------------------- cohere


def train_cohere(steps: int, batch: int = 8, lr: float = 2e-3,
                 seed: int = 0) -> Path:
    """Tiny conformer encoder + KV-cache AR decoder, teacher-forced CE."""
    from fluidaudio_tpu.models.cohere_asr import CohereDecoderStep, CohereEncoder
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
    from fluidaudio_tpu.train import fixtures as fx

    cfg = fx.cohere_tiny_config()
    encoder = CohereEncoder(cfg)
    decoder = CohereDecoderStep(cfg)
    mel = MelFrontend(MelConfig(n_mels=cfg.n_mels, normalize="per_feature",
                                f_max=8000.0))
    window = 5 * 16000
    M = cfg.max_decode_tokens
    L, H, Dh = cfg.n_decoder_layers, cfg.n_heads, cfg.head_dim

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    T0 = 32
    mel0 = jnp.zeros((1, cfg.n_mels, T0), jnp.float32)
    enc_params = jax.jit(encoder.init)(k1, mel0, jnp.array([T0], jnp.int32))
    enc0, mask0 = encoder.apply(enc_params, mel0, jnp.array([T0], jnp.int32))
    dec_params = jax.jit(decoder.init)(
        k2, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((L, 1, M, H, Dh), cfg.compute_dtype),
        jnp.zeros((L, 1, M, H, Dh), cfg.compute_dtype), enc0, mask0,
    )
    params = {"encoder": enc_params, "decoder": dec_params}
    # cosine decay: the AR decode is exact-match sensitive (one wrong token
    # derails the whole greedy sequence), so end-state stability matters
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, audio, lengths, tokens_in, targets, tgt_mask):
        m, mlen = mel(audio, lengths)
        m = m[:, :, : cfg.max_audio_frames]
        mlen = jnp.minimum(mlen, cfg.max_audio_frames)
        enc, enc_mask = encoder.apply(p["encoder"], m, mlen)
        B = enc.shape[0]
        k0 = jnp.zeros((L, B, M, H, Dh), cfg.compute_dtype)
        v0 = jnp.zeros_like(k0)

        def step(carry, t):
            k, v = carry
            logits, k2_, v2_ = decoder.apply(
                p["decoder"], tokens_in[:, t],
                jnp.full((B,), t, jnp.int32), k, v, enc, enc_mask,
            )
            return (k2_, v2_), logits

        _, logits = jax.lax.scan(step, (k0, v0), jnp.arange(M))
        logits = jnp.transpose(logits, (1, 0, 2))  # [B, M, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(ce * tgt_mask) / jnp.maximum(jnp.sum(tgt_mask), 1)

    @jax.jit
    def step_fn(p, o, audio, lengths, tokens_in, targets, tgt_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, audio, lengths, tokens_in, targets, tgt_mask)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    max_words = M - 2  # bos + words + eos must fit
    for i in range(steps):
        b = tc.asr_batch(rs, batch, window, min_words=2,
                         max_words=min(8, max_words), u_max=max_words)
        B = batch
        tokens_in = np.full((B, M), cfg.pad_id, np.int32)
        targets = np.full((B, M), cfg.pad_id, np.int32)
        tgt_mask = np.zeros((B, M), np.float32)
        for r in range(B):
            n = int(b["label_lengths"][r])
            seq = b["labels"][r, :n] + fx.COHERE_WORD_OFFSET
            tokens_in[r, 0] = cfg.bos_id
            tokens_in[r, 1 : 1 + n] = seq
            targets[r, :n] = seq
            targets[r, n] = cfg.eos_id
            tgt_mask[r, : n + 1] = 1.0
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(b["audio"]),
            jnp.asarray(b["audio_lengths"]), jnp.asarray(tokens_in),
            jnp.asarray(targets), jnp.asarray(tgt_mask),
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"cohere step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "cohere"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "encoder.npz", jax.device_get(params["encoder"]))
    save_params(out / "decoder.npz", jax.device_get(params["decoder"]))
    fx.write_family_vocab(
        out / "vocab.json", fx.COHERE_WORD_OFFSET,
        {0: "<unk>", 1: "<nospeech>", 2: "<pad>", 3: "</s>", 4: "<s>"},
    )
    print(f"cohere checkpoint -> {out}")
    return out


def eval_cohere(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    w = fx.eval_cohere_fixture()
    print(f"cohere eval avg WER {w*100:.2f}%")
    return w


def main() -> int:
    families = ["asr", "vad", "sortformer", "sensevoice", "paraformer", "cohere"]
    ap = argparse.ArgumentParser()
    ap.add_argument("family", nargs="?", default="all",
                    choices=families + ["all", "core"])
    ap.add_argument("--steps", type=int, default=0, help="override step count")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    if args.family == "all":
        fams = families
    elif args.family == "core":
        fams = ["asr", "vad", "sortformer"]
    else:
        fams = [args.family]
    defaults = {"asr": 700, "vad": 3000, "sortformer": 500,
                "sensevoice": 1500, "paraformer": 1500, "cohere": 1500}
    train_fns = {"asr": train_asr, "vad": train_vad,
                 "sortformer": train_sortformer, "sensevoice": train_sensevoice,
                 "paraformer": train_paraformer, "cohere": train_cohere}
    eval_fns = {"asr": eval_asr, "vad": eval_vad,
                "sortformer": eval_sortformer, "sensevoice": eval_sensevoice,
                "paraformer": eval_paraformer, "cohere": eval_cohere}
    print(f"backend: {jax.default_backend()}")
    for fam in fams:
        steps = args.steps or defaults[fam]
        out = ASSETS / fam
        if not args.eval_only:
            out = train_fns[fam](steps)
        eval_fns[fam](out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
