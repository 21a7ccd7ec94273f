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


# ------------------------------------------------------------- nemotron


def train_nemotron(steps: int, batch: int = 8, lr: float = 2e-3,
                   seed: int = 0) -> Path:
    """Trained multilingual streaming Nemotron fixture.

    Two synthetic languages (pure-tone A words / harmonic B words) + leading
    `<xx-XX>` language-tag labels + additive prompt conditioning: each sample
    trains under its own language prompt half the time and the auto prompt
    half the time, so explicit prompting AND acoustic auto-detection both
    work at decode. Same per-chunk cache-carrying scan as the EOU trainer,
    at the 560 ms Nemotron tier."""
    import json

    from fluidaudio_tpu.asr.streaming_eou import MEL_HOP, MEL_WIN
    from fluidaudio_tpu.asr.streaming_nemotron import NEMOTRON_TEST, _PromptedEncoder
    from fluidaudio_tpu.models.conformer_streaming import init_caches
    from fluidaudio_tpu.models.predictor import (
        PredictorConfig, RnntJoint, RnntPredictor,
    )
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.train.transducer_loss import rnnt_loss

    spec = NEMOTRON_TEST
    cfg = fx.nemotron_tiny_enc_cfg()
    n_prompts = 4
    chunk_samples = 560 * 16000 // 1000  # 8960 (the smallest Nemotron tier)
    mel_frames = chunk_samples // MEL_HOP  # 56
    n_chunks = 8  # 4.48 s window
    window = n_chunks * chunk_samples + (MEL_WIN - MEL_HOP)
    T = n_chunks * (mel_frames // 8)
    max_words = 7
    u_max = max_words + 1  # + leading lang tag

    encoder = _PromptedEncoder(cfg, n_prompts)
    pcfg = PredictorConfig(
        vocab_size=spec.vocab_size, pred_hidden=spec.pred_hidden, n_layers=1,
        enc_hidden=cfg.d_model, joint_hidden=spec.joint_hidden, n_durations=0,
    )
    predictor = RnntPredictor(pcfg)
    joint = RnntJoint(pcfg)
    mel = MelFrontend(MelConfig(center=False, normalize=None))

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = {
        "encoder": jax.jit(encoder.init)(
            k1, jnp.zeros((1, cfg.n_mels, mel_frames), jnp.float32),
            init_caches(cfg, 1), jnp.zeros((1,), jnp.int32),
        ),
        "predictor": jax.jit(predictor.init)(
            k2, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, pcfg.pred_hidden)),
            jnp.zeros((1, 1, pcfg.pred_hidden)),
        ),
        "joint": jax.jit(joint.init)(
            k3, jnp.zeros((1, cfg.d_model)), jnp.zeros((1, pcfg.pred_hidden)),
        ),
    }
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, audio, prompts, labels, label_lens, tag_min):
        B = audio.shape[0]
        m, _ = mel(audio, jnp.full((B,), audio.shape[1], jnp.int32))
        m = m[:, :, : n_chunks * mel_frames]
        chunks = jnp.transpose(
            m.reshape(B, cfg.n_mels, n_chunks, mel_frames), (2, 0, 1, 3))

        def enc_step(caches, mel_chunk):
            out, new_caches = encoder.apply(p["encoder"], mel_chunk, caches,
                                            prompts)
            return new_caches, out

        _, outs = jax.lax.scan(enc_step, init_caches(cfg, B), chunks)
        f = jnp.transpose(outs, (1, 0, 2, 3)).reshape(B, T, cfg.d_model)

        U = labels.shape[1]
        toks = jnp.concatenate(
            [jnp.full((B, 1), pcfg.blank_id, jnp.int32), labels], axis=1)
        h0 = jnp.zeros((pcfg.n_layers, B, pcfg.pred_hidden))

        def pred_step(carry, tok):
            h, c = carry
            g, h2, c2 = predictor.apply(p["predictor"], tok, h, c)
            return (h2, c2), g

        _, gs = jax.lax.scan(pred_step, (h0, h0), jnp.transpose(toks))
        g = jnp.transpose(gs, (1, 0, 2))

        logits = joint.apply(p["joint"], f[:, :, None, :], g[:, None, :, :])
        logp = jax.nn.log_softmax(logits, axis=-1)
        # RNN-T alignment freedom would let the leading <xx-XX> tag be
        # consumed at t=0 — off leading SILENCE, before any acoustic
        # evidence — so under the auto prompt the model would learn the
        # class prior, not the acoustics (measured: auto detect collapsed
        # to one language at 50%). Forbid consuming labels[:,0] (the tag,
        # the u=0 lattice row) before `tag_min` frames (the first word's
        # audio): the tag posterior is then only ever reinforced where the
        # language is audible. The EOU deadline lesson, mirrored.
        t_idx = jnp.arange(T, dtype=jnp.int32)
        gate = (t_idx[None, :] < tag_min[:, None]).astype(logp.dtype)  # [B,T]
        tag_onehot = jax.nn.one_hot(labels[:, 0], logits.shape[-1],
                                    dtype=logp.dtype)  # [B,V]
        logp = logp.at[:, :, 0, :].add(
            -1e4 * gate[:, :, None] * tag_onehot[:, None, :])
        t_len = jnp.full((B,), T, jnp.int32)
        nll = rnnt_loss(logp, labels, t_len, label_lens, pcfg.blank_id)
        return jnp.mean(nll / jnp.maximum(label_lens, 1))

    @jax.jit
    def step_fn(p, o, audio, prompts, labels, label_lens, tag_min):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, audio, prompts, labels, label_lens, tag_min)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        audio = np.zeros((batch, window), np.float32)
        prompts = np.zeros((batch,), np.int32)
        labels = np.zeros((batch, u_max), np.int32)
        lens = np.zeros((batch,), np.int32)
        tag_min = np.zeros((batch,), np.int32)
        for r in range(batch):
            lang_b = bool(rs.randint(0, 2))
            n = int(rs.randint(2, max_words + 1))
            ids = rs.randint(0, tc.N_WORDS, size=n)
            utt = tc.make_utterance(ids, rs, lang="b" if lang_b else "a")[:window]
            off = int(rs.randint(0, window - utt.size + 1))
            audio[r, off : off + utt.size] = utt
            labels[r, 0] = fx.NEMOTRON_TAG_B if lang_b else fx.NEMOTRON_TAG_A
            labels[r, 1 : 1 + n] = ids + (fx.NEMOTRON_B_OFFSET if lang_b else 0)
            lens[r] = n + 1
            # half explicit language prompt, half auto (prompt 0)
            prompts[r] = (2 if lang_b else 1) if rs.rand() < 0.5 else 0
            # tag consumable only once half the first word is audible
            # (encoder frame = 8 mel hops = 80 ms)
            tag_min[r] = int((off / tc.SR + 0.10 + tc.WORD_SEC / 2) / 0.080)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(audio), jnp.asarray(prompts),
            jnp.asarray(labels), jnp.asarray(lens), jnp.asarray(tag_min),
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"nemotron step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "nemotron"
    out.mkdir(parents=True, exist_ok=True)
    for part in ("encoder", "predictor", "joint"):
        save_params(out / f"{part}.npz", jax.device_get(params[part]))
    vocab = {i: "▁" + tc.word_text(i) for i in range(tc.N_WORDS)}
    vocab.update({fx.NEMOTRON_B_OFFSET + i: "▁" + tc.word_text_b(i)
                  for i in range(tc.N_WORDS)})
    vocab[fx.NEMOTRON_TAG_A] = "<aa-AA>"
    vocab[fx.NEMOTRON_TAG_B] = "<bb-BB>"
    (out / "vocab.json").write_text(json.dumps(
        {str(k): v for k, v in sorted(vocab.items())}, ensure_ascii=False))
    (out / "metadata.json").write_text(json.dumps({
        "num_prompts": n_prompts,
        "default_prompt_id": 0,
        "prompt_dictionary": {"auto": 0, "aa-AA": 1, "bb-BB": 2},
        "lang_tag_token_ids": [fx.NEMOTRON_TAG_A, fx.NEMOTRON_TAG_B],
    }))
    print(f"nemotron checkpoint -> {out}")
    return out


def eval_nemotron(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    scores = fx.eval_nemotron_fixture()
    print(f"nemotron eval avg WER {scores['wer_avg']*100:.2f}%, "
          f"lang detect rate {scores['lang_detect_rate']*100:.0f}%")
    return scores["wer_avg"]


# ------------------------------------------------------------------ ctc


def train_ctc(steps: int, batch: int = 8, lr: float = 2e-3, seed: int = 0) -> Path:
    """Trained CTC fixture for the keyword-spotting / CTC-decode stack.

    The zoo test-tiny conformer + a linear CTC head (blank LAST, id 16 —
    the parakeet-ctc layout `KeywordSpotterConfig.blank_id`) trained with
    `optax.ctc_loss` via the in-repo `parallel.train` step on the 16-tone-word
    corpus at the CtcKeywordSpotter's exact 15 s chunk window, under the
    spotter's own mel frontend (per_feature). Proves the Earnings22-KWS path
    functional: greedy/beam decode ~0 WER and DP keyword spotting."""
    from dataclasses import replace

    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
    from fluidaudio_tpu.parallel.train import create_train_state, make_train_step
    from fluidaudio_tpu.train import fixtures as fx

    window = 240_000  # CtcKeywordSpotter CHUNK_SAMPLES
    cfg = replace(fx.ctc_tiny_enc_cfg(), attention_backend="xla")
    mel = MelFrontend(MelConfig(normalize="per_feature"))
    mel_frames = window // 160 + 1

    rng = jax.random.PRNGKey(seed)
    state, encoder, tx = create_train_state(rng, cfg, tc.N_WORDS, mel_frames, lr)
    step_fn = jax.jit(make_train_step(encoder, tx, blank_id=fx.CTC_BLANK_ID))
    mel_fn = jax.jit(lambda a, l: mel(a, l))

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        b = tc.asr_batch(rs, batch, window)
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
            print(f"ctc step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = ASSETS / "ctc"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "encoder.npz", jax.device_get(state.params["encoder"]))
    np.savez(out / "ctc_head.npz", head=np.asarray(state.params["ctc_head"]))
    import json

    (out / "vocab.json").write_text(json.dumps(
        {str(i): "▁" + tc.word_text(i) for i in range(tc.N_WORDS)},
        ensure_ascii=False))
    print(f"ctc checkpoint -> {out}")
    return out


def eval_ctc(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    d = fx.eval_ctc_fixture()
    s = fx.eval_ctc_spotting_fixture()
    print(f"ctc eval WER {d['wer_avg']*100:.2f}%, beam agree "
          f"{d['beam_agree_rate']*100:.0f}%, KWS recall {s['recall']*100:.0f}% "
          f"precision {s['precision']*100:.0f}% timing {s['timing_rate']*100:.0f}%")
    return d["wer_avg"]


# ------------------------------------------------------------------ tts

# Shared discriminator-free vocoder loss recipe (Parallel WaveGAN aux loss):
# multi-resolution STFT magnitudes compared LINEARLY (spectral convergence)
# as well as in log — a log-mel-only loss lets silence be a local optimum
# for narrowband tones — plus a phase-free moving-RMS envelope term that
# forces energy ONTO words and silence into gaps. Used by the Kokoro and
# PocketTTS fixture trainers.
MRSTFT_RES = ((512, 120), (128, 32), (2048, 480))


def stft_mag(x, n_fft, hop):
    L = x.shape[-1]
    nf = 1 + (L - n_fft) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx] * jnp.asarray(np.hanning(n_fft), x.dtype)
    z = jnp.fft.rfft(frames, axis=-1)
    # sqrt(|z|^2 + eps), NOT jnp.abs: the abs gradient is z/|z|, which
    # is NaN on the exact-zero frames the length mask creates
    return jnp.sqrt(z.real**2 + z.imag**2 + 1e-12)


def mrstft_loss(pred, tgt):
    total = 0.0
    for n_fft, hop in MRSTFT_RES:
        mp, mt = stft_mag(pred, n_fft, hop), stft_mag(tgt, n_fft, hop)
        sc = jnp.linalg.norm(mt - mp) / (jnp.linalg.norm(mt) + 1e-6)
        logl1 = jnp.mean(jnp.abs(jnp.log(mt + 1e-5) - jnp.log(mp + 1e-5)))
        total = total + sc + logl1
    return total / len(MRSTFT_RES)


def envelope_loss(pred, tgt):
    # phase-free 5 ms moving-RMS envelope
    k = 120
    kernel = jnp.full((1, 1, k), 1.0 / k)

    def env(x):
        p = jax.lax.conv_general_dilated(
            (x * x)[:, None, :], kernel, (k,), "VALID")
        return jnp.sqrt(p[:, 0, :] + 1e-8)

    return jnp.mean(jnp.abs(env(pred) - env(tgt)))


def train_tts(steps: int, batch: int = 4, lr: float = 1e-3, seed: int = 0) -> Path:
    """Trained tiny Kokoro fixture — the TTS side of the functional proof.

    The REAL Kokoro graph (ALBERT + duration head + prosody/F0 + AdaIN
    iSTFTNet vocoder with harmonic source, `models/kokoro.py`) at fixture
    scale, trained jointly: duration MSE on the ground-truth frame layout +
    log-mel L1 between the vocoded waveform (teacher-forced alignment from
    true durations) and the constructed 24 kHz tone-word target. The closed
    loop — synthesize text, resample 24->16 kHz, transcribe with the trained
    ASR fixture — is the reference's `tts-asr-verify` contract as a hermetic
    quality gate."""
    from fluidaudio_tpu.models.kokoro import (
        HOP, KokoroAudioProgram, KokoroTextProgram,
    )
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.tts.kokoro_manager import VOICE_PACK_ROWS, VOCAB

    cfg = fx.kokoro_tiny_config()
    text_prog = KokoroTextProgram(cfg)
    audio_prog = KokoroAudioProgram(cfg)
    sym_ids = [VOCAB[c] for c in fx.TTS_WORD_SYMBOLS]
    space_id = VOCAB[" "]

    T_pad, F_pad, max_words = 32, 160, 8

    # one fixed synthetic voice; rows identical (length-bucket invariant)
    style_row = (np.random.RandomState(4242).randn(256) * 0.2).astype(np.float32)
    style_s = jnp.asarray(np.tile(style_row[128:], (batch, 1)))
    style_t = jnp.asarray(np.tile(style_row[:128], (batch, 1)))

    # loss: module-level MR-STFT recipe (see MRSTFT_RES above) — linear
    # magnitude SC + log L1 + RMS envelope; phase stays free (the harmonic
    # source's random initial phase must not be penalized). The round-4
    # checkpoint collapsed to silence under a log-mel-only loss: the tones
    # are narrowband, so muting them cost ~3 of 80 mel bins while broadband
    # attempts cost all 80.

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    ids0 = jnp.zeros((batch, T_pad), jnp.int32)
    len0 = jnp.full((batch,), T_pad, jnp.int32)
    params = {
        "text": jax.jit(text_prog.init)(k1, ids0, len0, style_s),
        "audio": jax.jit(audio_prog.init)(
            {"params": k2, "noise": k3},
            jnp.zeros((batch, T_pad, cfg.d_model + cfg.style_dim)),
            jnp.zeros((batch, T_pad, cfg.d_model)),
            jnp.zeros((batch, F_pad), jnp.int32),
            jnp.full((batch,), F_pad, jnp.int32),
            style_s, style_t,
        ),
    }
    # global-norm clip: the spectral losses are steep near random init (the
    # vocoder's exp log-magnitude head), and a single oversized step is what
    # NaN'd earlier fixture runs
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps)),
    )
    opt_state = tx.init(params)

    from fluidaudio_tpu.models.kokoro import stft_20

    def loss_fn(p, tokens, tok_lens, dur_tgt, dur_mask, frame_idx, n_frames,
                target, f0_tgt, key):
        dur, d, t_en = text_prog.apply(p["text"], tokens, tok_lens, style_s)
        dur_loss = jnp.sum(((dur - dur_tgt) ** 2) * dur_mask) / jnp.sum(dur_mask)
        audio, f0, _, pmag, pph = audio_prog.apply(
            p["audio"], d, t_en, frame_idx, n_frames, style_s, style_t,
            with_prosody=True, stop_f0_grad=True, with_spec=True,
            teacher_f0=f0_tgt, rngs={"noise": key})
        # Direct F0 supervision (round-5 fix): the SourceModule's voiced gate
        # `f0 > 10 Hz` has zero gradient and the sine-phase gradient is
        # oscillatory, so a mel loss alone leaves F0 unvoiced and the vocoder
        # collapses to silence (that was the round-4 failure). The target
        # pitch track is known by construction; supervise it in units of
        # 500 Hz at the prosody head's 2x frame rate.
        fmask = (jnp.arange(2 * F_pad)[None, :]
                 < (2 * n_frames)[:, None]).astype(f0.dtype)
        f0_loss = jnp.sum((((f0 - f0_tgt) / 500.0) ** 2) * fmask) / jnp.sum(fmask)
        smask = (jnp.arange(F_pad * HOP)[None, :]
                 < (n_frames * HOP)[:, None]).astype(audio.dtype)
        masked = audio * smask
        spec_loss = mrstft_loss(masked, target) + envelope_loss(masked, target)
        # Time-domain L2 (round-5): valid here because the phase origin is
        # PINNED — the SourceModule zeroes the fundamental's initial phase
        # in both train and inference, F0 is zero through silence (no
        # accumulation), and the construction target's sine also starts at
        # phase 0 at word onset. The dense per-sample gradient is what
        # finally pins the high-tone words the spectral losses left snapped
        # to feature rates (w11 -> 1600 Hz) or split across head bins (w15).
        wav_loss = 50.0 * jnp.sum(((masked - target) ** 2)) / jnp.sum(smask)

        # Direct iSTFT-head supervision (round-5 fix for the tone
        # quantization): within one acoustic frame every generator input
        # except the harmonic source is piecewise-constant, so the audio
        # spectral loss alone lets the phase head ignore the source and emit
        # feature-periodic output (tones snapped to a 400 Hz grid) or
        # collapse quiet. Supervise the head at ITS OWN resolution:
        #   mag   — log-L1 against the target's 20-point STFT magnitudes;
        #   phase — magnitude-weighted 1-cos on the FRAME-TO-FRAME phase
        #           delta (instantaneous frequency), invariant to the
        #           absolute phase offset between the harmonic source's
        #           cumsum (over PREDICTED F0) and the construction target.
        tmag, tph = stft_20(target, cfg.gen_n_fft, cfg.gen_hop)
        nf_spec = pmag.shape[1]
        fvalid = (jnp.arange(nf_spec)[None, :]
                  < ((HOP // cfg.gen_hop) * n_frames + 1)[:, None]
                  ).astype(pmag.dtype)
        hmag_loss = jnp.sum(
            jnp.abs(jnp.log(pmag + 1e-5) - jnp.log(tmag + 1e-5)).mean(-1)
            * fvalid) / jnp.sum(fvalid)
        w = tmag[:, 1:] * tmag[:, :-1] * fvalid[:, 1:, None]
        dph = (pph[:, 1:] - pph[:, :-1]) - (tph[:, 1:] - tph[:, :-1])
        dphase_loss = jnp.sum(w * (1.0 - jnp.cos(dph))) / (jnp.sum(w) + 1e-6)
        # absolute-phase term (same pinned-origin argument as wav_loss):
        # delta-phase alone leaves a free per-bin offset, and a wrong offset
        # between the two active bins of a between-bin tone cancels in the
        # iSTFT overlap-add
        wa = tmag * fvalid[..., None]
        aphase_loss = jnp.sum(wa * (1.0 - jnp.cos(pph - tph))) / (jnp.sum(wa) + 1e-6)
        head_loss = hmag_loss + 2.0 * dphase_loss + 2.0 * aphase_loss
        return (spec_loss + wav_loss + 0.05 * dur_loss + f0_loss + head_loss,
                (spec_loss, dur_loss, f0_loss, hmag_loss,
                 dphase_loss + aphase_loss, wav_loss))

    @jax.jit
    def step_fn(p, o, tokens, tok_lens, dur_tgt, dur_mask, frame_idx,
                n_frames, target, f0_tgt, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, tokens, tok_lens, dur_tgt, dur_mask, frame_idx, n_frames,
            target, f0_tgt, key)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss, aux

    out = ASSETS / "tts"
    out.mkdir(parents=True, exist_ok=True)

    def save_ckpt():
        # atomic (write-then-rename): an eval or a kill mid-save must never
        # observe a truncated npz
        # tmp names must END in .npz: np.savez appends the suffix otherwise
        for name, tree in (("text", params["text"]), ("audio", params["audio"])):
            tmp = out / f".{name}.tmp.npz"
            save_params(tmp, jax.device_get(tree))
            tmp.replace(out / f"{name}.npz")
        tmpv = out / ".voices.tmp.npz"
        np.savez(tmpv, af_test=np.tile(style_row[None, :], (VOICE_PACK_ROWS, 1)))
        tmpv.replace(out / "voices.npz")

    rs = np.random.RandomState(seed + 1)
    key = jax.random.PRNGKey(seed + 2)
    t0 = time.time()
    for i in range(steps):
        tokens = np.zeros((batch, T_pad), np.int32)
        tok_lens = np.zeros((batch,), np.int32)
        dur_tgt = np.zeros((batch, T_pad), np.float32)
        dur_mask = np.zeros((batch, T_pad), np.float32)
        frame_idx = np.zeros((batch, F_pad), np.int32)
        n_frames = np.zeros((batch,), np.int32)
        target = np.zeros((batch, F_pad * HOP), np.float32)
        f0_tgt = np.zeros((batch, 2 * F_pad), np.float32)
        for r in range(batch):
            n = int(rs.randint(1, max_words + 1))
            ids = rs.randint(0, tc.N_WORDS, size=n)
            seq = [0]
            for k_, w in enumerate(ids):
                seq.append(sym_ids[int(w)])
                if k_ + 1 < n:
                    seq.append(space_id)
            seq.append(0)
            tokens[r, : len(seq)] = seq
            tok_lens[r] = len(seq)
            durs = fx.tts_durations(n)
            dur_tgt[r, : len(seq)] = durs
            dur_mask[r, : len(seq)] = 1.0
            total = int(durs.sum())
            frame_idx[r, :total] = np.repeat(
                np.arange(len(seq), dtype=np.int32), durs.astype(np.int64))
            n_frames[r] = total
            # SOURCE-aligned target: phase follows the harmonic source's own
            # cumsum convention, so with teacher-forced F0 the waveform and
            # absolute-phase losses have a reachable zero (the plain
            # zero-phase-per-word target is unreachable past the first word
            # — the source never resets phase between words)
            target[r], f0_tgt[r] = fx.tts_target_audio_aligned(
                ids, F_pad, "kokoro")
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = step_fn(
            params, opt_state, jnp.asarray(tokens), jnp.asarray(tok_lens),
            jnp.asarray(dur_tgt), jnp.asarray(dur_mask),
            jnp.asarray(frame_idx), jnp.asarray(n_frames),
            jnp.asarray(target), jnp.asarray(f0_tgt), sub)
        if i % 50 == 0 or i == steps - 1:
            print(f"tts step {i}: loss {float(loss):.4f} "
                  f"(spec {float(aux[0]):.4f} dur {float(aux[1]):.4f} "
                  f"f0 {float(aux[2]):.4f} hmag {float(aux[3]):.4f} "
                  f"ph {float(aux[4]):.4f} wav {float(aux[5]):.4f}) "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if i > 0 and i % 1000 == 0:
            save_ckpt()
            print(f"tts checkpoint @ step {i} -> {out}", flush=True)

    save_ckpt()
    print(f"tts checkpoint -> {out}")
    return out


def eval_tts(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    d = fx.eval_tts_fixture()
    print(f"tts eval roundtrip WER {d['roundtrip_wer_avg']*100:.2f}%, "
          f"duration MAE {d['dur_mae_frames']:.3f} frames")
    return d["roundtrip_wer_avg"]


# --------------------------------------------------------------- pocket tts


def train_pocket(steps: int, batch: int = 4, lr: float = 1e-3, seed: int = 0) -> Path:
    """Trained tiny PocketTTS fixture — the streaming-AR TTS functional proof
    (reference loop `PocketTtsSynthesizer.swift:498-707`). Two stages:

      A (40% of steps): Mimi autoencoder. Encoder latents feed the STREAMING
        per-frame decoder scan (the exact inference path, all conv/KV states
        carried) and the waveform is fit with the shared MR-STFT + envelope
        recipe, plus a unit-variance latent regularizer so the flow decoder
        later operates on a sane scale.
      B (60%): flow-LM + flow-matching velocity + EOS head, teacher-forced
        over the REAL prefill layout [BOS | 125-frame voice prompt | text
        chars | latents]: conditional flow matching (OT path, z_t =
        (1-t)z0 + t x1, target velocity x1 - z0) on the FROZEN encoder's
        latents conditioned on the LM hidden state; BCE on the EOS logit at
        utterance end (inference threshold -4.0); small input-latent noise
        so generation tolerates its own feedback. The voice prompt comes
        from the manager's own `clone_voice` on the construction reference
        clip, so eval recloning reproduces it bit-identically.
    """
    from fluidaudio_tpu.models.mimi import MimiDecoder, MimiEncoder
    from fluidaudio_tpu.models.pocket_tts import (
        VOICE_PROMPT_FRAMES,
        FlowLm,
        FlowVelocity,
        init_kv,
    )
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.tts.pocket_text import fallback_char_tokens, normalize_text

    cfg = fx.pocket_tiny_config()
    HOP = cfg.mimi.hop  # 600 samples = 25 ms @ 24 kHz
    LAT = cfg.mimi.latent_dim
    enc = MimiEncoder(cfg.mimi)
    dec = MimiDecoder(cfg.mimi)
    flowlm = FlowLm(cfg)
    vel = FlowVelocity(cfg)

    out = ASSETS / "pocket"
    out.mkdir(parents=True, exist_ok=True)
    steps_a = max(1, int(steps * 0.4))
    steps_b = max(1, steps - steps_a)
    rs = np.random.RandomState(seed + 1)

    # ------------------------------------------------------------ stage A
    F_A = 64
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    params_a = {
        "enc": jax.jit(enc.init)(keys[0], jnp.zeros((batch, F_A * HOP))),
        "dec": jax.jit(dec.init)(
            keys[1], jnp.zeros((batch, LAT)), dec.init_state(batch)
        ),
    }

    def decode_seq(p, latents):  # [B, F, LAT] -> [B, F*HOP] streaming scan
        def step(state, z):
            y, state = dec.apply(p, z, state)
            return state, y

        _, ys = jax.lax.scan(
            step, dec.init_state(latents.shape[0]), jnp.swapaxes(latents, 0, 1)
        )
        return jnp.swapaxes(ys, 0, 1).reshape(latents.shape[0], -1)

    def ae_loss(p, audio):
        lat = enc.apply(p["enc"], audio)
        recon = decode_seq(p["dec"], lat)
        spec = mrstft_loss(recon, audio) + envelope_loss(recon, audio)
        # Time-domain L2 (round-5 fix): unlike a vocoder, an AUTOENCODER's
        # output phase is pinned by its input, so a waveform loss is
        # legitimate — and necessary: with only phase-free spectral terms
        # the first pocket run collapsed to silent latents (std 0.03, reg
        # stuck at 1.0) because near-silence is a local optimum of MR-STFT
        # on narrowband tones. The dense per-sample gradient breaks it.
        wav = 100.0 * jnp.mean((recon - audio) ** 2)
        reg = (jnp.mean(lat * lat) - 1.0) ** 2
        return spec + wav + 0.05 * reg, (spec, wav, reg)

    tx_a = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps_a)),
    )
    opt_a = tx_a.init(params_a)

    @jax.jit
    def step_a(p, o, audio):
        (loss, aux), g = jax.value_and_grad(ae_loss, has_aux=True)(p, audio)
        up, o2 = tx_a.update(g, o, p)
        return optax.apply_updates(p, up), o2, loss, aux

    t0 = time.time()
    for i in range(steps_a):
        audio = np.zeros((batch, F_A * HOP), np.float32)
        for r in range(batch):
            ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(1, 4)))
            audio[r] = fx.tts_target_audio(ids, F_A)
        params_a, opt_a, loss, aux = step_a(params_a, opt_a, jnp.asarray(audio))
        if i % 50 == 0 or i == steps_a - 1:
            print(f"pocket A step {i}: loss {float(loss):.4f} "
                  f"(spec {float(aux[0]):.4f} wav {float(aux[1]):.4f} "
                  f"reg {float(aux[2]):.4f}) "
                  f"({time.time() - t0:.0f}s)", flush=True)

    def save_npz(name, tree):
        # atomic write-then-rename; tmp names must END in .npz (np.savez
        # appends the suffix otherwise)
        tmp = out / f".{name}.tmp.npz"
        save_params(tmp, jax.device_get(tree))
        tmp.replace(out / f"{name}.npz")

    save_npz("mimi", params_a["dec"])
    save_npz("mimi_enc", params_a["enc"])
    print(f"pocket stage A checkpoint -> {out}", flush=True)

    # voice prompt via the REAL clone path (fixed 10 s encoder window,
    # usable-frame tiling) so eval's re-clone is bit-identical
    from fluidaudio_tpu.tts.pocket_manager import PocketTtsManager

    mgr0 = PocketTtsManager(config=cfg, checkpoint_dir=out)
    mgr0.clone_voice(fx.pocket_voice_reference(), "default", voices_dir=out)
    prompt = jnp.asarray(mgr0.voices["default"])  # [125, LAT]

    # ------------------------------------------------------------ stage B
    T_PAD, F_PAD = 44, 136
    S_PAD = 1 + VOICE_PROMPT_FRAMES + T_PAD + F_PAD
    text_start = 1 + VOICE_PROMPT_FRAMES

    params_b = {
        "flowlm": jax.jit(flowlm.init)(
            keys[2], jnp.zeros((1, cfg.d_model)), jnp.zeros((1,), jnp.int32),
            init_kv(cfg, 1),
        ),
        "vel": jax.jit(vel.init)(
            keys[3], jnp.zeros((1, LAT)), jnp.zeros((1, cfg.d_model)),
            jnp.zeros((1, 1)),
        ),
    }
    tx_b = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps_b)),
    )
    opt_b = tx_b.init(params_b)
    enc_apply = jax.jit(enc.apply)
    p_enc_frozen = params_a["enc"]

    def lm_loss(p, tokens, tok_lens, latents, n_frames, t_u, z0, in_noise):
        B = tokens.shape[0]
        lm = p["flowlm"]
        text_emb = flowlm.apply(lm, tokens, method=FlowLm.embed_text)
        # small latent input noise: generation feeds back its OWN flow
        # output, which is close to but not exactly the encoder latent
        lat_emb = flowlm.apply(
            lm, latents + 0.05 * in_noise, method=FlowLm.embed_latent
        )
        prompt_emb = flowlm.apply(lm, prompt, method=FlowLm.embed_latent)
        bos = flowlm.apply(lm, method=FlowLm.bos_embedding)

        s = jnp.arange(S_PAD)
        lat_start = text_start + tok_lens  # [B]
        is_text = (s[None] >= text_start) & (s[None] < lat_start[:, None])
        text_idx = jnp.clip(s[None] - text_start, 0, T_PAD - 1)
        lat_idx = jnp.clip(s[None] - lat_start[:, None], 0, F_PAD - 1)
        te = jnp.take_along_axis(text_emb, text_idx[..., None], axis=1)
        le = jnp.take_along_axis(lat_emb, lat_idx[..., None], axis=1)
        seq = jnp.where(is_text[..., None], te, le)
        pe = prompt_emb[jnp.clip(s - 1, 0, VOICE_PROMPT_FRAMES - 1)]
        is_prompt = (s >= 1) & (s < text_start)
        seq = jnp.where(is_prompt[None, :, None], pe[None], seq)
        seq = jnp.where((s == 0)[None, :, None], bos[None, None], seq)

        def stepf(carry, x):
            kv, pos = carry
            hidden, eos, kv = flowlm.apply(
                lm, x, jnp.full((B,), pos, jnp.int32), kv, method=FlowLm.step
            )
            return (kv, pos + 1), (hidden, eos)

        _, (hiddens, eoss) = jax.lax.scan(
            stepf, (init_kv(cfg, B), 0), jnp.swapaxes(seq, 0, 1)
        )
        hiddens = jnp.swapaxes(hiddens, 0, 1)  # [B, S, D]
        eoss = jnp.swapaxes(eoss, 0, 1)  # [B, S]

        # conditional flow matching: cond for frame i = hidden one position
        # before the frame's slot (exactly what generation feeds the flow)
        ci = jnp.clip(
            lat_start[:, None] - 1 + jnp.arange(F_PAD)[None, :], 0, S_PAD - 1
        )
        cond = jnp.take_along_axis(hiddens, ci[..., None], axis=1)
        fmask = (jnp.arange(F_PAD)[None] < n_frames[:, None]).astype(jnp.float32)
        t = t_u[..., None]
        zt = (1.0 - t) * z0 + t * latents
        vhat = vel.apply(
            p["vel"], zt.reshape(-1, LAT), cond.reshape(-1, cfg.d_model),
            t_u.reshape(-1, 1),
        ).reshape(B, F_PAD, LAT)
        cfm = jnp.sum(((vhat - (latents - z0)) ** 2).mean(-1) * fmask) / jnp.sum(fmask)

        # EOS: fires (logit > -4.0) at the step consuming the LAST latent;
        # train a few trailing silence-latent steps positive too so a
        # near-miss still stops one frame late rather than never
        eos_pos = lat_start + n_frames - 1
        in_gen = (s[None] >= lat_start[:, None]) & (s[None] <= eos_pos[:, None] + 3)
        labels = (s[None] >= eos_pos[:, None]).astype(jnp.float32)
        bce = optax.sigmoid_binary_cross_entropy(eoss, labels)
        w = jnp.where(labels > 0, 20.0, 1.0) * in_gen.astype(jnp.float32)
        eos_loss = jnp.sum(bce * w) / jnp.sum(w)
        return cfm + 0.5 * eos_loss, (cfm, eos_loss)

    @jax.jit
    def step_b(p, o, tokens, tok_lens, latents, n_frames, t_u, z0, in_noise):
        (loss, aux), g = jax.value_and_grad(lm_loss, has_aux=True)(
            p, tokens, tok_lens, latents, n_frames, t_u, z0, in_noise
        )
        up, o2 = tx_b.update(g, o, p)
        return optax.apply_updates(p, up), o2, loss, aux

    def save_b():
        save_npz("flowlm", params_b["flowlm"])
        save_npz("flow", {"params": {"velocity": params_b["vel"]["params"]}})

    key = jax.random.PRNGKey(seed + 2)
    t0 = time.time()
    for i in range(steps_b):
        tokens = np.zeros((batch, T_PAD), np.int32)
        tok_lens = np.zeros((batch,), np.int32)
        n_frames = np.zeros((batch,), np.int32)
        audio = np.zeros((batch, F_PAD * HOP), np.float32)
        for r in range(batch):
            n = int(rs.randint(1, 9))
            ids = rs.randint(0, tc.N_WORDS, size=n)
            norm, _ = normalize_text(tc.transcript_text(ids))
            toks = fallback_char_tokens(norm, cfg.vocab_size)
            tokens[r, : len(toks)] = toks
            tok_lens[r] = len(toks)
            n_frames[r] = int(fx.tts_durations(n).sum())
            audio[r] = fx.tts_target_audio(ids, F_PAD)
        latents = enc_apply(p_enc_frozen, jnp.asarray(audio))
        key, k1, k2, k3 = jax.random.split(key, 4)
        t_u = jax.random.uniform(k1, (batch, F_PAD))
        z0 = jax.random.normal(k2, (batch, F_PAD, LAT))
        in_noise = jax.random.normal(k3, (batch, F_PAD, LAT))
        params_b, opt_b, loss, aux = step_b(
            params_b, opt_b, jnp.asarray(tokens), jnp.asarray(tok_lens),
            latents, jnp.asarray(n_frames), t_u, z0, in_noise,
        )
        if i % 50 == 0 or i == steps_b - 1:
            print(f"pocket B step {i}: loss {float(loss):.4f} "
                  f"(cfm {float(aux[0]):.4f} eos {float(aux[1]):.4f}) "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if i > 0 and i % 1000 == 0:
            save_b()
            print(f"pocket B checkpoint @ step {i} -> {out}", flush=True)

    save_b()
    print(f"pocket checkpoint -> {out}")
    return out


def eval_pocket(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    d = fx.eval_pocket_fixture()
    print(f"pocket eval roundtrip WER {d['roundtrip_wer_avg']*100:.2f}%, "
          f"clone-voice WER {d['clone_roundtrip_wer']*100:.2f}%")
    return d["roundtrip_wer_avg"]


# -------------------------------------------------------------- styletts2


def train_styletts2(steps: int, batch: int = 4, lr: float = 1e-3,
                    seed: int = 0) -> Path:
    """Trained tiny StyleTTS2 fixture — the diffusion-TTS side of the
    functional proof. Trains ALL FOUR manager programs jointly on the tone
    corpus through the real TextCleaner/phonemizer conventions:

      text+predict+acoustic — duration MSE on `sum(sigmoid(bins))` (the
        `round_durations` contract), direct F0 supervision (Hz/500 via
        `cfg.f0_scale`, FastSpeech2 decoupling), MR-STFT + envelope +
        time-domain L2 on the HiFi-GAN output. The waveform loss is valid
        because the deterministic harmonic source's phase is pinned: F0=0
        through silence (no cumsum drift) and both source and construction
        target start each word at phase 0.
      style — the StarGANv2 ref encoders consume the FIXED reference clip
        through the manager's own `ref_mel_padded` convention; the EDM
        transformer denoiser trains with the standard EDM objective
        (sigma log-uniform over the Karras range, lambda(sigma) weight)
        toward the (stop-grad) encoder style, plus a scale regularizer
        keeping mean-square style energy at SIGMA_DATA^2 so the ADPM2
        sampler's preconditioning assumptions hold at inference.

    Eval runs the PUBLIC manager (diffusion sampling + alpha/beta blending
    included) and closes the loop through the trained ASR fixture
    (`StyleTTS2Synthesizer.swift:33-133` contract)."""
    from fluidaudio_tpu.models.styletts2 import (
        HOP as ST_HOP,
        SIGMA_DATA,
        SIGMA_MAX,
        StyleDenoiser,
        StyleEncoder2d,
        StyleTts2AcousticProgram,
        StyleTts2PredictProgram,
        StyleTts2TextProgram,
    )
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.tts.styletts2_manager import (
        ref_mel_padded, text_cleaner_encode,
    )

    cfg = fx.styletts2_tiny_config()
    text_prog = StyleTts2TextProgram(cfg)
    predict_prog = StyleTts2PredictProgram(cfg)
    acoustic_prog = StyleTts2AcousticProgram(cfg, deterministic=True)
    style_enc = StyleEncoder2d(cfg)
    denoiser = StyleDenoiser(cfg)

    sym_ids = [text_cleaner_encode(s, prepend_pad=False)[0]
               for s in fx.TTS_WORD_SYMBOLS]
    space_id = text_cleaner_encode(" ", prepend_pad=False)[0]

    T_pad, F_pad, max_words = 16, 160, 8
    half = cfg.style_dim

    # the fixed style reference through the manager's own mel convention
    mel_pad, mel_used = ref_mel_padded(fx.styletts2_ref_clip(), cfg.n_mels)
    mel_b = jnp.asarray(np.repeat(mel_pad, batch, axis=0))
    mel_frames_b = jnp.full((batch,), mel_used, jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    ids0 = jnp.zeros((batch, T_pad), jnp.int32)
    len0 = jnp.full((batch,), T_pad, jnp.int32)
    bert0 = jnp.zeros((batch, T_pad, cfg.albert_hidden))
    from fluidaudio_tpu.models.styletts2 import (
        DIFFUSION_STEPS, StyleTts2StyleProgram,
    )

    style_prog = StyleTts2StyleProgram(cfg)
    params = {
        "text": jax.jit(text_prog.init)(keys[0], ids0, len0),
        "style": jax.jit(style_prog.init)(
            keys[1], mel_b, mel_frames_b, bert0, len0,
            jnp.zeros((batch, 2 * half)),
            jnp.zeros((DIFFUSION_STEPS - 1, batch, 2 * half)),
        ),
        "predict": jax.jit(predict_prog.init)(
            keys[2], jnp.zeros((batch, T_pad, cfg.d_model)),
            jnp.zeros((batch, half)), len0,
        ),
        "acoustic": jax.jit(acoustic_prog.init)(
            keys[3],
            jnp.zeros((batch, T_pad, cfg.d_model + half)),
            jnp.zeros((batch, T_pad, cfg.d_model)),
            jnp.zeros((batch, F_pad), jnp.int32),
            jnp.full((batch,), F_pad, jnp.int32),
            jnp.zeros((batch, half)), jnp.zeros((batch, half)),
        ),
    }
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps)),
    )
    opt_state = tx.init(params)

    def loss_fn(p, tokens, tok_lens, dur_tgt, dur_mask, frame_idx, n_frames,
                target, f0_tgt, sig, zn):
        bert_dur, d_en, t_en = text_prog.apply(p["text"], tokens, tok_lens)

        sp = {"params": p["style"]["params"]}
        acou = style_enc.apply(
            {"params": sp["params"]["style_encoder"]}, mel_b, mel_frames_b)
        pros = style_enc.apply(
            {"params": sp["params"]["predictor_encoder"]}, mel_b, mel_frames_b)
        ref_s = jnp.concatenate([acou, pros], axis=-1)  # [B, 2*style_dim]
        ref128, s128 = ref_s[:, :half], ref_s[:, half:]

        d, dur_logits = predict_prog.apply(p["predict"], d_en, s128, tok_lens)
        dur_pred = jnp.sum(jax.nn.sigmoid(dur_logits), axis=-1)
        dur_loss = jnp.sum(((dur_pred - dur_tgt) ** 2) * dur_mask) / jnp.sum(dur_mask)

        audio, f0, _ = acoustic_prog.apply(
            p["acoustic"], d, t_en, frame_idx, n_frames, s128, ref128,
            with_prosody=True, stop_f0_grad=True, teacher_f0=f0_tgt)
        fmask = (jnp.arange(2 * F_pad)[None, :]
                 < (2 * n_frames)[:, None]).astype(f0.dtype)
        f0_loss = jnp.sum((((f0 - f0_tgt) / 500.0) ** 2) * fmask) / jnp.sum(fmask)

        # generator emits 2F*prod(rates)+1 samples (reflection pad);
        # compare on the exact F_pad*600 target grid
        audio = audio[:, : F_pad * ST_HOP]
        smask = (jnp.arange(F_pad * ST_HOP)[None, :]
                 < (n_frames * ST_HOP)[:, None]).astype(audio.dtype)
        masked = audio * smask
        spec_loss = mrstft_loss(masked, target) + envelope_loss(masked, target)
        wav_loss = 50.0 * jnp.sum((masked - target) ** 2) / jnp.sum(smask)

        # EDM denoising objective toward the (frozen) encoder style
        tgt_style = jax.lax.stop_gradient(ref_s)
        noisy = tgt_style + sig[:, None] * zn
        emb_mask = jnp.arange(T_pad)[None, :] < tok_lens[:, None]
        den = denoiser.apply(
            {"params": sp["params"]["diffusion"]}, noisy, sig,
            jax.lax.stop_gradient(bert_dur), emb_mask, tgt_style)
        lam = (sig**2 + SIGMA_DATA**2) / ((sig * SIGMA_DATA) ** 2)
        edm_loss = jnp.mean(lam * jnp.mean((den - tgt_style) ** 2, axis=-1))
        # keep the style scale where the sampler's preconditioning assumes
        sreg = 10.0 * (jnp.mean(ref_s**2) - SIGMA_DATA**2) ** 2
        return (spec_loss + wav_loss + 0.05 * dur_loss + f0_loss
                + edm_loss + sreg,
                (spec_loss, dur_loss, f0_loss, edm_loss, wav_loss))

    @jax.jit
    def step_fn(p, o, tokens, tok_lens, dur_tgt, dur_mask, frame_idx,
                n_frames, target, f0_tgt, sig, zn):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, tokens, tok_lens, dur_tgt, dur_mask, frame_idx, n_frames,
            target, f0_tgt, sig, zn)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss, aux

    out = ASSETS / "styletts2"
    out.mkdir(parents=True, exist_ok=True)

    def save_ckpt():
        for name in ("text", "style", "predict", "acoustic"):
            tmp = out / f".{name}.tmp.npz"
            save_params(tmp, jax.device_get(params[name]))
            tmp.replace(out / f"{name}.npz")

    rs = np.random.RandomState(seed + 1)
    key = jax.random.PRNGKey(seed + 2)
    t0 = time.time()
    for i in range(steps):
        tokens = np.zeros((batch, T_pad), np.int32)
        tok_lens = np.zeros((batch,), np.int32)
        dur_tgt = np.zeros((batch, T_pad), np.float32)
        dur_mask = np.zeros((batch, T_pad), np.float32)
        frame_idx = np.zeros((batch, F_pad), np.int32)
        n_frames = np.zeros((batch,), np.int32)
        target = np.zeros((batch, F_pad * 600), np.float32)
        f0_tgt = np.zeros((batch, 2 * F_pad), np.float32)
        for r in range(batch):
            n = int(rs.randint(1, max_words + 1))
            ids = rs.randint(0, tc.N_WORDS, size=n)
            # [pad, sym, space, sym, ..., sym] — the TextCleaner encoding of
            # the phonemized tone words, NO trailing pad (encode() appends
            # none; durations likewise end at the final word)
            seq = [0]
            for k_, w in enumerate(ids):
                seq.append(sym_ids[int(w)])
                if k_ + 1 < n:
                    seq.append(space_id)
            tokens[r, : len(seq)] = seq
            tok_lens[r] = len(seq)
            durs = fx.tts_durations(n)[: len(seq)]
            dur_tgt[r, : len(seq)] = durs
            dur_mask[r, : len(seq)] = 1.0
            total = int(durs.sum())
            frame_idx[r, :total] = np.repeat(
                np.arange(len(seq), dtype=np.int32), durs.astype(np.int64))
            n_frames[r] = total
            # source-aligned phase (per-sample cumsum variant) — see the
            # Kokoro trainer comment; makes wav_loss reachable
            target[r], f0_tgt[r] = fx.tts_target_audio_aligned(
                ids, F_pad, "styletts2")
        key, k_sig, k_zn = jax.random.split(key, 3)
        sig = jnp.exp(jax.random.uniform(
            k_sig, (batch,), minval=float(np.log(1e-3)),
            maxval=float(np.log(SIGMA_MAX))))
        zn = jax.random.normal(k_zn, (batch, 2 * half))
        params, opt_state, loss, aux = step_fn(
            params, opt_state, jnp.asarray(tokens), jnp.asarray(tok_lens),
            jnp.asarray(dur_tgt), jnp.asarray(dur_mask),
            jnp.asarray(frame_idx), jnp.asarray(n_frames),
            jnp.asarray(target), jnp.asarray(f0_tgt), sig, zn)
        if i % 50 == 0 or i == steps - 1:
            print(f"styletts2 step {i}: loss {float(loss):.4f} "
                  f"(spec {float(aux[0]):.4f} dur {float(aux[1]):.4f} "
                  f"f0 {float(aux[2]):.4f} edm {float(aux[3]):.4f} "
                  f"wav {float(aux[4]):.4f}) ({time.time() - t0:.0f}s)",
                  flush=True)
        if i > 0 and i % 1000 == 0:
            save_ckpt()
            print(f"styletts2 checkpoint @ step {i} -> {out}", flush=True)

    save_ckpt()
    print(f"styletts2 checkpoint -> {out}")
    return out


def eval_styletts2(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    d = fx.eval_styletts2_fixture()
    print(f"styletts2 eval roundtrip WER {d['roundtrip_wer_avg']*100:.2f}%, "
          f"duration MAE {d['dur_mae_frames']:.3f} frames")
    return d["roundtrip_wer_avg"]


# -------------------------------------------------------------- offline


def train_offline(steps: int, batch: int = 8, lr: float = 1e-3,
                  seed: int = 0) -> Path:
    """Trained offline-diarizer fixture: powerset segmentation (PIT CE) +
    masked-stats speaker embedder (speaker-classification CE) + a PLDA
    actually FITTED on the trained embeddings (two-covariance recipe), so
    the full AHC -> VBx chain runs on meaningful rho/psi instead of the
    random orthogonal stand-in."""
    from fluidaudio_tpu.models.pyannote_seg import (
        NUM_FRAMES, WINDOW_SAMPLES, PyannoteSegmentation,
    )
    from fluidaudio_tpu.models.wespeaker import WeSpeakerEmbedder, make_fbank_frontend
    from fluidaudio_tpu.train import fixtures as fx

    seg_cfg, emb_cfg = fx.offline_tiny_configs()
    seconds = WINDOW_SAMPLES / 16000.0  # 10 s windows

    def window_batch(rs, n, n_frames):
        """(audio [n, W], activity [n, n_frames, 2] by GLOBAL speaker id)."""
        audio = np.zeros((n, WINDOW_SAMPLES), np.float32)
        act = np.zeros((n, n_frames, 2), np.float32)
        centers = (np.arange(n_frames) + 0.5) * seconds / n_frames
        for b in range(n):
            mix, ref, _ = tc.diarizer_mixture(rs, seconds, overlap_prob=0.15)
            audio[b, : mix.size] = mix[:WINDOW_SAMPLES]
            for spk, s, e in ref:
                k = int(spk[-1])  # "spk0"/"spk1"
                act[b, (centers >= s) & (centers < e), k] = 1.0
        return audio, act

    # ---- stage 1: segmentation (PIT powerset CE) ----
    seg_model = PyannoteSegmentation(seg_cfg)
    seg_params = jax.jit(seg_model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, WINDOW_SAMPLES), jnp.float32))
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(seg_params)

    def powerset_targets(act):  # [B, T, 2] -> per-permutation class ids [2, B, T]
        a, b = act[..., 0], act[..., 1]
        # table rows: 0 none, 1 S1, 2 S2, 4 S1+S2
        ids_ab = (a * (1 - b) * 1 + (1 - a) * b * 2 + a * b * 4).astype(jnp.int32)
        ids_ba = (b * (1 - a) * 1 + (1 - b) * a * 2 + a * b * 4).astype(jnp.int32)
        return jnp.stack([ids_ab, ids_ba])

    def seg_loss(p, audio, act):
        logits = seg_model.apply(p, audio)  # [B, 589, 7]
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = powerset_targets(act)  # [2, B, T]
        ce = -jnp.take_along_axis(
            jnp.broadcast_to(logp[None], (2,) + logp.shape),
            tgt[..., None], axis=-1)[..., 0]  # [2, B, T]
        return jnp.mean(jnp.min(jnp.mean(ce, axis=2), axis=0))  # PIT per window

    @jax.jit
    def seg_step(p, o, audio, act):
        loss, grads = jax.value_and_grad(seg_loss)(p, audio, act)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        audio, act = window_batch(rs, batch, NUM_FRAMES)
        seg_params, opt_state, loss = seg_step(
            seg_params, opt_state, jnp.asarray(audio), jnp.asarray(act))
        if i % 50 == 0 or i == steps - 1:
            print(f"offline/seg step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---- stage 2: embedder (masked speaker classification) ----
    embedder = WeSpeakerEmbedder(emb_cfg)
    fbank = make_fbank_frontend()
    mel_frames = fbank.num_frames(WINDOW_SAMPLES)

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 2))
    mel0 = jnp.zeros((1, mel_frames, emb_cfg.n_mels), jnp.float32)
    emb_params = jax.jit(embedder.init)(k1, mel0, jnp.ones((1, mel_frames)))
    head = jax.random.normal(k2, (emb_cfg.embedding_dim, 2)) * 0.1
    packed = {"emb": emb_params, "head": head}
    tx2 = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt2 = tx2.init(packed)

    def emb_batch(rs, n):
        """Masked single-speaker views of mixture windows + speaker labels."""
        audio = np.zeros((n, WINDOW_SAMPLES), np.float32)
        masks = np.zeros((n, mel_frames), np.float32)
        labels = np.zeros((n,), np.int32)
        centers = (np.arange(mel_frames) + 0.5) * seconds / mel_frames
        b = 0
        while b < n:
            mix, ref, _ = tc.diarizer_mixture(rs, seconds, overlap_prob=0.15)
            act = np.zeros((mel_frames, 2), np.float32)
            for spk, s, e in ref:
                act[(centers >= s) & (centers < e), int(spk[-1])] = 1.0
            k = int(rs.randint(0, 2))
            clean = act[:, k] * (act.sum(axis=1) < 2)  # overlap-suppressed
            if clean.sum() < 10:
                continue
            audio[b, : mix.size] = mix[:WINDOW_SAMPLES]
            masks[b] = clean
            labels[b] = k
            b += 1
        return audio, masks, labels

    def emb_loss(p, audio, masks, labels):
        mel, _ = fbank(audio)
        mel_t = jnp.transpose(mel, (0, 2, 1))
        emb = embedder.apply(p["emb"], mel_t, masks)
        # AM-softmax (wespeaker's own training objective): cosine logits
        # with an additive margin. Plain CE separates via a hyperplane but
        # leaves inter-class COSINE similarity high — and the downstream
        # AHC warm start clusters on cosine (ahc.py), so margin training is
        # a functional requirement, not a nicety (first run: mean inter-
        # class cos 0.70 > the 0.4 merge threshold -> 1 cluster, DER 45%).
        e = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)
        w = p["head"] / (jnp.linalg.norm(p["head"], axis=0, keepdims=True) + 1e-6)
        cos = e @ w  # [B, 2]
        onehot = jax.nn.one_hot(labels, 2)
        logits = 10.0 * (cos - 0.3 * onehot)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    @jax.jit
    def emb_step(p, o, audio, masks, labels):
        loss, grads = jax.value_and_grad(emb_loss)(p, audio, masks, labels)
        updates, o2 = tx2.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    t0 = time.time()
    for i in range(steps):
        audio, masks, labels = emb_batch(rs, batch)
        packed, opt2, loss = emb_step(packed, opt2, jnp.asarray(audio),
                                      jnp.asarray(masks), jnp.asarray(labels))
        if i % 50 == 0 or i == steps - 1:
            print(f"offline/emb step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    emb_params = packed["emb"]

    # ---- stage 3: fit PLDA on the trained embeddings -----------------------
    # two-covariance recipe: whiten within-class scatter, diagonalize the
    # between-class scatter in the whitened space; psi = across-class
    # variances (the BUT VBx preprocessing the reference loads from
    # plda-parameters.json)
    emb_fn = jax.jit(lambda a, m: embedder.apply(
        emb_params, jnp.transpose(fbank(a)[0], (0, 2, 1)), m))
    all_embs, all_labels = [], []
    for _ in range(16):
        audio, masks, labels = emb_batch(rs, batch)
        all_embs.append(np.asarray(emb_fn(jnp.asarray(audio), jnp.asarray(masks))))
        all_labels.append(labels)
    X = np.concatenate(all_embs)  # [N, D]
    y = np.concatenate(all_labels)
    mu = X.mean(axis=0)
    Xc = X - mu
    D = X.shape[1]
    Sw = np.zeros((D, D))
    Sb = np.zeros((D, D))
    for k in (0, 1):
        cls = Xc[y == k]
        cm = cls.mean(axis=0)
        Sw += (cls - cm).T @ (cls - cm)
        Sb += len(cls) * np.outer(cm, cm)
    Sw /= len(X)
    Sb /= len(X)
    evals, evecs = np.linalg.eigh(Sw + 1e-4 * np.eye(D))
    W = evecs @ np.diag(evals**-0.5) @ evecs.T  # whitener
    Bw = W @ Sb @ W.T
    bvals, bvecs = np.linalg.eigh(Bw)
    order = np.argsort(bvals)[::-1]
    transform = (W.T @ bvecs[:, order]).astype(np.float32)  # [D, D]
    psi = np.maximum(bvals[order], 0.0).astype(np.float32)

    out = ASSETS / "offline"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "segmentation.npz", jax.device_get(seg_params))
    save_params(out / "embedding.npz", jax.device_get(emb_params))
    np.savez(out / "plda_rho.npz", mean=mu.astype(np.float32),
             transform=transform, psi=psi)
    print(f"offline checkpoints -> {out}")
    return out


def eval_offline(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    d = fx.eval_offline_diarizer_fixture()
    print(f"offline eval DER {d*100:.2f}%")
    return d


# --------------------------------------------------------------- lseend


def train_lseend(steps: int, batch: int = 4, lr: float = 1e-3,
                 seed: int = 0) -> Path:
    """Trained LS-EEND fixture: recurrent attractor diarizer, streaming.

    Trains EXACTLY as the manager infers: per-500 ms-step mel with
    per_feature CMN computed on each step buffer independently (the manager's
    `process_step` does per-step normalization, so whole-file mel would be a
    train/infer mismatch), subsample+context stacking, then a `lax.scan` of
    the attractor step carrying `LsEendState`. Arrival-order BCE labels;
    warmup frames (first 900 ms, forced to zero by the model) are masked."""
    from fluidaudio_tpu.models.lseend import (
        LSEEND_SAMPLE_RATE, LSEEND_TEST, MAX_SPEAKERS, LsEendModel,
        init_state, subsample_with_context,
    )
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend

    cfg = LSEEND_TEST
    step_frames = 5  # 500 ms manager default
    step_samples = step_frames * LSEEND_SAMPLE_RATE // 10
    n_steps = 40  # 20 s examples
    T = n_steps * step_frames
    model = LsEendModel(cfg)
    mel = MelFrontend(MelConfig(
        sample_rate=LSEEND_SAMPLE_RATE, n_mels=cfg.n_mels, n_fft=256,
        hop_length=80, win_length=200, normalize="per_feature",
    ))

    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, step_frames, cfg.feat_dim), jnp.float32),
        init_state(cfg, 1),
    )
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, audio8k, labels):
        B = audio8k.shape[0]
        m, _ = mel(audio8k.reshape(B * n_steps, step_samples))
        m = m[:, :, : step_frames * cfg.subsample]
        feats = subsample_with_context(m, cfg).reshape(
            B, n_steps, step_frames, cfg.feat_dim)

        def scan_step(state, f):
            acts, new_state = model.apply(p, f, state)
            return new_state, acts

        _, acts = jax.lax.scan(scan_step, init_state(cfg, B),
                               jnp.transpose(feats, (1, 0, 2, 3)))
        acts = jnp.transpose(acts, (1, 0, 2, 3)).reshape(B, T, MAX_SPEAKERS)
        pr = jnp.clip(acts, 1e-6, 1 - 1e-6)
        bce = -(labels * jnp.log(pr) + (1 - labels) * jnp.log1p(-pr))
        warm = (jnp.arange(T) >= cfg.warmup_frames).astype(jnp.float32)
        return jnp.sum(bce * warm[None, :, None]) / (
            jnp.sum(warm) * B * MAX_SPEAKERS)

    @jax.jit
    def step_fn(p, o, audio, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, audio, labels)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        audio, labels = tc.lseend_batch(rs, batch, n_steps, step_frames)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(audio), jnp.asarray(labels))
        if i % 50 == 0 or i == steps - 1:
            print(f"lseend step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "lseend"
    out.mkdir(parents=True, exist_ok=True)
    save_params(out / "model.npz", jax.device_get(params))
    print(f"lseend checkpoint -> {out}")
    return out


def eval_lseend(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    d = fx.eval_lseend_fixture()
    print(f"lseend eval DER {d*100:.2f}%")
    return d


# ------------------------------------------------------------------ eou


def train_eou(steps: int, batch: int = 8, lr: float = 2e-3, seed: int = 0) -> Path:
    """Trained streaming EOU fixture: cache-carrying conformer + RNN-T.

    The encoder trains EXACTLY as it infers — a `lax.scan` of the per-chunk
    step (mel pre-cache, attention channel cache, conv time cache) over 320 ms
    chunks — so the cache semantics themselves are under the quality gate, not
    just the offline math. Labels end with the EOU token (id 16 in EOU_TEST),
    teaching end-of-utterance detection; the decode loop flags it without
    emitting it into the transcript (`ops/tdt_decode.py` eou_id semantics,
    reference `RnntDecoder.swift:31-32`)."""
    from fluidaudio_tpu.asr.streaming_eou import EOU_TEST, MEL_HOP, MEL_WIN
    from fluidaudio_tpu.models.conformer_streaming import (
        StreamingConformerEncoder, init_caches,
    )
    from fluidaudio_tpu.models.predictor import (
        PredictorConfig, RnntJoint, RnntPredictor,
    )
    from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
    from fluidaudio_tpu.train import fixtures as fx
    from fluidaudio_tpu.train.transducer_loss import rnnt_loss

    spec = EOU_TEST
    cfg = spec.enc_cfg
    chunk_samples = 320 * 16000 // 1000  # train at the 320 ms tier
    mel_frames = chunk_samples // MEL_HOP  # 32 mel frames / chunk
    n_chunks = 12  # 3.84 s window fits 7 words + trailing silence
    window = n_chunks * chunk_samples + (MEL_WIN - MEL_HOP)
    enc_per_chunk = mel_frames // 8
    T = n_chunks * enc_per_chunk
    max_words = 7
    u_max = max_words + 1  # + EOU label

    encoder = StreamingConformerEncoder(cfg)
    pcfg = PredictorConfig(
        vocab_size=spec.blank_id, pred_hidden=spec.pred_hidden, n_layers=1,
        enc_hidden=cfg.d_model, joint_hidden=spec.joint_hidden, n_durations=0,
    )
    predictor = RnntPredictor(pcfg)
    joint = RnntJoint(pcfg)
    mel = MelFrontend(MelConfig(center=False, normalize=None))

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = {
        "encoder": jax.jit(encoder.init)(
            k1, jnp.zeros((1, cfg.n_mels, mel_frames), jnp.float32),
            init_caches(cfg, 1),
        ),
        "predictor": jax.jit(predictor.init)(
            k2, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, pcfg.pred_hidden)),
            jnp.zeros((1, 1, pcfg.pred_hidden)),
        ),
        "joint": jax.jit(joint.init)(
            k3, jnp.zeros((1, cfg.d_model)), jnp.zeros((1, pcfg.pred_hidden)),
        ),
    }
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    def loss_fn(p, audio, labels, label_lens, t_lens):
        B = audio.shape[0]
        m, _ = mel(audio, jnp.full((B,), audio.shape[1], jnp.int32))
        m = m[:, :, : n_chunks * mel_frames]
        chunks = jnp.transpose(
            m.reshape(B, cfg.n_mels, n_chunks, mel_frames), (2, 0, 1, 3))

        def enc_step(caches, mel_chunk):
            out, new_caches = encoder.apply(p["encoder"], mel_chunk, caches)
            return new_caches, out

        _, outs = jax.lax.scan(enc_step, init_caches(cfg, B), chunks)
        f = jnp.transpose(outs, (1, 0, 2, 3)).reshape(B, T, cfg.d_model)

        # teacher-forced predictor over [SOS(blank), y_0 .. y_{U-1}]
        U = labels.shape[1]
        toks = jnp.concatenate(
            [jnp.full((B, 1), pcfg.blank_id, jnp.int32), labels], axis=1)
        h0 = jnp.zeros((pcfg.n_layers, B, pcfg.pred_hidden))

        def pred_step(carry, tok):
            h, c = carry
            g, h2, c2 = predictor.apply(p["predictor"], tok, h, c)
            return (h2, c2), g

        _, gs = jax.lax.scan(pred_step, (h0, h0), jnp.transpose(toks))
        g = jnp.transpose(gs, (1, 0, 2))  # [B, U+1, H]

        logits = joint.apply(p["joint"], f[:, :, None, :], g[:, None, :, :])
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = rnnt_loss(logp, labels, t_lens, label_lens, pcfg.blank_id)
        return jnp.mean(nll / jnp.maximum(label_lens, 1))

    @jax.jit
    def step_fn(p, o, audio, labels, label_lens, t_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, audio, labels, label_lens, t_lens)
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, loss

    # EOU is SILENCE-driven (reference ParakeetEouCommand.swift:22 — "minimum
    # silence duration before EOU triggers"): the model must observe a pause,
    # then flag. Free RNN-T alignment would let it defer EOU arbitrarily deep
    # into silence, so the lattice is cut `eou_deadline` frames (~1 s) after
    # the utterance ends — bounded detection latency, trained directly.
    eou_deadline = 12  # encoder frames (80 ms each) after utterance end
    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        audio = np.zeros((batch, window), np.float32)
        labels = np.zeros((batch, u_max), np.int32)
        lens = np.zeros((batch,), np.int32)
        t_lens = np.zeros((batch,), np.int32)
        for r in range(batch):
            n = int(rs.randint(2, max_words + 1))
            ids = rs.randint(0, tc.N_WORDS, size=n)
            utt = tc.make_utterance(ids, rs)[:window]
            # random placement, always leaving >= deadline frames of silence
            max_off = max(0, window - utt.size - eou_deadline * 1280)
            off = int(rs.randint(0, max_off + 1))
            audio[r, off : off + utt.size] = utt
            labels[r, :n] = ids
            labels[r, n] = spec.eou_token_id
            lens[r] = n + 1
            t_lens[r] = min(T, -(-(off + utt.size) // 1280) + eou_deadline)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(audio),
            jnp.asarray(labels), jnp.asarray(lens), jnp.asarray(t_lens),
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"eou step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    out = ASSETS / "eou"
    out.mkdir(parents=True, exist_ok=True)
    for part in ("encoder", "predictor", "joint"):
        save_params(out / f"{part}.npz", jax.device_get(params[part]))
    fx.write_family_vocab(out / "vocab.json", 0, {16: "<eou>"})
    print(f"eou checkpoint -> {out}")
    return out


def eval_eou(_: Path) -> float:
    from fluidaudio_tpu.train import fixtures as fx

    scores = fx.eval_eou_fixture()
    print(f"eou eval avg WER {scores['wer_avg']*100:.2f}%, "
          f"EOU detect rate {scores['eou_detect_rate']*100:.0f}%")
    return scores["wer_avg"]


def main() -> int:
    families = ["asr", "vad", "sortformer", "sensevoice", "paraformer",
                "cohere", "eou", "lseend", "offline", "nemotron", "ctc",
                "tts", "pocket", "styletts2"]
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
                "sensevoice": 1500, "paraformer": 1500, "cohere": 1500,
                "eou": 1800, "lseend": 1200, "offline": 800,
                "nemotron": 2400, "ctc": 600, "tts": 3000, "pocket": 4000,
                "styletts2": 4000}
    train_fns = {"asr": train_asr, "vad": train_vad,
                 "sortformer": train_sortformer, "sensevoice": train_sensevoice,
                 "paraformer": train_paraformer, "cohere": train_cohere,
                 "eou": train_eou, "lseend": train_lseend,
                 "offline": train_offline, "nemotron": train_nemotron,
                 "ctc": train_ctc, "tts": train_tts, "pocket": train_pocket,
                 "styletts2": train_styletts2}
    eval_fns = {"asr": eval_asr, "vad": eval_vad,
                "sortformer": eval_sortformer, "sensevoice": eval_sensevoice,
                "paraformer": eval_paraformer, "cohere": eval_cohere,
                "eou": eval_eou, "lseend": eval_lseend,
                "offline": eval_offline, "nemotron": eval_nemotron,
                "ctc": eval_ctc, "tts": eval_tts, "pocket": eval_pocket,
                "styletts2": eval_styletts2}
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
