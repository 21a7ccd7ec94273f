"""Model zoo: assemble frontends + networks + params per model family/version.

Behavioral parity: reference `TDT/AsrModels.swift:5-54,229,425,452-483` —
version enum with per-version blank id / hidden size / decoder layers, download
+ load + validate + auto-recovery. Here "load" = npz param pytrees from the
registry cache; absent checkpoints fall back to seeded random init (explicit
opt-in) so throughput benchmarks and hermetic tests run without assets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp

from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder
from fluidaudio_tpu.models.predictor import PredictorConfig, RnntJoint, RnntPredictor
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("models")


@dataclass(frozen=True)
class AsrVersionSpec:
    """Per-version model hyperparameters (AsrModels.swift version table)."""

    name: str
    repo: Repo
    conformer: ConformerConfig
    predictor: PredictorConfig
    mel: MelConfig
    fused_frontend: bool = False


ASR_VERSIONS: dict[str, AsrVersionSpec] = {
    "v3": AsrVersionSpec(
        name="v3",
        repo=Repo.PARAKEET_V3,
        conformer=ConformerConfig(d_model=1024, n_layers=24, n_heads=8),
        predictor=PredictorConfig(vocab_size=8192, n_layers=1, enc_hidden=1024),
        mel=MelConfig(normalize="per_feature"),
    ),
    "v2": AsrVersionSpec(
        name="v2",
        repo=Repo.PARAKEET_V2,
        conformer=ConformerConfig(d_model=1024, n_layers=24, n_heads=8),
        predictor=PredictorConfig(vocab_size=1024, n_layers=2, enc_hidden=1024),
        mel=MelConfig(normalize="per_feature"),
    ),
    "tdt-ctc-110m": AsrVersionSpec(
        name="tdt-ctc-110m",
        repo=Repo.PARAKEET_TDT_CTC_110M,
        conformer=ConformerConfig(d_model=512, n_layers=17, n_heads=8),
        predictor=PredictorConfig(vocab_size=1024, n_layers=1, enc_hidden=512,
                                  pred_hidden=640, joint_hidden=640),
        mel=MelConfig(normalize="per_feature"),
    ),
    "tdt-ja": AsrVersionSpec(
        name="tdt-ja",
        repo=Repo.PARAKEET_JA,
        conformer=ConformerConfig(d_model=1024, n_layers=24, n_heads=8),
        predictor=PredictorConfig(vocab_size=3072, n_layers=1, enc_hidden=1024),
        mel=MelConfig(normalize="per_feature"),
    ),
    # tiny fixture for hermetic tests / fast compiles
    "test-tiny": AsrVersionSpec(
        name="test-tiny",
        repo=Repo.PARAKEET_V3,
        conformer=ConformerConfig(d_model=64, n_layers=2, n_heads=4,
                                  subsampling_channels=32, dtype="float32"),
        predictor=PredictorConfig(vocab_size=64, n_layers=1, enc_hidden=64,
                                  pred_hidden=32, joint_hidden=32),
        mel=MelConfig(normalize="per_feature"),
    ),
}


@dataclass
class AsrModels:
    spec: AsrVersionSpec
    mel: MelFrontend
    encoder: ConformerEncoder
    predictor: RnntPredictor
    joint: RnntJoint
    params: dict[str, Any]  # {"encoder":..., "predictor":..., "joint":...}
    tokenizer: Tokenizer

    @property
    def blank_id(self) -> int:
        return self.spec.predictor.blank_id

    @classmethod
    def load(
        cls,
        version: str = "v3",
        checkpoint_dir: str | Path | None = None,
        *,
        allow_random_init: bool = True,
        rng_seed: int = 0,
        dtype: str | None = None,
        quantization: str | None = None,
    ) -> "AsrModels":
        spec = ASR_VERSIONS[version]
        overrides = {}
        if dtype is not None:
            overrides["dtype"] = dtype
        if quantization is not None:
            overrides["quantization"] = quantization
        if overrides:
            spec = AsrVersionSpec(
                spec.name, spec.repo,
                ConformerConfig(**{**spec.conformer.__dict__, **overrides}),
                spec.predictor, spec.mel, spec.fused_frontend,
            )
        # strided-conv DFT on accelerators: bit-identical to the matmul DFT
        # at HIGHEST precision, ~12% faster on v5e (no gather/frame tensor);
        # CPU keeps the matmul path (XLA:CPU convs are slower there)
        mel = MelFrontend(
            spec.mel, use_fft="conv" if jax.default_backend() != "cpu" else False
        )
        encoder = ConformerEncoder(spec.conformer)
        predictor = RnntPredictor(spec.predictor)
        joint = RnntJoint(spec.predictor)

        rng = jax.random.PRNGKey(rng_seed)
        k_enc, k_pred, k_joint = jax.random.split(rng, 3)
        # init with a short dummy window (shapes are data-independent).
        # jit the inits: eager init of a 0.6B model dispatches thousands of
        # individual ops (pathological over the remote-TPU relay).
        dummy_mel = jnp.zeros((1, spec.mel.n_mels, 101), jnp.float32)
        dummy_len = jnp.array([101], jnp.int32)
        # int8 mode: init/load the f32 tree, then pre-quantize the Dense
        # kernels into the Int8Dense layout (weights quantize once at load,
        # not in-graph — see ops/quant.py)
        if spec.conformer.quantization == "int8":
            f32_cfg = ConformerConfig(
                **{**spec.conformer.__dict__, "quantization": "none"}
            )
            enc_for_load = ConformerEncoder(f32_cfg)
        else:
            enc_for_load = encoder
        params = {
            "encoder": jax.jit(enc_for_load.init)(k_enc, dummy_mel, dummy_len),
            "predictor": jax.jit(predictor.init)(
                k_pred,
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((spec.predictor.n_layers, 1, spec.predictor.pred_hidden)),
                jnp.zeros((spec.predictor.n_layers, 1, spec.predictor.pred_hidden)),
            ),
            "joint": jax.jit(joint.init)(
                k_joint,
                jnp.zeros((1, spec.predictor.enc_hidden)),
                jnp.zeros((1, spec.predictor.pred_hidden)),
            ),
        }

        if checkpoint_dir:
            ckpt_dir = Path(checkpoint_dir)
        elif allow_random_init:
            ckpt_dir = DownloadUtils.repo_dir(spec.repo)
        else:
            # weights required: validate + auto-repair the cache (fetch
            # missing artifacts, refetch corrupt npz) before loading — the
            # reference's loadWithAutoRecovery contract
            # (TDT/AsrModels.swift:425-435, DownloadUtils.swift:310-344)
            from fluidaudio_tpu.registry.doctor import ensure_repo

            ckpt_dir = ensure_repo(spec.repo)
        loaded_any = False
        for part in ("encoder", "predictor", "joint"):
            f = ckpt_dir / f"{part}.npz"
            if f.exists():
                params[part] = load_params(f, params[part])
                loaded_any = True
        if not loaded_any:
            if not allow_random_init:
                raise FileNotFoundError(
                    f"no checkpoints for {version} in {ckpt_dir}; pass allow_random_init=True"
                )
            logger.warning("ASR %s: no checkpoints in %s — using seeded random init", version, ckpt_dir)

        if spec.conformer.quantization == "int8":
            from fluidaudio_tpu.ops.quant import quantize_dense_tree

            params["encoder"] = jax.jit(quantize_dense_tree)(params["encoder"])

        vocab_file = ckpt_dir / "vocab.json"
        if vocab_file.exists():
            tokenizer = Tokenizer.from_json(vocab_file)
        else:
            tokenizer = Tokenizer(_placeholder_vocab(spec.predictor.vocab_size))

        return cls(spec, mel, encoder, predictor, joint, params, tokenizer)


def _placeholder_vocab(vocab_size: int) -> dict[int, str]:
    """Synthetic SentencePiece-shaped vocab so pipelines run without assets."""
    vocab = {}
    for i in range(vocab_size):
        piece = f"tok{i}"
        vocab[i] = ("▁" + piece) if i % 3 != 2 else piece
    return vocab
