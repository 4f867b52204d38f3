"""Configuration system for the TPU-native DualAR TTS framework.

JSON-file-driven, pydantic-validated configs, interoperable with the reference
checkpoint format: `DualARConfig` accepts the exact `config.json` field names
written by the reference trainer (see /root/reference/modeling/model/
rq_transformer.py:25-115 and sample_model_sizes/smoltts_byte_150m.json), so
released `smoltts_v0` checkpoints load without translation.

New TPU-specific sections (mesh/sharding/runtime) live in `RuntimeConfig` and
`TrainingConfig` and have no reference counterpart.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple, Union

from pydantic import BaseModel, ConfigDict, Field, model_validator


class ModelType(BaseModel):
    """Model family registry (reference: mlx .../lm/config.py:5-12)."""

    family: str  # "dual_ar" | "fish"
    version: Optional[str] = None
    codec: str = "mimi"

    @classmethod
    def smoltts_v0(cls) -> "ModelType":
        return cls(family="dual_ar", version=None, codec="mimi")


class DualARConfig(BaseModel):
    """DualAR / RQ-Transformer model hyperparameters.

    Field names mirror the reference `config.json` schema
    (modeling/model/rq_transformer.py:25-115) for checkpoint interop.
    Unknown keys are ignored so legacy configs (is_reward_model, etc.) load.
    """

    model_config = ConfigDict(extra="ignore", protected_namespaces=())

    model_type: str = "dual_ar"

    # Slow (backbone) transformer
    vocab_size: int = 2368
    n_layer: int = 10
    n_head: int = 12
    n_local_heads: int = -1  # GQA KV heads; -1 means == n_head
    head_dim: int = 64
    dim: int = 768
    intermediate_size: int = 3072
    rope_base: float = 10_000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048
    dropout: float = 0.0
    tie_word_embeddings: bool = True
    attention_qkv_bias: bool = False
    initializer_range: float = 0.02

    # Codebooks
    codebook_size: int = 2048
    num_codebooks: int = 8

    # Fast (depth) transformer
    fast_dim: Optional[int] = None
    n_fast_layer: int = 4
    fast_n_head: Optional[int] = None
    fast_n_local_heads: Optional[int] = None
    fast_head_dim: Optional[int] = None
    fast_intermediate_size: Optional[int] = None
    fast_attention_qkv_bias: Optional[bool] = None
    depthwise_wte: bool = False
    depthwise_output: bool = False
    duplicate_code_0: bool = True

    # Training-time flags
    use_gradient_checkpointing: bool = False

    @model_validator(mode="after")
    def _fill_defaults(self) -> "DualARConfig":
        if self.n_local_heads == -1:
            self.n_local_heads = self.n_head
        self.head_dim = self.dim // self.n_head
        if self.fast_dim is None:
            self.fast_dim = self.dim
        if self.fast_n_head is None:
            self.fast_n_head = self.n_head
        if self.fast_n_local_heads is None:
            self.fast_n_local_heads = self.n_local_heads
        self.fast_head_dim = self.fast_dim // self.fast_n_head
        if self.fast_intermediate_size is None:
            self.fast_intermediate_size = self.intermediate_size
        if self.fast_attention_qkv_bias is None:
            self.fast_attention_qkv_bias = self.attention_qkv_bias
        return self

    # Derived quantities -------------------------------------------------

    @property
    def num_rows(self) -> int:
        """Rows per time step: 1 text row + codebook rows.

        With duplicate_code_0 the semantic (Mimi level 0) code is carried both
        as a `<|semantic:n|>` token in row 0 and as codebook row 1, so there
        are 1 + num_codebooks rows; otherwise the semantic code lives only in
        row 0 and there are 1 + (num_codebooks - 1) rows
        (reference: train/data.py:48, rq_transformer.py:344-346).
        """
        return 1 + self.num_codebooks - (0 if self.duplicate_code_0 else 1)

    @property
    def max_fast_seqlen(self) -> int:
        """Fast-transformer sequence length (number of codes it predicts)."""
        return self.num_codebooks - (0 if self.duplicate_code_0 else 1)

    @property
    def fast_embedding_rows(self) -> int:
        """Fast input-embedding table rows (rq_transformer.py:348-353)."""
        if self.depthwise_wte:
            return self.codebook_size * (self.num_codebooks - 1)
        return self.codebook_size

    # IO -----------------------------------------------------------------

    @classmethod
    def from_json_file(cls, path: Union[str, Path]) -> "DualARConfig":
        p = Path(path)
        if p.is_dir():
            p = p / "config.json"
        with open(p, "r", encoding="utf-8") as f:
            return cls.model_validate_json(f.read())

    def save(self, path: Union[str, Path]) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                self.model_dump(), f, indent=4, sort_keys=True, ensure_ascii=False
            )


def smoltts_byte_150m() -> DualARConfig:
    """The released 150M config (sample_model_sizes/smoltts_byte_150m.json)."""
    return DualARConfig(
        vocab_size=2368,
        n_layer=10,
        n_head=12,
        n_local_heads=4,
        dim=768,
        intermediate_size=3072,
        rope_base=100_000,
        dropout=0.1,
        codebook_size=2048,
        num_codebooks=8,
        fast_dim=768,
        n_fast_layer=4,
        fast_n_head=12,
        fast_n_local_heads=4,
        fast_intermediate_size=3072,
        depthwise_wte=True,
        depthwise_output=True,
        duplicate_code_0=True,
        tie_word_embeddings=True,
        use_gradient_checkpointing=True,
        initializer_range=0.041666666666666664,
    )


def smoltts_byte_70m() -> DualARConfig:
    """The released 70M config (sample_model_sizes/smoltts_byte_70m.json)."""
    cfg = smoltts_byte_150m()
    return cfg.model_copy(
        update=dict(
            dim=576,
            n_head=9,
            n_local_heads=3,
            intermediate_size=1536,
            fast_dim=576,
            fast_n_head=9,
            fast_n_local_heads=3,
            fast_intermediate_size=1536,
        )
    )


def tiny_debug_config(**overrides) -> DualARConfig:
    """A tiny config for tests: full feature surface, minute dims."""
    base = dict(
        vocab_size=2368,
        n_layer=2,
        n_head=2,
        n_local_heads=1,
        dim=64,
        intermediate_size=128,
        rope_base=100_000,
        codebook_size=2048,
        num_codebooks=8,
        fast_dim=64,
        n_fast_layer=2,
        fast_n_head=2,
        fast_n_local_heads=1,
        fast_intermediate_size=128,
        depthwise_wte=True,
        depthwise_output=True,
        duplicate_code_0=True,
        max_seq_len=128,
        dropout=0.0,
    )
    base.update(overrides)
    return DualARConfig(**base)


class TrainingConfig(BaseModel):
    """Training-run config (reference: train/config.py:6-43) plus TPU extras."""

    model_config = ConfigDict(extra="ignore")

    # Core paths and identifiers
    project_name: str = "smoltts_train"
    checkpoint_path: str = "checkpoints"
    model_path: str = "pretrained_model"
    dataset_path: str = ""
    init_folder: str = ""

    # Training params
    batch_size: int = 8
    max_epochs: int = 10
    num_workers: int = 4
    gradient_clip: float = 1.0
    accumulate_steps: int = 1

    # Optimizer
    learning_rate: float = 1e-4
    lr_start: float = 1e-3
    lr_warmup_steps: int = 3000
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-5

    # Validation & checkpointing
    val_every_n_steps: int = 100
    save_every_n_steps: int = 500
    keep_last_n_checkpoints: int = 5

    # Model/data params
    max_sequence_length: int = 896
    use_bf16: bool = True
    use_wandb: bool = False
    use_pretrained: bool = True

    # --- TPU-native extras (no reference counterpart) ---
    # Device mesh: data-parallel x model(tensor)-parallel.
    mesh_data_axis: int = -1  # -1: all devices on the data axis
    mesh_model_axis: int = 1
    # Sequence parallelism: shard [B, T, dim] activations' T over the `model`
    # axis (long packed sequences; GSPMD inserts the attention all-gathers).
    sequence_parallel: bool = False
    # Preemption recovery: resume from the newest checkpoint under
    # checkpoint_path at startup (SURVEY §5 failure/recovery).
    auto_resume: bool = False
    seed: int = 0
    log_every_n_steps: int = 10
    remat_policy: str = "none"  # "none" | "dots" (see models/dual_ar.run_trunk)
    # >0: compute the fast-trunk + codebook-CE fused and CHUNKED over the
    # time axis (fast_chunk_t slow positions per chunk) instead of
    # materializing the [B, T, n, codebook_size] logits — the dominant
    # training activation (~0.4 GB bf16 at batch 16 x seq 768, plus fp32
    # softmax residuals held for backward). Identical losses/grads
    # (tests/test_chunked_loss.py); unlocks batch >= 32 at 150M on 16 GB.
    # Must divide the padded sequence length. 0 = dense path.
    fast_chunk_t: int = 0
    # >0: capture a jax.profiler trace over steps [2, 2+profile_steps) — the
    # TPU equivalent of the reference's nsys run config
    # (config/kokoro_v0.19/pg_kokoro_wte_nsys.json).
    profile_steps: int = 0
    profile_dir: str = "/tmp/smoltts_trace"


def load_training_config(path: Union[str, Path]) -> TrainingConfig:
    with open(path) as f:
        return TrainingConfig(**json.load(f))
