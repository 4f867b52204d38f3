"""Device mesh construction and sharding rules (GSPMD / pjit).

The reference has no distributed backend at all (SURVEY.md §2.7: single-GPU
training, single-stream inference). This module is the from-scratch
TPU-native scaling layer:

- a 2-D logical mesh `('data', 'model')` over ICI;
- NamedSharding rules for the DualAR parameter pytree: Megatron-style tensor
  parallelism on the attention/FFN matmuls (wqkv/w1/w3 column-split, wo/w2
  row-split), vocab/codebook-split output heads, replicated norms/embeddings;
- batch sharding over 'data' for training and over decode slots at serving.

Annotate with `jax.jit(..., in_shardings/out_shardings)` and let XLA insert
the collectives (all-reduce for row-parallel matmuls and DP grads).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model == n, f"mesh {n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_partition_specs(params: dict) -> dict:
    """PartitionSpec pytree for a DualAR param pytree (models/dual_ar.py).

    Trunk weights carry a leading stacked-layer axis (never sharded).
    """

    def trunk_specs(trunk: dict) -> dict:
        specs = {
            "attention_norm": P(),
            "ffn_norm": P(),
            "wqkv": P(None, None, MODEL_AXIS),  # column parallel
            "wo": P(None, MODEL_AXIS, None),  # row parallel
            "w1": P(None, None, MODEL_AXIS),
            "w3": P(None, None, MODEL_AXIS),
            "w2": P(None, MODEL_AXIS, None),
        }
        if "wqkv_bias" in trunk:
            specs["wqkv_bias"] = P(None, MODEL_AXIS)
        return specs

    specs: dict = {
        "embeddings": P(),
        "codebook_embeddings": P(),
        "layers": trunk_specs(params["layers"]),
        "norm": P(),
        "fast_embeddings": P(),
        "fast_layers": trunk_specs(params["fast_layers"]),
        "fast_norm": P(),
    }
    if "output" in params:
        specs["output"] = P(None, MODEL_AXIS)  # vocab-split logits
    if "fast_project_in" in params:
        specs["fast_project_in"] = {"kernel": P(), "bias": P()}
    fo = params["fast_output"]
    specs["fast_output"] = (
        P(None, None, MODEL_AXIS) if getattr(fo, "ndim", 3) == 3 else P(None, MODEL_AXIS)
    )
    return specs


def param_shardings(mesh: Mesh, params: dict) -> dict:
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Token batches [B, R, T] sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Device_put the param pytree with TP shardings."""
    sh = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, sh)
