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


_DISTRIBUTED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-process JAX runtime (jax.distributed) — the DCN
    entry the reference never needed (single-GPU; SURVEY.md §2.2/§2.7 item 1).

    On TPU pod slices all arguments come from the TPU metadata environment, so
    call with no args; explicit args drive the CPU multi-process tests
    (tests/test_multihost.py launches 2 processes x 4 virtual devices over a
    local coordinator). Idempotent within a process."""
    global _DISTRIBUTED
    if _DISTRIBUTED:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED = True


def make_multihost_mesh(n_model: int = 1) -> Mesh:
    """DCN-aware mesh: the model axis stays inside one process's ICI domain;
    the data axis runs processes outermost, so DP grad all-reduces are the
    only collectives that ride DCN (the standard pod-slice recipe)."""
    nproc = jax.process_count()
    if nproc == 1:
        return make_mesh(-1, n_model)
    local = jax.local_device_count()
    if local % n_model != 0:
        raise ValueError(
            f"model axis {n_model} must divide the {local} local devices: "
            "TP collectives must not cross DCN"
        )
    try:
        from jax.experimental import mesh_utils

        # Each process is a DCN granule: data outermost across processes,
        # model within a process (works on single-slice pods and CPU tests;
        # multi-slice topologies fall through to slice_index granules).
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // n_model, n_model),
            dcn_mesh_shape=(nproc, 1),
            process_is_granule=True,
        )
    except ValueError:
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        arr = np.asarray(devs).reshape(len(devs) // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_global_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Assemble per-process batch dicts into global arrays.

    Single-process: a plain device_put. Multihost: each process contributes
    its local slice of the data axis (train/data.py:batch_iterator already
    reads disjoint per-process slices)."""
    if jax.process_count() == 1:
        return {k: jax.device_put(np.asarray(v), sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def param_partition_specs(params: dict, shard_tables: bool = False) -> dict:
    """PartitionSpec pytree for a DualAR param pytree (models/dual_ar.py).

    Trunk weights carry a leading stacked-layer axis (never sharded).

    shard_tables: additionally row(vocab)-split the large embedding tables
    (`codebook_embeddings`, `fast_embeddings` — ~50 MB each at 150M, the
    biggest single tensors in the model) over `model`. GSPMD turns the
    lookups into gathers + collectives, so this is for backbone-exceeds-HBM
    configs; the tied text `embeddings` table (~7 MB) stays replicated.
    Exactness under both settings is pinned by tests/test_parallel_serving.py
    and tests/test_tp_scale.py.
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
            # Decode trees fuse gate/up into w13 = concat(w1, w3) on the
            # last axis (ops/quant.py::fuse_decode_params): still column-
            # parallel. The halves-split downstream may cost GSPMD a
            # reshard; exactness is pinned by the sharded-engine parity
            # test (tests/test_parallel_serving.py).
            "w13": P(None, None, MODEL_AXIS),
        }
        if "wqkv_bias" in trunk:
            specs["wqkv_bias"] = P(None, MODEL_AXIS)
        return {k: v for k, v in specs.items() if k in trunk}

    table = P(MODEL_AXIS, None) if shard_tables else P()
    specs: dict = {
        "embeddings": P(),
        "codebook_embeddings": table,
        "layers": trunk_specs(params["layers"]),
        "norm": P(),
        "fast_embeddings": table,
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


def param_shardings(mesh: Mesh, params: dict, shard_tables: bool = False) -> dict:
    specs = param_partition_specs(params, shard_tables=shard_tables)
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


def shard_params(params: dict, mesh: Mesh, shard_tables: bool = False) -> dict:
    """Device_put the param pytree with TP shardings."""
    sh = param_shardings(mesh, params, shard_tables=shard_tables)
    return jax.tree.map(jax.device_put, params, sh)
