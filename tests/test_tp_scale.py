"""Tensor parallelism at the REAL released scale (150M), not toy dims.

Two guarantees VERDICT-style toy-shape dryruns can't give:

1. The 150M parameter tree's TP shardings actually partition every large
   tensor — per-shard bytes == total/model_axis for wqkv/w1/w3/w2/wo, the
   depthwise head, and (with shard_tables) the big embedding tables; no
   tensor above the replication budget stays replicated. Pure metadata
   (jax.eval_shape), so it runs in milliseconds.
2. A backbone-sharded 150M decode actually executes on the virtual mesh
   (prefill + frame steps through shard_serving, tables sharded) and matches
   the replicated-params run bit-for-bit at temperature 0.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from smoltts_tpu.config import ModelType, smoltts_byte_150m
from smoltts_tpu.lm.decode import decode_frame, init_decode_state, prefill
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    param_partition_specs,
    shard_params,
)
from smoltts_tpu.tokenizer import TokenConfig

# Any tensor bigger than this must be partitioned over `model` (bf16 bytes).
# The tied text-embedding table (2368 x 768 bf16 = 3.5 MB) is the largest
# tensor allowed to replicate.
REPLICATION_BUDGET_BYTES = 4 * 2**20
N_MODEL = 4  # divides n_head=12? no — divides the projection dims; GSPMD
# shards dims, not heads: 1280/4, 3072/4, 768/4 are all clean.


def _named_leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _named_leaves(v, f"{prefix}{k}.")
    else:
        yield prefix[:-1], tree


def test_150m_shardings_partition_every_large_tensor():
    cfg = smoltts_byte_150m()
    shapes = jax.eval_shape(
        lambda key: init_params(cfg, key, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
    )
    specs = param_partition_specs(shapes, shard_tables=True)

    flat_shapes = dict(_named_leaves(shapes))
    flat_specs = dict(_named_leaves(specs))
    assert flat_shapes.keys() == flat_specs.keys()

    checked_big = []
    for name, leaf in flat_shapes.items():
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        spec = flat_specs[name]
        if nbytes <= REPLICATION_BUDGET_BYTES:
            continue
        checked_big.append(name)
        sharded_dims = [i for i, axis in enumerate(spec) if axis == MODEL_AXIS]
        assert sharded_dims, (
            f"{name} is {nbytes / 2**20:.1f} MB but replicated (spec {spec})"
        )
        dim = sharded_dims[0]
        assert leaf.shape[dim] % N_MODEL == 0, (
            f"{name} dim {dim} ({leaf.shape[dim]}) not divisible by model={N_MODEL}"
        )
    # Every heavy family must have been covered.
    for expect in [
        "layers.wqkv", "layers.wo", "layers.w1", "layers.w2", "layers.w3",
        "fast_layers.wqkv", "fast_output",
        "codebook_embeddings", "fast_embeddings",
    ]:
        assert any(n.startswith(expect) for n in checked_big), (
            f"expected {expect} among the partitioned big tensors: {checked_big}"
        )


@pytest.mark.slow
def test_backbone_sharded_150m_decode_matches_replicated():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh from tests/conftest.py")
    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    B, T, S = 2, 8, 64
    rng = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, T), np.int32)
    codes0 = rng.integers(0, cfg.codebook_size, (B, T))
    prompt[:, 0] = token_cfg.semantic_start_id + codes0
    prompt[:, 1] = codes0
    prompt[:, 2:] = rng.integers(0, cfg.codebook_size, (B, cfg.num_rows - 2, T))

    def run(p):
        state = init_decode_state(cfg, B, S, dtype=jnp.float32, tail_len=8)
        state, out = prefill(
            p, cfg, token_cfg, settings, state,
            jnp.asarray(prompt), jnp.full((B,), T, jnp.int32), jax.random.PRNGKey(1),
        )
        frames = [np.asarray(out.tokens)]
        for i in range(2):
            state, out = decode_frame(
                params=p, cfg=cfg, token_cfg=token_cfg, settings=settings,
                state=state, rng=jax.random.PRNGKey(2 + i),
            )
            frames.append(np.asarray(out.tokens))
        return np.stack(frames)

    ref = run(params)

    mesh = make_mesh(2, N_MODEL)
    tp_params = shard_params(params, mesh, shard_tables=True)
    # The big tensors really live partitioned on device.
    shard = tp_params["layers"]["w1"].addressable_shards[0].data
    assert shard.shape[-1] == cfg.intermediate_size // N_MODEL
    shard = tp_params["codebook_embeddings"].addressable_shards[0].data
    assert shard.shape[0] == tp_params["codebook_embeddings"].shape[0] // N_MODEL

    got = run(tp_params)
    np.testing.assert_array_equal(ref, got)
