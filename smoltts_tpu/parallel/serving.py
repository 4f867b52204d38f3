"""Multi-chip serving: decode/vocoder state sharded over the device mesh.

The reference serves a single stream on a single device (SURVEY.md §2.7);
here the continuous-batching state is laid out over a
`Mesh(('data', 'model'))`:

- every per-stream axis (decode slots) is sharded over `data` — streams are
  embarrassingly parallel, so the frame step runs without collectives on
  that axis;
- LM parameters may additionally be sharded Megatron-style over `model`
  (parallel/mesh.py) for backbone-exceeds-one-HBM configs, in which case
  GSPMD inserts the all-reduces on the row-parallel projections.

Shardings are applied by `device_put` on the state pytrees; the jitted frame
steps then inherit and propagate them (GSPMD), so the same pipeline code
serves 1 chip or a pod slice. Validated on a virtual 8-device CPU mesh
(tests/test_parallel_serving.py) and by the driver's dryrun.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smoltts_tpu.codec.mimi import MimiStreamState
from smoltts_tpu.lm.decode import DecodeState
from smoltts_tpu.parallel.mesh import DATA_AXIS


def decode_state_shardings(mesh: Mesh, state: DecodeState) -> DecodeState:
    """NamedShardings for DecodeState: stream axis -> `data`.

    k/v/k_tail/v_tail are [L, B, H, S|W, hd] (stream axis 1); the
    bookkeeping vectors are [B, ...] (stream axis 0)."""
    kv = NamedSharding(mesh, P(None, DATA_AXIS))
    b0 = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    return DecodeState(
        k=kv, v=kv, k_tail=kv, v_tail=kv,
        tail_pos=b0, flushed=b0, phase=rep, pos=b0,
        prev_tokens=b0, finished=b0,
        k_scale=None if state.k_scale is None else kv,
        v_scale=None if state.v_scale is None else kv,
    )


def mimi_state_shardings(mesh: Mesh, state: MimiStreamState) -> MimiStreamState:
    """NamedShardings for MimiStreamState: stream axis -> `data`.

    Conv tails and SEANet buffers are [B, ...]; the codec transformer ring
    and its tail are [L, B, W, H, hd] (stream axis 1)."""
    b0 = NamedSharding(mesh, P(DATA_AXIS))
    ring = NamedSharding(mesh, P(None, DATA_AXIS))
    rep = NamedSharding(mesh, P())
    t = state.transformer
    transformer = t._replace(
        k=ring, v=ring, slot_pos=b0, k_tail=ring, v_tail=ring,
        tail_abs=b0, t_phase=rep, pos=b0,
        k_scale=None if t.k_scale is None else ring,
        v_scale=None if t.v_scale is None else ring,
    )
    decoder = jax.tree.map(lambda _: b0, state.decoder)
    return MimiStreamState(
        upsample_tail=b0, transformer=transformer, decoder=decoder
    )


def shard_decode_state(state: DecodeState, mesh: Mesh) -> DecodeState:
    return jax.tree.map(jax.device_put, state, decode_state_shardings(mesh, state))


def shard_mimi_state(state: MimiStreamState, mesh: Mesh) -> MimiStreamState:
    return jax.tree.map(jax.device_put, state, mimi_state_shardings(mesh, state))


def shard_serving(
    params,
    state: DecodeState,
    mesh: Mesh,
    mimi_params=None,
    mimi_state: Optional[MimiStreamState] = None,
    tensor_parallel: bool = False,
    shard_tables: bool = False,
):
    """Lay out everything for mesh serving.

    Returns (params, state, mimi_params, mimi_state) with streams sharded
    over `data`; with tensor_parallel=True the LM backbone is additionally
    sharded over `model` (parallel/mesh.py), otherwise params replicate.
    Mimi params always replicate (the vocoder is small)."""
    from smoltts_tpu.parallel.mesh import replicated, shard_params

    if tensor_parallel:
        params = shard_params(params, mesh, shard_tables=shard_tables)
    else:
        params = jax.tree.map(lambda a: jax.device_put(a, replicated(mesh)), params)
    state = shard_decode_state(state, mesh)
    if mimi_params is not None:
        mimi_params = jax.tree.map(
            lambda a: jax.device_put(a, replicated(mesh)), mimi_params
        )
    if mimi_state is not None:
        mimi_state = shard_mimi_state(mimi_state, mesh)
    return params, state, mimi_params, mimi_state
