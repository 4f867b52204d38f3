"""Multihost SERVING worker: one process of a 2-process DP x TP sharded
decode+vocode run (the serving-side counterpart of multihost_worker.py).

Runs the fused prefill/stream pipeline with the decode and Mimi streaming
state sharded over a multihost mesh (streams over the cross-process `data`
axis, backbone weights Megatron-split over the intra-process `model` axis),
then reshards the emitted frames/PCM to replicated and writes them from
process 0 for the parent test to compare against a single-controller run.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize may pin a TPU backend

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    from smoltts_tpu.parallel.mesh import init_distributed, make_multihost_mesh

    init_distributed(f"127.0.0.1:{args.port}", args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes

    from jax.sharding import NamedSharding, PartitionSpec as P

    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
    from smoltts_tpu.config import ModelType, tiny_debug_config
    from smoltts_tpu.lm.decode import init_decode_state
    from smoltts_tpu.lm.pipeline import make_prefill_step, make_stream_step
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.parallel.mesh import param_shardings
    from smoltts_tpu.parallel.serving import (
        decode_state_shardings,
        mimi_state_shardings,
    )
    from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig

    CB = 32
    cfg = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB)
    tok = ByteTokenizer(cfg.codebook_size)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    mimi_cfg = MimiConfig(
        num_filters=8, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, head_dim=16, intermediate_size=64,
        num_quantizers=8, codebook_size=CB, codebook_dim=16,
        sliding_window=16, upsample_groups=32,
    )

    mesh = make_multihost_mesh(n_model=2)  # data = 8/2 = 4 (cross-process)

    def put(tree, shardings):
        """Host-identical data -> global arrays (every process holds the
        same full host values; each contributes its addressable shards)."""
        def one(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])
        return jax.tree.map(one, tree, shardings)

    B, T, S = 8, 6, 64
    rng = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, T), np.int32)
    prompt[:, 0] = token_cfg.semantic_start_id + rng.integers(0, CB, (B, T))
    prompt[:, 1:] = rng.integers(0, CB, (B, cfg.num_rows - 1, T))

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=np.float32)
    mimi_params = init_mimi_params(mimi_cfg, dtype=np.float32)
    params = put(params, param_shardings(mesh, params))
    mimi_params = put(
        mimi_params, jax.tree.map(lambda _: NamedSharding(mesh, P()), mimi_params)
    )

    state = init_decode_state(cfg, B, S, dtype=np.float32, tail_len=8)
    mstate = decode_stream_init(mimi_cfg, B, dtype=np.float32, tail_len=8)
    state = put(state, decode_state_shardings(mesh, state))
    mstate = put(mstate, mimi_state_shardings(mesh, mstate))

    data_sh = NamedSharding(mesh, P(DATA := "data"))
    prompt_g = put(prompt, jax.tree.map(lambda _: data_sh, prompt))
    lens_g = put(np.full((B,), T, np.int32), data_sh)
    rep = NamedSharding(mesh, P())
    replicate = jax.jit(lambda a: a, out_shardings=rep)

    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg)
    key = jax.random.PRNGKey(1)
    state, mstate, key, out = prefill_step(
        params, mimi_params, state, mstate, prompt_g, lens_g, key
    )

    def fetch(x):
        return np.asarray(replicate(x).addressable_data(0))

    frames = [fetch(out.audio_codes)]
    pcms = [fetch(out.pcm)]
    for _ in range(3):
        state, mstate, key, out = stream_step(params, mimi_params, state, mstate, key)
        frames.append(fetch(out.audio_codes))
        pcms.append(fetch(out.pcm))

    if jax.process_index() == 0:
        np.savez(
            Path(args.out) / "serving.npz",
            frames=np.stack(frames),
            pcm=np.concatenate(pcms, axis=1),
            mesh_data=mesh.shape["data"],
            mesh_model=mesh.shape["model"],
        )
    print("worker done", jax.process_index())


if __name__ == "__main__":
    main()
