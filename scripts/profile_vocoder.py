"""Vocoder-internal timing: RVQ+upsample | codec transformer | SEANet,
plus an A/B of the sequential frame step vs a software-pipelined step that
computes voc(t-1) and LM(t) in one program (independent chains let XLA's
scheduler overlap HBM prefetch latencies that a strict LM->voc chain cannot).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "64"))
BUCKET = int(os.environ.get("BUCKET", "256"))
ITERS = int(os.environ.get("ITERS", "20"))
INT8 = os.environ.get("INT8", "1") != "0"


def timed(fn, args, iters=ITERS):
    float(fn(*args))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(*args)
        float(x)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(times))


def main():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import (
        build_decoder_plan,
        decode_stream_init,
        init_mimi_params,
        mimi_decode_step,
    )
    from smoltts_tpu.codec.rvq import split_rvq_decode
    from smoltts_tpu.codec.conv import convtr_stream_step
    from smoltts_tpu.codec.seanet import seanet_stream_step
    from smoltts_tpu.codec.transformer import transformer_stream_step
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import decode_frame, init_decode_state
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import TokenConfig

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)
    if INT8:
        from smoltts_tpu.ops.quant import quantize_decode_params, quantize_mimi_params

        params = quantize_decode_params(params)
        mimi_params = quantize_mimi_params(mimi_params)

    state = init_decode_state(cfg, B, 1024, dtype=jnp.bfloat16)
    mstate = decode_stream_init(mimi_cfg, B, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    codes = jnp.zeros((B, 8, 1), jnp.int32)

    zero = jnp.zeros(())
    t_floor = timed(jax.jit(lambda z: z + 1.0), (zero,))
    print(f"B={B} int8={INT8} bucket={BUCKET}  floor={t_floor:.3f} ms")

    # 1. RVQ decode + upsample
    def rvq_up(mp, ms, c):
        emb = split_rvq_decode(c, mp["quantizer"], mimi_cfg)
        _, emb = convtr_stream_step(
            ms.upsample_tail, emb, mp["upsample"]["w"], mp["upsample"].get("b"),
            stride=mimi_cfg.downsample_stride, groups=mimi_cfg.upsample_groups,
        )
        return jnp.sum(emb.astype(jnp.float32))

    t_rvq = timed(jax.jit(rvq_up), (mimi_params, mstate, codes))

    # 2. codec transformer (T=2)
    x2 = jnp.zeros((B, 2, mimi_cfg.hidden_size), jnp.bfloat16)

    def ct(mp, ms, xx):
        _, y = transformer_stream_step(mp["decoder_transformer"], mimi_cfg, ms.transformer, xx)
        return jnp.sum(y.astype(jnp.float32))

    t_ct = timed(jax.jit(ct), (mimi_params, mstate, x2))

    # 3. SEANet streaming step (T=2 latent -> 1920 samples)
    plan = build_decoder_plan(mimi_cfg)

    def sn(mp, dec, xx):
        _, pcm = seanet_stream_step(plan, mp["decoder"], dec, xx)
        return jnp.sum(pcm.astype(jnp.float32))

    t_sn = timed(jax.jit(sn), (mimi_params, mstate.decoder, x2))

    # 4. full vocoder step
    def voc(mp, ms, c):
        _, pcm = mimi_decode_step(mp, mimi_cfg, ms, c)
        return jnp.sum(pcm.astype(jnp.float32))

    t_voc = timed(jax.jit(voc), (mimi_params, mstate, codes))

    # 5. LM frame (bucketed)
    def lm(p, st, k):
        st2, out = decode_frame(p, cfg, token_cfg, settings, st, k, attend_limit=BUCKET)
        return jnp.sum(out.tokens)

    t_lm = timed(jax.jit(lm), (params, state, key))

    # 6. sequential LM->voc (the current stream step shape)
    def seq(p, mp, st, ms, k):
        st2, out = decode_frame(p, cfg, token_cfg, settings, st, k, attend_limit=BUCKET)
        _, pcm = mimi_decode_step(mp, mimi_cfg, ms, out.audio_codes[:, :, None])
        return jnp.sum(pcm.astype(jnp.float32)) + jnp.sum(out.tokens)

    t_seq = timed(jax.jit(seq), (params, mimi_params, state, mstate, key))

    # 7. pipelined: voc(prev codes) || LM(t) — independent chains in one program
    def pipe(p, mp, st, ms, prev_codes, k):
        st2, out = decode_frame(p, cfg, token_cfg, settings, st, k, attend_limit=BUCKET)
        _, pcm = mimi_decode_step(mp, mimi_cfg, ms, prev_codes)
        return jnp.sum(pcm.astype(jnp.float32)) + jnp.sum(out.tokens)

    t_pipe = timed(jax.jit(pipe), (params, mimi_params, state, mstate, codes, key))

    f = t_floor
    print(f"rvq+upsample : {t_rvq - f:7.3f} ms")
    print(f"codec transf : {t_ct - f:7.3f} ms")
    print(f"seanet       : {t_sn - f:7.3f} ms")
    print(f"vocoder full : {t_voc - f:7.3f} ms")
    print(f"lm frame     : {t_lm - f:7.3f} ms")
    print(f"seq lm->voc  : {t_seq - f:7.3f} ms")
    print(f"pipe lm||voc : {t_pipe - f:7.3f} ms")
    tp_seq = B * 0.08 / ((t_seq) / 1e3)
    tp_pipe = B * 0.08 / ((t_pipe) / 1e3)
    print(f"-> seq {tp_seq:.1f} audio-s/s   pipe {tp_pipe:.1f} audio-s/s (ex-dispatch overlap)")


if __name__ == "__main__":
    main()
