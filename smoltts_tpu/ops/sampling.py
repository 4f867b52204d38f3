"""Fused token sampling on TPU: temperature + min-p + categorical in one
Pallas kernel (SURVEY.md §7.5c).

The XLA reference path (smoltts_tpu/lm/samplers.py) emits scale / max /
where / categorical as separate ops per sampling site (9 sites per frame:
1 slow + 8 codebook levels). The kernel fuses them per batch row using the
on-core PRNG and the Gumbel-max trick:

    sample = argmax(logits/T masked-by-min-p + Gumbel noise)

Kernel RNG differs from jax.random streams, so outputs are equal in
DISTRIBUTION, not bitwise — it is opt-in (SMOLTTS_PALLAS_SAMPLER=1) and the
parity tests are statistical plus exact for the degenerate cases.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sampler_kernel_enabled() -> bool:
    return os.environ.get("SMOLTTS_PALLAS_SAMPLER") == "1"


_ROWS = 8  # rows per kernel instance (TPU sublane tile)


def _sample_kernel(seed_ref, logits_ref, out_ref, *, temperature: float, min_p: Optional[float], vocab: int):
    blk = pl.program_id(0)
    pltpu.prng_seed(seed_ref[blk])
    l = logits_ref[...].astype(jnp.float32) / temperature  # [ROWS, V]
    if min_p is not None:
        top = jnp.max(l, axis=-1, keepdims=True)
        l = jnp.where(l >= top + math.log(min_p), l, -jnp.inf)
    # Raw bits surface as int32 on hardware (and Mosaic can't cast uint32 ->
    # float32): mask to the low 23 bits — non-negative int32 — then cast.
    bits = pltpu.prng_random_bits((_ROWS, vocab)).astype(jnp.int32)
    u = (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23)) + (1.0 / (1 << 24))
    gumbel = -jnp.log(-jnp.log(u))
    idx = jnp.argmax(l + gumbel, axis=-1).astype(jnp.int32)  # [ROWS]
    out_ref[...] = jnp.broadcast_to(idx[:, None], (_ROWS, 128))


def sample_categorical_pallas(
    logits: jnp.ndarray,  # [B, V]
    seeds: jnp.ndarray,  # [B] int32 (one PRNG seed per ROWS-row block is used)
    *,
    temperature: float,
    min_p: Optional[float] = None,
) -> jnp.ndarray:
    B, V = logits.shape
    pad = (-B) % _ROWS
    if pad:
        logits = jnp.pad(logits, ((0, pad), (0, 0)))
    Bp = B + pad
    kernel = functools.partial(
        _sample_kernel, temperature=temperature, min_p=min_p, vocab=V
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // _ROWS,),
            in_specs=[
                pl.BlockSpec((_ROWS, V), lambda b, seeds: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_ROWS, 128), lambda b, seeds: (b, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
    )(seeds[:: _ROWS].astype(jnp.int32), logits)
    return out[:B, 0]


def sample_categorical(
    logits: jnp.ndarray,
    rng: jax.Array,
    *,
    temperature: float,
    min_p: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatcher: Pallas kernel when enabled, else the XLA reference."""
    from smoltts_tpu.lm.samplers import sample_token
    from smoltts_tpu.ops import pallas_enabled

    if use_pallas is None:
        use_pallas = sampler_kernel_enabled() and pallas_enabled()
    if not use_pallas or temperature is None or temperature <= 0.0:
        return sample_token(logits, rng, temperature=temperature, min_p=min_p)
    seeds = jax.random.randint(
        rng, (logits.shape[0],), minval=0, maxval=2**31 - 1, dtype=jnp.int32
    )
    return sample_categorical_pallas(
        logits, seeds, temperature=temperature, min_p=min_p
    )
