"""DualAR / RQ-Transformer — single JAX implementation for train AND decode.

This one model replaces the reference's duplicated PyTorch training model
(modeling/model/rq_transformer.py) and MLX inference model
(mlx .../lm/rq_transformer.py). Semantics preserved:

- Embedding merge: row-0 text embedding + sum of per-level codebook embeddings
  from one shared table with per-level offsets; codebook contribution zeroed on
  text-only positions (rq_transformer.py:205-221, mlx:150-170). The train and
  decode paths of the reference disagree on the zeroing predicate (train: row
  1 == 0; decode: row 0 inside the semantic-token range) — both are available
  via `embed_mask_mode`.
- Slow trunk: Llama blocks (fused wqkv, GQA, traditional RoPE with bf16
  cos/sin cache, RMSNorm fp32, SwiGLU), causal SDPA, attention-prob dropout.
- Fast trunk (training): per-frame sequences [h_t, emb(next c_1..c_{n-1})],
  flattened to a (B*T) batch and run dense — the reference's dynamic
  drop-padded-frames/index_select/scatter dance (rq_transformer.py:427-469)
  is replaced by computing all frames with static shapes; positions the
  reference drops have fully-masked labels, so losses are identical.
- depthwise_wte / depthwise_output / duplicate_code_0 variants.

Parameters are a plain nested-dict pytree; per-trunk layer weights are
STACKED along a leading layer axis and the trunk runs as `lax.scan` over
layers — one compiled block, TPU-friendly, and trivially shardable with
GSPMD (see smoltts_tpu/parallel/sharding.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from smoltts_tpu.config import DualARConfig
from smoltts_tpu.models.layers import (
    AttnDims,
    rms_norm,
    rope_cos_sin,
    transformer_block,
)

DualARParams = Dict[str, Any]


class TrainForwardResult(NamedTuple):
    token_logits: jnp.ndarray  # [B, T, vocab]
    codebook_logits: jnp.ndarray  # [B, T, max_fast_seqlen, codebook_size]
    hidden_states: jnp.ndarray  # [B, T, dim] pre-norm slow output


def slow_dims(cfg: DualARConfig) -> AttnDims:
    return AttnDims(cfg.n_head, cfg.n_local_heads, cfg.head_dim, cfg.dim)


def fast_dims(cfg: DualARConfig) -> AttnDims:
    return AttnDims(cfg.fast_n_head, cfg.fast_n_local_heads, cfg.fast_head_dim, cfg.fast_dim)


def semantic_offsets(cfg: DualARConfig) -> jnp.ndarray:
    """Per-level offsets into the shared codebook embedding table
    (rq_transformer.py:152-157). Shape [num_rows-1]."""
    offs = jnp.arange(cfg.num_codebooks, dtype=jnp.int32) * cfg.codebook_size
    return offs if cfg.duplicate_code_0 else offs[1:]


def fast_codebook_offsets(cfg: DualARConfig) -> jnp.ndarray:
    """Offsets into the fast (depthwise) input embedding table for the
    teacher-forced codes c_1..c_{n-1} (rq_transformer.py:355-361).
    Shape [max_fast_seqlen - 1]."""
    if not cfg.depthwise_wte:
        return jnp.zeros((cfg.max_fast_seqlen - 1,), dtype=jnp.int32)
    offs = jnp.arange(cfg.num_codebooks - 1, dtype=jnp.int32) * cfg.codebook_size
    return offs if cfg.duplicate_code_0 else offs[1:]


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------


def _init_trunk(key, n_layer, dims: AttnDims, intermediate, std, qkv_bias, dtype):
    ks = jax.random.split(key, 5)
    total_qkv = dims.q_size + 2 * dims.kv_size

    def normal(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    lp = {
        "attention_norm": jnp.ones((n_layer, dims.dim), dtype),
        "ffn_norm": jnp.ones((n_layer, dims.dim), dtype),
        "wqkv": normal(ks[0], (n_layer, dims.dim, total_qkv)),
        "wo": normal(ks[1], (n_layer, dims.dim, dims.dim)),
        "w1": normal(ks[2], (n_layer, dims.dim, intermediate)),
        "w3": normal(ks[3], (n_layer, dims.dim, intermediate)),
        "w2": normal(ks[4], (n_layer, intermediate, dims.dim)),
    }
    if qkv_bias:
        lp["wqkv_bias"] = jnp.zeros((n_layer, total_qkv), dtype)
    return lp


def init_params(
    cfg: DualARConfig, key: jax.Array, dtype=jnp.float32
) -> DualARParams:
    """Random init matching reference _init_weights (normal(0, initializer_range),
    zero bias, ones for norms; rq_transformer.py:262-271)."""
    keys = jax.random.split(key, 8)
    std = cfg.initializer_range

    def normal(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    params: DualARParams = {
        "embeddings": normal(keys[0], (cfg.vocab_size, cfg.dim)),
        "codebook_embeddings": normal(
            keys[1], (cfg.codebook_size * cfg.num_codebooks, cfg.dim)
        ),
        "layers": _init_trunk(
            keys[2],
            cfg.n_layer,
            slow_dims(cfg),
            cfg.intermediate_size,
            std,
            cfg.attention_qkv_bias,
            dtype,
        ),
        "norm": jnp.ones((cfg.dim,), dtype),
        "fast_embeddings": normal(keys[3], (cfg.fast_embedding_rows, cfg.fast_dim)),
        "fast_layers": _init_trunk(
            keys[4],
            cfg.n_fast_layer,
            fast_dims(cfg),
            cfg.fast_intermediate_size,
            std,
            bool(cfg.fast_attention_qkv_bias),
            dtype,
        ),
        "fast_norm": jnp.ones((cfg.fast_dim,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["output"] = normal(keys[5], (cfg.dim, cfg.vocab_size))
    if cfg.fast_dim != cfg.dim:
        params["fast_project_in"] = {
            "kernel": normal(keys[6], (cfg.dim, cfg.fast_dim)),
            "bias": jnp.zeros((cfg.fast_dim,), dtype),
        }
    if cfg.depthwise_output:
        # [position, fast_dim, codebook_size]
        params["fast_output"] = normal(
            keys[7], (cfg.max_fast_seqlen, cfg.fast_dim, cfg.codebook_size)
        )
    else:
        params["fast_output"] = normal(keys[7], (cfg.fast_dim, cfg.codebook_size))
    return params


# --------------------------------------------------------------------------
# Embedding merge
# --------------------------------------------------------------------------


def embed_merge(
    params: DualARParams,
    cfg: DualARConfig,
    tokens: jnp.ndarray,
    *,
    embed_mask_mode: str = "row1_zero",
    semantic_start_id: int = 0,
    semantic_end_id: int = 0,
) -> jnp.ndarray:
    """Merge row-0 text embedding with the codebook-row embeddings.

    tokens: int [B, num_rows, T] (or [B, num_rows] for a single step, which is
    handled by the caller reshaping). Returns [B, T, dim].

    embed_mask_mode:
      "row1_zero"      — zero codebook contribution where row 1 == 0
                         (training semantics, rq_transformer.py:219)
      "semantic_range" — zero where row 0 is NOT in [semantic_start, semantic_end]
                         (decode semantics, mlx .../lm/rq_transformer.py:162-169)
    """
    text_tokens = tokens[:, 0, :]
    text_embeds = params["embeddings"][text_tokens]  # gather [B, T, dim]

    offs = semantic_offsets(cfg)  # [R-1]
    cb_tokens = tokens[:, 1:, :] + offs[None, :, None]
    cb_embeds = params["codebook_embeddings"][cb_tokens]  # [B, R-1, T, dim]
    cb_sum = cb_embeds.sum(axis=1)  # [B, T, dim]

    if embed_mask_mode == "row1_zero":
        keep = tokens[:, 1, :] != 0
    elif embed_mask_mode == "semantic_range":
        keep = (text_tokens >= semantic_start_id) & (text_tokens <= semantic_end_id)
    else:
        raise ValueError(f"unknown embed_mask_mode: {embed_mask_mode}")
    cb_sum = jnp.where(keep[..., None], cb_sum, 0)
    return text_embeds + cb_sum


# --------------------------------------------------------------------------
# Trunks (scan over stacked layers)
# --------------------------------------------------------------------------


def run_trunk(
    layer_params: dict,
    x: jnp.ndarray,
    dims: AttnDims,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_cols: Optional[int] = None,
    norm_eps: float = 1e-5,
    remat: bool = False,
    remat_policy: str = "none",
) -> jnp.ndarray:
    """Run a stack of transformer blocks as lax.scan over the layer axis.

    remat_policy: "none" saves only layer boundaries (max memory savings);
    "dots" saves matmul outputs and recomputes elementwise ops (less
    recompute FLOPs for a modest memory cost)."""
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if not use_dropout:
        dropout_rng = jax.random.PRNGKey(0)  # unused, keeps carry structure static

    def body(carry, lp):
        h, rng = carry
        rng, sub = jax.random.split(rng)
        h = transformer_block(
            h,
            lp,
            dims,
            cos,
            sin,
            mask=mask,
            is_causal=is_causal,
            dropout_rate=dropout_rate if use_dropout else 0.0,
            dropout_rng=sub if use_dropout else None,
            dropout_cols=dropout_cols,
            norm_eps=norm_eps,
        )
        return (h, rng), None

    if remat:
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat_policy == "dots"
            else None
        )
        body = jax.checkpoint(body, policy=policy)
    # Unrolling the layer scan lets XLA overlap weight-stack slices and
    # transposes across layers that the strict while loop serializes —
    # measured -2.2% step time at 150M b16 (unroll sweep in PERF.md "step
    # anatomy": 1/2/4/10 -> 426.5/423.6/417.5/418.7 ms; 4 is the knee).
    # SMOLTTS_TRUNK_UNROLL overrides.
    unroll = int(os.environ.get("SMOLTTS_TRUNK_UNROLL", "4"))
    (x, _), _ = jax.lax.scan(body, (x, dropout_rng), layer_params, unroll=unroll)
    return x


def run_fast_trunk(
    params: DualARParams,
    cfg: DualARConfig,
    fast_seq: jnp.ndarray,  # [N, n, fast_dim] — one row per frame
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    remat: bool = False,
    remat_policy: str = "none",
) -> jnp.ndarray:
    """Fast trunk over per-frame sequences, with FRAME FOLDING.

    The fast sequence length n (= max_fast_seqlen, 8) is far below the TPU
    lane width, so naive per-frame attention materializes [N, h, n, n]
    score/probability tensors whose minor dim pads 8 -> 128 — a measured
    16x memory/HBM-traffic expansion (the remat=off OOM dump showed 2.25 GB
    padded for 144 MB of data per buffer; PERF.md "step anatomy"). Folding
    F frames into one (F*n)-token sequence with a BLOCK-DIAGONAL causal
    mask packs the lanes exactly: softmax rows are unchanged (each token
    still attends only within its own frame), so the result is numerically
    identical to the unfolded form (pinned by test_fast_fold_parity); only
    dropout bit-streams differ, which is already dropout's contract here.

    F = largest of {16, 8, 4, 2} dividing N with F*n a lane multiple
    (n=8 -> F=16 -> 128 tokens); SMOLTTS_FAST_FOLD=1 disables.
    """
    N, n, fd = fast_seq.shape
    fold_max = int(os.environ.get("SMOLTTS_FAST_FOLD", "16"))
    F = 1
    for cand in (16, 8, 4, 2):
        if cand <= fold_max and N % cand == 0 and (cand * n) % 128 == 0:
            F = cand
            break
    fdims = fast_dims(cfg)
    fcos, fsin = rope_cos_sin(jnp.arange(n), cfg.fast_head_dim, cfg.rope_base)
    if F == 1:
        return run_trunk(
            params["fast_layers"], fast_seq, fdims, fcos, fsin,
            is_causal=True, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            norm_eps=cfg.norm_eps, remat=remat, remat_policy=remat_policy,
        )
    folded = fast_seq.reshape(N // F, F * n, fd)
    idx = jnp.arange(F * n)
    blk = idx // n
    fmask = (blk[:, None] == blk[None, :]) & (idx[:, None] >= idx[None, :])
    fast_x = run_trunk(
        params["fast_layers"], folded, fdims,
        jnp.tile(fcos, (F, 1)), jnp.tile(fsin, (F, 1)),
        mask=fmask, is_causal=False,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        # 8 block-aligned attendable keys per 128-wide row: draw keep bits
        # for 8 columns, not 128 (see sdpa dropout_cols).
        dropout_cols=n,
        norm_eps=cfg.norm_eps, remat=remat, remat_policy=remat_policy,
    )
    return fast_x.reshape(N, n, -1)


# --------------------------------------------------------------------------
# Training forward
# --------------------------------------------------------------------------


def token_head(params: DualARParams, cfg: DualARConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Vocab logits from the normed slow output (tied or separate head)."""
    slow_out = rms_norm(x, params["norm"], cfg.norm_eps)
    if cfg.tie_word_embeddings:
        return slow_out @ params["embeddings"].T
    from smoltts_tpu.ops.quant import mm

    return mm(slow_out, params["output"])


def project_fast_in(params: DualARParams, cfg: DualARConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.fast_dim != cfg.dim:
        from smoltts_tpu.ops.quant import mm

        p = params["fast_project_in"]
        return mm(x, p["kernel"]) + p["bias"]
    return x


def fast_output_logits(
    params: DualARParams, cfg: DualARConfig, fast_out: jnp.ndarray
) -> jnp.ndarray:
    """fast_out: [N, max_fast_seqlen, fast_dim] -> [N, max_fast_seqlen, cb]."""
    from smoltts_tpu.ops.quant import QTensor, mm

    w = params["fast_output"]
    if cfg.depthwise_output:
        # Per-position projection (DepthwiseLinear, rq_transformer.py:585-598).
        if isinstance(w, QTensor):
            y = jnp.einsum(
                "ijm,jmk->ijk", fast_out, w.q.astype(fast_out.dtype),
                preferred_element_type=jnp.float32,
            )
            # scale [n, 1, cb] broadcasts over the batch axis of [N, n, cb].
            return (y * w.scale.transpose(1, 0, 2)).astype(fast_out.dtype)
        return jnp.einsum(
            "ijm,jmk->ijk", fast_out, w, preferred_element_type=jnp.float32
        ).astype(fast_out.dtype)
    return mm(fast_out, w)


def _slow_forward(
    params: DualARParams,
    cfg: DualARConfig,
    tokens: jnp.ndarray,
    *,
    dropout: float,
    dropout_rng: Optional[jax.Array],
    embed_mask_mode: str,
    semantic_start_id: int,
    semantic_end_id: int,
    activation_sharding,
    remat_policy: str,
    remat: bool,
) -> jnp.ndarray:
    """Embed-merge + slow trunk -> pre-norm hidden states [B, T, dim]."""
    x = embed_merge(
        params,
        cfg,
        tokens,
        embed_mask_mode=embed_mask_mode,
        semantic_start_id=semantic_start_id,
        semantic_end_id=semantic_end_id,
    )
    if activation_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, activation_sharding)
    T = tokens.shape[-1]
    cos, sin = rope_cos_sin(jnp.arange(T), cfg.head_dim, cfg.rope_base)
    x = run_trunk(
        params["layers"],
        x,
        slow_dims(cfg),
        cos,
        sin,
        is_causal=True,
        dropout_rate=dropout,
        dropout_rng=dropout_rng,
        norm_eps=cfg.norm_eps,
        remat=remat,
        remat_policy=remat_policy,
    )
    if activation_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, activation_sharding)
    return x


def forward_train(
    params: DualARParams,
    cfg: DualARConfig,
    tokens: jnp.ndarray,
    *,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
    embed_mask_mode: str = "row1_zero",
    semantic_start_id: int = 0,
    semantic_end_id: int = 0,
    activation_sharding=None,
    remat_policy: str = "none",
) -> TrainForwardResult:
    """Full training forward: slow trunk + dense fast trunk.

    tokens: int32 [B, num_rows, T], already causally shifted (input side).
    Matches RQTransformer.forward (rq_transformer.py:223-260, 401-479) with
    the fast trunk computed dense over every frame (see module docstring).

    activation_sharding: optional NamedSharding for [B, T, dim] activations —
    sequence-parallel sharding of the packed batch (e.g. P('data', 'seq'));
    GSPMD inserts the attention all-gathers (SURVEY.md §5 long-context).
    """
    B, R, T = tokens.shape
    assert R == cfg.num_rows, f"expected {cfg.num_rows} rows, got {R}"
    fdims = fast_dims(cfg)
    dropout = cfg.dropout if train else 0.0
    rngs = (
        jax.random.split(dropout_rng, 2)
        if (dropout > 0.0 and dropout_rng is not None)
        else (None, None)
    )
    # SMOLTTS_REMAT_SCOPE: which trunks layer-remat applies to when gradient
    # checkpointing is on — "both" (default), "slow", or "fast". The slow
    # trunk's saved activations are ~30x smaller than the fast trunk's
    # (T vs T*n tokens), so scope=fast keeps nearly all the memory win
    # while skipping the slow trunk's backward recompute (PERF.md "step
    # anatomy").
    scope = os.environ.get("SMOLTTS_REMAT_SCOPE", "both")
    remat_on = cfg.use_gradient_checkpointing and train

    # ---- slow trunk ----
    x = _slow_forward(
        params, cfg, tokens,
        dropout=dropout, dropout_rng=rngs[0],
        embed_mask_mode=embed_mask_mode,
        semantic_start_id=semantic_start_id,
        semantic_end_id=semantic_end_id,
        activation_sharding=activation_sharding,
        remat_policy=remat_policy,
        remat=remat_on and scope in ("both", "slow"),
    )
    token_logits = token_head(params, cfg, x)

    # ---- fast trunk (dense) ----
    h = project_fast_in(params, cfg, x)  # [B, T, fast_dim]

    # Teacher-forced codes: next-frame codebook rows 1..R-2, shifted left in
    # time, zero-padded at the end (rq_transformer.py:417-420).
    cb = tokens[:, 1:-1, 1:]  # [B, R-2, T-1]
    cb = jnp.pad(cb, ((0, 0), (0, 0), (0, 1)))  # [B, R-2, T]
    cb = cb + fast_codebook_offsets(cfg)[None, :, None]
    # Gather TIME-MAJOR ([B, T, R-2, fd]) so the per-frame fast sequences
    # assemble with a concat instead of a materialized [B, n, T, fd]
    # transpose (the transpose showed up as a full extra HBM pass at the
    # training shapes).
    cb_embeds = params["fast_embeddings"][cb.transpose(0, 2, 1)]

    # Fast sequence per frame: [h_t, emb(c_1), ..., emb(c_{n-1})].
    fast_seq = jnp.concatenate([h[:, :, None], cb_embeds], axis=2)  # [B, T, n, fd]
    n = cfg.max_fast_seqlen
    fast_seq = fast_seq.reshape(B * T, n, cfg.fast_dim)

    fast_x = run_fast_trunk(
        params,
        cfg,
        fast_seq,
        dropout_rate=dropout,
        dropout_rng=rngs[1],
        remat=remat_on and scope in ("both", "fast"),
        remat_policy=remat_policy,
    )
    fast_out = rms_norm(fast_x, params["fast_norm"], cfg.norm_eps)
    codebook_logits = fast_output_logits(params, cfg, fast_out)
    codebook_logits = codebook_logits.reshape(B, T, n, cfg.codebook_size)

    return TrainForwardResult(
        token_logits=token_logits,
        codebook_logits=codebook_logits,
        hidden_states=x,
    )
