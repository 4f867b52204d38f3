"""DualAR training losses.

Semantics per the reference (train/trainer.py:25-60): `base_loss` is CE of the
slow head against row-0 labels, `semantic_loss` is CE over ALL codebook levels
flattened together, both with ignore_index=-100 masking; optional per-codebook
losses for validation. Cross-entropy is computed in fp32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Losses(NamedTuple):
    total: jnp.ndarray
    base: jnp.ndarray
    semantic: jnp.ndarray
    per_codebook: Optional[jnp.ndarray] = None  # [num_levels]


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Mean CE over positions where labels != ignore_index.

    logits [..., V]; labels [...] int. Returns a scalar (0 if fully masked).
    """
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def compute_losses(
    token_logits: jnp.ndarray,  # [B, T, V]
    codebook_logits: jnp.ndarray,  # [B, T, N, CB]
    labels: jnp.ndarray,  # [B, R, T] with R = 1 + N
    per_codebook: bool = False,
) -> Losses:
    base = masked_cross_entropy(token_logits, labels[:, 0, :])
    cb_labels = labels[:, 1:, :].transpose(0, 2, 1)  # [B, T, N]
    semantic = masked_cross_entropy(codebook_logits, cb_labels)
    per_cb = None
    if per_codebook:
        per_cb = jax.vmap(
            lambda lg, lb: masked_cross_entropy(lg, lb), in_axes=(2, 2)
        )(codebook_logits, cb_labels)
    return Losses(total=base + semantic, base=base, semantic=semantic, per_codebook=per_cb)


def _masked_nll_sums(logits: jnp.ndarray, labels: jnp.ndarray):
    """(sum NLL, count) over labels != -100; per-level sums along the last
    label axis kept (logits [..., N, CB], labels [..., N])."""
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = nll * mask
    axes = tuple(range(nll.ndim - 1))
    return jnp.sum(nll, axis=axes), jnp.sum(mask, axis=axes)  # [N], [N]


def forward_train_loss(
    params,
    cfg,
    tokens: jnp.ndarray,  # [B, R, T]
    labels: jnp.ndarray,  # [B, R, T]
    *,
    dropout_rng=None,
    train: bool = False,
    chunk_t: int = 0,
    per_codebook: bool = False,
    embed_mask_mode: str = "row1_zero",
    semantic_start_id: int = 0,
    semantic_end_id: int = 0,
    activation_sharding=None,
    remat_policy: str = "none",
) -> Losses:
    """Fused forward + loss with the fast trunk CHUNKED over time.

    Numerically equivalent to forward_train + compute_losses (pinned by
    tests/test_chunked_loss.py) but never materializes the
    [B, T, n, codebook_size] codebook logits — the dominant training
    activation (BT x n x CB fp32 softmax residuals held for backward). The
    fast trunk + depthwise head + CE partial sums run per chunk of
    `chunk_t` slow positions under jax.checkpoint, so backward recomputes
    one chunk at a time. Chunking is over T (not B*T) so DP batch sharding
    is untouched (B stays the leading sharded axis).

    chunk_t=0 falls back to the dense reference path.
    """
    from smoltts_tpu.models.dual_ar import (
        _slow_forward,
        fast_codebook_offsets,
        fast_output_logits,
        forward_train,
        project_fast_in,
        run_fast_trunk,
        token_head,
    )
    from smoltts_tpu.models.layers import rms_norm

    if chunk_t <= 0:
        out = forward_train(
            params, cfg, tokens, dropout_rng=dropout_rng, train=train,
            embed_mask_mode=embed_mask_mode,
            semantic_start_id=semantic_start_id,
            semantic_end_id=semantic_end_id,
            activation_sharding=activation_sharding,
            remat_policy=remat_policy,
        )
        return compute_losses(
            out.token_logits, out.codebook_logits, labels,
            per_codebook=per_codebook,
        )

    B, R, T = tokens.shape
    assert T % chunk_t == 0, f"fast_chunk_t {chunk_t} must divide T {T}"
    n = cfg.max_fast_seqlen
    dropout = cfg.dropout if train else 0.0
    rngs = (
        jax.random.split(dropout_rng, 2)
        if (dropout > 0.0 and dropout_rng is not None)
        else (None, None)
    )
    remat = cfg.use_gradient_checkpointing and train

    x = _slow_forward(
        params, cfg, tokens,
        dropout=dropout, dropout_rng=rngs[0],
        embed_mask_mode=embed_mask_mode,
        semantic_start_id=semantic_start_id,
        semantic_end_id=semantic_end_id,
        activation_sharding=activation_sharding,
        remat_policy=remat_policy,
        remat=remat,
    )
    token_logits = token_head(params, cfg, x)
    base = masked_cross_entropy(token_logits, labels[:, 0, :])

    h = project_fast_in(params, cfg, x)  # [B, T, fast_dim]
    # Teacher-forced codes (see forward_train): [B, R-2, T] -> offsets added.
    cb = tokens[:, 1:-1, 1:]
    cb = jnp.pad(cb, ((0, 0), (0, 0), (0, 1)))
    cb = cb + fast_codebook_offsets(cfg)[None, :, None]
    cb = cb.transpose(0, 2, 1)  # [B, T, R-2]
    cb_labels = labels[:, 1:, :].transpose(0, 2, 1)  # [B, T, n]

    nt = T // chunk_t
    # [B, nt, C, ...] -> scan over nt (time chunks; B untouched for DP).
    h_c = h.reshape(B, nt, chunk_t, -1).transpose(1, 0, 2, 3)
    cb_c = cb.reshape(B, nt, chunk_t, -1).transpose(1, 0, 2, 3)
    lb_c = cb_labels.reshape(B, nt, chunk_t, -1).transpose(1, 0, 2, 3)

    frng = rngs[1] if rngs[1] is not None else jax.random.PRNGKey(0)
    use_dropout = dropout > 0.0 and rngs[1] is not None

    def chunk_body(carry, inp):
        nll_acc, cnt_acc, rng = carry
        hc, cbc, lbc = inp  # [B, C, fd], [B, C, n-1], [B, C, n]
        rng, sub = jax.random.split(rng)
        cb_embeds = params["fast_embeddings"][cbc]  # [B, C, n-1, fd]
        seq = jnp.concatenate([hc[:, :, None], cb_embeds], axis=2)
        seq = seq.reshape(B * chunk_t, n, -1)
        fast_x = run_fast_trunk(
            params, cfg, seq,
            dropout_rate=dropout if use_dropout else 0.0,
            dropout_rng=sub if use_dropout else None,
            # Inner per-layer remat is OFF: the chunk body below is itself
            # checkpointed, so backward already recomputes the body one
            # chunk at a time (chunk-local activations only). Stacking the
            # per-layer remat on top would recompute the fast-trunk forward
            # a THIRD time — measured +15%/token at 150M b32 ct128.
            remat=False, remat_policy=remat_policy,
        )
        fast_out = rms_norm(fast_x, params["fast_norm"], cfg.norm_eps)
        logits = fast_output_logits(params, cfg, fast_out)  # [B*C, n, CB]
        s, c = _masked_nll_sums(logits, lbc.reshape(B * chunk_t, n))
        return (nll_acc + s, cnt_acc + c, rng), None

    if remat:
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat_policy == "dots"
            else None
        )
        body = jax.checkpoint(chunk_body, policy=policy)
    else:
        body = chunk_body
    (nll, cnt, _), _ = jax.lax.scan(
        body,
        (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.int32), frng),
        (h_c, cb_c, lb_c),
    )
    semantic = jnp.sum(nll) / jnp.maximum(jnp.sum(cnt), 1)
    per_cb = (nll / jnp.maximum(cnt, 1)) if per_codebook else None
    return Losses(
        total=base + semantic, base=base, semantic=semantic, per_codebook=per_cb
    )
