"""Int8 weight-only quantization for the decode path.

Decode at 150M is HBM-bandwidth-bound on weight reads: every 80 ms frame
streams the full slow-trunk + fast-trunk + head matmul weights from HBM
(~270 MB in bf16). Symmetric per-output-channel int8 halves that traffic;
XLA fuses the int8->bf16 convert into the dot's operand read (measured on
TPU v5e: the dequantizing matmul reads int8 from HBM at full bandwidth, no
dequantized copy is materialized), so the speedup is the bandwidth ratio.

Design:
- `QTensor(q, scale)` is a pytree node shaped exactly like the weight it
  replaces (leading stacked-layer axes included), so it composes with the
  existing `jax.tree.map(lambda a: a[l], layer_params)` per-layer indexing
  and with `lax.scan` over stacked layer weights.
- `mm(x, w)` is the single matmul entry point used by the decode trunks;
  it is the identity `x @ w` for plain arrays, so training and unquantized
  decode are untouched.
- Scales are applied AFTER the dot: `(x @ q.astype(x.dtype)) * scale`.
  With a power-of-two scale this is bit-exact against `x @ (q * scale)`
  (pinned by tests/test_ops_quant.py::test_power_of_two_exact).

The reference has no quantized inference path (its MLX engine runs bf16,
mlx_inference/src/smoltts_mlx/__init__.py:47-51); this is a TPU-native
serving capability on top of reference parity.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Symmetric per-channel int8 weight: w ~= q * scale.

    `q` has the original weight's shape; `scale` keeps the reduced
    (contraction) axis as size 1 so leading-axis indexing/scans treat both
    leaves uniformly and the post-dot broadcast is shape-correct.
    """

    q: jnp.ndarray  # int8
    scale: jnp.ndarray  # float, contraction axis kept as 1


Weight = Union[jnp.ndarray, QTensor]


def quantize_q8(w: jnp.ndarray, contract_axis: int = -2) -> QTensor:
    """Per-output-channel symmetric int8 over the contraction axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale.astype(jnp.float32))


def dequantize(w: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


def mm(x: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """x @ w for plain or int8-quantized weights.

    For QTensor the convert fuses into the dot's rhs read; the per-channel
    scale is applied to the (much smaller) result.
    """
    if isinstance(w, QTensor):
        if any(d != 1 for d in w.scale.shape[:-1]):
            raise ValueError(
                f"mm() got a QTensor with stacked leading axes (scale shape "
                f"{w.scale.shape}); index the layer out first (qindex/tree "
                "slicing) so only the [1, out] per-channel scale remains"
            )
        y = x @ w.q.astype(x.dtype)
        # scale: [..., 1, out] -> broadcast over the result's trailing [out].
        return y * w.scale.reshape(w.scale.shape[-1]).astype(y.dtype)
    return x @ w


def qindex(w: Weight, i) -> Weight:
    """w[i] that works for both plain arrays and QTensor leaves."""
    if isinstance(w, QTensor):
        return QTensor(q=w.q[i], scale=w.scale[i])
    return w[i]


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector int8 over the trailing head_dim axis.

    Used for KV-cache quantization (kv8): each cached key/value vector gets
    its own scale, so attention dequantizes by scaling LOGITS (keys) or
    PROBS (values) — the int8->bf16 convert fuses into the dot's operand
    read exactly like the weight path, halving KV HBM traffic.

    Returns (q int8 shaped like x, scale float32 with the trailing axis
    reduced away).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


_TRUNK_KEYS = ("wqkv", "wo", "w1", "w2", "w3")


def quantize_decode_params(params: dict) -> dict:
    """Quantize the matmul weights of a DualAR param tree for decode.

    Quantized: slow/fast trunk projections (wqkv, wo, w1, w2, w3, stacked
    over layers), the fast output head (incl. depthwise [n, dim, cb]), the
    fast input projection, and the untied output head if present.
    Left in bf16: embeddings (gather tables — also the tied head, a 3.6 MB
    read), norm weights, biases.
    """
    out = dict(params)
    for trunk in ("layers", "fast_layers"):
        lp = dict(params[trunk])
        for key in _TRUNK_KEYS + ("w13",):  # w13: fused gate/up (fuse_decode_params)
            if key in lp and not isinstance(lp[key], QTensor):
                lp[key] = quantize_q8(lp[key], contract_axis=-2)
        out[trunk] = lp
    out["fast_output"] = quantize_q8(params["fast_output"], contract_axis=-2)
    if "fast_project_in" in params:
        fpi = dict(params["fast_project_in"])
        fpi["kernel"] = quantize_q8(fpi["kernel"], contract_axis=-2)
        out["fast_project_in"] = fpi
    if "output" in params:
        out["output"] = quantize_q8(params["output"], contract_axis=-2)
    return out


def _concat_w(ws, axis=-1):
    """Concatenate weights along the OUTPUT axis — exact for both plain
    arrays and per-output-channel QTensors (each output column's reduction
    is unchanged, so the fused dot is bit-identical to the separate dots)."""
    if isinstance(ws[0], QTensor):
        return QTensor(
            q=jnp.concatenate([w.q for w in ws], axis=axis),
            scale=jnp.concatenate([w.scale for w in ws], axis=axis),
        )
    return jnp.concatenate(ws, axis=axis)


def fuse_decode_params(params: dict) -> dict:
    """Fuse the SwiGLU gate/up projections (w1, w3 -> w13) for the decode
    hot path: one [dim, 2*ffn] matmul instead of two [dim, ffn] ones per
    layer per (micro-)step — fewer, larger MXU ops. Bit-exact (output
    columns are computed identically); the decode trunks branch on the
    "w13" key (lm/decode.py). Composes with int8 weights in either order.
    Idempotent; training trees are never fused (forward_train uses w1/w3).
    """
    out = dict(params)
    for trunk in ("layers", "fast_layers"):
        if trunk not in params or "w13" in params[trunk]:
            continue
        lp = dict(params[trunk])
        lp["w13"] = _concat_w([lp.pop("w1"), lp.pop("w3")])
        out[trunk] = lp
    return out


def fuse_mimi_decode_params(params: dict) -> dict:
    """Fuse the codec transformers' q/k/v projections into one wqkv matmul
    (3x fewer attention-projection ops per stream step). Bit-exact; the
    codec transformer branches on the "wqkv" key. Idempotent."""
    out = dict(params)
    for trunk in ("encoder_transformer", "decoder_transformer"):
        if trunk not in params or "wqkv" in params[trunk]["layers"]:
            continue
        lp = dict(params[trunk]["layers"])
        lp["wqkv"] = _concat_w([lp.pop("wq"), lp.pop("wk"), lp.pop("wv")])
        out[trunk] = {**params[trunk], "layers": lp}
    return out


_MIMI_LINEARS = ("wq", "wk", "wv", "wo", "fc1", "fc2")


def quantize_mimi_params(params: dict) -> dict:
    """Quantize the Mimi codec transformers' linear weights (the bulk of the
    vocoder's per-frame weight reads: 8 layers x (4x512^2 + 2x512x2048) ~ 25M
    params per transformer). SEANet conv kernels, RVQ codebooks, layer norms
    and LayerScale stay dense (small, and convs don't route through mm)."""
    out = dict(params)
    for trunk in ("encoder_transformer", "decoder_transformer"):
        if trunk not in params:
            continue
        lp = dict(params[trunk]["layers"])
        for key in _MIMI_LINEARS + ("wqkv",):  # wqkv: fused (fuse_mimi_decode_params)
            if key in lp and not isinstance(lp[key], QTensor):
                lp[key] = quantize_q8(lp[key], contract_axis=-2)
        out[trunk] = {**params[trunk], "layers": lp}
    return out
