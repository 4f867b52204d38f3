"""Causal 1-D convolutions for the Mimi SEANet stacks — batch and streaming.

Batch semantics match the reference's causal convs (mlx .../codec/conv.py:
68-158 for conv, 161-220 for transpose conv; same math as HF Mimi): left-pad
by `effective_kernel - stride`, extra right-pad to frame-align, transpose
convs trim `padding_left/right` per `trim_right_ratio`.

Streaming is re-derived for XLA's static shapes: the reference keeps
variable-length leftover tails in Python objects; here every step consumes a
fixed chunk length L (L % stride == 0 — true throughout the SEANet decoder at
one 80 ms frame per step), which makes the carried state FIXED-SHAPE:

- causal conv: a rolling input buffer of exactly `effective_kernel - stride`
  samples, zero-initialized (== the reference's one-time left pad,
  conv.py:136-139) and updated to the last `eff_k - stride` inputs each step.
- transpose conv: the overlap-add tail of exactly `kernel - stride` output
  samples, carried bias-free (== the reference's subtract-the-bias trick,
  conv.py:206-219) and zero-initialized.

Both are pure functions over (state, x) -> (state, y), so the whole streaming
vocoder jits as one program. Layout: activations [B, L, C]; conv kernels
[K, C_in/groups, C_out] (importer transposes from torch).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_PAD_MODES = {"constant": "constant", "replicate": "edge", "edge": "edge", "reflect": "reflect"}


def _pad_time(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    if left == 0 and right == 0:
        return x
    jmode = _PAD_MODES[mode]
    if jmode == "reflect":
        # Reflect needs length > pad; mirror the reference's extra-zero-pad
        # workaround for short inputs (conv.py:45-64).
        L = x.shape[1]
        max_pad = max(left, right)
        if L <= max_pad:
            extra = max_pad - L + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
            padded = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
            return padded[:, : padded.shape[1] - extra]
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=jmode)


def conv1d_raw(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """VALID 1-D convolution. x [B, L, Cin], w [K, Cin/groups, Cout]."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def effective_kernel(kernel: int, dilation: int) -> int:
    return (kernel - 1) * dilation + 1


def extra_pad_for_frame_align(length: int, eff_k: int, stride: int) -> int:
    """Right padding so the conv output covers ceil frames
    (conv.py:112-118 / HF _get_extra_padding_for_conv1d)."""
    padding_total = eff_k - stride
    n_frames = (length - eff_k + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + eff_k - padding_total
    return ideal - length


def causal_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    pad_mode: str = "constant",
    groups: int = 1,
) -> jnp.ndarray:
    """Batch causal conv: left-pad eff_k - stride (+ frame-align right pad)."""
    K = w.shape[0]
    eff_k = effective_kernel(K, dilation)
    extra = extra_pad_for_frame_align(x.shape[1], eff_k, stride)
    x = _pad_time(x, eff_k - stride, extra, pad_mode)
    return conv1d_raw(x, w, b, stride=stride, dilation=dilation, groups=groups)


def conv_transpose1d_raw(
    x: jnp.ndarray,
    w_flipped: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    groups: int = 1,
) -> jnp.ndarray:
    """Transposed conv as lhs-dilated correlation with a pre-flipped kernel.

    x [B, L, Cin]; w_flipped [K, Cin/groups, Cout] with
    w_flipped[k, i, o] = w_torch[i, o, K-1-k]. Output length (L-1)*stride + K.
    """
    K = w_flipped.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        w_flipped.astype(x.dtype),
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv_transpose1d(
    x: jnp.ndarray,
    w_flipped: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    groups: int = 1,
    trim_right_ratio: float = 1.0,
) -> jnp.ndarray:
    """Batch transpose conv with causal trimming (conv.py:195-199)."""
    K = w_flipped.shape[0]
    y = conv_transpose1d_raw(x, w_flipped, b, stride=stride, groups=groups)
    padding_total = K - stride
    padding_right = math.ceil(padding_total * trim_right_ratio)
    padding_left = padding_total - padding_right
    end = y.shape[1] - padding_right
    return y[:, padding_left:end]


# --------------------------------------------------------------------------
# Streaming (fixed-shape state)
# --------------------------------------------------------------------------


def conv_stream_init(
    batch: int, in_channels: int, kernel: int, stride: int, dilation: int, dtype
) -> jnp.ndarray:
    """Zero rolling buffer [B, eff_k - stride, Cin]."""
    eff_k = effective_kernel(kernel, dilation)
    return jnp.zeros((batch, eff_k - stride, in_channels), dtype)


def conv_stream_step(
    state: jnp.ndarray,
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming step. x [B, L, Cin] with L % stride == 0 ->
    y [B, L//stride, Cout]."""
    L = x.shape[1]
    assert L % stride == 0, "streaming conv requires chunk % stride == 0"
    x_long = jnp.concatenate([state, x.astype(state.dtype)], axis=1)
    y = conv1d_raw(x_long, w, b, stride=stride, dilation=dilation, groups=groups)
    new_state = x_long[:, L:] if state.shape[1] > 0 else state
    return new_state, y


def convtr_stream_init(
    batch: int, out_channels: int, kernel: int, stride: int, dtype
) -> jnp.ndarray:
    """Zero overlap tail [B, kernel - stride, Cout] (bias-free)."""
    return jnp.zeros((batch, kernel - stride, out_channels), dtype)


def convtr_stream_step(
    state: jnp.ndarray,
    x: jnp.ndarray,
    w_flipped: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming step. x [B, L, Cin] -> y [B, L*stride, Cout]."""
    K = w_flipped.shape[0]
    L = x.shape[1]
    ys = conv_transpose1d_raw(x, w_flipped, b, stride=stride, groups=groups)
    overlap = K - stride
    if overlap > 0:
        head = ys[:, :overlap] + state.astype(ys.dtype)
        ys = jnp.concatenate([head, ys[:, overlap:]], axis=1)
    out = ys[:, : L * stride]
    tail = ys[:, L * stride :]
    if b is not None:
        tail = tail - b.astype(tail.dtype)
    return tail.astype(state.dtype), out
