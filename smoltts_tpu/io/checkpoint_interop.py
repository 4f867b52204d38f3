"""Weight interop with reference checkpoints (safetensors / torch state dicts).

The reference ships three layouts (SURVEY.md §7 "weight-layout interop"):
torch train checkpoints (`model.pth` state dicts, possibly with legacy
separate wq/wk/wv and 3-D depthwise `fast_output.weight`), the flattened
safetensors export (train/convert_safetensors.py:6-16), and MLX-transposed
conv weights for Mimi. This module converts the LM layouts to/from the
canonical JAX pytree of smoltts_tpu.models.dual_ar:

- linear kernels [in, out]  (torch stores [out, in] -> transpose)
- per-trunk layer weights stacked on a leading layer axis
- depthwise fast_output stored 3-D [position, fast_dim, codebook_size]
  (exported 2-D as [position*cb, fast_dim]; see convert_safetensors.py:10-15)
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

import numpy as np

from smoltts_tpu.config import DualARConfig

_TRUNK_LINEARS = {
    "attention.wqkv.weight": ("wqkv", True),
    "attention.wo.weight": ("wo", True),
    "feed_forward.w1.weight": ("w1", True),
    "feed_forward.w2.weight": ("w2", True),
    "feed_forward.w3.weight": ("w3", True),
    "attention_norm.weight": ("attention_norm", False),
    "ffn_norm.weight": ("ffn_norm", False),
    "attention.wqkv.bias": ("wqkv_bias", False),
}


def _normalize_torch_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip torch.compile prefixes and fuse legacy wq/wk/wv into wqkv
    (reference load hook, rq_transformer.py:528-533)."""
    state = {k.replace("_orig_mod.", ""): v for k, v in state.items()}
    out = dict(state)
    for key in list(state):
        if key.endswith("attention.wq.weight"):
            prefix = key[: -len("wq.weight")]
            wq = out.pop(prefix + "wq.weight")
            wk = out.pop(prefix + "wk.weight")
            wv = out.pop(prefix + "wv.weight")
            out[prefix + "wqkv.weight"] = np.concatenate([wq, wk, wv], axis=0)
    return out


def _stack_trunk(state: Dict[str, np.ndarray], prefix: str, n_layer: int) -> dict:
    trunk: dict = {}
    for suffix, (name, transpose) in _TRUNK_LINEARS.items():
        key0 = f"{prefix}.0.{suffix}"
        if key0 not in state:
            continue
        per_layer = [state[f"{prefix}.{i}.{suffix}"] for i in range(n_layer)]
        arr = np.stack(per_layer, axis=0)
        if transpose:
            arr = arr.transpose(0, 2, 1)
        trunk[name] = arr
    return trunk


def params_from_state_dict(
    state: Dict[str, np.ndarray], cfg: DualARConfig
) -> dict:
    """Convert a reference state dict (numpy-valued) to the canonical pytree."""
    state = _normalize_torch_keys(state)
    params: dict = {
        "embeddings": state["embeddings.weight"],
        "codebook_embeddings": state["codebook_embeddings.weight"],
        "layers": _stack_trunk(state, "layers", cfg.n_layer),
        "norm": state["norm.weight"],
        "fast_embeddings": state["fast_embeddings.weight"],
        "fast_layers": _stack_trunk(state, "fast_layers", cfg.n_fast_layer),
        "fast_norm": state["fast_norm.weight"],
    }
    if "output.weight" in state:
        params["output"] = state["output.weight"].T
    if "fast_project_in.weight" in state and cfg.fast_dim != cfg.dim:
        params["fast_project_in"] = {
            "kernel": state["fast_project_in.weight"].T,
            "bias": state["fast_project_in.bias"],
        }

    w = state["fast_output.weight"]
    n, cb = cfg.max_fast_seqlen, cfg.codebook_size
    if cfg.depthwise_output:
        if w.ndim == 3:  # torch DepthwiseLinear [n, fast_dim, cb]
            params["fast_output"] = w
        else:  # flattened export [n*cb, fast_dim] (convert_safetensors.py:10-15)
            assert w.shape == (n * cb, cfg.fast_dim), w.shape
            params["fast_output"] = w.reshape(n, cb, cfg.fast_dim).transpose(0, 2, 1)
    else:
        params["fast_output"] = w.T  # [cb, fast_dim] -> [fast_dim, cb]
    return params


def state_dict_from_params(params: dict, cfg: DualARConfig) -> Dict[str, np.ndarray]:
    """Convert the canonical pytree back to the reference safetensors schema
    (flattened depthwise head), for interop with the MLX engine."""
    state: Dict[str, np.ndarray] = {
        "embeddings.weight": np.asarray(params["embeddings"]),
        "codebook_embeddings.weight": np.asarray(params["codebook_embeddings"]),
        "norm.weight": np.asarray(params["norm"]),
        "fast_embeddings.weight": np.asarray(params["fast_embeddings"]),
        "fast_norm.weight": np.asarray(params["fast_norm"]),
    }

    def unstack(trunk: dict, prefix: str, n_layer: int):
        for name, (suffix, transpose) in {
            v[0]: (k, v[1]) for k, v in _TRUNK_LINEARS.items()
        }.items():
            if name not in trunk:
                continue
            arr = np.asarray(trunk[name])
            for i in range(n_layer):
                w = arr[i]
                state[f"{prefix}.{i}.{suffix}"] = w.T if transpose else w

    unstack(params["layers"], "layers", cfg.n_layer)
    unstack(params["fast_layers"], "fast_layers", cfg.n_fast_layer)

    if "output" in params:
        state["output.weight"] = np.asarray(params["output"]).T
    if "fast_project_in" in params:
        state["fast_project_in.weight"] = np.asarray(
            params["fast_project_in"]["kernel"]
        ).T
        state["fast_project_in.bias"] = np.asarray(params["fast_project_in"]["bias"])

    w = np.asarray(params["fast_output"])
    if cfg.depthwise_output:
        n, fd, cb = w.shape
        # [n, fd, cb] -> [fd, n*cb] -> [n*cb, fd] (convert_safetensors.py:13-15)
        state["fast_output.weight"] = w.transpose(1, 0, 2).reshape(fd, n * cb).T.copy()
    else:
        state["fast_output.weight"] = w.T
    return state


def load_params(
    checkpoint_dir: Union[str, Path], cfg: DualARConfig, dtype=None
) -> dict:
    """Load LM params from a checkpoint dir holding `model.safetensors`
    (preferred) or `model.pth` (torch train checkpoint)."""
    d = Path(checkpoint_dir)
    st_path = d / "model.safetensors"
    if st_path.exists():
        state = load_safetensors(st_path)
    else:
        import torch

        raw = torch.load(d / "model.pth", map_location="cpu", weights_only=True)
        if "model_state_dict" in raw:
            raw = raw["model_state_dict"]
        state = {k: v.to(torch.float32).numpy() for k, v in raw.items()}
    params = params_from_state_dict(state, cfg)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda a: a.astype(dtype), params)
    return params


def save_params(
    params: dict, cfg: DualARConfig, checkpoint_dir: Union[str, Path]
) -> None:
    """Write `model.safetensors` + `config.json` in the reference schema."""
    d = Path(checkpoint_dir)
    d.mkdir(parents=True, exist_ok=True)
    state = state_dict_from_params(params, cfg)
    save_safetensors(
        {k: np.ascontiguousarray(v) for k, v in state.items()}, d / "model.safetensors"
    )
    cfg.save(d / "config.json")


def load_safetensors(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Read a .safetensors file — native C reader (zero-copy mmap, BF16-capable)
    when a toolchain is present, else the `safetensors` package."""
    from smoltts_tpu.native.safetensors_io import load_file, native_st_available

    if native_st_available():
        return load_file(path)
    from safetensors.numpy import load_file as st_load_file

    return st_load_file(str(path))


def save_safetensors(tensors: Dict[str, np.ndarray], path: Union[str, Path]) -> None:
    """Write a .safetensors file — native C writer when available."""
    from smoltts_tpu.native.safetensors_io import native_st_available, save_file

    if native_st_available():
        save_file(tensors, path)
        return
    from safetensors.numpy import save_file as st_save_file

    st_save_file(tensors, str(path))
