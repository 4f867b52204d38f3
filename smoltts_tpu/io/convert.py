"""Checkpoint conversion CLI (reference: train/convert_safetensors.py).

Converts any supported source into the release layout
(`model.safetensors` + `config.json`, depthwise head flattened):

  python -m smoltts_tpu.io.convert --src <path> --config <config.json> -o out/

Sources: a torch train checkpoint (`.pt`/`.pth`, raw or with
`model_state_dict`), a safetensors file, a checkpoint DIR containing either,
or an Orbax train-state directory written by smoltts_tpu.train.checkpoint
(`step_NNNNNN/`).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from smoltts_tpu.config import DualARConfig
from smoltts_tpu.io.checkpoint_interop import (
    params_from_state_dict,
    save_params,
)


def load_source(src: Path, cfg: DualARConfig) -> dict:
    if src.is_dir():
        if (src / "state").exists():  # Orbax step dir
            import orbax.checkpoint as ocp

            ckpt = ocp.PyTreeCheckpointer().restore(str((src / "state").absolute()))
            return ckpt["params"]
        for name in ("model.safetensors", "model.pth", "model.pt"):
            if (src / name).exists():
                src = src / name
                break
        else:
            raise FileNotFoundError(f"no checkpoint found in {src}")
    if src.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return params_from_state_dict(load_file(str(src)), cfg)
    if src.suffix in (".pt", ".pth"):
        import torch

        raw = torch.load(src, map_location="cpu", weights_only=True)
        if "model_state_dict" in raw:
            raw = raw["model_state_dict"]
        state = {k: v.to(torch.float32).numpy() for k, v in raw.items()}
        return params_from_state_dict(state, cfg)
    raise ValueError(f"unsupported source {src}")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Convert checkpoints to the release safetensors layout")
    parser.add_argument("--src", required=True, help="torch .pt/.pth, safetensors, ckpt dir, or Orbax step dir")
    parser.add_argument("--config", required=True, help="model config.json (or dir containing it)")
    parser.add_argument("-o", "--out-dir", required=True)
    parser.add_argument("--dtype", choices=["float32", "bfloat16", "keep"], default="keep")
    args = parser.parse_args(argv)

    cfg = DualARConfig.from_json_file(args.config)
    params = load_source(Path(args.src), cfg)
    if args.dtype != "keep":
        import jax

        params = jax.tree.map(lambda a: np.asarray(a, dtype=args.dtype), params)
    save_params(params, cfg, args.out_dir)
    n = sum(int(np.prod(np.shape(p))) for p in __import__("jax").tree.leaves(params))
    print(f"Wrote {args.out_dir}/model.safetensors ({n} params)")


if __name__ == "__main__":
    main()
