"""Checkpoint manager: timestamped run dirs, step_N checkpoints, keep-last-5
GC, resume with optimizer/scheduler hparam-drift detection.

Semantics per the reference CheckpointManager (train/state.py:19-140):
- run dirs `run_{timestamp}` under the base checkpoint path;
- `step_{N:06d}` checkpoints holding model/optimizer state + step + config;
- keep-last-N pruning;
- resume reloads weights and detects AdamW/schedule hparam changes, in which
  case the optimizer state is reinitialized (train/state.py:36-64).

Storage is Orbax (multihost-safe sharded pytree checkpointing) — the TPU
replacement for torch.save/load.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from smoltts_tpu.config import TrainingConfig

OPTIMIZER_KEYS = ["learning_rate", "weight_decay", "betas", "eps"]
SCHEDULER_KEYS = ["lr_start", "lr_warmup_steps"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


class CheckpointManager:
    def __init__(
        self,
        base_directory: str,
        keep_last_n: int = 5,
        run_name: Optional[str] = None,
        config: Optional[TrainingConfig] = None,
    ):
        self.base_dir = Path(base_directory)
        timestamp = run_name or f"run_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
        self.run_dir = self.base_dir / timestamp
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.keep_last_n = keep_last_n
        self.config = config
        print(f"Checkpoint directory for this run: {self.run_dir}")

    def save(self, state, step: Optional[int] = None, config: Optional[TrainingConfig] = None) -> None:
        """Save TrainState (params + opt_state + step) and the run config."""
        step = int(state.step) if step is None else int(step)
        if step == 0:
            print("Skipping step 0")
            return
        path = self.run_dir / f"step_{step:06d}"
        ckpt = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(step),
        }
        # Orbax save is a collective in multihost runs: every process calls
        # it (each writes its addressable shards); host-side bookkeeping
        # (config file, GC) stays on process 0.
        _checkpointer().save((path / "state").absolute(), ckpt, force=True)
        if jax.process_index() != 0:
            return
        config = config or self.config
        if config is not None:
            with open(path / "config.json", "w") as f:
                json.dump(config.model_dump(), f, indent=2)
        self._cleanup_old_checkpoints()

    def _cleanup_old_checkpoints(self):
        dirs = sorted(self.run_dir.glob("step_*"))
        for d in dirs[: max(0, len(dirs) - self.keep_last_n)]:
            import shutil

            shutil.rmtree(d)

    @staticmethod
    def latest_step_dir(run_dir: Path) -> Optional[Path]:
        dirs = sorted(Path(run_dir).glob("step_*"))
        return dirs[-1] if dirs else None

    @staticmethod
    def latest_checkpoint(base_directory: str) -> Optional[Path]:
        """Newest step checkpoint across all runs under `base_directory` —
        the preemption-recovery entry (restart-from-latest): newest step
        first, run-dir timestamp as the tiebreaker."""
        best: Optional[Path] = None
        for step_dir in Path(base_directory).glob("*/step_*"):
            if best is None or (step_dir.name, step_dir.parent.name) > (
                best.name, best.parent.name
            ):
                best = step_dir
        return best

    @staticmethod
    def load(
        checkpoint_path: str,
        config: TrainingConfig,
        abstract_state=None,
    ) -> Tuple[dict, int, bool]:
        """Load a checkpoint dir -> (pytree, step, reinit_optimizer).

        `reinit_optimizer` is True when optimizer/scheduler hparams changed
        vs. the checkpoint's recorded config (reference train/state.py:36-64).
        """
        path = Path(checkpoint_path)
        restore_args = {}
        if abstract_state is not None:
            restore_args["item"] = abstract_state
        try:
            ckpt = _checkpointer().restore((path / "state").absolute(), **restore_args)
        except ValueError:
            # Checkpoints written by a multihost run store sharded jax.Arrays;
            # without target shardings Orbax needs an explicit host-numpy
            # restore type (the caller re-shards via device_put afterwards).
            import orbax.checkpoint as ocp

            meta = _checkpointer().metadata((path / "state").absolute())
            args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                meta.item_metadata,
            )
            ckpt = _checkpointer().restore(
                (path / "state").absolute(), restore_args=args
            )
        step = int(np.asarray(ckpt["step"]))

        reinit = False
        cfg_path = path / "config.json"
        if cfg_path.exists():
            with open(cfg_path) as f:
                old = TrainingConfig(**json.load(f))
            changed = [
                k
                for k in OPTIMIZER_KEYS + SCHEDULER_KEYS
                if getattr(config, k) != getattr(old, k)
            ]
            if changed:
                print("Detected changes in optimization parameters:")
                for k in changed:
                    print(f"  {k}: {getattr(old, k)} -> {getattr(config, k)}")
                print("Will reinitialize optimizer with new settings")
                reinit = True
        return ckpt, step, reinit
