"""Server settings (reference: mlx .../server/settings.py:12-63).

model_id XOR checkpoint_dir; a default config file is bootstrapped into the
user cache dir on first run. hub download is attempted only when a model_id
is configured and `huggingface_hub` is importable (this environment has no
network — local checkpoint_dir is the primary path).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

from pydantic import BaseModel, Field, model_validator

from smoltts_tpu.config import ModelType
from smoltts_tpu.lm.samplers import GenerationSettings


class GenerationSettingsModel(BaseModel):
    default_temp: float = 0.5
    default_fast_temp: Optional[float] = 0.0
    min_p: Optional[float] = 0.10
    max_new_tokens: int = 1024

    def to_settings(self) -> GenerationSettings:
        return GenerationSettings(
            default_temp=self.default_temp,
            default_fast_temp=self.default_fast_temp,
            min_p=self.min_p,
            max_new_tokens=self.max_new_tokens,
        )


DEFAULT_SETTINGS = {
    "model_id": "jkeisling/smoltts_v0",
    "model_type": {"family": "dual_ar", "codec": "mimi", "version": None},
    "generation": {
        "default_temp": 0.5,
        "default_fast_temp": 0.0,
        "min_p": 0.10,
        "max_new_tokens": 1024,
    },
}


def _cache_config_path() -> Path:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return Path(base) / "smoltts" / "settings" / "config.json"


class ServerSettings(BaseModel):
    model_id: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    mimi_path: Optional[str] = None
    generation: GenerationSettingsModel = Field(default_factory=GenerationSettingsModel)
    model_type: ModelType = Field(default_factory=ModelType.smoltts_v0)

    @model_validator(mode="after")
    def validate_model_source(self):
        if self.model_id is not None and self.checkpoint_dir is not None:
            raise ValueError("Cannot specify both model_id and checkpoint_dir")
        if self.model_id is None and self.checkpoint_dir is None:
            raise ValueError("Must specify either model_id or checkpoint_dir")
        return self

    @classmethod
    def get_settings(cls, config_path: Optional[str] = None) -> "ServerSettings":
        if config_path:
            with open(config_path) as f:
                return cls(**json.load(f))
        path = _cache_config_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        if not path.exists():
            with open(path, "w") as f:
                json.dump(DEFAULT_SETTINGS, f, indent=2)
            return cls(**DEFAULT_SETTINGS)
        with open(path) as f:
            return cls(**json.load(f))

    def get_checkpoint_dir(self) -> Path:
        if self.checkpoint_dir is not None:
            return Path(self.checkpoint_dir)
        try:
            from huggingface_hub import snapshot_download  # type: ignore

            return Path(snapshot_download(self.model_id))
        except Exception as e:  # no hub / no network
            raise RuntimeError(
                f"cannot download {self.model_id!r} (no hub access): {e}; "
                "set checkpoint_dir in the server config"
            )
