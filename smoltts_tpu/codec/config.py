"""Mimi codec configuration.

Field names and defaults mirror the kyutai/mimi release (and HF transformers'
MimiConfig), which is also what the reference's MLX port hardcodes
(mlx .../codec/conv.py:8-22, transformer.py:10-31, rvq.py:7-13): 24 kHz audio,
SEANet ratios [8,6,5,4] (hop 960 → 25 Hz), stride-2 down/upsample to 12.5 Hz
frames, 8-layer 512-dim codec transformer with LayerScale 0.01 and sliding
window 250, split RVQ with 1 semantic + 31 acoustic quantizers of 2048 codes.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np
from pydantic import BaseModel, ConfigDict


class MimiConfig(BaseModel):
    model_config = ConfigDict(extra="ignore")

    # SEANet
    sampling_rate: int = 24_000
    audio_channels: int = 1
    num_filters: int = 64
    num_residual_layers: int = 1
    upsampling_ratios: List[int] = [8, 6, 5, 4]
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    trim_right_ratio: float = 1.0
    use_causal_conv: bool = True
    pad_mode: str = "constant"
    hidden_size: int = 512

    # Codec transformer
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    norm_eps: float = 1e-5
    rope_theta: float = 10_000.0
    sliding_window: int = 250
    layer_scale_initial_scale: float = 0.01

    # RVQ
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    frame_rate: float = 12.5
    upsample_groups: int = 512

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))  # 960

    @property
    def encodec_frame_rate(self) -> float:
        return math.ceil(self.sampling_rate / self.hop_length)  # 25 Hz

    @property
    def downsample_stride(self) -> int:
        """Down/upsample stride is fixed at 2 (HF Mimi builds the stride-2
        convs with kernel 2*int(encodec_frame_rate/frame_rate))."""
        return 2

    @property
    def downsample_kernel(self) -> int:
        return 2 * int(self.encodec_frame_rate / self.frame_rate)  # 4

    @property
    def samples_per_frame(self) -> int:
        return self.hop_length * self.downsample_stride  # 1920 (80 ms)
