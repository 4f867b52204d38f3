"""ChatML prompt construction for DualAR models.

Numpy port of the reference PromptEncoder (mlx .../lm/utils/prompt.py:10-63):
text turns are `<|im_start|>role\\n[content<|im_end|>]` token rows stacked
over `depth` zero codebook rows; VQ (audio) turns put semantic-offset codes in
row 0, the lower codebook rows through, and append `<|im_end|>\\n`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from smoltts_tpu.config import DualARConfig, ModelType


class PromptEncoder:
    def __init__(
        self,
        tokenizer,
        model_type: ModelType,
        semantic_offset: int,
        num_codebooks: int = 8,
        duplicate_code_0: bool = True,
    ):
        self.tokenizer = tokenizer
        self.model_type = model_type
        self.depth = num_codebooks if duplicate_code_0 else num_codebooks - 1
        self.semantic_offset = semantic_offset

    @classmethod
    def from_config(cls, tokenizer, cfg: DualARConfig, token_cfg, model_type=None):
        return cls(
            tokenizer,
            model_type=model_type or ModelType.smoltts_v0(),
            semantic_offset=token_cfg.semantic_start_id,
            num_codebooks=cfg.num_codebooks,
            duplicate_code_0=cfg.duplicate_code_0,
        )

    def _encode_ids(self, text: str) -> list:
        enc = self.tokenizer.encode(text)
        return enc if isinstance(enc, list) else enc.ids

    def tokenize_text(self, text: str) -> np.ndarray:
        ids = np.asarray(self._encode_ids(text), dtype=np.int32)[None, :]
        zeros = np.zeros((self.depth, ids.shape[-1]), dtype=np.int32)
        return np.concatenate([ids, zeros], axis=0)

    def encode_text_turn(self, role: str, content: Optional[str] = None) -> np.ndarray:
        content_suffix = f"{content}<|im_end|>" if content is not None else ""
        return self.tokenize_text(f"<|im_start|>{role}\n{content_suffix}")

    def encode_vq(self, codes: np.ndarray) -> np.ndarray:
        """codes: [num_codebooks, T] Mimi codes -> [1+depth, T+len(im_end)]"""
        if codes.ndim != 2:
            raise ValueError("Must be single batch")
        semantic_line = (codes[0, :] + self.semantic_offset)[None, :]
        lower_start = codes.shape[0] - self.depth
        lower_codes = codes[lower_start:, :]
        vq_block = np.concatenate([semantic_line, lower_codes], axis=0)
        im_end = self.tokenize_text("<|im_end|>\n")
        return np.concatenate([vq_block, im_end], axis=1).astype(np.int32)
