"""ChatML turn assembly for DualAR decoding.

The on-the-wire layout is fixed by the reference engine
(mlx_inference/src/smoltts_mlx/lm/utils/prompt.py:10-63): every turn is a
``[1 + depth, T]`` int32 matrix whose top row carries text-vocab ids and whose
remaining ``depth`` rows carry Mimi codebook ids (zero on pure-text columns).
Audio turns shift the first codebook into the text vocab's ``<|semantic:n|>``
range and close with an ``<|im_end|>\\n`` column block. This module produces
those matrices from plain strings / numpy code arrays; byte-exactness against
the reference is pinned by tests/test_smoltts_api.py and the pipeline parity
test in tests/test_data_pipeline.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from smoltts_tpu.config import DualARConfig, ModelType

CHATML_OPEN = "<|im_start|>"
CHATML_CLOSE = "<|im_end|>"


def _token_ids(tokenizer, text: str) -> list:
    enc = tokenizer.encode(text)
    return list(enc) if isinstance(enc, list) else list(enc.ids)


def text_rows(tokenizer, text: str, depth: int) -> np.ndarray:
    """Tokenize `text` into the top row of a [1+depth, T] turn matrix."""
    ids = _token_ids(tokenizer, text)
    rows = np.zeros((1 + depth, len(ids)), dtype=np.int32)
    rows[0] = ids
    return rows


def audio_rows(codes: np.ndarray, depth: int, semantic_offset: int) -> np.ndarray:
    """Mimi codes [num_codebooks, T] -> [1+depth, T] turn body.

    Row 0 is codebook 0 shifted into the tokenizer's semantic-id range; the
    trailing `depth` codebook rows pass through unchanged (when
    duplicate_code_0 is set, depth == num_codebooks, so codebook 0 appears
    both shifted on row 0 and raw on row 1).
    """
    codes = np.asarray(codes)
    if codes.ndim != 2:
        raise ValueError(f"expected [num_codebooks, T] codes, got shape {codes.shape}")
    body = np.empty((1 + depth, codes.shape[1]), dtype=np.int32)
    body[0] = codes[0] + semantic_offset
    body[1:] = codes[codes.shape[0] - depth :]
    return body


class PromptEncoder:
    """Bundles a tokenizer with the model constants the turn format needs."""

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
        self.semantic_offset = semantic_offset
        self.depth = num_codebooks if duplicate_code_0 else num_codebooks - 1

    @classmethod
    def from_config(cls, tokenizer, cfg: DualARConfig, token_cfg, model_type=None):
        return cls(
            tokenizer,
            model_type=model_type or ModelType.smoltts_v0(),
            semantic_offset=token_cfg.semantic_start_id,
            num_codebooks=cfg.num_codebooks,
            duplicate_code_0=cfg.duplicate_code_0,
        )

    def encode_text_turn(self, role: str, content: Optional[str] = None) -> np.ndarray:
        """`<|im_start|>role\\n` opener; closed with content + `<|im_end|>`
        when content is given, left open (generation prefix) otherwise."""
        body = "" if content is None else f"{content}{CHATML_CLOSE}"
        return text_rows(self.tokenizer, f"{CHATML_OPEN}{role}\n{body}", self.depth)

    def encode_vq(self, codes: np.ndarray) -> np.ndarray:
        """Audio turn: code rows followed by `<|im_end|>\\n` closing columns."""
        turn = audio_rows(codes, self.depth, self.semantic_offset)
        closer = text_rows(self.tokenizer, f"{CHATML_CLOSE}\n", self.depth)
        return np.concatenate([turn, closer], axis=1)
