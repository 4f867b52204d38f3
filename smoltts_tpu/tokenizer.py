"""Byte-level tokenizer for smoltts-style DualAR models.

Two implementations, same vocab:

1. `build_byte_level_tokenizer()` — builds the HF `tokenizers` object with the
   exact vocabulary layout of the reference init builder
   (data_pipeline/scripts/create_bytelevel_init.py:15-57): 256 raw-byte tokens
   (ids 0..255), 15 control tokens, 49 `<|speaker:n|>` tokens (padding the
   control block to 64 ids), then `codebook_size` `<|semantic:i|>` tokens —
   vocab 2368 at codebook_size 2048.

2. `ByteTokenizer` — a dependency-free host-side tokenizer over the same
   vocabulary. Byte-level vocab makes this trivial (special tokens by longest
   match, raw bytes otherwise), and it removes the Rust `tokenizers` runtime
   from the serving hot path.

`TokenConfig` resolves the control ids the generation loop needs
(reference: mlx .../lm/rq_transformer.py:51-89), including the legacy
fish-speech 1.2/1.4/1.5 branches.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Optional, Union

from pydantic import BaseModel

from smoltts_tpu.config import DualARConfig, ModelType

CONTROL_TOKENS = [
    "system",
    "user",
    "assistant",
    "<|british|>",
    "<|american|>",
    "<|male|>",
    "<|female|>",
    "<|unknown|>",
    "<|endoftext|>",
    "<|voice|>",
    "<|semantic|>",
    "<|pad|>",
    "<|epad|>",
    "<|im_start|>",
    "<|im_end|>",
]
CONTROL_BLOCK_SIZE = 64  # control + speaker tokens span ids 256..319


def special_token_list(codebook_size: int = 2048) -> List[str]:
    speakers = [f"<|speaker:{i}|>" for i in range(CONTROL_BLOCK_SIZE - len(CONTROL_TOKENS))]
    semantic = [f"<|semantic:{i}|>" for i in range(codebook_size)]
    return [*CONTROL_TOKENS, *speakers, *semantic]


def build_byte_level_tokenizer(codebook_size: int = 2048):
    """Build the byte-level HF tokenizer (vocab-identical to the reference)."""
    from tokenizers import Tokenizer, decoders, models
    from tokenizers.trainers import BpeTrainer

    tokenizer = Tokenizer(models.BPE())
    trainer = BpeTrainer(vocab_size=256, special_tokens=[])
    byte_strings = [bytes([i]).decode("latin-1") for i in range(256)]
    tokenizer.train_from_iterator(byte_strings, trainer=trainer)
    tokenizer.pre_tokenizer = None
    tokenizer.normalizer = None
    tokenizer.decoder = decoders.ByteLevel()
    tokenizer.add_special_tokens(special_token_list(codebook_size))
    return tokenizer


def save_byte_level_tokenizer(out_dir: Union[str, Path], codebook_size: int = 2048):
    """Save tokenizer.json (+ HF wrapper files) like the reference init builder."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tok = build_byte_level_tokenizer(codebook_size)
    tok.save(str(out / "tokenizer.json"))
    return tok


class ByteTokenizer:
    """Pure-Python byte-level tokenizer over the smoltts vocab.

    Vocabulary layout (must match `build_byte_level_tokenizer`):
      ids 0..255      raw bytes (BPE-trained on single bytes => identity)
      ids 256..270    control tokens
      ids 271..319    <|speaker:0..48|>
      ids 320..       <|semantic:0..codebook_size-1|>
    """

    _SPECIAL_RE = re.compile(r"<\|[^|<>]+\|>|system|user|assistant")

    def __init__(self, codebook_size: int = 2048):
        self.codebook_size = codebook_size
        specials = special_token_list(codebook_size)
        self._special_to_id = {s: 256 + i for i, s in enumerate(specials)}
        self._id_to_special = {v: k for k, v in self._special_to_id.items()}
        self.vocab_size = 256 + len(specials)

    def token_to_id(self, token: str) -> Optional[int]:
        if token in self._special_to_id:
            return self._special_to_id[token]
        if len(token) == 1 and ord(token) < 256:
            return ord(token)
        return None

    def id_to_token(self, idx: int) -> Optional[str]:
        if 0 <= idx < 256:
            return chr(idx)
        return self._id_to_special.get(idx)

    def _encode_chars(self, chunk: str, ids: List[int]) -> None:
        # HF byte-level semantics: each CHARACTER with codepoint < 256 maps to
        # its codepoint id (the BPE vocab is latin-1 characters); characters
        # outside latin-1 have no vocab entry and are silently dropped. The
        # data pipeline recodes UTF-8 bytes to latin-1 chars for the "bpe"
        # strategy (chatml_tokenize_dataset.py:113).
        ids.extend(ord(c) for c in chunk if ord(c) < 256)

    def encode(self, text: str) -> List[int]:
        """Encode text: special tokens match greedily, the rest per-char."""
        ids: List[int] = []
        pos = 0
        for m in self._SPECIAL_RE.finditer(text):
            self._encode_chars(text[pos : m.start()], ids)
            tok = m.group(0)
            tid = self._special_to_id.get(tok)
            if tid is not None:
                ids.append(tid)
            else:  # not a known special: fall back to chars
                self._encode_chars(tok, ids)
            pos = m.end()
        self._encode_chars(text[pos:], ids)
        return ids

    def decode(self, ids: List[int]) -> str:
        out: List[str] = []
        for i in ids:
            if 0 <= i < 256:
                out.append(chr(i))
            else:
                out.append(self._id_to_special.get(i, ""))
        return "".join(out)


class TokenConfig(BaseModel):
    """Resolved control-token ids (reference: mlx .../lm/rq_transformer.py:51-89)."""

    im_end_id: int
    pad_id: int
    semantic_start_id: int
    semantic_end_id: Optional[int] = None

    @classmethod
    def from_tokenizer(
        cls, model: ModelType, tokenizer, config: DualARConfig
    ) -> "TokenConfig":
        """`tokenizer` is anything with `.token_to_id` (HF or ByteTokenizer)."""
        im_end = tokenizer.token_to_id("<|im_end|>")
        if im_end is None:
            raise ValueError("Tokenizer does not have <|im_end|>")

        modern = model.family == "dual_ar" or (
            model.family == "fish" and model.version == "1.5"
        )
        if modern:
            semantic_start_id = tokenizer.token_to_id("<|semantic:0|>")
            semantic_end_id = tokenizer.token_to_id(
                f"<|semantic:{config.codebook_size - 1}|>"
            )
        else:
            semantic_start_id = tokenizer.token_to_id("<|semantic|>") or 5
            semantic_end_id = None
        pad_id = tokenizer.token_to_id("<|semantic|>") or 5

        return cls(
            im_end_id=im_end,
            pad_id=pad_id,
            semantic_start_id=semantic_start_id,
            semantic_end_id=semantic_end_id,
        )

    @classmethod
    def smoltts_v0(cls, codebook_size: int = 2048) -> "TokenConfig":
        """Static resolution for the canonical byte-level vocab."""
        tok = ByteTokenizer(codebook_size)
        return cls.from_tokenizer(
            ModelType.smoltts_v0(), tok, DualARConfig(codebook_size=codebook_size)
        )


def load_tokenizer(checkpoint_dir: Union[str, Path]):
    """Load tokenizer.json from a checkpoint dir via HF `tokenizers`;
    falls back to the native C byte-level tokenizer (vocab-identical), then
    the pure-Python one."""
    p = Path(checkpoint_dir) / "tokenizer.json"
    if p.exists():
        try:
            from tokenizers import Tokenizer

            return Tokenizer.from_file(str(p))
        except ImportError:
            pass
    try:
        from smoltts_tpu.native import NativeByteTokenizer, native_available

        if native_available():
            return NativeByteTokenizer()
    except Exception:
        pass
    return ByteTokenizer()
