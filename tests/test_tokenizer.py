"""Vocabulary and tokenizer tests: pure-Python ByteTokenizer must agree with
the HF `tokenizers` build (itself vocab-identical to the reference init
builder, data_pipeline/scripts/create_bytelevel_init.py:15-57)."""

import pytest

from smoltts_tpu.tokenizer import (
    ByteTokenizer,
    TokenConfig,
    build_byte_level_tokenizer,
)
from smoltts_tpu.config import ModelType, DualARConfig


@pytest.fixture(scope="module")
def hf_tok():
    return build_byte_level_tokenizer(2048)


def test_vocab_layout(hf_tok):
    bt = ByteTokenizer(2048)
    assert bt.vocab_size == 2368
    assert hf_tok.get_vocab_size() == 2368
    # semantic ids contiguous, start at 320
    assert hf_tok.token_to_id("<|semantic:0|>") == 320
    assert hf_tok.token_to_id("<|semantic:2047|>") == 2367
    assert bt.token_to_id("<|semantic:0|>") == 320
    assert bt.token_to_id("<|im_end|>") == hf_tok.token_to_id("<|im_end|>")
    assert bt.token_to_id("<|pad|>") == hf_tok.token_to_id("<|pad|>")
    assert bt.token_to_id("<|speaker:0|>") == hf_tok.token_to_id("<|speaker:0|>")
    for i in range(256):
        assert bt.id_to_token(i) == chr(i)


def test_encode_matches_hf(hf_tok):
    bt = ByteTokenizer(2048)
    cases = [
        "<|im_start|>system\n<|speaker:3|><|im_end|>",
        "<|im_start|>user\nHello, world!<|im_end|>",
        "<|im_start|>assistant\n",
        "plain ascii text.",
        "<|semantic:17|><|semantic:2047|><|im_end|>\n",
    ]
    for text in cases:
        assert bt.encode(text) == hf_tok.encode(text).ids, text


def test_roundtrip():
    bt = ByteTokenizer(2048)
    text = "<|im_start|>user\nHi there<|im_end|>\n"
    assert bt.decode(bt.encode(text)) == text


def test_token_config():
    tc = TokenConfig.smoltts_v0()
    assert tc.semantic_start_id == 320
    assert tc.semantic_end_id == 2367
    assert tc.im_end_id == ByteTokenizer().token_to_id("<|im_end|>")
    # legacy fish branch resolves without semantic_end
    bt = ByteTokenizer(2048)
    legacy = TokenConfig.from_tokenizer(
        ModelType(family="fish", version="1.4"), bt, DualARConfig()
    )
    assert legacy.semantic_end_id is None
