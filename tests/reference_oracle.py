"""Golden-parity oracle helpers.

The reference implementation at /root/reference (read-only mount) is used as
a numerical ORACLE only: tests instantiate its torch model with random
weights, import those weights through our interop layer, and assert our JAX
forward matches. No reference code is copied into this repo; tests that need
the oracle skip cleanly when the mount is absent.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "modeling" / "model" / "rq_transformer.py").exists()


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference oracle not mounted"
)


def import_reference_modeling():
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    from modeling.model import rq_transformer as ref_rq  # type: ignore

    return ref_rq


def make_hf_byte_tokenizer(codebook_size: int = 2048):
    """Wrap our byte-level tokenizer for the reference model's AutoTokenizer
    surface (it only calls .encode on semantic tokens)."""
    from transformers import PreTrainedTokenizerFast

    from smoltts_tpu.tokenizer import build_byte_level_tokenizer

    tok = build_byte_level_tokenizer(codebook_size)
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|im_start|>",
        eos_token="<|endoftext|>",
        unk_token="<|unknown|>",
        pad_token="<|pad|>",
    )


def torch_state_to_numpy(model) -> dict:
    # .copy(): .numpy() aliases the torch storage (for fp32 .float() is a
    # no-op view), and an aliased oracle corrupts imported params the moment
    # the torch model trains in place.
    return {
        k: v.detach().to("cpu").to_dense().float().numpy().copy()
        for k, v in model.state_dict().items()
    }


def assert_close(a, b, rtol=2e-4, atol=2e-4, name=""):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    diff = np.abs(a - b)
    denom = np.maximum(np.abs(b), 1.0)
    rel = (diff / denom).max()
    assert np.allclose(a, b, rtol=rtol, atol=atol), (
        f"{name}: max abs diff {diff.max():.3e}, max rel {rel:.3e}"
    )
