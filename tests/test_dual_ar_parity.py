"""Golden-activation parity: JAX DualAR training forward vs. the reference
torch RQTransformer (random weights imported through the interop layer).

This is the test strategy SURVEY.md §4 prescribes: per-stage allclose against
reference activations, made automatic.
"""

import os

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")  # torch.compile off for oracle

import numpy as np
import pytest

from tests.reference_oracle import (
    assert_close,
    import_reference_modeling,
    make_hf_byte_tokenizer,
    requires_reference,
    torch_state_to_numpy,
)

from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.io.checkpoint_interop import (
    params_from_state_dict,
    state_dict_from_params,
)
from smoltts_tpu.models.dual_ar import forward_train


def make_batch(cfg, rng, B=2, T=24):
    """Mixed text/audio token grid in the training layout [B, num_rows, T]."""
    R = cfg.num_rows
    tokens = np.zeros((B, R, T), dtype=np.int64)
    sem_start = 320
    for b in range(B):
        for t in range(T):
            if rng.random() < 0.45:  # text-only position
                tokens[b, 0, t] = rng.integers(0, 320)
                # codebook rows stay 0
            else:  # audio position
                code0 = rng.integers(0, cfg.codebook_size)
                tokens[b, 0, t] = sem_start + code0
                if cfg.duplicate_code_0:
                    tokens[b, 1, t] = code0
                    tokens[b, 2:, t] = rng.integers(1, cfg.codebook_size, R - 2)
                else:
                    tokens[b, 1:, t] = rng.integers(1, cfg.codebook_size, R - 1)
    return tokens


def dropped_frame_mask(cfg, tokens):
    """Frames the reference fast path drops (all shifted codes == 0); its
    codebook logits there are zeros, ours are dense (rq_transformer.py:427-436)."""
    cb = tokens[:, 1:-1, 1:]
    cb = np.pad(cb, ((0, 0), (0, 0), (0, 1)))
    return (cb == 0).all(axis=1)  # [B, T]


@requires_reference
@pytest.mark.parametrize("duplicate_code_0", [True, False])
@pytest.mark.parametrize("depthwise", [True])
# depthwise=False is NOT oracle-testable: the reference training fast path
# adds codebook_offset unconditionally (rq_transformer.py:419) while the
# non-depthwise fast_embeddings table has only codebook_size rows, so the
# torch model raises IndexError — broken/dead code upstream (released models
# all use depthwise_wte=true; the MLX decode path offsets only when
# depthwise, generate.py:136-138, which is the semantics we implement).
def test_forward_parity(duplicate_code_0, depthwise):
    import torch

    ref_rq = import_reference_modeling()
    cfg = tiny_debug_config(
        duplicate_code_0=duplicate_code_0,
        depthwise_wte=depthwise,
        depthwise_output=depthwise,
        codebook_size=128,  # tiny vocab but still > dims
        vocab_size=256 + 64 + 128,
        use_gradient_checkpointing=False,
    )
    tok = make_hf_byte_tokenizer(cfg.codebook_size)
    ref_cfg = ref_rq.RQTransformerModelArgs(
        model_type="dual_ar",
        vocab_size=cfg.vocab_size,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        n_local_heads=cfg.n_local_heads,
        dim=cfg.dim,
        intermediate_size=cfg.intermediate_size,
        rope_base=int(cfg.rope_base),
        codebook_size=cfg.codebook_size,
        num_codebooks=cfg.num_codebooks,
        fast_dim=cfg.fast_dim,
        n_fast_layer=cfg.n_fast_layer,
        fast_n_head=cfg.fast_n_head,
        fast_n_local_heads=cfg.fast_n_local_heads,
        fast_intermediate_size=cfg.fast_intermediate_size,
        depthwise_wte=cfg.depthwise_wte,
        depthwise_output=cfg.depthwise_output,
        duplicate_code_0=cfg.duplicate_code_0,
        max_seq_len=cfg.max_seq_len,
        dropout=0.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    ref_model = ref_rq.RQTransformer(ref_cfg, tokenizer=tok).eval()

    state = torch_state_to_numpy(ref_model)
    params = params_from_state_dict(state, cfg)

    rng = np.random.default_rng(1)
    tokens = make_batch(cfg, rng)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(tokens))

    ours = forward_train(params, cfg, tokens.astype(np.int32), train=False)

    assert_close(
        np.asarray(ours.token_logits),
        ref_out.token_logits.numpy(),
        name="token_logits",
        rtol=5e-4,
        atol=5e-4,
    )
    keep = ~dropped_frame_mask(cfg, tokens)  # [B, T]
    ours_cb = np.asarray(ours.codebook_logits)[keep]
    ref_cb = ref_out.codebook_logits.numpy()[keep]
    assert_close(ours_cb, ref_cb, name="codebook_logits", rtol=5e-4, atol=5e-4)


@requires_reference
def test_state_dict_roundtrip():
    import torch

    ref_rq = import_reference_modeling()
    cfg = tiny_debug_config(codebook_size=64, vocab_size=256 + 64 + 64)
    tok = make_hf_byte_tokenizer(cfg.codebook_size)
    ref_cfg = ref_rq.RQTransformerModelArgs(
        model_type="dual_ar",
        vocab_size=cfg.vocab_size,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        n_local_heads=cfg.n_local_heads,
        dim=cfg.dim,
        intermediate_size=cfg.intermediate_size,
        codebook_size=cfg.codebook_size,
        num_codebooks=cfg.num_codebooks,
        fast_dim=cfg.fast_dim,
        n_fast_layer=cfg.n_fast_layer,
        fast_n_head=cfg.fast_n_head,
        fast_n_local_heads=cfg.fast_n_local_heads,
        fast_intermediate_size=cfg.fast_intermediate_size,
        depthwise_wte=True,
        depthwise_output=True,
        max_seq_len=cfg.max_seq_len,
    )
    torch.manual_seed(0)
    ref_model = ref_rq.RQTransformer(ref_cfg, tokenizer=tok).eval()
    state = torch_state_to_numpy(ref_model)

    params = params_from_state_dict(state, cfg)
    # Export flattens the depthwise head exactly like convert_safetensors.py.
    exported = state_dict_from_params(params, cfg)
    w = state["fast_output.weight"]
    expected = np.transpose(w, (1, 0, 2)).reshape(cfg.fast_dim, -1).T
    np.testing.assert_allclose(exported["fast_output.weight"], expected, rtol=0)
    # And re-importing the exported form is lossless.
    params2 = params_from_state_dict(exported, cfg)
    np.testing.assert_allclose(params2["fast_output"], params["fast_output"])
    np.testing.assert_allclose(
        params2["layers"]["wqkv"], params["layers"]["wqkv"]
    )
