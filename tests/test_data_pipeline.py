"""Data-pipeline tests: pipeline prompt encoder parity vs the reference
(torch oracle), FFD packing invariants, causal shift, checkpoint manager
save/GC/resume, and the LM-init converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.config import TrainingConfig, tiny_debug_config
from smoltts_tpu.data_pipeline.create_init import convert_lm_init
from smoltts_tpu.data_pipeline.prompt import PipelinePromptEncoder, TokenizationConfig
from smoltts_tpu.data_pipeline.tokenize_dataset import (
    PipelineConfig,
    SpeakerStrategy,
    SyspromptEncoder,
    AudioConfig,
    TokenizationStrategy,
    PackingStrategy,
    causal_shift_row,
    pack_utterances,
    tts_tokenize_row,
)
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import ByteTokenizer, build_byte_level_tokenizer
from smoltts_tpu.train.checkpoint import CheckpointManager
from smoltts_tpu.train.trainer import init_train_state

from tests.reference_oracle import requires_reference, REFERENCE_ROOT


@pytest.fixture(scope="module")
def encoder():
    return PipelinePromptEncoder(ByteTokenizer(2048), TokenizationConfig())


def test_text_turn_has_chat_template_shape(encoder):
    turn = encoder.encode_text_turn("user", "hello", add_generation_prompt=True)
    assert turn.shape[0] == 9
    bt = ByteTokenizer(2048)
    decoded = bt.decode(turn[0].tolist())
    assert decoded == "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
    assert (turn[1:] == 0).all()


def test_encode_vq_and_delay(encoder):
    codes = np.arange(16).reshape(8, 2) % 5
    block = encoder.encode_vq(codes)
    # 2 frames + <|im_end|> + newline columns
    assert block.shape == (9, 4)
    assert (block[0, :2] == codes[0] + 320).all()
    assert (block[1:, :2] == codes).all()

    delayed = PipelinePromptEncoder(
        ByteTokenizer(2048), TokenizationConfig(acoustic_delay=2)
    ).encode_vq(codes)
    assert delayed.shape == (9, 6)
    # semantic row right-padded with <|pad|>, codebooks shifted right
    pad_id = ByteTokenizer(2048).token_to_id("<|pad|>")
    assert (delayed[0, 2:4] == pad_id).all()
    assert (delayed[1:, :2] == 0).all()
    assert (delayed[1:, 2:4] == codes).all()


def test_encode_vq_corrupt(encoder):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2048, (8, 50))
    block = encoder.encode_vq_corrupt(codes, dropout=0.5, rng=rng)
    assert block.shape == (9, 52)  # semantic + c0 residual + 7 corrupted rows
    # row 0 semantic offset, row 1 untouched residual 0
    assert (block[0, :50] == codes[0] + 320).all()
    assert (block[1, :50] == codes[0]).all()
    changed = (block[2:, :50] != codes[1:]).mean()
    assert 0.3 < changed < 0.7


@requires_reference
def test_pipeline_prompt_parity_with_reference():
    """Byte-for-byte parity with the reference pipeline PromptEncoder."""
    import sys

    sys.path.insert(0, str(REFERENCE_ROOT))
    import torch
    from transformers import PreTrainedTokenizerFast

    from data_pipeline.utils.prompt import (  # type: ignore
        PromptEncoder as RefEncoder,
        TokenizationConfig as RefConfig,
    )

    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=build_byte_level_tokenizer(2048),
        pad_token="<|pad|>",
        chat_template=(
            "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
            " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
            "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
        ),
    )
    ref = RefEncoder(hf_tok, RefConfig())
    ours = PipelinePromptEncoder(ByteTokenizer(2048), TokenizationConfig())

    codes = np.random.default_rng(0).integers(0, 2048, (8, 7))
    np.testing.assert_array_equal(
        ours.encode_vq(codes), ref.encode_vq(torch.from_numpy(codes)).numpy()
    )
    ref_turn = ref.encode_text_turn("user", "Hello there!", add_generation_prompt=True)
    np.testing.assert_array_equal(
        ours.encode_text_turn("user", "Hello there!"), ref_turn.numpy()
    )


def make_pipeline_config(**overrides):
    base = dict(
        tokenization=TokenizationStrategy(tokenizer_path="byte", strategy="bytelevel"),
        speaker=SpeakerStrategy(strategy="id_token", speaker_names=["alice", "bob"]),
        audio=AudioConfig(),
        packing=PackingStrategy(max_sequence_length=64),
    )
    base.update(overrides)
    return PipelineConfig(**base)


def test_tokenize_row_and_shift(encoder):
    cfg = make_pipeline_config()
    row = {
        "text_normalized": "hi",
        "codes": np.random.default_rng(1).integers(0, 2048, (8, 3)),
    }
    out = tts_tokenize_row(row, encoder, cfg)
    gt = out["ground_truth"]
    assert gt.shape[0] == 9
    shifted = causal_shift_row({"ground_truth": gt})
    assert shifted["tokens"].shape[-1] == gt.shape[-1] - 1
    # text-only codebook labels masked
    assert (shifted["labels"][1:, shifted["labels"][1] == -100] == -100).all()


def test_ffd_packing(encoder):
    cfg = make_pipeline_config()
    sysenc = SyspromptEncoder(cfg, encoder)
    rng = np.random.default_rng(2)
    utts, speakers = [], []
    for i in range(12):
        L = int(rng.integers(8, 30))
        utts.append(np.full((9, L), i + 1, np.int32))
        speakers.append("alice" if i % 2 == 0 else "bob")
    packed = pack_utterances(
        {"speaker_id": speakers, "ground_truth": utts}, sysenc
    )
    sys_len = sysenc.get_sysprompt_length("alice")
    for seq, sid in zip(packed["ground_truth"], packed["speaker_id"]):
        assert seq.shape[-1] <= cfg.packing.max_sequence_length
        # sysprompt is prepended
        expected = sysenc.speaker_cache[sid]
        np.testing.assert_array_equal(seq[:, :sys_len], expected)
    # no content lost
    total_in = sum(u.shape[-1] for u in utts)
    total_out = sum(s.shape[-1] - sys_len for s in packed["ground_truth"])
    assert total_out == total_in


def test_checkpoint_manager_roundtrip(tmp_path):
    cfg = tiny_debug_config(codebook_size=16, vocab_size=336, n_layer=1, n_fast_layer=1)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = TrainingConfig(learning_rate=1e-4)
    state, tx = init_train_state(params, tc)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    mgr = CheckpointManager(str(tmp_path), keep_last_n=2, run_name="run_test", config=tc)
    mgr.save(state, 7)
    mgr.save(state._replace(step=jnp.asarray(8, jnp.int32)), 8)
    mgr.save(state._replace(step=jnp.asarray(9, jnp.int32)), 9)
    remaining = sorted(p.name for p in mgr.run_dir.glob("step_*"))
    assert remaining == ["step_000008", "step_000009"]  # keep-last-2 GC

    ckpt, step, reinit = CheckpointManager.load(mgr.run_dir / "step_000009", tc)
    assert step == 9 and not reinit
    np.testing.assert_allclose(
        np.asarray(ckpt["params"]["norm"]), np.asarray(params["norm"])
    )
    tc2 = tc.model_copy(update=dict(learning_rate=5e-5))
    _, _, reinit2 = CheckpointManager.load(mgr.run_dir / "step_000009", tc2)
    assert reinit2  # hparam drift -> optimizer reinit


def test_convert_lm_init():
    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    rng = np.random.default_rng(0)
    D, FF, V0 = cfg.dim, cfg.intermediate_size, 300
    hf = {"model.embed_tokens.weight": rng.standard_normal((V0, D)),
          "model.norm.weight": np.ones(D)}
    for i in range(cfg.n_layer):
        pre = f"model.layers.{i}."
        hf[pre + "self_attn.q_proj.weight"] = rng.standard_normal((D, D))
        hf[pre + "self_attn.k_proj.weight"] = rng.standard_normal((D // 2, D))
        hf[pre + "self_attn.v_proj.weight"] = rng.standard_normal((D // 2, D))
        hf[pre + "self_attn.o_proj.weight"] = rng.standard_normal((D, D))
        hf[pre + "mlp.gate_proj.weight"] = rng.standard_normal((FF, D))
        hf[pre + "mlp.down_proj.weight"] = rng.standard_normal((D, FF))
        hf[pre + "mlp.up_proj.weight"] = rng.standard_normal((FF, D))
        hf[pre + "input_layernorm.weight"] = np.ones(D)
        hf[pre + "post_attention_layernorm.weight"] = np.ones(D)
    out = convert_lm_init(hf, cfg, cfg.n_layer)
    assert out["embeddings.weight"].shape == (cfg.vocab_size, D)
    # extension rows are the mean of the original table
    mean = hf["model.embed_tokens.weight"].mean(axis=0)
    np.testing.assert_allclose(out["embeddings.weight"][V0], mean)
    assert out["layers.0.attention.wqkv.weight"].shape == (2 * D, D)


def test_convert_cli_roundtrip(tmp_path):
    """Orbax train-state -> release safetensors via the convert CLI."""
    from smoltts_tpu.io.checkpoint_interop import load_params
    from smoltts_tpu.io.convert import main as convert_main

    cfg = tiny_debug_config(codebook_size=16, vocab_size=336, n_layer=1, n_fast_layer=1)
    params = init_params(cfg, jax.random.PRNGKey(5))
    tc = TrainingConfig()
    state, _ = init_train_state(params, tc)
    mgr = CheckpointManager(str(tmp_path / "ckpts"), run_name="r", config=tc)
    mgr.save(state, 3)
    cfg.save(tmp_path / "config.json")

    out = tmp_path / "release"
    convert_main([
        "--src", str(mgr.run_dir / "step_000003"),
        "--config", str(tmp_path / "config.json"),
        "-o", str(out),
    ])
    reloaded = load_params(out, cfg)
    np.testing.assert_allclose(
        np.asarray(reloaded["layers"]["wqkv"]), np.asarray(params["layers"]["wqkv"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(reloaded["fast_output"]), np.asarray(params["fast_output"]), rtol=1e-6
    )
