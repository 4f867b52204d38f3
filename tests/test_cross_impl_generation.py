"""Cross-implementation FULL-GENERATION parity.

The reference decode loop (mlx .../lm/generate.py:59-171) is, at temperature
0, exactly greedy re-scoring of its own training forward: each emitted slow
token is the argmax of the backbone logits at its position, and each codebook
row is the argmax of the teacher-forced fast trunk. The reference *torch*
model (/root/reference/modeling/model/rq_transformer.py:223-260, installed in
this env) therefore serves as a cross-implementation oracle for the whole
autoregressive loop: we generate with OUR prefill/decode_frame on weights
imported from the torch model, then replay the produced sequence through the
TORCH forward and require frame-for-frame token equality. The PCM leg then
decodes the generated codes through our JAX Mimi and HF transformers'
MimiModel on shared weights and requires waveform allclose — together this is
end-to-end generation parity without network access to released weights.

Preconditions (asserted, seed-pinned): the torch training embed zeroes the
codebook sum where row 1 == 0 (rq_transformer.py:219) while the decode engine
masks by semantic-range membership (mlx .../lm/rq_transformer.py:162-169) —
the two coincide only on grids where every audio column has row 1 != 0 and
every non-audio column has zero codebook rows. The test constrains the slow
head to {im_end} ∪ semantic range (the reference's dormant constraint,
lm/utils/constraints.py:8-43) and pins seeds so no generated level-0 code is
0; it fails loudly if that drifts.
"""

import os

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_oracle import (
    import_reference_modeling,
    make_hf_byte_tokenizer,
    requires_reference,
    torch_state_to_numpy,
)

from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.io.checkpoint_interop import params_from_state_dict
from smoltts_tpu.lm.generate import FrameGenerator
from smoltts_tpu.lm.prompt import PromptEncoder
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig

CB = 64  # shared LM codebook_size / Mimi codebook_size so codes flow through


def lm_config():
    return tiny_debug_config(
        codebook_size=CB,
        vocab_size=256 + 64 + CB,
        use_gradient_checkpointing=False,
    )


def build_torch_oracle(cfg, seed: int):
    import torch

    ref_rq = import_reference_modeling()
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
    torch.manual_seed(seed)
    tok = make_hf_byte_tokenizer(cfg.codebook_size)
    return ref_rq.RQTransformer(ref_cfg, tokenizer=tok).eval()


def chat_prompt(cfg, token_cfg, n_audio_frames: int, seed: int) -> np.ndarray:
    """Realistic mixed prompt: user text turn + audio turn + assistant open."""
    enc = PromptEncoder(
        ByteTokenizer(cfg.codebook_size),
        ModelType.smoltts_v0(),
        semantic_offset=token_cfg.semantic_start_id,
        num_codebooks=cfg.num_codebooks,
        duplicate_code_0=cfg.duplicate_code_0,
    )
    rng = np.random.default_rng(seed)
    # level-0 codes drawn from [1, CB) so torch's row1==0 text predicate and
    # the decode engine's semantic-range predicate agree on every column
    codes = rng.integers(1, cfg.codebook_size, (cfg.num_codebooks, n_audio_frames))
    turns = [
        enc.encode_text_turn("user", "Hi there"),
        enc.encode_vq(codes),
        enc.encode_text_turn("assistant"),
    ]
    return np.concatenate(turns, axis=1)


GEN_SEED, PROMPT_SEED, WEIGHT_SEED = 11, 3, 0


def generate_frames(cfg, token_cfg, params, max_new_tokens=8):
    settings = GenerationSettings(
        default_temp=0.0,
        default_fast_temp=0.0,
        max_new_tokens=max_new_tokens,
        audio_only_constraint=True,
    )
    prompt = chat_prompt(cfg, token_cfg, n_audio_frames=3, seed=PROMPT_SEED)
    gen = FrameGenerator(
        params,
        cfg,
        token_cfg,
        settings,
        [prompt],
        rng=jax.random.PRNGKey(GEN_SEED),
        max_seq_len=cfg.max_seq_len,
        kv_dtype=jnp.float32,
    )
    frames = []
    for out in gen:
        frames.append(
            (
                np.asarray(out.tokens)[0],
                bool(np.asarray(out.is_audio)[0]),
                bool(np.asarray(out.finished)[0]),
            )
        )
        if frames[-1][2]:
            break
    return prompt, frames


@pytest.fixture(scope="module")
def generation():
    import torch  # noqa: F401 — skip module if torch absent

    cfg = lm_config()
    oracle = build_torch_oracle(cfg, WEIGHT_SEED)
    params = params_from_state_dict(torch_state_to_numpy(oracle), cfg)
    token_cfg = TokenConfig.from_tokenizer(
        ModelType.smoltts_v0(), ByteTokenizer(cfg.codebook_size), cfg
    )
    prompt, frames = generate_frames(cfg, token_cfg, params)
    return cfg, token_cfg, oracle, prompt, frames


@requires_reference
def test_generation_preconditions(generation):
    """Seed pin: enough audio frames, no zero level-0 codes (see docstring)."""
    cfg, token_cfg, _, _, frames = generation
    audio = [f for f, is_audio, _ in frames if is_audio]
    assert len(audio) >= 4, f"seed drift: only {len(audio)} audio frames"
    for f in audio:
        assert f[1] != 0, "seed drift: level-0 code 0 breaks the embed-predicate match"
        assert token_cfg.semantic_start_id <= f[0] <= token_cfg.semantic_end_id


@requires_reference
def test_frame_for_frame_token_parity(generation):
    """Every generated frame must be the greedy choice of the TORCH forward."""
    import torch

    cfg, token_cfg, oracle, prompt, frames = generation
    T = prompt.shape[1]
    audio_or_end = [(tok, is_audio) for tok, is_audio, _ in frames]
    seq = np.concatenate(
        [prompt] + [tok[:, None] for tok, _ in audio_or_end], axis=1
    )
    with torch.no_grad():
        ref = oracle(torch.from_numpy(seq[None].astype(np.int64)))
    token_logits = ref.token_logits.numpy()[0]
    # constraint applied on our side: compare argmax over the allowed set only
    allowed = np.full(cfg.vocab_size, -np.inf, np.float32)
    ids = np.arange(cfg.vocab_size)
    mask = (ids == token_cfg.im_end_id) | (
        (ids >= token_cfg.semantic_start_id) & (ids <= token_cfg.semantic_end_id)
    )
    cb_logits = ref.codebook_logits.numpy()[0]

    for j, (tok, is_audio) in enumerate(audio_or_end):
        pos = T - 1 + j  # torch position whose prediction produced frame j
        ref_slow = int(np.argmax(np.where(mask, token_logits[pos], allowed)))
        assert int(tok[0]) == ref_slow, f"frame {j}: slow token diverges"
        if not is_audio:
            assert int(tok[0]) == token_cfg.im_end_id
            break
        # Fast trunk at `pos` is teacher-forced with frame j's code rows: its
        # per-level argmax must reproduce the codes our micro-loop sampled.
        for lvl in range(cfg.max_fast_seqlen):
            assert int(tok[1 + lvl]) == int(np.argmax(cb_logits[pos, lvl])), (
                f"frame {j} level {lvl}: codebook code diverges"
            )


@requires_reference
def test_generated_codes_pcm_parity(generation):
    """Decode the generated Mimi codes with our JAX codec and HF MimiModel on
    shared weights: waveform allclose (the BASELINE correctness bar, applied
    to actual generated tokens rather than random ones)."""
    import torch

    from tests.test_mimi_parity import hf_cfg_from, small_cfg
    from smoltts_tpu.codec.mimi import mimi_decode, params_from_hf_state_dict

    from transformers import MimiModel

    cfg, _, _, _, frames = generation
    codes = np.stack(
        [tok[1 : 1 + cfg.num_codebooks] for tok, is_audio, _ in frames if is_audio],
        axis=1,
    )[None]
    assert codes.max() < CB and codes.min() >= 0

    mcfg = small_cfg()
    torch.manual_seed(0)
    hf = MimiModel(hf_cfg_from(mcfg)).eval()
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in list(sd):
        if k.endswith("codebook.embed_sum"):
            sd[k] = torch.randn(sd[k].shape, generator=g)
    hf.load_state_dict(sd)
    mimi_params = params_from_hf_state_dict(
        {k: v.float().numpy() for k, v in hf.state_dict().items()}, mcfg
    )

    with torch.no_grad():
        ref_pcm = hf.decode(torch.from_numpy(codes)).audio_values.numpy()
    ours = np.asarray(mimi_decode(mimi_params, mcfg, jnp.asarray(codes)))
    np.testing.assert_allclose(
        ours[:, :, 0], ref_pcm[:, 0, :], rtol=2e-3, atol=2e-4
    )
