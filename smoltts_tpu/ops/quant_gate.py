"""Runtime quality gates for the quantized decode configurations.

bench.py defends int8 weights (+ int8 KV) as its measured configuration;
these gates make that defensible at run time: flipping BENCH_INT8/BENCH_KV8
on runs the corresponding gate against the exact parameter trees the bench
is about to measure, and a failing gate raises (loud) instead of silently
recording numbers for a broken quantization. The same checks are exercised
at tiny scale by tests/test_quant_gate.py (including the fails-loudly
direction), and the distribution-level thresholds mirror
tests/test_int8_gate.py / tests/test_kv8.py.

Checks (all scale-free — no released weights are reachable offline, so
random-init trees are the measured distribution):

1. int8 LM: teacher-forced CE delta < 2% and mean token KL < 0.02 on a
   synthetic labeled batch (greedy-agreement is noise at random init).
2. int8 LM sampling distribution: Jensen-Shannon divergence between the
   ACTUAL sampling distributions (temperature + min-p filter applied,
   audio-constrained) of dense vs quantized logits < 0.05, with a
   support-flip-mass ceiling (< 0.10) as a hard backstop — the temp>0
   analogue of greedy agreement, computed analytically over the full
   distribution rather than by Monte-Carlo draws. (JS, not KL: min-p
   keep-set membership is knife-edge at flat distributions and hard-support
   KL diverges on a measurement artifact; see gate_int8_lm.)
3. int8 vocoder: PCM SNR > 25 dB decoding GENERATED (greedy, dense-LM)
   codes — not random codes — through dense vs quantized Mimi.
4. kv8: (a) per-vector int8 round-trip SNR > 30 dB on REAL prefill K/V
   tensors; (b) relative error of the kv8 attention read path
   (decode_attention_tailed with int8 history + scales vs bf16 history)
   < 2% on those tensors.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class QuantGateError(AssertionError):
    """A quantized configuration failed its quality gate."""


def _mean_kl(ref_logits, got_logits) -> float:
    ref = jax.nn.log_softmax(ref_logits.astype(jnp.float32), axis=-1)
    got = jax.nn.log_softmax(got_logits.astype(jnp.float32), axis=-1)
    return float(jnp.mean(jnp.sum(jnp.exp(ref) * (ref - got), axis=-1)))


def _sampling_dist(logits, token_cfg, temperature: float, min_p: float):
    """The actual serving-time sampling distribution: audio-constrained,
    temperature-scaled, min-p filtered, renormalized."""
    from smoltts_tpu.lm.samplers import constrain_logits_to_audio

    x = constrain_logits_to_audio(
        logits.astype(jnp.float32),
        token_cfg.im_end_id,
        token_cfg.semantic_start_id,
        token_cfg.semantic_end_id or token_cfg.semantic_start_id,
    )
    x = x / max(temperature, 1e-6)
    p = jax.nn.softmax(x, axis=-1)
    keep = p >= min_p * jnp.max(p, axis=-1, keepdims=True)
    p = jnp.where(keep, p, 0.0)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def gate_int8_lm(
    cfg, token_cfg, params, qparams, *,
    temperature: float = 0.7, min_p: float = 0.05,
    batch: int = 4, seq: int = 64, seed: int = 0,
) -> Dict[str, float]:
    """Checks 1 + 2. Returns metrics; raises QuantGateError on failure."""
    from smoltts_tpu.models.dual_ar import forward_train
    from smoltts_tpu.train.data import batch_iterator, synthetic_dataset
    from smoltts_tpu.train.loss import compute_losses

    ds = synthetic_dataset(batch, cfg, token_cfg, seq_len=seq, seed=seed)
    b = next(batch_iterator(
        ds, batch_size=batch, semantic_pad_id=token_cfg.pad_id, max_len=seq,
        duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
    ))
    tokens = jnp.asarray(b["tokens"])

    def fwd(p):
        return forward_train(
            p, cfg, tokens,
            embed_mask_mode="semantic_range",
            semantic_start_id=token_cfg.semantic_start_id,
            semantic_end_id=token_cfg.semantic_end_id or token_cfg.semantic_start_id,
        )

    ref = jax.jit(fwd)(params)
    got = jax.jit(fwd)(qparams)
    labels = jnp.asarray(b["labels"])
    ce_ref = float(compute_losses(ref.token_logits, ref.codebook_logits, labels).total)
    ce_got = float(compute_losses(got.token_logits, got.codebook_logits, labels).total)
    ce_delta = abs(ce_got - ce_ref) / max(abs(ce_ref), 1e-9)
    kl_tok = _mean_kl(ref.token_logits, got.token_logits)
    kl_cb = _mean_kl(ref.codebook_logits, got.codebook_logits)

    p_ref = _sampling_dist(ref.token_logits[:, -1], token_cfg, temperature, min_p)
    p_got = _sampling_dist(got.token_logits[:, -1], token_cfg, temperature, min_p)
    # Jensen-Shannon divergence + support-flip mass, NOT hard-support KL:
    # at near-uniform distributions (random init; also very high temp) the
    # min-p keep-set membership is knife-edge, and a token flipping out of
    # one support contributes mass * log(p / eps) — KL diverges on a
    # measurement artifact while the actual sampled behavior is unchanged.
    # JS is bounded (<= log 2) and support flips contribute at most their
    # probability mass; flip mass is reported and gated directly.
    eps = 1e-12
    m = 0.5 * (p_ref + p_got)

    def _kl(a, b):
        return jnp.sum(jnp.where(a > 0, a * (jnp.log(a + eps) - jnp.log(b + eps)), 0.0), axis=-1)

    js_sample = float(jnp.mean(0.5 * _kl(p_ref, m) + 0.5 * _kl(p_got, m)))
    flip_mass = float(jnp.mean(
        jnp.sum(jnp.where(p_got <= 0, p_ref, 0.0), axis=-1)
        + jnp.sum(jnp.where(p_ref <= 0, p_got, 0.0), axis=-1)
    ))

    metrics = {
        "int8_ce_delta": ce_delta, "int8_kl_token": kl_tok,
        "int8_kl_codebook": kl_cb, "int8_js_sampling": js_sample,
        "int8_sampling_flip_mass": flip_mass,
    }
    # flip_mass ceiling 0.10: for flat distributions (random init) the
    # min-p keep set is inherently chaotic — a measured 150M random-init
    # tree flips ~6% of mass while its JS stays at 0.025, i.e. the flipped
    # tokens sit exactly at the threshold where keeping or dropping them is
    # behaviorally equivalent. JS already charges every flip its true
    # probability mass, so it is the primary gate for both flat and peaked
    # distributions; the flip-mass ceiling is a hard backstop for the case
    # where quantization genuinely reshapes the min-p keep set (large mass
    # moving across the threshold). Tightened 0.15 -> 0.10 (r4 advice):
    # random-init — the WORST case for threshold chaos — measures 0.063,
    # and peaked trained checkpoints flip strictly less mass at min-p.
    if (
        ce_delta >= 0.02 or kl_tok >= 0.02 or kl_cb >= 0.02
        or js_sample >= 0.05 or flip_mass >= 0.10
    ):
        raise QuantGateError(f"int8 LM gate failed: {metrics}")
    return metrics


def gate_int8_vocoder(
    cfg, token_cfg, settings, mimi_cfg, params, mimi_params, qmimi, *,
    n_frames: int = 12, seed: int = 0,
) -> Dict[str, float]:
    """Check 3: PCM SNR on codes GENERATED by the (dense) LM."""
    from smoltts_tpu.codec.mimi import mimi_decode
    from smoltts_tpu.lm.generate import FrameGenerator
    from smoltts_tpu.lm.samplers import GenerationSettings

    greedy = GenerationSettings(
        default_temp=0.0, default_fast_temp=0.0,
        max_new_tokens=n_frames, audio_only_constraint=True,
    )
    rng = np.random.default_rng(seed)
    T = 12
    prompt = np.zeros((cfg.num_rows, T), np.int32)
    c0 = rng.integers(1, cfg.codebook_size, T)
    prompt[0] = token_cfg.semantic_start_id + c0
    prompt[1] = c0 if cfg.duplicate_code_0 else rng.integers(1, cfg.codebook_size, T)
    prompt[2:] = rng.integers(0, cfg.codebook_size, (cfg.num_rows - 2, T))

    gen = FrameGenerator(
        params, cfg, token_cfg, greedy, [prompt],
        rng=jax.random.PRNGKey(seed), max_seq_len=max(64, T + n_frames + 2),
    )
    codes = np.stack([np.asarray(f.audio_codes)[0] for f in gen], axis=1)[None]
    ref = np.asarray(mimi_decode(mimi_params, mimi_cfg, jnp.asarray(codes)))
    got = np.asarray(mimi_decode(qmimi, mimi_cfg, jnp.asarray(codes)))
    err = ref - got
    snr = 10.0 * np.log10(float((ref**2).mean()) / max(float((err**2).mean()), 1e-12))
    if snr <= 25.0:
        raise QuantGateError(f"int8 vocoder gate failed: generated-codes SNR {snr:.1f} dB")
    return {"int8_vocoder_snr_db": snr}


def gate_kv8(cfg, token_cfg, params, *, batch: int = 2, T: int = 48, seed: int = 0) -> Dict[str, float]:
    """Check 4: int8 KV fidelity on REAL prefill tensors, and the kv8
    attention read path against the bf16 one."""
    from smoltts_tpu.lm.decode import init_decode_state, prefill
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.ops.attention import decode_attention_tailed
    from smoltts_tpu.ops.quant import quantize_kv

    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    rng = np.random.default_rng(seed)
    prompt = np.zeros((batch, cfg.num_rows, T), np.int32)
    c0 = rng.integers(1, cfg.codebook_size, (batch, T))
    prompt[:, 0] = token_cfg.semantic_start_id + c0
    prompt[:, 1] = c0
    S = max(64, 2 * T)
    state = init_decode_state(cfg, batch, S, dtype=jnp.bfloat16)
    # params go in as a jit ARGUMENT: closure-capturing a 150M tree bakes
    # ~300 MB of weight constants into the serialized HLO, which remote-
    # compile services reject (HTTP 413) or stall on.
    state, _ = jax.jit(
        lambda w, s, p, l, r: prefill(w, cfg, token_cfg, settings, s, p, l, r)
    )(params, state, jnp.asarray(prompt), jnp.full((batch,), T, jnp.int32),
      jax.random.PRNGKey(0))

    k = state.k  # [L, B, H, S, hd] bf16, positions < T valid
    v = state.v
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    deq = kq.astype(jnp.float32) * ks[..., None]
    ref = k.astype(jnp.float32)
    valid = ref[:, :, :, :T]
    err = valid - deq[:, :, :, :T]
    snr = 10.0 * np.log10(
        float(jnp.mean(valid**2)) / max(float(jnp.mean(err**2)), 1e-12)
    )

    # Attention read path: one query over the quantized vs dense history.
    L = k.shape[0]
    hd = cfg.head_dim
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.n_head, hd), jnp.bfloat16)
    W = 8
    k_tail = jnp.zeros((batch, cfg.n_local_heads, W, hd), jnp.bfloat16)
    v_tail = jnp.zeros_like(k_tail)
    tail_pos = jnp.full((batch, W), -1, jnp.int32)
    pos = jnp.full((batch,), T - 1, jnp.int32)
    flushed = jnp.full((batch,), T, jnp.int32)
    out_ref = decode_attention_tailed(
        q, k[0], v[0], k_tail, v_tail, pos, flushed, tail_pos
    )
    out_q = decode_attention_tailed(
        q, kq[0], vq[0], k_tail, v_tail, pos, flushed, tail_pos,
        k_scale=ks[0], v_scale=vs[0],
    )
    rel = float(
        jnp.linalg.norm((out_ref - out_q).astype(jnp.float32))
        / jnp.maximum(jnp.linalg.norm(out_ref.astype(jnp.float32)), 1e-9)
    )
    metrics = {"kv8_roundtrip_snr_db": snr, "kv8_attention_rel_err": rel}
    if snr <= 30.0 or rel >= 0.02:
        raise QuantGateError(f"kv8 gate failed: {metrics}")
    return metrics


def run_quant_gates(
    cfg, token_cfg, settings, mimi_cfg,
    params_dense, params_q, mimi_dense, mimi_q,
    *, int8: bool, kv8: bool,
) -> Dict[str, float]:
    """Run the gates matching the enabled quantized modes. Raises
    QuantGateError if any enabled mode fails; returns the pooled metrics."""
    metrics: Dict[str, float] = {}
    if int8:
        metrics.update(gate_int8_lm(cfg, token_cfg, params_dense, params_q))
        metrics.update(gate_int8_vocoder(
            cfg, token_cfg, settings, mimi_cfg, params_dense, mimi_dense, mimi_q
        ))
    if kv8:
        metrics.update(gate_kv8(cfg, token_cfg, params_dense))
    return metrics


def _gate_cache_key(
    cfg, mimi_cfg, settings, int8: bool, kv8: bool, platform: str = ""
) -> str:
    """Content hash over everything a gate verdict depends on: the full
    smoltts_tpu source tree (the gates exercise forward, decode, sampling,
    and the codec — any of it changing must invalidate), the model/codec
    configs, the sampler settings, the enabled modes, the jax/jaxlib
    versions, and the backend platform the gates execute on (numerics
    differ across backends and releases — a verdict computed on XLA:CPU
    under one jax must not vouch for another stack; r4 advice). Seeds are
    fixed defaults inside the gate functions, covered by the source hash."""
    import hashlib
    from pathlib import Path

    import jaxlib

    h = hashlib.sha256()
    root = Path(__file__).resolve().parent.parent  # smoltts_tpu/
    for p in sorted(root.rglob("*.py")):
        h.update(p.read_bytes())
    h.update(cfg.model_dump_json().encode())
    h.update(repr(sorted(vars(mimi_cfg).items())).encode())
    h.update(repr(settings).encode())
    h.update(f"int8={int8} kv8={kv8}".encode())
    h.update(f"jax={jax.__version__} jaxlib={jaxlib.__version__}".encode())
    h.update(f"platform={platform}".encode())
    return h.hexdigest()


def run_quant_gates_cached(
    cfg, token_cfg, settings, mimi_cfg,
    params_dense, params_q, mimi_dense, mimi_q,
    *, int8: bool, kv8: bool,
    cache_path: Optional[str] = None,
    device=None,
) -> Dict[str, float]:
    """`run_quant_gates` with (a) a cached verdict and (b) optional device
    pinning.

    The gate computation is deterministic given the code, configs, and
    seeds (the parameter trees are derived from fixed seeds), so the bench
    doesn't have to spend its wall-clock budget re-proving the same
    invariant every run: the verdict is cached in `cache_path` keyed on a
    hash of the source tree + configs (committed to the repo, so a fresh
    driver run with unchanged code hits it). A FAILED gate is never cached
    — it raises, every run.

    `device` (e.g. a CPU device alongside the TPU platform) moves the gate
    math off the accelerator: gates are quality checks, not perf
    measurements, and on remote-compile runtimes each 150M gate program
    costs minutes of cold compile for zero information gain."""
    import json
    from pathlib import Path

    import os

    key = None
    # SMOLTTS_GATE_NO_CACHE=1 forces a fresh (uncached) gate run — use
    # periodically on the benchmark device to re-validate the cached
    # verdict against the production stack's numerics (r4 advice).
    if cache_path is not None and os.environ.get("SMOLTTS_GATE_NO_CACHE") != "1":
        platform = device.platform if device is not None else jax.default_backend()
        key = _gate_cache_key(cfg, mimi_cfg, settings, int8, kv8, platform)
        p = Path(cache_path)
        if p.exists():
            try:
                blob = json.loads(p.read_text())
                if blob.get("key") == key:
                    return dict(blob["metrics"], gate_cached=1.0)
            except (ValueError, KeyError):
                pass

    trees = (params_dense, params_q, mimi_dense, mimi_q)
    if device is not None:
        if device.platform == "cpu":
            # XLA:CPU has no bf16 dot kernels (DotThunk: "BF16 x BF16 =
            # F32" unsupported); run the gate math in f32 there. int8
            # quantized payloads are untouched, so the quantization under
            # test is exactly the benchmarked one — only the dense
            # reference gains precision, which the loose thresholds absorb.
            trees = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
                else x,
                trees,
            )
        trees = jax.device_put(trees, device)
        ctx = jax.default_device(device)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        metrics = run_quant_gates(
            cfg, token_cfg, settings, mimi_cfg, *trees, int8=int8, kv8=kv8
        )
    metrics = {k: float(v) for k, v in metrics.items()}
    if cache_path is not None:
        Path(cache_path).write_text(
            json.dumps({"key": key, "metrics": metrics}, indent=1)
        )
    return metrics
