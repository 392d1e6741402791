"""Dtype policy: bf16 compute with fp32 islands.

The reference relies on CUDA AMP autocast with explicit fp32 assertions for
AdaLN modulation / time embeddings (model.py:237,469) and fp32 scheduler
state. On TPU we make the policy explicit: parameters and activations in
bfloat16, with fp32 for normalization statistics, rotary tables, modulation,
time embeddings and solver state.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    # residual stream accumulation dtype: fp32 by default (the reference
    # keeps fp32 modulation/time islands and accumulates residuals in
    # fp32 under autocast); bf16 halves residual HBM traffic for
    # inference — see BF16_RESIDUAL_POLICY
    residual_dtype: jnp.dtype = jnp.float32
    # fp32 islands
    norm_dtype: jnp.dtype = jnp.float32
    modulation_dtype: jnp.dtype = jnp.float32
    time_embed_dtype: jnp.dtype = jnp.float32
    rope_dtype: jnp.dtype = jnp.float32
    solver_dtype: jnp.dtype = jnp.float32
    # run the flash-kernel softmax chain (max/sub/exp2 over the [bq, bk]
    # score tile) in bf16 instead of fp32 — inference-only knob (the
    # training vjp always keeps the fp32 chain, kernels/attention.py:150).
    # Measured a ~7% kernel SLOWDOWN at the 1.3B 33k-token v5e shape
    # (the bf16<->fp32 relayouts around the score tile outweigh the
    # halved VPU width), so this stays opt-in for other geometries and
    # is never defaulted; rel err vs the fp32 chain ~1.4e-2.
    softmax_bf16: bool = False
    # int8 QK^T inside the flash kernel (SageAttention-style: per-row q /
    # per-block k symmetric scales, quantized post-rope in the kernel).
    # MEASURED NEGATIVE on v5e at the 1.3B 33k-token shape: 96.5 ms vs
    # 90.6 ms bf16 at the pinned 2048/2048 blocks (tools/bench_attn.py,
    # ATTN_QK_INT8=1). Root cause is structural, not tuning: the MXU's
    # int8 2x rate comes from packing pairs along the CONTRACTION dim,
    # and QK^T contracts over head_dim=128 — exactly one systolic pass
    # either way — so the in-loop quantize + s32->f32 rescale is pure
    # VPU overhead. (The W8A8 GEMM mode wins because its contractions
    # are 1536-8960.) Kept opt-in for future hardware; same Pallas-only
    # scope as softmax_bf16 (training vjp + XLA/ring keep bf16 QK^T).
    # Quality gate: qk_int8 row of tools/quality_sweep.py (QS_QK_INT8=1).
    qk_int8: bool = False
    # bounded softmax: Wan's qk-norm (RMSNorm with learned gains on the
    # q/k rows, dit.py _attn_qkv) bounds the raw scores by
    # d * max|g_q| * max|g_k| EXACTLY (rope is a per-pair rotation —
    # norm-preserving), so the flash kernel can pin the online-softmax
    # reference point at that bound instead of tracking a running max:
    # exp2(s - C) with the constant cancelling in acc/l. Mathematically
    # exact (same softmax, different reference point; fp32 relative
    # precision is exponent-absorbed), it removes the [bq, bk] max
    # reduce, the correction exp2 and the accumulator rescale from
    # every kv-block iteration. Inference-only scope like softmax_bf16
    # (Pallas path; training vjp and XLA fallback keep the max chain).
    bounded_softmax: bool = False


DEFAULT_POLICY = DTypePolicy()

# Inference-speed policy: residual stream in bf16 (norm statistics and
# modulation still fp32 inside the blocks).
BF16_RESIDUAL_POLICY = DTypePolicy(residual_dtype=jnp.bfloat16)

# Full-precision policy for parity testing on CPU.
FP32_POLICY = DTypePolicy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.float32,
)
