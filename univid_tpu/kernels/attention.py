"""Attention dispatcher: Pallas flash kernel on TPU, XLA reference elsewhere.

Public entrypoint `attention(q, k, v, ...)` mirrors the dispatch role of the
reference flash_attention wrapper (models/wan/utils/modules/attention.py:
24-179: FA3 -> FA2 -> SDPA), with the TPU-native backends:

  pallas  — kernels.flash_attention (inference hot path)
  xla     — masked jnp reference (differentiable; used for training paths
            and CPU tests)

Inputs are [B, L, N, D]; lengths may be unpadded (padding to kernel block
multiples is handled here and masked via kv_len / segment ids).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .flash_attention import flash_attention_padded, flash_attention_bwd_padded

_FORCE_BACKEND: Optional[str] = None


def set_attention_backend(name: Optional[str]):
    """Force 'pallas' | 'xla' | None (auto)."""
    global _FORCE_BACKEND
    _FORCE_BACKEND = name


def _backend() -> str:
    if _FORCE_BACKEND is not None:
        return _FORCE_BACKEND
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_mask_codes(doc_id, fn_id, noise_id):
    """Pack the three BAGEL packed-training mask id arrays into one int32
    per token for the attention kernels: doc in bits 16+, full/noise
    split id (+1, 0=none) in bits 8-15, noise split id (+1) in bits 0-7.
    Reference predicate: data/data_utils.py create_sparse_mask:13-41."""
    doc = jnp.asarray(doc_id, jnp.int32)
    fn = jnp.asarray(fn_id, jnp.int32) + 1      # -1 (none) -> 0
    nz = jnp.asarray(noise_id, jnp.int32) + 1
    return (doc << 16) | (fn << 8) | nz


def _packed_mask_allowed(qc, kc, row, col):
    """(and(or(causal, same full/noise split), remove_noise, same doc))."""
    doc_q, doc_k = qc >> 16, kc >> 16
    fn_q, fn_k = (qc >> 8) & 0xFF, (kc >> 8) & 0xFF
    nz_q, nz_k = qc & 0xFF, kc & 0xFF
    causal = row >= col
    full_noise = (fn_q == fn_k) & (fn_q > 0)
    remove_noise = ~((nz_k > 0) & (nz_q != nz_k))
    return (causal | full_noise) & remove_noise & (doc_q == doc_k)


def mha_reference(q, k, v, *, causal=False, q_offset=0, kv_len=None,
                  q_segments=None, kv_segments=None, softmax_scale=None,
                  packed_mode=False, q_offsets=None):
    """Masked XLA attention with identical semantics to the Pallas kernel.

    fp32 softmax; differentiable (used by training paths until the custom
    VJP Pallas kernel lands). packed_mode treats q/kv_segments as
    pack_mask_codes outputs and applies the BAGEL mixed
    causal/full/noise mask.
    """
    b, lq, n, d = q.shape
    lk = k.shape[1]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bqnd,bknd->bnqk", q, k,
                   preferred_element_type=jnp.float32) * softmax_scale
    # Mask terms are applied to the runtime scores SEPARATELY and kept at
    # their natural (broadcastable) rank — never combined into one
    # materialized [b, 1, lq, lk] boolean. When lengths are static the
    # combined mask is a compile-time constant, and XLA constant-folds
    # the O(lq*lk) combine + the any() reduction over it at COMPILE time
    # (a measured 21 s fold of a pred[2,1,8190,512]-class tensor in the
    # r4 multichip dryrun, MULTICHIP_r04.json tail).
    seg_mask = None
    if causal:
        row = jnp.arange(lq)[None, :, None] + q_offset
        if q_offsets is not None:
            row = row + q_offsets[:, None, None]
        col = jnp.arange(lk)[None, None, :]
        s = jnp.where((col <= row)[:, None, :, :], s, -1e30)
    if kv_len is not None:
        kv_valid = jnp.arange(lk)[None, :] < kv_len[:, None]   # [b, lk]
        s = jnp.where(kv_valid[:, None, None, :], s, -1e30)
    if q_segments is not None and packed_mode:
        row = jnp.arange(lq)[None, :, None] + q_offset
        col = jnp.arange(lk)[None, None, :]
        seg_mask = _packed_mask_allowed(
            q_segments[:, :, None], kv_segments[:, None, :], row,
            col)[:, None, :, :]
    elif q_segments is not None:
        seg_mask = (q_segments[:, :, None] ==
                    kv_segments[:, None, :])[:, None, :, :]
    if seg_mask is not None:
        s = jnp.where(seg_mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    # fully-masked rows -> 0 (matches kernel's zero-denominator guard).
    # Only two mask terms can zero an entire row: kv_len == 0 and the
    # (runtime) segment/packed masks — a causal row r always sees key 0
    # (every call site uses non-negative offsets), so no O(lq*lk)
    # constant any() is needed for it.
    if seg_mask is not None:
        valid = seg_mask
        if kv_len is not None:
            valid = valid & kv_valid[:, None, None, :]
        p = jnp.where(jnp.any(valid, axis=-1, keepdims=True), p, 0.0)
    elif kv_len is not None:
        p = jnp.where((kv_len > 0)[:, None, None, None], p, 0.0)
    o = jnp.einsum("bnqk,bknd->bqnd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


def _krot_auto(cache_rot_k, causal, qk_int8, lk_pad, d, itemsize):
    """Rotated-k VMEM cache default: ON for non-causal fused-rope calls
    whose whole-sequence cache stays small (<= 12 MB — 33k x d128 bf16
    is 8.4 MB; the v5e scoped-VMEM budget is 64 MB). Measured +1.6%
    kernel at the 1.3B 33k shape (89.7 -> 88.3 ms; composes with the
    bounded softmax to 77.2 ms / 86.7% MFU). Pass False/True to
    override."""
    if cache_rot_k is None:
        cache_rot_k = lk_pad * d * itemsize <= 12 * 1024 * 1024
    return bool(cache_rot_k) and not causal and not qk_int8


def _zero_cot(x):
    """Cotangent for a non-differentiable array arg: float0 zeros for int
    arrays (required by custom_vjp), zeros_like for float arrays, None for
    absent args."""
    if x is None:
        return None
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17))
def _flash(q, k, v, kv_len, q_segments, kv_segments, q_offsets,
           score_bound,
           causal, q_offset, softmax_scale, block_q, block_k, packed_mode,
           softmax_bf16, bwd_block_q, bwd_block_k, qk_int8):
    """Differentiable Pallas flash attention over PADDED inputs.

    Forward = the plain kernel; the VJP rule re-runs the forward with
    save_residuals to capture the exp2-domain lse, then runs the recompute-p
    dq / dkv Pallas backward kernels — giving training paths the same O(L)
    memory the reference gets from flash-attn varlen's backward
    (BAGEL qwen2_navit.py:579-588, wan attention.py:94-127).

    score_bound (FOLDED domain, may derive from differentiated qk-norm
    gains) shifts the softmax reference point only — d(out)/d(bound) == 0
    exactly, so its cotangent is zero."""
    return flash_attention_padded(
        q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len,
        q_segments=q_segments, kv_segments=kv_segments,
        softmax_scale=softmax_scale, block_q=block_q, block_k=block_k,
        packed_mode=packed_mode, q_offsets=q_offsets,
        softmax_bf16=softmax_bf16, qk_int8=qk_int8,
        score_bound=score_bound)


def _flash_fwd(q, k, v, kv_len, q_segments, kv_segments, q_offsets,
               score_bound,
               causal, q_offset, softmax_scale, block_q, block_k,
               packed_mode, softmax_bf16, bwd_block_q, bwd_block_k,
               qk_int8):
    # qk_int8 (like softmax_bf16) is an INFERENCE knob: the training
    # forward keeps exact bf16 QK^T so lse/backward stay fp32-consistent
    # the residual-saving forward carries an extra f32 lse output; at
    # block_q=2048 the fp32 [bq, bk] score tile + lse double-buffering
    # exceed the 16 MB scoped-VMEM budget (v5e), so cap the training
    # forward at 1024 — the inference primal keeps the larger tile
    # the training forward keeps the fp32 softmax chain (softmax_bf16 is
    # an inference knob; the backward recompute derives p from the fp32
    # exp2-domain lse). score_bound IS honored here: the bounded
    # forward's lse (= C + log2 l) feeds the same recompute-p backward —
    # exact either way.
    bq = min(block_q, 1024)
    o, lse = flash_attention_padded(
        q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len,
        q_segments=q_segments, kv_segments=kv_segments,
        softmax_scale=softmax_scale, block_q=bq, block_k=block_k,
        packed_mode=packed_mode, q_offsets=q_offsets, save_residuals=True,
        score_bound=score_bound)
    return o, (q, k, v, o, lse, kv_len, q_segments, kv_segments, q_offsets,
               score_bound)


def _flash_bwd(causal, q_offset, softmax_scale, block_q, block_k,
               packed_mode, softmax_bf16, bwd_block_q, bwd_block_k,
               qk_int8, res, g):
    (q, k, v, o, lse, kv_len, q_segments, kv_segments, q_offsets,
     score_bound) = res
    dq, dk, dv = flash_attention_bwd_padded(
        q, k, v, o, lse, g, causal=causal, q_offset=q_offset, kv_len=kv_len,
        q_segments=q_segments, kv_segments=kv_segments,
        softmax_scale=softmax_scale, packed_mode=packed_mode,
        q_offsets=q_offsets, block_q=bwd_block_q, block_k=bwd_block_k)
    return (dq, dk, dv, _zero_cot(kv_len), _zero_cot(q_segments),
            _zero_cot(kv_segments), _zero_cot(q_offsets),
            _zero_cot(score_bound))


_flash.defvjp(_flash_fwd, _flash_bwd)


def attention(q, k, v, *, causal=False, q_offset=0, kv_len=None,
              q_segments=None, kv_segments=None, softmax_scale=None,
              block_q=None, block_k=None, packed_mode=False,
              q_offsets=None, softmax_bf16=False, rope_tables=None,
              bwd_block_q=None, bwd_block_k=None, qk_int8=False,
              score_bound=None, cache_rot_k=None):
    """Multi-head attention over [B, L, N, D] tensors.

    Default block sizes auto-tune by sequence length: the v5e sweep
    (tools/bench_attn.py, 33k tokens x 12 heads x d128, chained-dispatch
    timing) measured 37-52% MFU at small tiles vs 60.9% at (1024, 1024)
    and 69.1% at (2048, 2048) — softmax VPU overhead and m/l correction
    steps amortize over larger tiles (needs the 64 MiB scoped-vmem
    limit).

    score_bound: optional scalar — a PROVEN upper bound on the RAW
    (unscaled) q.k scores, e.g. d * max|g_q| * max|g_k| for qk-normed
    towers (rope preserves row norms). Enables the bounded-softmax
    kernel: exp2(s - C) with no running max / correction / rescale —
    mathematically exact, inference-only (like rope_tables; the XLA
    fallback ignores it: exact softmax either way)."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    # head dims that aren't lane-multiples (e.g. SigLIP so400m d=72)
    # would be padded to 128 inside the Pallas kernel — 44% wasted MXU
    # and VPU work; XLA handles the odd geometry better, and at these
    # tower sizes (<=1k tokens) the materialized-scores memory is fine
    if _backend() == "xla" or d % 128 != 0:
        if rope_tables is not None:
            # apply the rotation in XLA with the UNSCALED (k) tables —
            # mha_reference applies softmax_scale itself
            _, _, ck, sk = rope_tables

            def rot(x):
                ll = x.shape[1]
                sw = x.reshape(*x.shape[:-1], d // 2, 2)[..., ::-1]
                sw = sw.reshape(x.shape)
                return (x.astype(jnp.float32)
                        * ck[:ll][None, :, None]
                        + sw.astype(jnp.float32)
                        * sk[:ll][None, :, None]).astype(x.dtype)

            q, k = rot(q), rot(k)
        return mha_reference(
            q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len,
            q_segments=q_segments, kv_segments=kv_segments,
            softmax_scale=softmax_scale, packed_mode=packed_mode,
            q_offsets=q_offsets)
    if block_q is None:
        if lk <= 512 and lq >= 4096:
            # cross-attention (one tiny kv block): the kernel is
            # q/out-DMA-bound and runs the folded q layout (see
            # flash_attention_padded q_fold); the r5 v5e sweep at the
            # 1.3B cross shape (32,760 q x 512 kv) measured 9.0 ms at
            # (512, 512) vs 9.9-11.8 ms at the wide self-attention
            # tiles — wide q tiles only amortize softmax over a kv
            # loop this shape doesn't have
            block_q = 512
        elif lq >= 4096:
            # 2048 is ~3% faster than 1024 on v5e but only worth it when
            # it adds no extra q padding
            block_q = 2048 if _round_up(lq, 2048) == _round_up(lq, 1024) \
                else 1024
            if score_bound is not None \
                    and _round_up(lq, 4096) == _round_up(lq, 1024):
                # bounded softmax frees the m scratch + correction chain,
                # and the r5 v5e sweep shows the old wide-tile VMEM
                # spill is gone: (4096, 2048) 75.8 ms / 88.3% MFU vs
                # (2048, 2048) 77.2 / 86.7% at the 1.3B 33k shape
                block_q = 4096
        else:
            block_q = 256
    if block_k is None:
        if lk >= 4096:
            # r4 v5e sweep (chained-dispatch timing): (2048, 2048)
            # reaches 69-71% kernel MFU vs 60.9% at (1024, 1024) now that
            # the 64 MiB scoped-vmem limit admits the larger kv tile;
            # prefer it when it adds no extra padding. Wider tiles regress
            # (measured at the 1.3B 33k-token fused-rope shape):
            # (1024,4096) 68.3%, (2048,4096)/(4096,2048) ~40% (VMEM
            # spills), (4096,4096) fails to compile — don't revisit.
            block_k = 2048 if _round_up(lk, 2048) == _round_up(lk, 1024) \
                else 1024
        else:
            block_k = 512
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    if lk_pad != lk and kv_len is None:
        kv_len = jnp.full((b,), lk, jnp.int32)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0), (0, 0)))
        if q_segments is not None:
            q_segments = jnp.pad(q_segments,
                                 ((0, 0), (0, lq_pad - lq)),
                                 constant_values=-1)
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0), (0, 0)))
        if kv_segments is not None:
            kv_segments = jnp.pad(kv_segments,
                                  ((0, 0), (0, lk_pad - lk)),
                                  constant_values=-2)

    folded_bound = None
    if score_bound is not None:
        # kernel scores carry softmax_scale * log2(e) (folded into q or
        # the q rope tables) — convert the raw-score bound once here
        sc = softmax_scale if softmax_scale is not None \
            else 1.0 / math.sqrt(d)
        folded_bound = jnp.asarray(score_bound, jnp.float32) \
            * (sc * math.log2(math.e))

    if rope_tables is not None:
        # fused-rope prologue: INFERENCE-ONLY fast path (the custom_vjp
        # below differentiates the rotated-inputs formulation; training
        # code applies rope in XLA and leaves rope_tables unset).
        # score_bound composes here and in _flash below.
        o = flash_attention_padded(
            q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len,
            softmax_scale=softmax_scale, block_q=block_q,
            block_k=block_k, q_offsets=q_offsets,
            softmax_bf16=softmax_bf16, rope_tables=rope_tables,
            qk_int8=qk_int8, score_bound=folded_bound,
            cache_rot_k=_krot_auto(cache_rot_k, causal, qk_int8,
                                   _round_up(lk, block_k), d,
                                   v.dtype.itemsize))
        return o[:, :lq]

    # backward kernel tiles (only used when this call is differentiated):
    # independent of the forward's because the bwd kernels hold ~4 fp32
    # [bq, bk] intermediates (t/p/dp/ds) plus two accumulator scratches.
    # v5e sweep (tools/bench_attn.py ATTN_MODE=bwd, 32,760 tokens x 12
    # heads x d128): (512,512) 70.9% -> (1024,2048) 83.1% MFU of the
    # executed two-pass FLOPs
    if bwd_block_q is None:
        bwd_block_q = 1024 if lq >= 4096 else 256
    if bwd_block_k is None:
        bwd_block_k = 2048 if lk >= 4096 else 512
    o = _flash(q, k, v, kv_len, q_segments, kv_segments, q_offsets,
               folded_bound,
               causal, q_offset, softmax_scale, block_q, block_k,
               packed_mode, softmax_bf16, bwd_block_q, bwd_block_k,
               qk_int8)
    return o[:, :lq]
