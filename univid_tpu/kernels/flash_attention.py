"""Pallas TPU flash attention.

One kernel serves every attention mode in the framework (SURVEY.md §7.3.1):

  * Wan DiT full 3D self-attention (L up to ~34k tokens) with optional
    kv-length masking (reference flash_attention k_lens,
    models/wan/utils/modules/attention.py:24-179)
  * Wan cross-attention (q = video tokens, kv = 512 context tokens)
  * causal attention (+ q_offset) for BAGEL AR decode over a KV cache
  * segment-id masking reproducing cu_seqlens varlen packing semantics
    (BAGEL qwen2_navit.py:579-588, NaViT siglip_navit.py:233)

Design: grid (batch*heads, q_blocks, kv_blocks) with the kv axis innermost
and sequential; online-softmax running max/denominator in fp32 VMEM scratch;
bf16 matmuls on the MXU with fp32 accumulation. Inputs must be padded to
block multiples (the public wrapper in .attention pads/unpads).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# module-wide interpret-mode default (per-call `interpret=` overrides when
# not None): lets CPU CI exercise the full custom_vjp wiring in
# .attention without real TPU hardware
_INTERPRET = False


def set_interpret_mode(on: bool):
    global _INTERPRET
    _INTERPRET = bool(on)


def _flash_kernel(
    # refs (the optional [2, B] scalar-prefetch — kv_len row 0, dynamic
    # q_offset row 1 — comes first when present)
    *refs,
    num_heads: int,
    block_q: int,
    block_k: int,
    causal: bool,
    q_offset: int,
    has_scalars: bool,
    has_kv_len: bool,
    has_q_offsets: bool,
    has_segments: bool,
    packed_mode: bool,
    save_residuals: bool,
    softmax_bf16: bool,
    fused_rope: bool,
    qk_int8: bool,
    static_max: bool,
    cache_rot_k: bool,
):
    idx = 0
    scalar_ref = None
    if has_scalars:
        scalar_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref = refs[idx:idx + 3]
    idx += 3
    bound_ref = None
    if static_max:
        bound_ref = refs[idx]  # [1, 1] f32 SMEM: score upper bound
        idx += 1
    cq_ref = sq_ref = ck_ref = sk_ref = None
    if fused_rope:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[idx:idx + 4]
        idx += 4
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref, kseg_ref = refs[idx:idx + 2]
        idx += 2
    o_ref = refs[idx]
    idx += 1
    lse_ref = None
    if save_residuals:
        lse_ref = refs[idx]
        idx += 1
    if static_max:
        # bounded-softmax mode: no running max — softmax is computed as
        # exp2(s - C) for a PROVEN upper bound C on the (folded) scores
        # (Wan qk-norm: |q.k| <= d * max|g_q| * max|g_k|, rope is
        # norm-preserving). Mathematically EXACT — the constant cancels
        # in acc/l — it just pins the online-softmax reference point so
        # the max reduce, correction exp2 and acc rescale all vanish.
        m_scr = None
        l_scr, acc_scr = refs[idx:idx + 2]
        idx += 2
    else:
        m_scr, l_scr, acc_scr = refs[idx:idx + 3]
        idx += 3
    q_scr = qi_scr = sq_scr = None
    if qk_int8:
        qi_scr, sq_scr = refs[idx:idx + 2]  # int8 q tile + per-row scale
        idx += 2
    elif fused_rope:
        q_scr = refs[idx]
        idx += 1
    krot_scr = None
    if cache_rot_k:
        krot_scr = refs[idx]  # [Lk, d] rotated-k cache (see below)

    i_q = pl.program_id(1)
    i_k = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0) // num_heads

    def _rot(x32, c_ref, s_ref):
        """In-prologue rotary embed: y = x*cosF + swap_pairs(x)*sinF on
        a fp32 VMEM tile (tables carry the swap-multiply convention and
        the q tables fold in softmax_scale*log2e — see
        build_fused_rope_tables). VPU register work instead of the
        ~300 ms/step of fp32 cast/rev/mul HBM passes the XLA-side
        rotation cost on the 1.3B. swap_pairs (sw[i] = x[i^1]) is two
        cyclic lane rolls + a parity select: Pallas TPU has no lowering
        for rev, and the (rows, d/2, 2) reshape it needed is
        layout-hostile on the lane dimension anyway."""
        _, d = x32.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, x32.shape, 1)
        nxt = pltpu.roll(x32, d - 1, 1)  # nxt[i] = x[(i + 1) % d]
        prv = pltpu.roll(x32, 1, 1)      # prv[i] = x[(i - 1) % d]
        sw = jnp.where((lane & 1) == 0, nxt, prv)
        return x32 * c_ref[...] + sw * s_ref[...]

    @pl.when(i_k == 0)
    def _init():
        if not static_max:
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if qk_int8:
            # int8 QK^T mode (SageAttention-style): quantize the q tile
            # ONCE per q block with per-row symmetric scales. Any prefix
            # scale (softmax_scale*log2e folded into q by the wrapper, or
            # into the fused-rope q tables) is absorbed by the row scale.
            # Wan's qk-norm (RMS-normalized q/k rows) keeps per-row /
            # per-block granularity near-lossless here.
            if fused_rope:
                q32 = _rot(q_ref[0].astype(jnp.float32), cq_ref, sq_ref)
            else:
                q32 = q_ref[0].astype(jnp.float32)
            aq = jnp.maximum(jnp.max(jnp.abs(q32), axis=-1,
                                     keepdims=True), 1e-30)  # [bq, 1]
            qi_scr[:] = jnp.round(q32 * (127.0 / aq)).astype(jnp.int8)
            sq_scr[:] = jnp.broadcast_to(aq * (1.0 / 127.0), sq_scr.shape)
        elif fused_rope:
            q_scr[:] = _rot(q_ref[0].astype(jnp.float32), cq_ref,
                            sq_ref).astype(q_scr.dtype)

    # causal: skip fully-masked kv blocks. With a static offset this is a
    # compile-time grid predicate; with dynamic per-batch offsets it is a
    # runtime scalar skip (still saves the whole block's matmul+softmax).
    run = True
    if causal:
        first_masked_col = i_q * block_q + q_offset + block_q
        if has_q_offsets:
            first_masked_col = first_masked_col + scalar_ref[1, b]
        run = i_k * block_k < first_masked_col
    if has_kv_len:
        # kv blocks entirely beyond kv_len contribute p == 0 to both the
        # accumulator and the denominator — skip them outright. Makes the
        # up-front token pad (pipelines/ti2v.py) nearly free in attention
        # even when it rounds the sequence up by a whole block (e.g. the
        # 704p ref point: 27,280 -> 28,672 tokens).
        run = run & (i_k * block_k < scalar_ref[0, b])

    def _mask_scores_fwd(s, mask_kv):
        """Mask ops for blocks that need them (same predicate as
        `_mask_scores` used by the backward kernels)."""
        col = i_k * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            row = i_q * block_q + q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            if has_q_offsets:
                row = row + scalar_ref[1, b]
            s = jnp.where(col <= row, s, NEG_INF)
        if has_kv_len and mask_kv:
            s = jnp.where(col < scalar_ref[0, b], s, NEG_INF)
        if has_segments:
            # qseg block [bq, 128] (lane-broadcast), kseg block [8, bk]
            # (sublane-broadcast) — TPU tiling-friendly layouts.
            qs = qseg_ref[0]  # [bq, 128]
            ks = kseg_ref[0]  # [8, bk]
            qs_full = jnp.tile(qs, (1, block_k // 128))  # [bq, bk]
            ks_row = ks[:1, :]
            if packed_mode:
                # BAGEL mixed causal/full/noise mask from pack_mask_codes
                # (see attention.pack_mask_codes / create_sparse_mask)
                row = i_q * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                doc_q, doc_k = qs_full >> 16, ks_row >> 16
                fn_q, fn_k = (qs_full >> 8) & 0xFF, (ks_row >> 8) & 0xFF
                nz_q, nz_k = qs_full & 0xFF, ks_row & 0xFF
                allowed = ((row >= col) | ((fn_q == fn_k) & (fn_q > 0))) \
                    & (~((nz_k > 0) & (nz_q != nz_k))) & (doc_q == doc_k)
                s = jnp.where(allowed, s, NEG_INF)
            else:
                s = jnp.where(qs_full == ks_row, s, NEG_INF)
        return s

    def _compute(mask_kv, mask_causal):
        v = v_ref[0]  # [bk, d]
        if qk_int8:
            # quantize the (rotated) k tile with ONE per-block scalar
            # scale — qk-norm bounds every k row to the same RMS, so the
            # scalar loses almost nothing vs per-row scales and keeps the
            # s rescale a single [bq,1]-broadcast multiply (no [1,bk]
            # lane-vector relayout). NOTE: measured SLOWER than bf16 on
            # v5e (core/dtypes.py) — the d=128 contraction is one MXU
            # pass in either dtype, so this trades nothing for VPU work.
            if fused_rope:
                k32 = _rot(k_ref[0].astype(jnp.float32), ck_ref, sk_ref)
            else:
                k32 = k_ref[0].astype(jnp.float32)
            ak = jnp.maximum(jnp.max(jnp.abs(k32)), 1e-30)
            ki = jnp.round(k32 * (127.0 / ak)).astype(jnp.int8)
            s32 = jax.lax.dot_general(
                qi_scr[:], ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [bq, bk]
            s = s32.astype(jnp.float32) \
                * (sq_scr[:, :1] * (ak * (1.0 / 127.0)))
        else:
            if fused_rope:
                q = q_scr[:]  # rotated + scale-folded at i_k == 0
                if cache_rot_k:
                    # rotated once at i_q == 0 (see _fill_krot), reused
                    # for every later q block — kills the (nq-1)/nq
                    # redundant per-visit k rotations
                    k = krot_scr[pl.ds(i_k * block_k, block_k), :]
                else:
                    k = _rot(k_ref[0].astype(jnp.float32), ck_ref,
                             sk_ref).astype(v_ref.dtype)
            else:
                q = q_ref[0]  # [bq, d] — scale pre-folded by the wrapper
                k = k_ref[0]  # [bk, d]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [bq, bk]

        if mask_kv or mask_causal or has_segments:
            s = _mask_scores_fwd(s, mask_kv)

        # softmax runs in the exp2 domain: log2(e) is folded into the
        # q scale by the wrapper, so exp2 here == exp of raw scores and
        # the VPU skips exp's per-element ln2 multiply.
        if softmax_bf16:
            # the whole [bq, bk]-wide softmax chain (max / sub / exp2)
            # runs at half VPU width; max-subtraction bounds the exp2
            # argument to ~<= 0 so bf16's 8-bit mantissa costs ~0.4% on
            # p — the same order as the bf16 PV matmul below. Masked
            # NEG_INF survives the cast (bf16 keeps fp32's exponent).
            s = s.astype(jnp.bfloat16)
        if static_max:
            # exp2(s - C): exact softmax with the reference point pinned
            # at the proven score bound C (exp2 argument <= ~0, so no
            # overflow; fp32's exponent range makes far-below-max terms
            # underflow to 0 exactly as the max-subtracted chain does).
            # No m bookkeeping, no correction, no acc rescale.
            p = jnp.exp2(s - bound_ref[0, 0].astype(s.dtype))  # [bq, bk]
            p_sum = jnp.sum(p, axis=-1, keepdims=True,
                            dtype=jnp.float32)
            l_scr[:] = l_scr[:] + jnp.broadcast_to(p_sum, l_scr.shape)
            acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        m_prev = m_scr[:, :1]                       # [bq, 1] fp32
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur.astype(jnp.float32))
        p = jnp.exp2(s - m_new.astype(s.dtype))     # [bq, bk]
        p_sum = jnp.sum(p, axis=-1, keepdims=True,
                        dtype=jnp.float32)
        corr = jnp.exp2(m_prev - m_new)             # [bq, 1]

        l_new = l_scr[:, :1] * corr + p_sum
        acc = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[:] = acc

    if cache_rot_k:
        # fill the rotated-k cache on the FIRST q block's kv sweep
        # (non-causal only: causal would skip high-ik blocks at i_q == 0
        # that later q blocks need — the wrapper asserts). Skipped
        # kv_len-tail blocks are skipped identically at every i_q, so
        # their slots are never read.
        @pl.when(jnp.logical_and(run, i_q == 0))
        def _fill_krot():
            krot_scr[pl.ds(i_k * block_k, block_k), :] = _rot(
                k_ref[0].astype(jnp.float32), ck_ref, sk_ref
            ).astype(krot_scr.dtype)

    # Interior blocks skip every mask op (the dominant case for the Wan
    # self-attention hot path, where only the last kv block carries
    # padding): branch on runtime scalars so only diagonal-intersecting
    # causal blocks and kv_len-tail blocks pay the compare+select VPU
    # passes over [bq, bk].
    need = None
    if causal:
        row0 = i_q * block_q + q_offset
        if has_q_offsets:
            row0 = row0 + scalar_ref[1, b]
        on_diag = (i_k + 1) * block_k > row0 + 1  # block not fully live
        need = on_diag
    if has_kv_len:
        kv_tail = (i_k + 1) * block_k > scalar_ref[0, b]
        need = kv_tail if need is None else (need | kv_tail)

    if need is None:
        @pl.when(run)
        def _go():
            _compute(has_kv_len, causal)
    else:
        @pl.when(run & need)
        def _masked():
            _compute(has_kv_len, causal)

        @pl.when(run & jnp.logical_not(need))
        def _clean():
            _compute(False, False)

    @pl.when(i_k == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc_scr[:] * inv).astype(o_ref.dtype)
        if save_residuals:
            # log-sum-exp in the exp2 domain: p_ij = exp2(t_ij - lse_i) in
            # the backward recompute. Fully-masked rows (l == 0) store a
            # large POSITIVE sentinel so exp2(t - lse) underflows to 0
            # instead of producing inf/nan.
            lf = l_scr[:]
            m_term = (bound_ref[0, 0] if static_max else m_scr[:])
            lse_ref[0] = jnp.where(
                lf > 0.0, m_term + jnp.log2(jnp.where(lf > 0.0, lf, 1.0)),
                jnp.float32(-NEG_INF))


def _cross_kernel(
    *refs,
    num_heads: int,
    lk: int,
    has_kv_len: bool,
    static_max: bool,
    softmax_bf16: bool,
):
    """Single-kv-block (cross-)attention: grid (B, Lq/block_q), the whole
    per-batch kv [N*Lk, D] resident in VMEM, heads unrolled inside.

    Why a dedicated kernel: at the Wan cross shape (32,760 q x 512 text
    kv — ref wan/utils/modules/model.py:158 WanCrossAttention, which
    runs flash-attn over the same single text block) the generic grid
    is (B*N, nq, 1) = 1,536 tiny invocations whose per-invocation
    overhead dominates — measured 9.9 ms vs ~1.6 ms of DMA+MXU
    speed-of-light. Collapsing heads into the kernel body cuts the grid
    to (B, nq) and lets q/out keep their native [B, L, N*D] layout
    (zero XLA transposes). With one kv block the softmax is one-shot —
    no running max / correction / accumulator scratch at all."""
    idx = 0
    scalar_ref = refs[idx] if has_kv_len else None
    idx += int(has_kv_len)
    q_ref, k_ref, v_ref = refs[idx:idx + 3]
    idx += 3
    bound_ref = None
    if static_max:
        bound_ref = refs[idx]
        idx += 1
    o_ref = refs[idx]

    b = pl.program_id(0)
    d = k_ref.shape[-1]
    kv_mask = None
    if has_kv_len:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[1], lk), 1)
        kv_mask = col < scalar_ref[0, b]

    for h in range(num_heads):
        qh = q_ref[0, :, h * d:(h + 1) * d]          # [bq, d]
        kh = k_ref[0, h * lk:(h + 1) * lk, :]        # [lk, d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bq, lk]
        if kv_mask is not None:
            s = jnp.where(kv_mask, s, NEG_INF)
        if softmax_bf16:
            s = s.astype(jnp.bfloat16)
        if static_max:
            p = jnp.exp2(s - bound_ref[0, 0].astype(s.dtype))
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
        if kv_mask is not None:
            # NEG_INF is a finite sentinel: a fully-masked row would
            # otherwise softmax to uniform (exp2(0)); zero it exactly
            p = jnp.where(kv_mask, p, jnp.zeros_like(p))
        l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        vh = v_ref[0, h * lk:(h + 1) * lk, :]        # [lk, d]
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bq, d]
        o_ref[0, :, h * d:(h + 1) * d] = (o * inv).astype(o_ref.dtype)


def _cross_attention_padded(q, k, v, *, kv_len, score_bound, block_q,
                            softmax_bf16, interpret):
    """Dispatch target for single-kv-block non-causal attention. q is
    already scale*log2(e)-folded by the caller; shapes are padded."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    qf = q.reshape(b, lq, n * d)
    kf = k.transpose(0, 2, 1, 3).reshape(b, n * lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b, n * lk, d)
    grid = (b, lq // block_q)

    q_map = lambda ib, iq, *_: (ib, iq, 0)
    kv_map = lambda ib, iq, *_: (ib, 0, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, n * d), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n * lk, d), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n * lk, d), kv_map, memory_space=pltpu.VMEM),
    ]
    inputs = [qf, kf, vf]
    static_max = score_bound is not None
    if static_max:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(score_bound, jnp.float32).reshape(1, 1))

    has_kv_len = kv_len is not None
    kernel = functools.partial(
        _cross_kernel, num_heads=n, lk=lk, has_kv_len=has_kv_len,
        static_max=static_max, softmax_bf16=softmax_bf16)
    out_spec = pl.BlockSpec((1, block_q, n * d), q_map,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, lq, n * d), q.dtype)
    cost_estimate = pl.CostEstimate(
        flops=4 * b * n * lq * lk * d,
        bytes_accessed=(qf.size + kf.size + vf.size + qf.size)
        * qf.dtype.itemsize,
        transcendentals=b * n * lq * lk,
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=64 * 1024 * 1024)
    if has_kv_len:
        scalars = kv_len.astype(jnp.int32).reshape(1, b)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=[])
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, cost_estimate=cost_estimate,
            compiler_params=params)(scalars, *inputs)
    else:
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
            cost_estimate=cost_estimate,
            compiler_params=params)(*inputs)
    return out.reshape(b, lq, n, d)


def build_fused_rope_tables(cos: jnp.ndarray, sin: jnp.ndarray, d: int,
                            softmax_scale: Optional[float] = None):
    """[L, d/2] rope tables -> the 4 full-width fp32 tables the kernel's
    fused prologue consumes: (cos_q, sin_q, cos_k, sin_k) in the
    swap-multiply convention (cosF = repeat(cos, 2), sinF =
    interleave(-sin, +sin)); the q pair additionally folds in
    softmax_scale * log2(e) so the kernel needs NO extra scale pass."""
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    sc = softmax_scale * math.log2(math.e)
    c32 = cos.astype(jnp.float32)
    s32 = sin.astype(jnp.float32)
    cf = jnp.repeat(c32, 2, axis=-1)
    sf = jnp.stack([-s32, s32], axis=-1).reshape(s32.shape[0], -1)
    return cf * sc, sf * sc, cf, sf


def _pad_tables(tables, lq, lk, scale_const):
    """Pad the 4 fused-rope tables to the padded q/k lengths with the
    identity rotation (cos = 1 (scaled for q), sin = 0)."""
    cq, sq, ck, sk = tables

    def pad(t, length, fill):
        if t.shape[0] >= length:
            return t[:length]
        return jnp.pad(t, ((0, length - t.shape[0]), (0, 0)),
                       constant_values=fill)

    return (pad(cq, lq, scale_const), pad(sq, lq, 0.0),
            pad(ck, lk, 1.0), pad(sk, lk, 0.0))


def flash_attention_padded(
    q: jnp.ndarray,  # [B, Lq, N, D], Lq % block_q == 0
    k: jnp.ndarray,  # [B, Lk, N, D], Lk % block_k == 0
    v: jnp.ndarray,
    *,
    causal: bool = False,
    q_offset: int = 0,
    kv_len: Optional[jnp.ndarray] = None,       # [B] int32
    q_segments: Optional[jnp.ndarray] = None,   # [B, Lq] int32
    kv_segments: Optional[jnp.ndarray] = None,  # [B, Lk] int32
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    packed_mode: bool = False,
    q_offsets: Optional[jnp.ndarray] = None,    # [B] int32 dynamic causal
    save_residuals: bool = False,
    softmax_bf16: bool = False,
    rope_tables=None,  # build_fused_rope_tables output -> fused prologue
    qk_int8: bool = False,  # int8 QK^T (per-row q / per-block k scales)
    score_bound=None,  # scalar f32: PROVEN upper bound on the FOLDED
                       # (scale*log2e-multiplied) scores -> bounded
                       # softmax, no running max (exact; see kernel)
    cache_rot_k: bool = False,  # fused-rope only: rotate each k tile
                                # once (at i_q == 0) into a [Lk, d] VMEM
                                # cache instead of per-(i_q, i_k) visit
    q_fold=None,  # fold q/out to [B*N, L, D] (contiguous DMA; wins when
                  # kv is tiny — see layout comment). None = auto.
) -> jnp.ndarray:
    if interpret is None:
        interpret = _INTERPRET
    b, lq, n, d = q.shape
    lk = k.shape[1]
    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    assert lq % block_q == 0 and lk % block_k == 0, (lq, lk, block_q, block_k)
    # the packed-mode causal term uses raw global row indices; a nonzero
    # offset would silently diverge from the XLA reference
    assert not (packed_mode and (q_offset != 0 or q_offsets is not None)), \
        "packed_mode does not support q offsets"
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    fused_rope = rope_tables is not None
    if fused_rope:
        assert q_segments is None, \
            "fused rope does not compose with segment masking"
        rope_tables = _pad_tables(
            rope_tables, lq, lk,
            softmax_scale * math.log2(math.e))
    else:
        # fold the softmax scale AND log2(e) into q once (O(L*d))
        # instead of scaling every [bq, bk] score tile inside the
        # kernel (O(L^2)); the kernel softmax runs in the exp2 domain
        q = q * jnp.asarray(softmax_scale * math.log2(math.e), q.dtype)

    # Single-kv-block fast path (cross-attention): see _cross_kernel.
    # Inference-only (the residual-saving training forward keeps the
    # generic grid whose lse layout the backward kernels expect).
    if (lk <= block_k and not causal and not fused_rope
            and q_segments is None and not packed_mode and q_offset == 0
            and q_offsets is None and not qk_int8 and not save_residuals
            and d % 128 == 0 and lk % 128 == 0 and q_fold is None
            and n * lk * d * k.dtype.itemsize <= 8 * 1024 * 1024
            and os.environ.get("ATTN_XK", "1") == "1"):
        return _cross_attention_padded(
            q, k, v, kv_len=kv_len, score_bound=score_bound,
            block_q=block_q, softmax_bf16=softmax_bf16,
            interpret=interpret)

    # HYBRID layout (profiled on the 1.3B step): q and the output are
    # touched ONCE per element, so they stay in the native [B, L, N*D]
    # view (a free reshape) with the head picked by the last-dim block
    # index — their per-head strided DMA rides the compute-bound
    # kernel's slack and the explicit q/out transposes disappear. k/v
    # are RE-READ lq/block_q times, which amplifies the strided-read
    # penalty past the one-time transpose cost (+3.6 ms/call measured
    # fully-native), so they keep the [B*N, L, D] fold.
    #
    # EXCEPTION (q_fold): when kv is tiny (cross-attention: lk <= one
    # block) the kernel is q/out-DMA-bound, not compute-bound — there
    # is no kv loop to hide the strided per-head reads behind. Folding
    # q/out to [B*N, L, D] (one XLA transpose each way, contiguous
    # DMA inside) wins there.
    if q_fold is None:
        env = os.environ.get("ATTN_QFOLD")  # bench A/B override
        if env is not None:
            q_fold = env == "1"
        else:
            # auto: single kv block (cross-attention) and a long q
            # loop — the q/out DMA dominates, fold pays for its two
            # transposes
            q_fold = (lk <= block_k) and (lq // block_q >= 4)
    if q_fold:
        qf = q.transpose(0, 2, 1, 3).reshape(b * n, lq, d)
        q_map = lambda ibn, iq, ik, *_: (ibn, iq, 0)
    else:
        qf = q.reshape(b, lq, n * d)
        q_map = lambda ibn, iq, ik, *_, _n=n: (ibn // _n, iq, ibn % _n)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, lk, d)

    grid = (b * n, lq // block_q, lk // block_k)

    kv_map = lambda ibn, iq, ik, *_: (ibn, ik, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, d), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), kv_map, memory_space=pltpu.VMEM),
    ]
    inputs = [qf, kf, vf]

    static_max = score_bound is not None
    if static_max:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(score_bound,
                                  jnp.float32).reshape(1, 1))

    if fused_rope:
        tq_spec = pl.BlockSpec((block_q, d),
                               lambda ibn, iq, ik, *_: (iq, 0),
                               memory_space=pltpu.VMEM)
        tk_spec = pl.BlockSpec((block_k, d),
                               lambda ibn, iq, ik, *_: (ik, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [tq_spec, tq_spec, tk_spec, tk_spec]
        inputs += list(rope_tables)

    has_segments = q_segments is not None
    if has_segments:
        assert kv_segments is not None
        # lane/sublane-broadcast layouts to satisfy TPU tiling (see kernel)
        qseg = jax.lax.broadcast_in_dim(
            q_segments.astype(jnp.int32), (b, lq, 128), (0, 1))
        kseg = jax.lax.broadcast_in_dim(
            kv_segments.astype(jnp.int32), (b, 8, lk), (0, 2))
        in_specs += [
            pl.BlockSpec((1, block_q, 128),
                         lambda ibn, iq, ik, *_, _n=n: (ibn // _n, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_k),
                         lambda ibn, iq, ik, *_, _n=n: (ibn // _n, 0, ik),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [qseg, kseg]

    has_kv_len = kv_len is not None
    has_q_offsets = q_offsets is not None
    has_scalars = has_kv_len or has_q_offsets
    kernel = functools.partial(
        _flash_kernel,
        num_heads=n, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, has_scalars=has_scalars, has_kv_len=has_kv_len,
        has_q_offsets=has_q_offsets, has_segments=has_segments,
        packed_mode=packed_mode, save_residuals=save_residuals,
        softmax_bf16=softmax_bf16, fused_rope=fused_rope,
        qk_int8=qk_int8, static_max=static_max,
        cache_rot_k=cache_rot_k)

    scratch_shapes = []
    if not static_max:
        scratch_shapes.append(
            pltpu.VMEM((block_q, 128), jnp.float32))  # running max
    scratch_shapes += [
        pltpu.VMEM((block_q, 128), jnp.float32),  # running denominator
        pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
    ]
    if qk_int8:
        # int8 q tile + per-row scale, computed once per q block
        scratch_shapes.append(pltpu.VMEM((block_q, d), jnp.int8))
        scratch_shapes.append(pltpu.VMEM((block_q, 128), jnp.float32))
    elif fused_rope:
        # rotated+scaled q tile, computed once per q block
        scratch_shapes.append(pltpu.VMEM((block_q, d), q.dtype))
    if cache_rot_k:
        assert fused_rope and not qk_int8 and not causal, \
            "cache_rot_k requires fused rope, non-causal, no qk_int8"
        # whole-sequence rotated-k cache (bf16: 33k tokens x d128 =
        # 8.4 MB) — persists across q blocks, so the q grid axis must
        # stay sequential (see dimension_semantics below)
        scratch_shapes.append(pltpu.VMEM((lk, d), v.dtype))

    out_spec = pl.BlockSpec((1, block_q, d), q_map,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(
        (b * n, lq, d) if q_fold else (b, lq, n * d), q.dtype)
    if save_residuals:
        # lse in the lane-broadcast [B*N, Lq, 128] layout so the backward
        # kernels read per-row stats as [bq, 128] tiles without transposes
        # (same layout JAX's own TPU flash kernel uses for l/m).
        out_spec = (out_spec, pl.BlockSpec(
            (1, block_q, 128), lambda ibn, iq, ik, *_: (ibn, iq, 0),
            memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b * n, lq, 128), jnp.float32))

    # scheduling hint: qk^T + pv matmul flops and the dominant q/k/v/o
    # HBM traffic (helps Mosaic pick pipeline depths)
    cost_estimate = pl.CostEstimate(
        flops=4 * b * n * lq * lk * d,
        bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize
        + (b * n * lq * d) * qf.dtype.itemsize
        + (kf.size + vf.size) * qf.dtype.itemsize * (lq // block_q - 1),
        transcendentals=b * n * lq * lk,
    )

    # the rotated-k cache persists across q blocks — the q grid axis
    # must then execute sequentially (megacore may otherwise split it)
    dims = ("parallel", "arbitrary" if cache_rot_k else "parallel",
            "arbitrary")
    if has_scalars:
        scalars = jnp.stack([
            (kv_len if has_kv_len else jnp.full((b,), lk)).astype(
                jnp.int32),
            (q_offsets if has_q_offsets else jnp.zeros((b,))).astype(
                jnp.int32)])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost_estimate,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=dims,
                # the fused-rope prologue adds 4 fp32 table blocks +
                # a rotated-q scratch; at bq=2048/bk=1024 the default
                # 16 MiB scoped-vmem limit overflows by ~36 KiB on v5e
                vmem_limit_bytes=64 * 1024 * 1024),
        )(scalars, *inputs)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            cost_estimate=cost_estimate,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=dims,
                # the fused-rope prologue adds 4 fp32 table blocks +
                # a rotated-q scratch; at bq=2048/bk=1024 the default
                # 16 MiB scoped-vmem limit overflows by ~36 KiB on v5e
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*inputs)

    if save_residuals:
        out, lse = out
        if q_fold:
            return out.reshape(b, n, lq, d).transpose(0, 2, 1, 3), lse
        return out.reshape(b, lq, n, d), lse
    if q_fold:
        return out.reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, n, d)


# ---------------------------------------------------------------------------
# Backward (recompute-p flavor, FlashAttention-2 style)
#
# The reference trains through flash-attn varlen (BAGEL
# qwen2_navit.py:579-588, models/wan/utils/modules/attention.py:94-127);
# these kernels give the TPU training paths the same O(L) memory property.
#
# Two kernels, both re-deriving p from the saved exp2-domain lse:
#   dq  — grid (B*N, q_blocks, kv_blocks), kv innermost:  dq_i = s·Σ dS·k
#   dkv — grid (B*N, kv_blocks, q_blocks), q  innermost:  dv_j = Σ pᵀ·dO,
#                                                         dk_j = s·Σ dSᵀ·q
# with dS = p ⊙ (dO·vᵀ − Δ), Δ_i = Σ_d dO_id·O_id. Δ is recomputed from the
# already-resident O/dO tiles (O(bq·d) VPU work per step — cheaper than a
# 128-lane-broadcast delta array in HBM). q arrives pre-scaled by
# scale·log2(e) (shared with the forward's fold), so dq needs a final ×scale
# and dk a final ×ln(2) to refer gradients back to the RAW q/k inputs.
# ---------------------------------------------------------------------------


def _mask_scores(s, i_q, i_k, b, *, block_q, block_k, causal, q_offset,
                 scalar_ref, has_kv_len, has_q_offsets, qseg_ref, kseg_ref,
                 packed_mode, mask_kv=True, mask_causal=True):
    """Shared mask predicate — must match `_flash_kernel` exactly.

    mask_kv/mask_causal let interior blocks (proven fully live by the
    caller's runtime block predicate) skip the compare+select VPU passes
    over [bq, bk] — same trick as the forward's _compute(False, False)."""
    col = i_k * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    if causal and mask_causal:
        row = i_q * block_q + q_offset + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        if has_q_offsets:
            row = row + scalar_ref[1, b]
        s = jnp.where(col <= row, s, NEG_INF)
    if has_kv_len and mask_kv:
        s = jnp.where(col < scalar_ref[0, b], s, NEG_INF)
    if qseg_ref is not None:
        qs = qseg_ref[0]  # [bq, 128]
        ks = kseg_ref[0]  # [8, bk]
        qs_full = jnp.tile(qs, (1, block_k // 128))
        ks_row = ks[:1, :]
        if packed_mode:
            row = i_q * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            doc_q, doc_k = qs_full >> 16, ks_row >> 16
            fn_q, fn_k = (qs_full >> 8) & 0xFF, (ks_row >> 8) & 0xFF
            nz_q, nz_k = qs_full & 0xFF, ks_row & 0xFF
            allowed = ((row >= col) | ((fn_q == fn_k) & (fn_q > 0))) \
                & (~((nz_k > 0) & (nz_q != nz_k))) & (doc_q == doc_k)
            s = jnp.where(allowed, s, NEG_INF)
        else:
            s = jnp.where(qs_full == ks_row, s, NEG_INF)
    return s


def _flash_bwd_dq_kernel(
    *refs,
    num_heads: int,
    block_q: int,
    block_k: int,
    causal: bool,
    q_offset: int,
    softmax_scale: float,
    has_scalars: bool,
    has_kv_len: bool,
    has_q_offsets: bool,
    has_segments: bool,
    packed_mode: bool,
):
    idx = 0
    scalar_ref = None
    if has_scalars:
        scalar_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref = refs[idx:idx + 6]
    idx += 6
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref, kseg_ref = refs[idx:idx + 2]
        idx += 2
    dq_ref = refs[idx]
    acc_scr = refs[idx + 1]

    i_q = pl.program_id(1)
    i_k = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0) // num_heads

    @pl.when(i_k == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # block skip: causal dead blocks and kv blocks fully beyond kv_len
    # contribute p == 0 -> ds == 0 (same predicate family as the forward)
    run = True
    if causal:
        first_masked_col = i_q * block_q + q_offset + block_q
        if has_q_offsets:
            first_masked_col = first_masked_col + scalar_ref[1, b]
        run = i_k * block_k < first_masked_col
    if has_kv_len:
        run = run & (i_k * block_k < scalar_ref[0, b])

    def _compute(mask_kv, mask_causal):
        qs = q_ref[0]   # [bq, d], pre-scaled by scale*log2(e)
        k = k_ref[0]    # [bk, d]
        v = v_ref[0]
        do = do_ref[0]  # [bq, d]
        o = o_ref[0]

        t = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        if mask_kv or mask_causal or has_segments:
            t = _mask_scores(
                t, i_q, i_k, b, block_q=block_q, block_k=block_k,
                causal=causal, q_offset=q_offset, scalar_ref=scalar_ref,
                has_kv_len=has_kv_len, has_q_offsets=has_q_offsets,
                qseg_ref=qseg_ref, kseg_ref=kseg_ref,
                packed_mode=packed_mode, mask_kv=mask_kv,
                mask_causal=mask_causal)
        p = jnp.exp2(t - lse_ref[0][:, :1])      # [bq, bk]

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)  # [bq, 1]
        ds = p * (dp - delta)
        acc_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # interior blocks skip the mask compare+select VPU passes (the
    # dominant case at the Wan train shape: only the kv_len tail block
    # carries padding)
    need = None
    if causal:
        row0 = i_q * block_q + q_offset
        if has_q_offsets:
            row0 = row0 + scalar_ref[1, b]
        need = (i_k + 1) * block_k > row0 + 1
    if has_kv_len:
        kv_tail = (i_k + 1) * block_k > scalar_ref[0, b]
        need = kv_tail if need is None else (need | kv_tail)

    if need is None:
        @pl.when(run)
        def _go():
            _compute(has_kv_len, causal)
    else:
        @pl.when(run & need)
        def _masked():
            _compute(has_kv_len, causal)

        @pl.when(run & jnp.logical_not(need))
        def _clean():
            _compute(False, False)

    @pl.when(i_k == nk - 1)
    def _finish():
        dq_ref[0] = (acc_scr[:] * softmax_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    *refs,
    num_heads: int,
    block_q: int,
    block_k: int,
    causal: bool,
    q_offset: int,
    softmax_scale: float,
    has_scalars: bool,
    has_kv_len: bool,
    has_q_offsets: bool,
    has_segments: bool,
    packed_mode: bool,
):
    idx = 0
    scalar_ref = None
    if has_scalars:
        scalar_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref = refs[idx:idx + 6]
    idx += 6
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref, kseg_ref = refs[idx:idx + 2]
        idx += 2
    dk_ref, dv_ref = refs[idx:idx + 2]
    dk_scr, dv_scr = refs[idx + 2:idx + 4]

    i_k = pl.program_id(1)
    i_q = pl.program_id(2)
    nq = pl.num_programs(2)
    b = pl.program_id(0) // num_heads

    @pl.when(i_q == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # block skip: a q block contributes iff its causal-live region
    # intersects this kv block (last row >= first col), and a kv block
    # fully beyond kv_len gets p == 0 from every q block -> dk/dv stay
    # the zeros the scratch was initialized to
    run = True
    if causal:
        last_row = i_q * block_q + q_offset + block_q
        if has_q_offsets:
            last_row = last_row + scalar_ref[1, b]
        run = last_row > i_k * block_k
    if has_kv_len:
        run = run & (i_k * block_k < scalar_ref[0, b])

    def _compute(mask_kv, mask_causal):
        qs = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        o = o_ref[0]

        t = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        if mask_kv or mask_causal or has_segments:
            t = _mask_scores(
                t, i_q, i_k, b, block_q=block_q, block_k=block_k,
                causal=causal, q_offset=q_offset, scalar_ref=scalar_ref,
                has_kv_len=has_kv_len, has_q_offsets=has_q_offsets,
                qseg_ref=qseg_ref, kseg_ref=kseg_ref,
                packed_mode=packed_mode, mask_kv=mask_kv,
                mask_causal=mask_causal)
        p = jnp.exp2(t - lse_ref[0][:, :1])

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = p * (dp - delta)

        # pᵀ·dO and dSᵀ·q via contracting dim 0 — no explicit transposes
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(qs.dtype), qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    need = None
    if causal:
        row0 = i_q * block_q + q_offset
        if has_q_offsets:
            row0 = row0 + scalar_ref[1, b]
        need = (i_k + 1) * block_k > row0 + 1
    if has_kv_len:
        kv_tail = (i_k + 1) * block_k > scalar_ref[0, b]
        need = kv_tail if need is None else (need | kv_tail)

    if need is None:
        @pl.when(run)
        def _go():
            _compute(has_kv_len, causal)
    else:
        @pl.when(run & need)
        def _masked():
            _compute(has_kv_len, causal)

        @pl.when(run & jnp.logical_not(need))
        def _clean():
            _compute(False, False)

    @pl.when(i_q == nq - 1)
    def _finish():
        # dk was accumulated against the PRE-SCALED q (qs = q·scale·log2e);
        # dk_raw = scale · dSᵀ·q = dSᵀ·qs / log2(e) = ln(2) · dSᵀ·qs
        dk_ref[0] = (dk_scr[:] * math.log(2.0)).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(
    *refs,
    num_heads: int,
    block_q: int,
    block_k: int,
    causal: bool,
    q_offset: int,
    softmax_scale: float,
    has_scalars: bool,
    has_kv_len: bool,
    has_q_offsets: bool,
    has_segments: bool,
    packed_mode: bool,
):
    """One-pass backward: dq + dk + dv from a single recompute of p.

    Grid (B*N, nq, nk), kv innermost. The score-chain matmuls (t, dp)
    run ONCE per block pair instead of once per kernel — 5 block-matmuls
    total vs the two-pass kernels' 7 (a 28% FLOP cut). Safe accumulation
    without output-block revisits (Pallas TPU does not preserve revisited
    output blocks):
      dq    — fp32 scratch per q block, written at i_k == nk-1 (the dq
              out block index depends only on i_q -> consecutive visits)
      dk/dv — FULL-LENGTH fp32 out blocks indexed by the bn axis only
              (constant across the whole inner+outer sweep -> VMEM-
              resident, accumulated in place via dynamic-slice stores).
    The resident kv grads cost 2*Lk*D*4 bytes of VMEM, so this kernel is
    selected only when that fits (see _FUSED_KV_VMEM_BUDGET)."""
    idx = 0
    scalar_ref = None
    if has_scalars:
        scalar_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref = refs[idx:idx + 6]
    idx += 6
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref, kseg_ref = refs[idx:idx + 2]
        idx += 2
    dq_ref, dk_ref, dv_ref = refs[idx:idx + 3]
    dq_scr = refs[idx + 3]

    i_q = pl.program_id(1)
    i_k = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0) // num_heads

    @pl.when((i_q == 0) & (i_k == 0))
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when(i_k == 0)
    def _init_q():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        first_masked_col = i_q * block_q + q_offset + block_q
        if has_q_offsets:
            first_masked_col = first_masked_col + scalar_ref[1, b]
        run = i_k * block_k < first_masked_col
    if has_kv_len:
        run = run & (i_k * block_k < scalar_ref[0, b])

    def _compute(mask_kv, mask_causal):
        qs = q_ref[0]   # [bq, d], pre-scaled by scale*log2(e)
        k = k_ref[0]    # [bk, d]
        v = v_ref[0]
        do = do_ref[0]  # [bq, d]
        o = o_ref[0]

        t = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        if mask_kv or mask_causal or has_segments:
            t = _mask_scores(
                t, i_q, i_k, b, block_q=block_q, block_k=block_k,
                causal=causal, q_offset=q_offset, scalar_ref=scalar_ref,
                has_kv_len=has_kv_len, has_q_offsets=has_q_offsets,
                qseg_ref=qseg_ref, kseg_ref=kseg_ref,
                packed_mode=packed_mode, mask_kv=mask_kv,
                mask_causal=mask_causal)
        p = jnp.exp2(t - lse_ref[0][:, :1])      # [bq, bk]

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)  # [bq, 1]
        ds = p * (dp - delta)

        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        rows = pl.dslice(i_k * block_k, block_k)
        dv_ref[0, rows, :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, rows, :] += jax.lax.dot_general(
            ds.astype(qs.dtype), qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    need = None
    if causal:
        row0 = i_q * block_q + q_offset
        if has_q_offsets:
            row0 = row0 + scalar_ref[1, b]
        need = (i_k + 1) * block_k > row0 + 1
    if has_kv_len:
        kv_tail = (i_k + 1) * block_k > scalar_ref[0, b]
        need = kv_tail if need is None else (need | kv_tail)

    if need is None:
        @pl.when(run)
        def _go():
            _compute(has_kv_len, causal)
    else:
        @pl.when(run & need)
        def _masked():
            _compute(has_kv_len, causal)

        @pl.when(run & jnp.logical_not(need))
        def _clean():
            _compute(False, False)

    @pl.when(i_k == nk - 1)
    def _finish():
        dq_ref[0] = (dq_scr[:] * softmax_scale).astype(dq_ref.dtype)


# resident fp32 dk+dv budget for the fused backward: 2 * Lk * D * 4 B.
# 32k tokens x d128 = 33.5 MiB, BAGEL's 36,864-token packed-training
# shape = 37.7 MiB — together with the (512, 1024) fp32 score tiles
# (~8 MiB) both stay under the kernel's 100 MiB scoped-vmem limit.
_FUSED_KV_VMEM_BUDGET = 42 * 1024 * 1024


def _pick_block(length: int, pref: int) -> int:
    for c in (pref, 1024, 512, 256, 128):
        if c <= length and length % c == 0:
            return c
    return length


def flash_attention_bwd_padded(
    q: jnp.ndarray,    # [B, Lq, N, D] RAW (unscaled), Lq % 128 == 0
    k: jnp.ndarray,    # [B, Lk, N, D]
    v: jnp.ndarray,
    o: jnp.ndarray,    # forward output [B, Lq, N, D]
    lse: jnp.ndarray,  # [B*N, Lq, 128] exp2-domain lse from the forward
    do: jnp.ndarray,   # output cotangent [B, Lq, N, D]
    *,
    causal: bool = False,
    q_offset: int = 0,
    kv_len: Optional[jnp.ndarray] = None,
    q_segments: Optional[jnp.ndarray] = None,
    kv_segments: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    packed_mode: bool = False,
    q_offsets: Optional[jnp.ndarray] = None,
    fused: Optional[bool] = None,
):
    if interpret is None:
        interpret = _INTERPRET
    b, lq, n, d = q.shape
    lk = k.shape[1]
    block_q = _pick_block(lq, block_q)
    block_k = _pick_block(lk, block_k)
    assert not (packed_mode and (q_offset != 0 or q_offsets is not None)), \
        "packed_mode does not support q offsets"
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    qs = q * jnp.asarray(softmax_scale * math.log2(math.e), q.dtype)

    # per-kernel hybrid layout (see flash_attention_padded): a tensor
    # that the kernel RE-READS across its inner grid axis gets the
    # [B*N, L, D] fold (one-time transpose beats repeated strided DMA);
    # a tensor touched once stays the native [B, L, N*D] view. dq
    # re-reads k/v; dkv re-reads q/do/o; all gradient OUTPUTS are
    # written once and stay native.
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], d)

    def native(x):
        return x.reshape(b, x.shape[1], n * d)

    has_segments = q_segments is not None
    seg_inputs = []
    if has_segments:
        assert kv_segments is not None
        qseg = jax.lax.broadcast_in_dim(
            q_segments.astype(jnp.int32), (b, lq, 128), (0, 1))
        kseg = jax.lax.broadcast_in_dim(
            kv_segments.astype(jnp.int32), (b, 8, lk), (0, 2))
        seg_inputs = [qseg, kseg]

    has_kv_len = kv_len is not None
    has_q_offsets = q_offsets is not None
    has_scalars = has_kv_len or has_q_offsets
    scalars = None
    if has_scalars:
        scalars = jnp.stack([
            (kv_len if has_kv_len else jnp.full((b,), lk)).astype(jnp.int32),
            (q_offsets if has_q_offsets else jnp.zeros((b,))).astype(
                jnp.int32)])

    common = dict(
        num_heads=n, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, softmax_scale=softmax_scale,
        has_scalars=has_scalars, has_kv_len=has_kv_len,
        has_q_offsets=has_q_offsets, has_segments=has_segments,
        packed_mode=packed_mode)

    def vspec(bs, imap):
        return pl.BlockSpec(bs, imap, memory_space=pltpu.VMEM)

    # ---- fused one-pass (5 matmuls) when the resident fp32 dk+dv fit
    # VMEM; falls through to the two-pass kernels (7 matmuls) otherwise
    if fused is None:
        fused = 2 * lk * d * 4 <= _FUSED_KV_VMEM_BUDGET
    if fused:
        # v5e sweep at the 1.3B train shape (32,760 tok x 12 h x d128):
        # (512, 1024) 134.9 ms < (1024, 1024) 140.5 < (512, 2048) 148.1
        # < (256, 1024) 154.1 — the smaller q tile keeps the 4 fp32
        # score intermediates light next to the resident fp32 dk/dv
        fbq = min(block_q, 512)
        fbk = min(block_k, 1024)
        fbq = _pick_block(lq, fbq)
        fbk = _pick_block(lk, fbk)
        fcommon = dict(common, block_q=fbq, block_k=fbk)
        f_q = lambda ibn, iq, ik, *_, _n=n: (ibn // _n, iq, ibn % _n)
        f_k = lambda ibn, iq, ik, *_: (ibn, ik, 0)
        f_lse = lambda ibn, iq, ik, *_: (ibn, iq, 0)
        f_specs = [
            vspec((1, fbq, d), f_q),            # q (resident per iq)
            vspec((1, fbk, d), f_k),            # k (folded, re-read)
            vspec((1, fbk, d), f_k),            # v
            vspec((1, fbq, d), f_q),            # do
            vspec((1, fbq, d), f_q),            # o
            vspec((1, fbq, 128), f_lse),        # lse
        ]
        f_inputs = [native(qs), fold(k), fold(v), native(do), native(o),
                    lse]
        if has_segments:
            f_specs += [
                vspec((1, fbq, 128),
                      lambda ibn, iq, ik, *_, _n=n: (ibn // _n, iq, 0)),
                vspec((1, 8, fbk),
                      lambda ibn, iq, ik, *_, _n=n: (ibn // _n, 0, ik)),
            ]
            f_inputs += seg_inputs
        f_grid = (b * n, lq // fbq, lk // fbk)
        f_out_specs = (
            vspec((1, fbq, d), f_q),                       # dq
            vspec((1, lk, d), lambda ibn, iq, ik, *_: (ibn, 0, 0)),  # dk
            vspec((1, lk, d), lambda ibn, iq, ik, *_: (ibn, 0, 0)),  # dv
        )
        f_out_shapes = (
            jax.ShapeDtypeStruct((b, lq, n * d), q.dtype),
            jax.ShapeDtypeStruct((b * n, lk, d), jnp.float32),
            jax.ShapeDtypeStruct((b * n, lk, d), jnp.float32),
        )
        f_scratch = [pltpu.VMEM((fbq, d), jnp.float32)]
        f_cost = pl.CostEstimate(
            flops=5 * b * n * lq * lk * d,
            bytes_accessed=3 * q.size * q.dtype.itemsize
            + 2 * k.size * q.dtype.itemsize * (lq // fbq)
            + lse.size * 4 + 2 * b * n * lk * d * 4,
            transcendentals=b * n * lq * lk,
        )
        f_kernel = functools.partial(_flash_bwd_fused_kernel, **fcommon)
        f_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        if has_scalars:
            dqf, dkf, dvf = pl.pallas_call(
                f_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=f_grid, in_specs=f_specs,
                    out_specs=f_out_specs, scratch_shapes=f_scratch),
                out_shape=f_out_shapes, interpret=interpret,
                cost_estimate=f_cost, compiler_params=f_params,
            )(scalars, *f_inputs)
        else:
            dqf, dkf, dvf = pl.pallas_call(
                f_kernel, grid=f_grid, in_specs=f_specs,
                out_specs=f_out_specs, out_shape=f_out_shapes,
                scratch_shapes=f_scratch, interpret=interpret,
                cost_estimate=f_cost, compiler_params=f_params,
            )(*f_inputs)
        dq_out = dqf.reshape(b, lq, n, d)
        # dk accumulated against the PRE-SCALED q (see two-pass _finish)
        dk_out = (dkf * math.log(2.0)).astype(k.dtype).reshape(
            b, n, lk, d).transpose(0, 2, 1, 3)
        dv_out = dvf.astype(v.dtype).reshape(
            b, n, lk, d).transpose(0, 2, 1, 3)
        return dq_out, dk_out, dv_out

    # ---- dq: grid (B*N, nq, nk), kv innermost ----
    q_by_iq = lambda ibn, iq, ik, *_, _n=n: (ibn // _n, iq, ibn % _n)
    k_by_ik = lambda ibn, iq, ik, *_: (ibn, ik, 0)
    lse_by_iq = lambda ibn, iq, ik, *_: (ibn, iq, 0)
    dq_specs = [
        vspec((1, block_q, d), q_by_iq),
        vspec((1, block_k, d), k_by_ik),
        vspec((1, block_k, d), k_by_ik),
        vspec((1, block_q, d), q_by_iq),
        vspec((1, block_q, d), q_by_iq),
        vspec((1, block_q, 128), lse_by_iq),
    ]
    dq_inputs = [native(qs), fold(k), fold(v), native(do), native(o),
                 lse]
    if has_segments:
        dq_specs += [
            vspec((1, block_q, 128),
                  lambda ibn, iq, ik, *_, _n=n: (ibn // _n, iq, 0)),
            vspec((1, 8, block_k),
                  lambda ibn, iq, ik, *_, _n=n: (ibn // _n, 0, ik)),
        ]
        dq_inputs += seg_inputs

    # 5 matmuls of bq*bk*d per (iq, ik) step across fwd-recompute + grads
    bwd_cost = pl.CostEstimate(
        flops=5 * b * n * lq * lk * d,
        bytes_accessed=3 * q.size * q.dtype.itemsize
        + 2 * k.size * q.dtype.itemsize * (lq // block_q)
        + lse.size * 4,
        transcendentals=b * n * lq * lk,
    )

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, **common)
    dq_grid = (b * n, lq // block_q, lk // block_k)
    dq_out_spec = vspec((1, block_q, d), q_by_iq)
    dq_out_shape = jax.ShapeDtypeStruct((b, lq, n * d), q.dtype)
    dq_scratch = [pltpu.VMEM((block_q, d), jnp.float32)]
    if has_scalars:
        dqf = pl.pallas_call(
            dq_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=dq_grid, in_specs=dq_specs,
                out_specs=dq_out_spec, scratch_shapes=dq_scratch),
            out_shape=dq_out_shape, interpret=interpret,
            cost_estimate=bwd_cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                # the fused-rope prologue adds 4 fp32 table blocks +
                # a rotated-q scratch; at bq=2048/bk=1024 the default
                # 16 MiB scoped-vmem limit overflows by ~36 KiB on v5e
                vmem_limit_bytes=64 * 1024 * 1024),
        )(scalars, *dq_inputs)
    else:
        dqf = pl.pallas_call(
            dq_kernel, grid=dq_grid, in_specs=dq_specs,
            out_specs=dq_out_spec, out_shape=dq_out_shape,
            scratch_shapes=dq_scratch, interpret=interpret,
            cost_estimate=bwd_cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                # the fused-rope prologue adds 4 fp32 table blocks +
                # a rotated-q scratch; at bq=2048/bk=1024 the default
                # 16 MiB scoped-vmem limit overflows by ~36 KiB on v5e
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*dq_inputs)

    # ---- dk/dv: grid (B*N, nk, nq), q innermost ----
    q_by_inner = lambda ibn, ik, iq, *_: (ibn, iq, 0)
    k_by_outer = lambda ibn, ik, iq, *_, _n=n: (ibn // _n, ik, ibn % _n)
    lse_by_inner = lambda ibn, ik, iq, *_: (ibn, iq, 0)
    dkv_specs = [
        vspec((1, block_q, d), q_by_inner),
        vspec((1, block_k, d), k_by_outer),
        vspec((1, block_k, d), k_by_outer),
        vspec((1, block_q, d), q_by_inner),
        vspec((1, block_q, d), q_by_inner),
        vspec((1, block_q, 128), lse_by_inner),
    ]
    dkv_inputs = [fold(qs), native(k), native(v), fold(do), fold(o),
                  lse]
    if has_segments:
        dkv_specs += [
            vspec((1, block_q, 128),
                  lambda ibn, ik, iq, *_, _n=n: (ibn // _n, iq, 0)),
            vspec((1, 8, block_k),
                  lambda ibn, ik, iq, *_, _n=n: (ibn // _n, 0, ik)),
        ]
        dkv_inputs += seg_inputs

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, **common)
    dkv_grid = (b * n, lk // block_k, lq // block_q)
    dkv_out_specs = (vspec((1, block_k, d), k_by_outer),
                     vspec((1, block_k, d), k_by_outer))
    dkv_out_shapes = (jax.ShapeDtypeStruct((b, lk, n * d), k.dtype),
                      jax.ShapeDtypeStruct((b, lk, n * d), v.dtype))
    dkv_scratch = [pltpu.VMEM((block_k, d), jnp.float32),
                   pltpu.VMEM((block_k, d), jnp.float32)]
    if has_scalars:
        dkf, dvf = pl.pallas_call(
            dkv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=dkv_grid, in_specs=dkv_specs,
                out_specs=dkv_out_specs, scratch_shapes=dkv_scratch),
            out_shape=dkv_out_shapes, interpret=interpret,
            cost_estimate=bwd_cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                # the fused-rope prologue adds 4 fp32 table blocks +
                # a rotated-q scratch; at bq=2048/bk=1024 the default
                # 16 MiB scoped-vmem limit overflows by ~36 KiB on v5e
                vmem_limit_bytes=64 * 1024 * 1024),
        )(scalars, *dkv_inputs)
    else:
        dkf, dvf = pl.pallas_call(
            dkv_kernel, grid=dkv_grid, in_specs=dkv_specs,
            out_specs=dkv_out_specs, out_shape=dkv_out_shapes,
            scratch_shapes=dkv_scratch, interpret=interpret,
            cost_estimate=bwd_cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                # the fused-rope prologue adds 4 fp32 table blocks +
                # a rotated-q scratch; at bq=2048/bk=1024 the default
                # 16 MiB scoped-vmem limit overflows by ~36 KiB on v5e
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*dkv_inputs)

    def unfold(x, length):
        return x.reshape(b, length, n, d)

    return unfold(dqf, lq), unfold(dkf, lk), unfold(dvf, lk)
