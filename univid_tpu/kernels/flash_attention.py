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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


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
):
    idx = 0
    scalar_ref = None
    if has_scalars:
        scalar_ref = refs[idx]
        idx += 1
    q_ref, k_ref, v_ref = refs[idx:idx + 3]
    idx += 3
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref, kseg_ref = refs[idx:idx + 2]
        idx += 2
    o_ref = refs[idx]
    m_scr, l_scr, acc_scr = refs[idx + 1:idx + 4]

    i_q = pl.program_id(1)
    i_k = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0) // num_heads

    @pl.when(i_k == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: skip fully-masked kv blocks (static offset only — with a
    # dynamic per-batch offset every block may be live)
    run = True
    if causal and not has_q_offsets:
        first_masked_col = i_q * block_q + q_offset + block_q
        run = i_k * block_k < first_masked_col

    @pl.when(run)
    def _compute():
        q = q_ref[0]  # [bq, d] — softmax scale pre-folded by the wrapper
        k = k_ref[0]  # [bk, d]
        v = v_ref[0]  # [bk, d]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, bk]

        col = i_k * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            row = i_q * block_q + q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            if has_q_offsets:
                row = row + scalar_ref[1, b]
            s = jnp.where(col <= row, s, NEG_INF)
        if has_kv_len:
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

        # softmax runs in the exp2 domain: log2(e) is folded into the
        # q scale by the wrapper, so exp2 here == exp of raw scores and
        # the VPU skips exp's per-element ln2 multiply.
        m_prev = m_scr[:, :1]                       # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)                     # [bq, bk]
        corr = jnp.exp2(m_prev - m_new)             # [bq, 1]

        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc_scr[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[:] = acc

    @pl.when(i_k == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc_scr[:] * inv).astype(o_ref.dtype)


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
    interpret: bool = False,
    packed_mode: bool = False,
    q_offsets: Optional[jnp.ndarray] = None,    # [B] int32 dynamic causal
) -> jnp.ndarray:
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
    # fold the softmax scale AND log2(e) into q once (O(L*d)) instead of
    # scaling every [bq, bk] score tile inside the kernel (O(L^2)); the
    # kernel's softmax then runs in the exp2 domain
    q = q * jnp.asarray(softmax_scale * math.log2(math.e), q.dtype)

    # [B, L, N, D] -> [B*N, L, D]
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)

    grid = (b * n, lq // block_q, lk // block_k)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda ibn, iq, ik, *_: (ibn, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda ibn, iq, ik, *_: (ibn, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda ibn, iq, ik, *_: (ibn, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [qf, kf, vf]

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
        packed_mode=packed_mode)

    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),  # running max
        pltpu.VMEM((block_q, 128), jnp.float32),  # running denominator
        pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
    ]

    out_spec = pl.BlockSpec((1, block_q, d), lambda ibn, iq, ik, *_: (ibn, iq, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * n, lq, d), q.dtype)

    # scheduling hint: qk^T + pv matmul flops and the dominant q/k/v/o
    # HBM traffic (helps Mosaic pick pipeline depths)
    cost_estimate = pl.CostEstimate(
        flops=4 * b * n * lq * lk * d,
        bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize
        + (b * n * lq * d) * qf.dtype.itemsize
        + (kf.size + vf.size) * qf.dtype.itemsize * (lq // block_q - 1),
        transcendentals=b * n * lq * lk,
    )

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
                dimension_semantics=("parallel", "parallel", "arbitrary")),
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
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(*inputs)

    return out.reshape(b, n, lq, d).transpose(0, 2, 1, 3)
