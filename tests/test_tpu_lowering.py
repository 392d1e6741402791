"""Cross-platform TPU lowering of the Pallas kernels, on CPU-only CI.

`jax.export` with platforms=['tpu'] runs the full Pallas->Mosaic lowering
pipeline without TPU hardware, so any primitive the TPU backend cannot
lower (e.g. `rev`, which the fused-rope prologue's original swap-pairs
slice emitted and which only surfaced when bench.py hit real hardware)
fails HERE instead of one round later on the driver's bench run.

Interpret-mode tests (test_attention.py) prove numerics; these prove the
kernels actually compile for the target. Shapes are tiny but use the real
head_dim (128) and block sizes of the hot paths.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from univid_tpu.kernels.flash_attention import (
    build_fused_rope_tables,
    flash_attention_bwd_padded,
    flash_attention_padded,
)

D = 128  # every production head_dim (Wan 1.3B/5B/A14B, BAGEL-7B) is 128


def _qkv(b=1, lq=512, lk=512, n=2, d=D, dtype=jnp.bfloat16):
    q = jnp.zeros((b, lq, n, d), dtype)
    k = jnp.zeros((b, lk, n, d), dtype)
    v = jnp.zeros((b, lk, n, d), dtype)
    return q, k, v


def _lower_tpu(fn, *args):
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


def test_fwd_plain_lowers():
    q, k, v = _qkv()
    _lower_tpu(functools.partial(flash_attention_padded, block_q=256,
                                 block_k=512, interpret=False), q, k, v)


def test_fwd_fused_rope_kv_len_lowers():
    # the Wan denoise hot path: fused rope prologue + kv_len tail mask
    q, k, v = _qkv()
    cos = jnp.ones((512, D // 2), jnp.float32)
    sin = jnp.zeros((512, D // 2), jnp.float32)
    tabs = build_fused_rope_tables(cos, sin, D)
    kv_len = jnp.full((1,), 500, jnp.int32)
    _lower_tpu(
        functools.partial(flash_attention_padded, block_q=256, block_k=512,
                          rope_tables=tabs, kv_len=kv_len, interpret=False),
        q, k, v)


def test_fwd_bf16_softmax_fused_rope_lowers():
    # the --bf16_softmax opt-in knob riding the fused-rope serving path
    # (measured slower than fp32 at the 1.3B shape, kept for other
    # geometries — must still lower)
    q, k, v = _qkv()
    cos = jnp.ones((512, D // 2), jnp.float32)
    sin = jnp.zeros((512, D // 2), jnp.float32)
    tabs = build_fused_rope_tables(cos, sin, D)
    kv_len = jnp.full((1,), 500, jnp.int32)
    _lower_tpu(
        functools.partial(flash_attention_padded, block_q=256, block_k=512,
                          rope_tables=tabs, kv_len=kv_len,
                          softmax_bf16=True, interpret=False),
        q, k, v)


def test_fwd_causal_dynamic_offsets_lowers():
    # BAGEL AR decode config: causal + per-batch dynamic q offsets
    q, k, v = _qkv(lq=256, lk=1024)
    offs = jnp.array([512], jnp.int32)
    kv_len = jnp.array([768], jnp.int32)
    _lower_tpu(
        functools.partial(flash_attention_padded, block_q=256, block_k=512,
                          causal=True, q_offsets=offs, kv_len=kv_len,
                          interpret=False), q, k, v)


def test_fwd_packed_segments_lowers():
    # BAGEL packed-training config: segment ids + packed mask codes
    b, l = 1, 512
    q, k, v = _qkv(lq=l, lk=l)
    qseg = jnp.ones((b, l), jnp.int32)
    kseg = jnp.ones((b, l), jnp.int32)
    _lower_tpu(
        functools.partial(flash_attention_padded, block_q=256, block_k=512,
                          q_segments=qseg, kv_segments=kseg,
                          packed_mode=True, interpret=False), q, k, v)


@pytest.mark.parametrize("fused", [True, False],
                         ids=["fused-one-pass", "two-pass"])
@pytest.mark.parametrize("causal", [False, True])
def test_bwd_kernels_lower(causal, fused):
    # both backward paths directly (the custom_vjp in kernels.attention
    # routes grads here): the fused one-pass kernel (dynamic-slice
    # accumulation into VMEM-resident dk/dv out blocks) and the two-pass
    # dq/dkv fallback; also covers the residual-saving forward
    q, k, v = _qkv()

    def fwd_and_bwd(q, k, v):
        o, lse = flash_attention_padded(q, k, v, block_q=256, block_k=512,
                                        causal=causal, save_residuals=True,
                                        interpret=False)
        g = jnp.ones_like(o)
        return flash_attention_bwd_padded(q, k, v, o, lse, g, causal=causal,
                                          fused=fused, interpret=False)

    _lower_tpu(fwd_and_bwd, q, k, v)


def test_bwd_fused_packed_kv_len_lowers():
    # fused backward with the BAGEL packed mask + a kv_len tail — the
    # config the packed-training path differentiates through
    b, l = 1, 512
    q, k, v = _qkv(lq=l, lk=l)
    qseg = jnp.ones((b, l), jnp.int32)
    kseg = jnp.ones((b, l), jnp.int32)
    kv_len = jnp.full((b,), 500, jnp.int32)

    def fwd_and_bwd(q, k, v):
        kw = dict(q_segments=qseg, kv_segments=kseg, packed_mode=True,
                  kv_len=kv_len, interpret=False)
        o, lse = flash_attention_padded(q, k, v, block_q=256, block_k=512,
                                        save_residuals=True, **kw)
        g = jnp.ones_like(o)
        return flash_attention_bwd_padded(q, k, v, o, lse, g, fused=True,
                                          **kw)

    _lower_tpu(fwd_and_bwd, q, k, v)
