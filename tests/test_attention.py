"""XLA attention backend semantics vs a naive numpy oracle, plus the
Pallas flash kernel in interpret mode vs the XLA reference (so the kernel
code path — scale/log2e folding, exp2 softmax, masking, online-softmax
corrections — is exercised in CPU CI, not just on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from univid_tpu.kernels.attention import mha_reference
from univid_tpu.kernels.flash_attention import flash_attention_padded


def naive(q, k, v, causal=False, q_offset=0, kv_len=None, q_seg=None,
          k_seg=None):
    b, lq, n, d = q.shape
    lk = k.shape[1]
    out = np.zeros_like(q, dtype=np.float64)
    for bi in range(b):
        for ni in range(n):
            s = q[bi, :, ni].astype(np.float64) @ \
                k[bi, :, ni].astype(np.float64).T / np.sqrt(d)
            mask = np.ones((lq, lk), bool)
            if causal:
                rows = np.arange(lq)[:, None] + q_offset
                mask &= np.arange(lk)[None, :] <= rows
            if kv_len is not None:
                mask &= np.arange(lk)[None, :] < kv_len[bi]
            if q_seg is not None:
                mask &= q_seg[bi][:, None] == k_seg[bi][None, :]
            s = np.where(mask, s, -np.inf)
            with np.errstate(invalid="ignore"):
                p = np.exp(s - s.max(axis=-1, keepdims=True))
                p = np.nan_to_num(p / p.sum(axis=-1, keepdims=True))
            out[bi, :, ni] = p @ v[bi, :, ni].astype(np.float64)
    return out


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_full():
    q, k, v = (_rand((2, 17, 3, 8), i) for i in range(3))
    got = np.asarray(mha_reference(*map(jnp.asarray, (q, k, v))))
    np.testing.assert_allclose(got, naive(q, k, v), rtol=1e-4, atol=1e-5)


def test_kv_len_and_causal():
    q, k, v = (_rand((2, 16, 2, 8), i) for i in range(3))
    kvl = np.asarray([9, 16], np.int32)
    got = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), kv_len=jnp.asarray(kvl)))
    np.testing.assert_allclose(got, naive(q, k, v, kv_len=kvl), rtol=1e-4,
                               atol=1e-5)
    got = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), causal=True))
    np.testing.assert_allclose(got, naive(q, k, v, causal=True), rtol=1e-4,
                               atol=1e-5)


def test_decode_offset():
    q = _rand((1, 1, 2, 8), 0)
    k, v = (_rand((1, 12, 2, 8), i) for i in (1, 2))
    got = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), causal=True, q_offset=7))
    np.testing.assert_allclose(got, naive(q, k, v, causal=True, q_offset=7),
                               rtol=1e-4, atol=1e-5)


def test_segments():
    q, k, v = (_rand((1, 12, 2, 8), i) for i in range(3))
    seg = np.asarray([[0] * 5 + [1] * 4 + [2] * 3])
    got = np.asarray(mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_segments=jnp.asarray(seg), kv_segments=jnp.asarray(seg)))
    np.testing.assert_allclose(got, naive(q, k, v, q_seg=seg, k_seg=seg),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["full", "kv_len", "causal", "segments"])
def test_pallas_kernel_interpret_matches_reference(mode):
    """flash_attention_padded (interpret mode) == mha_reference."""
    b, lq, lk, n, d = 2, 256, 512, 2, 64
    q = jnp.asarray(_rand((b, lq, n, d), 0))
    k = jnp.asarray(_rand((b, lk, n, d), 1))
    v = jnp.asarray(_rand((b, lk, n, d), 2))
    kw = {}
    if mode == "kv_len":
        kw["kv_len"] = jnp.asarray([300, 512], jnp.int32)
    elif mode == "causal":
        q = q[:, :lk]  # square for causal
        kw["causal"] = True
    elif mode == "segments":
        qs = np.zeros((b, lq), np.int32)
        qs[:, 100:] = 1
        ks = np.zeros((b, lk), np.int32)
        ks[:, 200:] = 1
        kw["q_segments"] = jnp.asarray(qs)
        kw["kv_segments"] = jnp.asarray(ks)

    ref = mha_reference(q, k, v, **kw)
    got = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                 interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_kernel_dynamic_q_offsets():
    """Causal with per-batch dynamic offset (BAGEL cached prefill) in
    interpret mode vs the XLA reference."""
    b, lq, lk, n, d = 2, 128, 256, 2, 32
    q = jnp.asarray(_rand((b, lq, n, d), 0))
    k = jnp.asarray(_rand((b, lk, n, d), 1))
    v = jnp.asarray(_rand((b, lk, n, d), 2))
    offs = jnp.asarray([37, 101], jnp.int32)
    kvl = jnp.asarray([37 + 128, 101 + 128], jnp.int32)
    ref = mha_reference(q, k, v, causal=True, q_offsets=offs, kv_len=kvl)
    got = flash_attention_padded(q, k, v, causal=True, q_offsets=offs,
                                 kv_len=kvl, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Backward-kernel grad parity (interpret mode) vs jax.grad of mha_reference
# ---------------------------------------------------------------------------

import jax

from univid_tpu.kernels.attention import (
    attention, pack_mask_codes, set_attention_backend)
from univid_tpu.kernels import flash_attention as fa


def _grad_case(mode, b=2, lq=256, lk=256, n=2, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, lq, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, n, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, lq, n, d)), jnp.float32)
    kw = {}
    if mode == "causal":
        kw["causal"] = True
    elif mode == "kv_len":
        kw["kv_len"] = jnp.asarray([130, lk], jnp.int32)
    elif mode == "causal_kv_len":
        kw["causal"] = True
        kw["kv_len"] = jnp.asarray([130, lk], jnp.int32)
    elif mode == "segments":
        qs = np.zeros((b, lq), np.int32)
        qs[:, lq // 2:] = 1
        ks = np.zeros((b, lk), np.int32)
        ks[:, lk // 3:] = 1
        kw["q_segments"] = jnp.asarray(qs)
        kw["kv_segments"] = jnp.asarray(ks)
    elif mode == "packed":
        # two documents; second has a full-attn (vit-like) span and a noise
        # span — the BAGEL packed-training mask
        doc = np.zeros((b, lq), np.int32)
        doc[:, lq // 2:] = 1
        fn = np.full((b, lq), -1, np.int32)
        fn[:, lq // 2:lq // 2 + 40] = 0
        nz = np.full((b, lq), -1, np.int32)
        nz[:, -30:] = 0
        codes = pack_mask_codes(doc, fn, nz)
        kw["q_segments"] = codes
        kw["kv_segments"] = codes
        kw["packed_mode"] = True
    return q, k, v, g, kw


@pytest.mark.parametrize("fused", [True, False],
                         ids=["fused-one-pass", "two-pass"])
@pytest.mark.parametrize(
    "mode", ["full", "causal", "kv_len", "causal_kv_len", "segments",
             "packed"])
def test_flash_backward_grad_parity(mode, fused):
    """Pallas backward kernels (interpret) == jax.grad of the XLA
    reference — both the fused one-pass kernel (VMEM-resident dk/dv)
    and the two-pass dq/dkv fallback for long-kv shapes."""
    q, k, v, g, kw = _grad_case(mode)

    def ref_loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, **kw) * g)

    dq_ref, dk_ref, dv_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    o, lse = flash_attention_padded(
        q, k, v, block_q=128, block_k=128, interpret=True,
        save_residuals=True, **kw)
    dq, dk, dv = fa.flash_attention_bwd_padded(
        q, k, v, o, lse, g, block_q=128, block_k=128, interpret=True,
        fused=fused, **kw)

    for got, ref, name in ((dq, dq_ref, "dq"), (dk, dk_ref, "dk"),
                           (dv, dv_ref, "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_attention_custom_vjp_wiring_with_padding():
    """attention() on the pallas backend is differentiable end-to-end,
    including the pad/unpad adjoint for non-block-multiple lengths."""
    q, k, v, g, _ = _grad_case("full", b=1, lq=100, lk=150, n=2, d=32)
    kvl = jnp.asarray([150], jnp.int32)

    def loss(backend):
        set_attention_backend(backend)
        try:
            def f(q, k, v):
                return jnp.sum(attention(q, k, v, kv_len=kvl) * g)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            set_attention_backend(None)

    fa.set_interpret_mode(True)
    try:
        got = loss("pallas")
    finally:
        fa.set_interpret_mode(False)
    ref = loss("xla")
    for a, b_, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_softmax_bf16_variant_close():
    """Opt-in bf16-softmax kernel (exp2 on bf16 after max-subtraction):
    measured +4-5% on the v5e 33k shape, mean rel err ~0.2% vs the f32
    softmax — same order as the bf16 PV matmul. Off by default."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from univid_tpu.kernels.flash_attention import flash_attention_padded

    b, l, n, d = 1, 256, 2, 128
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(jax.random.PRNGKey(0), 3))
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True)
    bf = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, softmax_bf16=True)
    rel = (np.abs(np.asarray(base) - np.asarray(bf)).mean()
           / np.abs(np.asarray(base)).mean())
    assert rel < 0.02, rel


def test_fused_rope_prologue_matches_xla_rope():
    """Kernel-prologue rope (interpret) == XLA apply_rope + plain
    flash: same fp32 rotation values, bf16-cast at the same point."""
    import jax
    import jax.numpy as jnp

    from univid_tpu.kernels.flash_attention import (
        build_fused_rope_tables, flash_attention_padded)
    from univid_tpu.ops.rope import build_rope_3d, apply_rope

    b, l, n, d = 2, 256, 4, 128
    key = jax.random.PRNGKey(11)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    cos, sin = build_rope_3d(d, (4, 8, 8))
    qr = apply_rope(q, cos, sin)
    kr = apply_rope(k, cos, sin)
    ref = flash_attention_padded(qr, kr, v, block_q=128, block_k=128,
                                 interpret=True)
    tabs = build_fused_rope_tables(cos, sin, d)
    out = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                 interpret=True, rope_tables=tabs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_rope_with_kv_len_and_padding():
    """Fused rope composes with the wrapper's padding + kv_len mask
    (the production Wan self-attention configuration)."""
    import jax
    import jax.numpy as jnp

    from univid_tpu.kernels import flash_attention as fa
    from univid_tpu.kernels.attention import attention, mha_reference
    from univid_tpu.ops.rope import build_rope_3d, apply_rope

    b, l, n, d = 1, 250, 4, 128   # unpadded odd length
    key = jax.random.PRNGKey(12)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    cos, sin = build_rope_3d(d, (10, 5, 5))
    kv_len = jnp.array([l - 9], jnp.int32)
    ref = mha_reference(apply_rope(q, cos, sin),
                        apply_rope(k, cos, sin), v, kv_len=kv_len)
    tabs = fa.build_fused_rope_tables(cos, sin, d)
    fa.set_interpret_mode(True)
    try:
        out = attention(q, k, v, kv_len=kv_len, block_q=128,
                        block_k=128, rope_tables=tabs)
    finally:
        fa.set_interpret_mode(False)
    np.testing.assert_allclose(np.asarray(out)[:, :l - 9],
                               np.asarray(ref)[:, :l - 9],
                               rtol=2e-5, atol=2e-5)


def test_qk_int8_variant_close():
    """int8 QK^T kernel (per-row q / per-block k symmetric scales,
    SageAttention-style) vs the exact fp32-score kernel: rel err ~1% on
    qk-normed inputs (the Wan case — RMS-normalized q/k rows bound the
    per-block k scale). Off by default — MEASURED SLOWER than bf16 on
    v5e at the 1.3B kernel shape (head_dim=128 contraction is a single
    MXU pass either way; see core/dtypes.py). Correctness stays tested
    so the knob remains sound for hardware where it pays."""
    import jax
    import jax.numpy as jnp

    b, l, n, d = 2, 256, 2, 128
    key = jax.random.PRNGKey(5)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    # qk-norm rows like the Wan DiT (rms_norm before rope)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * d ** 0.5
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * d ** 0.5
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True)
    qi = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, qk_int8=True)
    rel = (np.abs(np.asarray(base) - np.asarray(qi)).mean()
           / np.abs(np.asarray(base)).mean())
    assert rel < 0.03, rel


def test_qk_int8_with_kv_len_and_fused_rope():
    """qk_int8 composes with the fused-rope prologue and kv_len
    masking: quantization happens on the ROTATED tiles and masked
    columns stay exactly excluded (NEG_INF applied to the rescaled
    fp32 scores, not the int8 operands)."""
    import jax
    import jax.numpy as jnp

    from univid_tpu.kernels.flash_attention import build_fused_rope_tables
    from univid_tpu.ops.rope import build_rope_3d

    b, l, n, d = 2, 256, 2, 128
    key = jax.random.PRNGKey(6)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    cos, sin = build_rope_3d(d, (4, 8, 8))
    tabs = build_fused_rope_tables(cos, sin, d)
    kv_len = jnp.array([200, 97], jnp.int32)
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True, rope_tables=tabs,
                                  kv_len=kv_len)
    qi = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, rope_tables=tabs,
                                kv_len=kv_len, qk_int8=True)
    a, bq_ = np.asarray(base), np.asarray(qi)
    rel = np.abs(a - bq_).mean() / np.abs(a).mean()
    assert rel < 0.03, rel
    # a fully-masked tail column range must be identical (zeros path):
    # rows attend only within kv_len, so outputs for batch 1 rows match
    # between the two kernels where p underflows identically — sanity
    # check finiteness everywhere instead of exact equality
    assert np.isfinite(bq_).all()

def test_bounded_softmax_exact():
    """Bounded-softmax kernel (static score bound instead of a running
    max) == the dynamic-max kernel to fp32 rounding: the softmax
    reference point is pinned at a proven upper bound and the constant
    cancels in acc/l — exact math, not an approximation."""
    import jax
    import jax.numpy as jnp
    import math

    b, l, n, d = 2, 256, 2, 128
    key = jax.random.PRNGKey(7)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    # qk-normed rows (the Wan case): row norm == sqrt(d)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * d ** 0.5
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * d ** 0.5
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True)
    # folded-domain bound: raw |q.k| <= d, x softmax_scale * log2(e)
    fb = jnp.float32(1.01 * d * (1.0 / d ** 0.5) * math.log2(math.e))
    bd = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, score_bound=fb)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_bounded_softmax_with_fused_rope_and_kv_len():
    """score_bound composes with the fused-rope prologue (rope preserves
    row norms, so the bound holds post-rotation) and kv_len masking
    (NEG_INF scores underflow exp2 to 0 without a running max). Also
    checks the save_residuals lse (= bound + log2(l)) against the
    dynamic-max kernel's."""
    import jax
    import jax.numpy as jnp
    import math

    from univid_tpu.kernels.flash_attention import build_fused_rope_tables
    from univid_tpu.ops.rope import build_rope_3d

    b, l, n, d = 2, 256, 2, 128
    key = jax.random.PRNGKey(8)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * d ** 0.5
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * d ** 0.5
    cos, sin = build_rope_3d(d, (4, 8, 8))
    tabs = build_fused_rope_tables(cos, sin, d)
    kv_len = jnp.array([200, 97], jnp.int32)
    fb = jnp.float32(1.01 * d * (1.0 / d ** 0.5) * math.log2(math.e))
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True, rope_tables=tabs,
                                  kv_len=kv_len)
    bd = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, rope_tables=tabs,
                                kv_len=kv_len, score_bound=fb)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    ob, lseb = flash_attention_padded(
        q, k, v, block_q=128, block_k=128, interpret=True,
        kv_len=kv_len, save_residuals=True)
    od, lsed = flash_attention_padded(
        q, k, v, block_q=128, block_k=128, interpret=True,
        kv_len=kv_len, save_residuals=True, score_bound=fb)
    np.testing.assert_allclose(np.asarray(od), np.asarray(ob),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lsed), np.asarray(lseb),
                               rtol=1e-5, atol=1e-5)


def test_bounded_softmax_dit_forward_parity():
    """bounded_softmax policy on a tiny DiT (pallas interpret backend,
    so the real per-layer gain-derived bounds flow into the kernel for
    both self- and cross-attention) == default policy output."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import univid_tpu.kernels.flash_attention as fa
    from univid_tpu.core.dtypes import DTypePolicy
    from univid_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                           wan_dit_forward)
    from univid_tpu.ops.rope import build_rope_3d

    cfg = WanDiTConfig(dim=256, ffn_dim=512, num_heads=2, num_layers=2,
                       in_dim=16, out_dim=16, text_dim=32, freq_dim=32,
                       text_len=8, patch_size=(1, 2, 2), qk_norm=True,
                       cross_attn_norm=True)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg,
                          param_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8, 16),
                          jnp.float32)
    t = jnp.array([500.0], jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32),
                            jnp.float32)
    pol = DTypePolicy(compute_dtype=jnp.float32)

    cos, sin = build_rope_3d(cfg.dim // cfg.num_heads, (4, 4, 4))

    def run(policy):
        set_attention_backend("pallas")
        fa.set_interpret_mode(True)
        try:
            return wan_dit_forward(params, cfg, x, t, ctx, cos, sin,
                                   policy=policy)
        finally:
            fa.set_interpret_mode(False)
            set_attention_backend(None)

    base = run(pol)
    bd = run(dataclasses.replace(pol, bounded_softmax=True))
    np.testing.assert_allclose(np.asarray(bd), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_bounded_softmax_grad_parity():
    """attention() with score_bound is differentiable through the
    custom_vjp (bounded forward's lse feeds the same recompute-p
    backward; d(out)/d(bound) == 0) and matches the XLA grads."""
    import jax

    q, k, v, g, _ = _grad_case("full", b=1, lq=128, lk=128, n=2, d=128)
    # qk-normed rows so the bound d is valid
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * 128.0 ** 0.5
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * 128.0 ** 0.5
    sb = jnp.float32(1.01 * 128.0)

    def loss(backend, bound):
        set_attention_backend(backend)
        try:
            def f(q, k, v):
                return jnp.sum(attention(q, k, v, score_bound=bound) * g)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            set_attention_backend(None)

    fa.set_interpret_mode(True)
    try:
        got = loss("pallas", sb)
    finally:
        fa.set_interpret_mode(False)
    ref = loss("xla", None)
    for a, b_, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_cache_rot_k_matches_per_visit_rotation():
    """cache_rot_k (rotate each k tile once at i_q == 0 into a VMEM
    cache) == the per-(i_q, i_k)-visit rotation path, including kv_len
    tails and composition with the bounded softmax."""
    import jax
    import math

    from univid_tpu.kernels.flash_attention import build_fused_rope_tables
    from univid_tpu.ops.rope import build_rope_3d

    b, l, n, d = 2, 512, 2, 128
    key = jax.random.PRNGKey(9)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    cos, sin = build_rope_3d(d, (8, 8, 8))
    tabs = build_fused_rope_tables(cos, sin, d)
    kv_len = jnp.array([400, 129], jnp.int32)
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True, rope_tables=tabs,
                                  kv_len=kv_len)
    kc = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, rope_tables=tabs,
                                kv_len=kv_len, cache_rot_k=True)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    # a realistic folded bound: raw |q.k| max for these gaussian rows is
    # well under 80, folded 80 * scale * log2e ~ 10.2 — near the actual
    # score max so p stays in normal fp32 range (a trivially-huge bound
    # would underflow BOTH paths to zeros and prove nothing)
    fb = jnp.float32(80.0 * (1.0 / d ** 0.5) * math.log2(math.e))
    both = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True, rope_tables=tabs,
                                  kv_len=kv_len, cache_rot_k=True,
                                  score_bound=fb)
    bd = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                interpret=True, rope_tables=tabs,
                                kv_len=kv_len, score_bound=fb)
    assert float(jnp.abs(both).max()) > 0  # non-degenerate comparison
    np.testing.assert_allclose(np.asarray(both), np.asarray(bd),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_q_fold_layout_matches_hybrid():
    """Folded q/out layout (q_fold, auto-on for single-kv-block calls
    with a long q loop) == the hybrid layout, incl. save_residuals."""
    b, lq, lk, n, d = 2, 1024, 128, 2, 128
    q = jnp.asarray(_rand((b, lq, n, d), 0))
    k = jnp.asarray(_rand((b, lk, n, d), 1))
    v = jnp.asarray(_rand((b, lk, n, d), 2))
    base = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True, q_fold=False)
    fold = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                  interpret=True, q_fold=True)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(base),
                               rtol=1e-6, atol=1e-6)
    ob, lb = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                    interpret=True, q_fold=False,
                                    save_residuals=True)
    of, lf = flash_attention_padded(q, k, v, block_q=128, block_k=128,
                                    interpret=True, q_fold=True,
                                    save_residuals=True)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ob),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lb),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("use_kvlen", [False, True])
@pytest.mark.parametrize("bound", [None, 16.0])
def test_cross_kernel_matches_generic(use_kvlen, bound):
    """Single-kv-block dispatch (_cross_kernel, auto for cross-attention
    shapes) == the generic grid (forced via explicit q_fold)."""
    b, lq, lk, n, d = 2, 1024, 256, 3, 128
    q = jnp.asarray(_rand((b, lq, n, d), 3))
    k = jnp.asarray(_rand((b, lk, n, d), 4))
    v = jnp.asarray(_rand((b, lk, n, d), 5))
    kv_len = jnp.asarray([256, 100], jnp.int32) if use_kvlen else None
    sb = None
    if bound is not None:
        # folded-domain bound (scale * log2e applied by the wrapper)
        import math
        sb = jnp.float32(bound / math.sqrt(d) * math.log2(math.e))
    base = flash_attention_padded(q, k, v, block_q=256, block_k=256,
                                  kv_len=kv_len, score_bound=sb,
                                  interpret=True, q_fold=False)
    fast = flash_attention_padded(q, k, v, block_q=256, block_k=256,
                                  kv_len=kv_len, score_bound=sb,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_cross_kernel_zero_kv_len_rows():
    """A batch row with kv_len == 0 must produce zeros (matches the
    generic kernel's l == 0 guard), not nan."""
    b, lq, lk, n, d = 2, 512, 128, 2, 128
    q = jnp.asarray(_rand((b, lq, n, d), 6))
    k = jnp.asarray(_rand((b, lk, n, d), 7))
    v = jnp.asarray(_rand((b, lk, n, d), 8))
    kv_len = jnp.asarray([0, 128], jnp.int32)
    out = flash_attention_padded(q, k, v, block_q=256, block_k=128,
                                 kv_len=kv_len, interpret=True)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out[0], 0.0)
    ref = flash_attention_padded(q, k, v, block_q=256, block_k=128,
                                 kv_len=kv_len, interpret=True,
                                 q_fold=False)
    np.testing.assert_allclose(out[1], np.asarray(ref)[1],
                               rtol=2e-5, atol=2e-5)
