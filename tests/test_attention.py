"""XLA attention backend semantics vs a naive numpy oracle.

(The Pallas kernel itself is validated against mha_reference on real TPU;
see bench/tpu smoke. Here we pin the shared semantics.)"""

import numpy as np
import jax.numpy as jnp

from univid_tpu.kernels.attention import mha_reference


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
