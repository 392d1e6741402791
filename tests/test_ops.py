"""Unit tests for ops: RoPE, embeddings, TMA schedule, CFG."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core.config import TMAConfig
from univid_tpu.ops import (
    apply_rope,
    build_rope_3d,
    rope_dim_split,
    sinusoidal_embedding_1d,
    tma_schedule_weights,
    apply_text_weight,
    classifier_free_guidance,
)


def rope_oracle(x, grid, head_dim, theta=10000.0):
    """float64 oracle with the reference's complex formulation
    (model.py:27-66), written independently from the math."""
    f, h, w = grid
    c = head_dim // 2
    ct, ch, cw = rope_dim_split(head_dim)

    def freqs_1d(n, half):
        inv = theta ** (-np.arange(0, half, dtype=np.float64) / half)
        ang = np.outer(np.arange(n), inv)
        return np.exp(1j * ang)

    ft = freqs_1d(f, ct)[:, None, None, :]
    fh = freqs_1d(h, ch)[None, :, None, :]
    fw = freqs_1d(w, cw)[None, None, :, :]
    freqs = np.concatenate([
        np.broadcast_to(ft, (f, h, w, ct)),
        np.broadcast_to(fh, (f, h, w, ch)),
        np.broadcast_to(fw, (f, h, w, cw)),
    ], axis=-1).reshape(f * h * w, 1, c)

    b, l, n, d = x.shape
    xc = x.astype(np.float64).reshape(b, l, n, c, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    yc = xc * freqs[None]
    y = np.stack([yc.real, yc.imag], axis=-1).reshape(b, l, n, d)
    return y


def test_rope_dim_split():
    assert rope_dim_split(128) == (22, 21, 21)
    assert sum(rope_dim_split(128)) == 64


@pytest.mark.parametrize("grid", [(2, 3, 4), (5, 4, 6)])
def test_rope3d_matches_complex_oracle(grid):
    head_dim = 128
    rng = np.random.default_rng(0)
    l = grid[0] * grid[1] * grid[2]
    x = rng.standard_normal((2, l, 4, head_dim)).astype(np.float32)
    cos, sin = build_rope_3d(head_dim, grid)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    want = rope_oracle(x, grid, head_dim)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_rope_preserves_norm():
    grid = (3, 4, 4)
    l = 48
    x = np.random.default_rng(1).standard_normal((1, l, 2, 64)).astype(
        np.float32)
    cos, sin = build_rope_3d(64, grid)
    y = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_sinusoidal_embedding():
    dim = 256
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0])
    e = np.asarray(sinusoidal_embedding_1d(dim, t))
    assert e.shape == (4, dim)
    # position 0: cos=1, sin=0
    np.testing.assert_allclose(e[0, :128], 1.0, atol=1e-6)
    np.testing.assert_allclose(e[0, 128:], 0.0, atol=1e-6)
    # oracle for arbitrary position
    half = dim // 2
    inv = np.power(10000.0, -np.arange(half) / half)
    want = np.concatenate([np.cos(500.0 * inv), np.sin(500.0 * inv)])
    np.testing.assert_allclose(e[2], want, rtol=1e-4, atol=1e-5)


def test_tma_schedule_cosine():
    cfg = TMAConfig(weight_max=1.3, weight_min=1.0, schedule="cosine",
                    transition_ratio=0.4)
    w = tma_schedule_weights(cfg, 50)
    assert w.shape == (50,)
    assert math.isclose(w[0], 1.3, abs_tol=1e-6)  # progress 0 -> max
    assert np.all(w[20:] == 1.0)  # after 40% of steps -> min
    assert np.all(np.diff(w[:20]) <= 1e-7)  # monotone decreasing
    # midpoint of transition: cos factor 0.5
    assert math.isclose(w[10], 1.15, abs_tol=1e-6)


def test_tma_schedule_linear_and_disabled():
    cfg = TMAConfig(schedule="linear", transition_ratio=0.4)
    w = tma_schedule_weights(cfg, 10)
    np.testing.assert_allclose(w[:4], [1.3, 1.225, 1.15, 1.075], atol=1e-6)
    off = tma_schedule_weights(TMAConfig(enabled=False), 10)
    assert np.all(off == 1.0)


def test_apply_text_weight():
    ctx = jnp.ones((2, 8, 4))
    out = np.asarray(apply_text_weight(ctx, 1.3, 4))
    np.testing.assert_allclose(out[:, :4], 1.3, rtol=1e-6)
    np.testing.assert_allclose(out[:, 4:], 1.0, rtol=1e-6)


def test_cfg():
    c = jnp.asarray([2.0])
    u = jnp.asarray([1.0])
    np.testing.assert_allclose(
        np.asarray(classifier_free_guidance(c, u, 5.0)), [6.0])
