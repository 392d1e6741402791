"""3D rotary position embedding for video DiTs.

Semantics match reference models/wan/utils/modules/model.py:27-66:

  * The per-head channel dim d is split into (t, h, w) bands of half-sizes
    [c - 2*(c//3), c//3, c//3] where c = d // 2 (for d=128: 22/21/21).
  * Angles are theta^{-2i/d_band} * position, applied to adjacent
    (even, odd) channel pairs.
  * The reference computes in complex128; we build tables in numpy float64
    and apply with fp32 sin/cos pairs (validated against a float64 oracle
    in tests/test_rope.py).

Tables are precomputed per (F, H, W) grid — grids are static per size
bucket (core.config.SIZE_CONFIGS), so this happens once per compilation.
For sequence-parallel sharding, slice the [L, c] tables along L with the
shard's global token offsets before passing in (reference
sequence_parallel.py:50-55 does the same per-rank slice).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def rope_dim_split(head_dim: int) -> Tuple[int, int, int]:
    """Half-channel band sizes (t, h, w); matches model.py:43 and :400-404."""
    c = head_dim // 2
    return (c - 2 * (c // 3), c // 3, c // 3)


def rope_angles_1d(max_len: int, half_dim: int, theta: float = 10000.0
                   ) -> np.ndarray:
    """[max_len, half_dim] float64 rotation angles."""
    inv = theta ** (-np.arange(0, half_dim, dtype=np.float64) / half_dim)
    return np.outer(np.arange(max_len, dtype=np.float64), inv)


def build_rope_3d(head_dim: int, grid: Tuple[int, int, int],
                  theta: float = 10000.0, dtype=jnp.float32
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for a flattened (F, H, W) token grid.

    Returns (cos, sin), each [F*H*W, head_dim//2].
    """
    f, h, w = grid
    ct, ch, cw = rope_dim_split(head_dim)
    ang_t = rope_angles_1d(f, ct, theta)            # [F, ct]
    ang_h = rope_angles_1d(h, ch, theta)            # [H, ch]
    ang_w = rope_angles_1d(w, cw, theta)            # [W, cw]

    full = np.concatenate([
        np.broadcast_to(ang_t[:, None, None, :], (f, h, w, ct)),
        np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ch)),
        np.broadcast_to(ang_w[None, None, :, :], (f, h, w, cw)),
    ], axis=-1).reshape(f * h * w, head_dim // 2)

    return (jnp.asarray(np.cos(full), dtype=dtype),
            jnp.asarray(np.sin(full), dtype=dtype))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """Rotate adjacent channel pairs.

    x:   [..., L, N, D]  (or [..., L, D] with N folded in — cos/sin must
         broadcast against [..., L, 1, D//2])
    cos/sin: [L, D//2]

    Matches the complex multiply in model.py:51-61: for each pair
    (x_even, x_odd): (x_e*cosθ - x_o*sinθ, x_e*sinθ + x_o*cosθ).
    Rotation happens in fp32 regardless of input dtype.
    """
    orig_dtype = x.dtype
    *lead, n, d = x.shape
    # swap-multiply form: y = x * cosF + swap_pairs(x) * sinF with
    # cosF = repeat(cos, 2) and sinF = interleave(-sin, +sin) — the
    # identical products/sums as the (ye, yo)+stack formulation
    # (bitwise-equal in fp32) but without a stack/concatenate op in the
    # per-layer graph (profiled at ~29 ms/step on the 1.3B as an
    # unfused concat); the pair swap lowers to a cheap lane reverse.
    cf = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)        # [L, D]
    sf = jnp.stack([-sin.astype(jnp.float32),
                    sin.astype(jnp.float32)], axis=-1)
    sf = sf.reshape(*sin.shape[:-1], d)                         # [L, D]
    xf = x.astype(jnp.float32)
    sw = xf.reshape(*lead, n, d // 2, 2)[..., ::-1]
    sw = sw.reshape(*lead, n, d)
    y = xf * cf[..., :, None, :] + sw * sf[..., :, None, :]
    return y.astype(orig_dtype)
