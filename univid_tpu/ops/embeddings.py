"""Timestep / positional embeddings."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] sinusoidal embedding.

    Matches reference model.py:14-24: sinusoid = outer(pos,
    10000^{-i/half}), output = concat([cos, sin]) (cos first). Computed in
    fp32 (reference uses float64 then casts; validated in tests).
    """
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32)
    inv = jnp.asarray(
        np.power(10000.0, -np.arange(half, dtype=np.float64) / half),
        dtype=jnp.float32)
    sinusoid = pos[..., None] * inv
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)


def sincos_2d(dim: int, h: int, w: int) -> np.ndarray:
    """2D sin-cos position embedding (reference modeling_utils.py:127-143).

    Returns [h*w, dim] float32 (half for height, half for width; each half
    is [sin | cos] over dim//4 frequencies).
    """
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))

    def emb_1d(pos):
        out = np.einsum("m,d->md", pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    emb = np.concatenate([emb_1d(gy.reshape(-1)), emb_1d(gx.reshape(-1))],
                         axis=1)
    return emb.astype(np.float32)
