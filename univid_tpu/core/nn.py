"""Minimal functional NN layer library (param-dict style).

Models in this framework are pure functions over nested dict param trees:
explicit control over sharding annotations, checkpoint ingestion from torch
layouts, and jit-stable carried state (e.g. the video VAE's streaming cache)
without framework magic.

Conventions:
  * Linear weights are stored [in, out] (JAX convention; transposed from
    torch's [out, in] at checkpoint-ingestion time).
  * Matmuls run in the policy compute dtype with fp32 accumulation.
  * Norms compute statistics in fp32 and cast back.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def linear_init(key, in_dim, out_dim, *, bias=True, init="xavier", std=0.02,
                dtype=jnp.float32):
    if init == "xavier":
        w = xavier_uniform(key, (in_dim, out_dim), dtype)
    elif init == "normal":
        w = normal_init(key, (in_dim, out_dim), std, dtype)
    elif init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def linear(p, x, *, compute_dtype=None):
    """Dense layer over {'w': [in, out], 'b'?: [out]} params.

    Also accepts int8 weight-only quantized params from core/quant.py:
    {'qw': int8 [in, out], 'scale': f32 [out]} — the dequant (cast +
    per-output-channel scale) fuses into the dot's weight read, so HBM
    weight traffic halves vs bf16. Memory-bound paths (AR decode) speed
    up proportionally."""
    if "qw8" in p:
        # dynamic-activation int8 (W8A8): runs the dot on the int8 MXU
        # path (~2x bf16 on v5e) — see core/quant.py
        from .quant import w8a8_linear
        return w8a8_linear(p, x, compute_dtype=compute_dtype)
    if "qw" in p:
        dt = compute_dtype or x.dtype
        x = x.astype(dt)
        # dequant in f32 (int8 values are exact in f32; the scale mul
        # stays full precision) then cast once for the MXU
        w = (p["qw"].astype(jnp.float32)
             * p["scale"].astype(jnp.float32)).astype(dt)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if "b" in p:
            y = y + p["b"].astype(jnp.float32)
        return y.astype(dt)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype if compute_dtype is None else compute_dtype)


def layer_norm(x, *, weight=None, bias=None, eps=1e-6):
    """fp32-statistics layer norm (reference WanLayerNorm, model.py:88-98)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(dtype)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def rms_norm(x, weight, *, eps=1e-5):
    """fp32-statistics RMS norm (reference WanRMSNorm, model.py:69-85)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1,
                                     keepdims=True) + eps)
    return y.astype(dtype) * weight


def l2_normalize_rms(x, gamma, *, bias=None, axis=-1):
    """F.normalize-style RMS norm used in the video VAE (vae2_2.py:45-59):
    unit-normalize along `axis`, scale by sqrt(dim) * gamma (+ bias)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    scale = x.shape[axis] ** 0.5
    y = (x32 / jnp.maximum(norm, 1e-12)) * scale
    y = y.astype(x.dtype) * gamma
    if bias is not None:
        y = y + bias
    return y


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def mlp_init(key, dims: Tuple[int, ...], *, bias=True, init="xavier",
             std=0.02, dtype=jnp.float32):
    """Stack of linears: dims = (in, hidden..., out)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"fc{i}": linear_init(k, dims[i], dims[i + 1], bias=bias, init=init,
                              std=std, dtype=dtype)
        for i, k in enumerate(keys)
    }


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)
