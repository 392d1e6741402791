"""Face conditioning blocks for WanAnimate.

Behavioral parity with reference
models/wan/utils/modules/animate/face_blocks.py:
  * FaceEncoder (:129-177): per-frame motion vectors [B, T, 512] through
    a causal Conv1d pyramid (k=3; widths 1024*heads -> 1024, two stride-2
    stages => T -> ceil-ish T/4), affine-free LayerNorms + SiLU, a linear
    out_proj to the DiT hidden size, heads folded back as a token axis,
    plus one learned padding token appended -> [B, T_lat, heads+1, dim].
  * FaceBlock (:297-380): per-latent-frame cross attention — the video
    tokens of latent frame j attend that frame's motion tokens; RMS
    qk-norm (affine, eps 1e-6), affine-free pre-LayerNorms, packed KV
    projection. Output is the residual the model adds every 5th block
    (model_animate.py:365-371).

JAX redesign: causal conv1d as jnp padding + lax conv; the per-frame
grouping is a reshape (frames are contiguous in the f-major token
raster), so one batched attention call covers all frames.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ....core import nn
from ....kernels.attention import attention


def causal_conv1d(p, x, stride=1):
    """x [B, T, C] -> [B, T', C']; left 'replicate' padding of k-1
    (face_blocks.py:112-126)."""
    k = p["w"].shape[0]
    left = jnp.repeat(x[:, :1], k - 1, axis=1)
    x = jnp.concatenate([left, x], axis=1)
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + p["b"]


def _ln_no_affine(x, eps=1e-6):
    return nn.layer_norm(x, eps=eps)


def init_face_encoder(key, in_dim: int, hidden_dim: int, num_heads: int = 4,
                      width: int = 1024, dtype=jnp.float32) -> Dict:
    """width=1024 in the reference (face_blocks.py:133-137); 
    parameterized for tiny test configs."""
    ks = iter(jax.random.split(key, 8))

    def conv(cin, cout, k=3):
        kk = next(ks)
        w = jax.random.normal(kk, (k, cin, cout), dtype) \
            * (1.0 / math.sqrt(k * cin))
        return {"w": w, "b": jnp.zeros((cout,), dtype)}

    return {
        "conv1_local": conv(in_dim, width * num_heads),
        "conv2": conv(width, width),
        "conv3": conv(width, width),
        "out_proj": nn.linear_init(next(ks), width, hidden_dim,
                                   dtype=dtype),
        "padding_tokens": jnp.zeros((1, 1, 1, hidden_dim), dtype),
    }


def face_encoder_forward(params, x: jnp.ndarray, num_heads: int = 4
                         ) -> jnp.ndarray:
    """[B, T, in_dim] -> [B, T_lat, heads+1, hidden]
    (FaceEncoder.forward, :150-177)."""
    n = num_heads
    b, t, _ = x.shape
    h = causal_conv1d(params["conv1_local"], x)        # [B, T, width*n]
    width = h.shape[-1] // n
    h = h.reshape(b, t, n, width).transpose(0, 2, 1, 3) \
        .reshape(b * n, t, width)                      # (b n) t c
    h = jax.nn.silu(_ln_no_affine(h))
    h = causal_conv1d(params["conv2"], h, stride=2)
    h = jax.nn.silu(_ln_no_affine(h))
    h = causal_conv1d(params["conv3"], h, stride=2)
    h = jax.nn.silu(_ln_no_affine(h))
    h = nn.linear(params["out_proj"], h)               # [(b n), t', d]
    tl = h.shape[1]
    h = h.reshape(b, n, tl, -1).transpose(0, 2, 1, 3)  # [B, t', n, d]
    pad = jnp.broadcast_to(params["padding_tokens"],
                           (b, tl, 1, h.shape[-1])).astype(h.dtype)
    return jnp.concatenate([h, pad], axis=2)


def init_face_block(key, hidden_size: int, heads_num: int,
                    dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 4))
    hd = hidden_size // heads_num
    return {
        "linear1_kv": nn.linear_init(next(ks), hidden_size,
                                     hidden_size * 2, dtype=dtype),
        "linear1_q": nn.linear_init(next(ks), hidden_size, hidden_size,
                                    dtype=dtype),
        "linear2": nn.linear_init(next(ks), hidden_size, hidden_size,
                                  dtype=dtype),
        "q_norm": jnp.ones((hd,), dtype),
        "k_norm": jnp.ones((hd,), dtype),
    }


def face_block_forward(params, x: jnp.ndarray, motion_vec: jnp.ndarray,
                       heads_num: int, motion_mask=None,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """x [B, T_lat * S, dim] (f-major token raster), motion_vec
    [B, T_lat, N, dim] -> residual [B, T_lat * S, dim]
    (FaceBlock.forward, :334-381)."""
    b, l_total, c = x.shape
    bt, t_lat, n_tok, _ = motion_vec.shape
    s = l_total // t_lat
    hd = c // heads_num

    x_motion = _ln_no_affine(motion_vec.astype(compute_dtype))
    x_feat = _ln_no_affine(x.astype(compute_dtype))

    kv = nn.linear(params["linear1_kv"], x_motion,
                   compute_dtype=compute_dtype)
    q = nn.linear(params["linear1_q"], x_feat,
                  compute_dtype=compute_dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(b, t_lat, s, heads_num, hd)
    k = k.reshape(b, t_lat, n_tok, heads_num, hd)
    v = v.reshape(b, t_lat, n_tok, heads_num, hd)
    q = nn.rms_norm(q, params["q_norm"].astype(compute_dtype), eps=1e-6)
    k = nn.rms_norm(k, params["k_norm"].astype(compute_dtype), eps=1e-6)

    # one batched call: (B*T_lat) groups of S queries over N motion tokens
    o = attention(q.reshape(b * t_lat, s, heads_num, hd),
                  k.reshape(b * t_lat, n_tok, heads_num, hd),
                  v.reshape(b * t_lat, n_tok, heads_num, hd))
    o = o.reshape(b, l_total, c)
    out = nn.linear(params["linear2"], o, compute_dtype=compute_dtype)
    if motion_mask is not None:
        out = out * motion_mask.reshape(b, -1)[..., None]
    return out
