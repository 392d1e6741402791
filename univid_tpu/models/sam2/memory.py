"""SAM2 memory subsystem: memory encoder + RoPE memory attention.

TPU-native re-implementation of the streaming-memory half of the SAM2
video predictor the reference preprocess drives via the pip `sam2`
package (video_predictor.py:14-157, propagate_in_video). Two pieces:

  * memory encoder — fuses the current frame's 64x64 image feature with
    its predicted mask (sigmoid-scaled 20x-10 or binarized on clicked
    frames, matching sam_utils.py:141 binarize_mask_from_pts_for_mem_enc)
    into a compact 64-d memory map: strided mask downsampler (4x
    conv/LN/GELU, total stride 16), two ConvNeXt-style CXBlocks, 1x1 out
    projection.
  * memory attention — 4 pre-norm layers; self-attention over the
    current frame's 4096 tokens and cross-attention into the
    concatenated memory bank, both with 2D axial RoPE over the 64x64
    grid (theta 10000); the trailing object-pointer tokens are excluded
    from rotary (num_k_exclude_rope), exactly the published semantics.

Pinned from the published SAM2.1-L configuration: d_model 256, 1 head,
dim_feedforward 2048, ReLU, memory dim 64, pos_enc_at_input with the
0.1x query-position residual.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from .hiera import conv2d, _conv_init, sine_pos_encoding
from .sam_heads import _ln_init, _ln


@dataclass(frozen=True)
class MemoryConfig:
    d_model: int = 256
    mem_dim: int = 64
    num_layers: int = 4
    num_heads: int = 1
    dim_feedforward: int = 2048
    rope_theta: float = 10000.0
    feat_size: int = 64                  # memory grid side
    mask_downsample_layers: int = 4      # total stride 16
    fuser_layers: int = 2
    sigmoid_scale: float = 20.0
    sigmoid_bias: float = -10.0


# ---------------------------------------------------------------- encoder

def init_memory_encoder(key, cfg: MemoryConfig, param_dtype=jnp.float32):
    d = cfg.d_model
    keys = iter(jax.random.split(key, cfg.mask_downsample_layers
                                 + cfg.fuser_layers + 4))
    downs, cin = [], 1
    for _ in range(cfg.mask_downsample_layers):
        cout = cin * 4                  # stride^2 channel growth
        downs.append({"conv": _conv_init(next(keys), 3, 3, cin, cout,
                                         param_dtype),
                      "ln": _ln_init(cout, param_dtype)})
        cin = cout
    p = {
        "mask_down": downs,
        "mask_down_final": _conv_init(next(keys), 1, 1, cin, d,
                                      param_dtype),
        "pix_feat_proj": _conv_init(next(keys), 1, 1, d, d, param_dtype),
        "fuser": [],
        "out_proj": _conv_init(next(keys), 1, 1, d, cfg.mem_dim,
                               param_dtype),
    }
    for _ in range(cfg.fuser_layers):
        ks = iter(jax.random.split(next(keys), 3))
        p["fuser"].append({
            # CXBlock: 7x7 depthwise conv, LN, pw 4x expand, GELU,
            # pw project, 1e-6 layer scale, residual
            "dwconv": _conv_init(next(ks), 7, 7, 1, d, param_dtype),
            "norm": _ln_init(d, param_dtype),
            "pwconv1": nn.linear_init(next(ks), d, 4 * d,
                                      dtype=param_dtype),
            "pwconv2": nn.linear_init(next(ks), 4 * d, d,
                                      dtype=param_dtype),
            "gamma": jnp.full((d,), 1e-6, param_dtype),
        })
    return p


def _cx_block(p, x):
    inp = x
    # depthwise: HWIO with I=1, groups=C
    x = conv2d(x, p["dwconv"]["w"].astype(x.dtype),
               p["dwconv"]["b"].astype(x.dtype), padding=3,
               groups=x.shape[-1])
    x = _ln(p["norm"], x)
    x = nn.linear(p["pwconv1"], x)
    x = jax.nn.gelu(x, approximate=False)
    x = nn.linear(p["pwconv2"], x)
    return inp + p["gamma"].astype(x.dtype) * x


def memory_encoder_forward(p, cfg: MemoryConfig, pix_feat: jnp.ndarray,
                           mask_logits: jnp.ndarray, *,
                           binarize: bool):
    """pix_feat [B, g, g, d] (stride-16 image feature), mask_logits
    [B, G, G, 1] at input-image resolution. Returns (mem [B, g, g, 64],
    mem_pos [g, g, 64])."""
    if binarize:
        m = (mask_logits > 0).astype(pix_feat.dtype)
    else:
        m = jax.nn.sigmoid(mask_logits).astype(pix_feat.dtype)
    m = m * cfg.sigmoid_scale + cfg.sigmoid_bias
    for layer in p["mask_down"]:
        m = conv2d(m, layer["conv"]["w"].astype(m.dtype),
                   layer["conv"]["b"].astype(m.dtype), stride=2,
                   padding=1)
        m = _ln(layer["ln"], m)
        m = jax.nn.gelu(m, approximate=False)
    m = conv2d(m, p["mask_down_final"]["w"].astype(m.dtype),
               p["mask_down_final"]["b"].astype(m.dtype))
    x = conv2d(pix_feat, p["pix_feat_proj"]["w"].astype(pix_feat.dtype),
               p["pix_feat_proj"]["b"].astype(pix_feat.dtype))
    x = x + m
    for blk in p["fuser"]:
        x = _cx_block(blk, x)
    x = conv2d(x, p["out_proj"]["w"].astype(x.dtype),
               p["out_proj"]["b"].astype(x.dtype))
    pos = sine_pos_encoding(x.shape[1], x.shape[2], cfg.mem_dim, x.dtype)
    return x, pos


# ----------------------------------------------------------- rope attn

def axial_rope_freqs(cfg: MemoryConfig, head_dim: int) -> jnp.ndarray:
    """[g*g, head_dim/2] complex rotations: first half x-axis, second
    half y-axis frequencies (published compute_axial_cis)."""
    g = cfg.feat_size
    quarter = head_dim // 4
    freqs = 1.0 / (cfg.rope_theta **
                   (np.arange(0, head_dim, 4)[:quarter] / head_dim))
    idx = np.arange(g * g)
    tx, ty = idx % g, idx // g
    ang_x = np.outer(tx, freqs)
    ang_y = np.outer(ty, freqs)
    ang = np.concatenate([ang_x, ang_y], axis=-1)
    return jnp.asarray(np.exp(1j * ang).astype(np.complex64))


def _apply_rope(x, freqs):
    """x [B, H, N, hd] with N == freqs.shape[0] * k (grid repeats)."""
    b, h, n, hd = x.shape
    xc = x.astype(jnp.float32).reshape(b, h, n, hd // 2, 2)
    xc = jax.lax.complex(xc[..., 0], xc[..., 1])
    g = freqs.shape[0]
    f = jnp.tile(freqs, (n // g, 1)) if n != g else freqs
    out = xc * f[None, None]
    out = jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
    return out.reshape(b, h, n, hd).astype(x.dtype)


def _rope_attn_init(key, d, internal, dtype, kv_in=None):
    kv_in = kv_in or d
    ks = iter(jax.random.split(key, 4))
    return {"q": nn.linear_init(next(ks), d, internal, dtype=dtype),
            "k": nn.linear_init(next(ks), kv_in, internal, dtype=dtype),
            "v": nn.linear_init(next(ks), kv_in, internal, dtype=dtype),
            "o": nn.linear_init(next(ks), internal, d, dtype=dtype)}


def _rope_attn(p, cfg: MemoryConfig, freqs, q, k, v, *,
               num_k_exclude_rope: int = 0, key_mask=None,
               compute_dtype=None):
    """RoPEAttention: rotary on q and on all k except the trailing
    `num_k_exclude_rope` tokens (object pointers). k positions repeat
    the 64x64 grid per memory frame (rope_k_repeat). `key_mask` [K] bool
    masks out padded bank slots — the fixed-capacity TPU replacement for
    the reference's ragged python-dict memory bank."""
    q = nn.linear(p["q"], q, compute_dtype=compute_dtype)
    k = nn.linear(p["k"], k, compute_dtype=compute_dtype)
    v = nn.linear(p["v"], v, compute_dtype=compute_dtype)
    b, nq, c = q.shape
    nk = k.shape[1]
    heads = cfg.num_heads
    hd = c // heads
    qh = q.reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, heads, hd).transpose(0, 2, 1, 3)
    qh = _apply_rope(qh, freqs)
    n_rot = nk - num_k_exclude_rope
    if num_k_exclude_rope > 0:
        kh = jnp.concatenate(
            [_apply_rope(kh[:, :, :n_rot], freqs), kh[:, :, n_rot:]],
            axis=2)
    else:
        kh = _apply_rope(kh, freqs)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    if key_mask is not None:
        logits = jnp.where(key_mask[None, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return nn.linear(p["o"], out, compute_dtype=compute_dtype)


def init_memory_attention(key, cfg: MemoryConfig,
                          param_dtype=jnp.float32):
    d = cfg.d_model
    layers = []
    keys = iter(jax.random.split(key, cfg.num_layers + 1))
    for _ in range(cfg.num_layers):
        ks = iter(jax.random.split(next(keys), 4))
        layers.append({
            "self_attn": _rope_attn_init(next(ks), d, d, param_dtype),
            "cross_attn": _rope_attn_init(next(ks), d, d, param_dtype,
                                          kv_in=cfg.mem_dim),
            "linear1": nn.linear_init(next(ks), d, cfg.dim_feedforward,
                                      dtype=param_dtype),
            "linear2": nn.linear_init(next(ks), cfg.dim_feedforward, d,
                                      dtype=param_dtype),
            "norm1": _ln_init(d, param_dtype),
            "norm2": _ln_init(d, param_dtype),
            "norm3": _ln_init(d, param_dtype),
        })
    return {"layers": layers, "norm": _ln_init(d, param_dtype)}


def memory_attention_forward(p, cfg: MemoryConfig, curr, curr_pos,
                             memory, memory_pos, *,
                             num_obj_ptr_tokens: int = 0,
                             key_mask=None, compute_dtype=None):
    """curr [B, 4096, 256] stride-16 tokens + sine positions; memory
    [B, M, 64] concatenated maskmem tokens (+ trailing object-pointer
    tokens); returns conditioned [B, 4096, 256]."""
    freqs = axial_rope_freqs(cfg, cfg.d_model // cfg.num_heads)
    x = curr + 0.1 * curr_pos            # pos_enc_at_input
    for layer in p["layers"]:
        y = _ln(layer["norm1"], x)
        x = x + _rope_attn(layer["self_attn"], cfg, freqs, y, y, y,
                           compute_dtype=compute_dtype)
        y = _ln(layer["norm2"], x)
        x = x + _rope_attn(layer["cross_attn"], cfg, freqs, y,
                           memory + memory_pos, memory,
                           num_k_exclude_rope=num_obj_ptr_tokens,
                           key_mask=key_mask,
                           compute_dtype=compute_dtype)
        y = _ln(layer["norm3"], x)
        y = nn.linear(layer["linear2"], jax.nn.relu(
            nn.linear(layer["linear1"], y, compute_dtype=compute_dtype)),
            compute_dtype=compute_dtype)
        x = x + y
    return _ln(p["norm"], x)
