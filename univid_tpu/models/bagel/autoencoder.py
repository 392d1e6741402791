"""FLUX-style 2D image VAE (BAGEL's generation latent space).

Behavioral parity with reference models/BAGEL/modeling/autoencoder.py
(AutoEncoder: GroupNorm-swish ResnetBlocks, single-head attention at the
bottleneck, 8x downsample, z=16, scale 0.3611 / shift 0.1159 at :290-360).
Channels-last [B, H, W, C] for TPU; deterministic encode returns the mean
(DiagonalGaussian sample=False path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn


@dataclass(frozen=True)
class ImageVAEConfig:
    resolution: int = 256
    in_channels: int = 3
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def conv2d(x, p, *, stride=1, padding="SAME"):
    w, b = p["w"], p.get("b")
    kh, kw = w.shape[:2]
    if padding == "SAME":
        pads = [((kh - 1) // 2, (kh - 1) // 2),
                ((kw - 1) // 2, (kw - 1) // 2)]
    elif padding == "RB":  # flux Downsample pad (0,1,0,1)
        pads = [(0, 1), (0, 1)]
    else:
        pads = padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(x, p, groups=32, eps=1e-6):
    b, h, w, c = x.shape
    groups = min(groups, c)
    x32 = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.square(x32 - mean).mean(axis=(1, 2, 4), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv_init(key, kh, kw, cin, cout, dtype):
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) \
        / np.sqrt(kh * kw * cin)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _gn_init(c, dtype):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _res_init(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _gn_init(cin, dtype),
         "conv1": _conv_init(k1, 3, 3, cin, cout, dtype),
         "norm2": _gn_init(cout, dtype),
         "conv2": _conv_init(k2, 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["shortcut"] = _conv_init(k3, 1, 1, cin, cout, dtype)
    return p


def _res_block(p, x):
    h = group_norm(x, p["norm1"])
    h = conv2d(_swish(h), p["conv1"])
    h = group_norm(h, p["norm2"])
    h = conv2d(_swish(h), p["conv2"])
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"])
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {"norm": _gn_init(c, dtype),
            "q": _conv_init(ks[0], 1, 1, c, c, dtype),
            "k": _conv_init(ks[1], 1, 1, c, c, dtype),
            "v": _conv_init(ks[2], 1, 1, c, c, dtype),
            "proj": _conv_init(ks[3], 1, 1, c, c, dtype)}


def _attn_block(p, x):
    b, h, w, c = x.shape
    y = group_norm(x, p["norm"])
    q = conv2d(y, p["q"]).reshape(b, h * w, c).astype(jnp.float32)
    k = conv2d(y, p["k"]).reshape(b, h * w, c).astype(jnp.float32)
    v = conv2d(y, p["v"]).reshape(b, h * w, c).astype(jnp.float32)
    s = jnp.einsum("bqc,bkc->bqk", q, k) / np.sqrt(c)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", a, v).reshape(b, h, w, c)
    return x + conv2d(o.astype(x.dtype), p["proj"])


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_image_vae(key, cfg: ImageVAEConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    ch = cfg.ch
    mults = cfg.ch_mult
    n_levels = len(mults)

    enc = {"conv_in": _conv_init(next(keys), 3, 3, cfg.in_channels, ch,
                                 param_dtype)}
    block_in = ch
    for i in range(n_levels):
        level = {}
        block_in = ch * ((1,) + tuple(mults))[i]
        block_out = ch * mults[i]
        for j in range(cfg.num_res_blocks):
            level[f"res{j}"] = _res_init(next(keys), block_in, block_out,
                                         param_dtype)
            block_in = block_out
        if i != n_levels - 1:
            level["down"] = _conv_init(next(keys), 3, 3, block_in,
                                       block_in, param_dtype)
        enc[f"down{i}"] = level
    enc["mid_res1"] = _res_init(next(keys), block_in, block_in, param_dtype)
    enc["mid_attn"] = _attn_init(next(keys), block_in, param_dtype)
    enc["mid_res2"] = _res_init(next(keys), block_in, block_in, param_dtype)
    enc["norm_out"] = _gn_init(block_in, param_dtype)
    enc["conv_out"] = _conv_init(next(keys), 3, 3, block_in,
                                 2 * cfg.z_channels, param_dtype)

    block_in = ch * mults[-1]
    dec = {"conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels,
                                 block_in, param_dtype)}
    dec["mid_res1"] = _res_init(next(keys), block_in, block_in, param_dtype)
    dec["mid_attn"] = _attn_init(next(keys), block_in, param_dtype)
    dec["mid_res2"] = _res_init(next(keys), block_in, block_in, param_dtype)
    for i in reversed(range(n_levels)):
        level = {}
        block_out = ch * mults[i]
        for j in range(cfg.num_res_blocks + 1):
            level[f"res{j}"] = _res_init(next(keys), block_in, block_out,
                                         param_dtype)
            block_in = block_out
        if i != 0:
            level["up"] = _conv_init(next(keys), 3, 3, block_in, block_in,
                                     param_dtype)
        dec[f"up{i}"] = level
    dec["norm_out"] = _gn_init(block_in, param_dtype)
    dec["conv_out"] = _conv_init(next(keys), 3, 3, block_in, cfg.out_ch,
                                 param_dtype)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def image_vae_encode(params, cfg: ImageVAEConfig, x: jnp.ndarray
                     ) -> jnp.ndarray:
    """[B, H, W, 3] in [-1,1] -> scaled latent mean [B, H/8, W/8, z]."""
    enc = params["encoder"]
    h = conv2d(x, enc["conv_in"])
    for i in range(len(cfg.ch_mult)):
        level = enc[f"down{i}"]
        for j in range(cfg.num_res_blocks):
            h = _res_block(level[f"res{j}"], h)
        if "down" in level:
            h = conv2d(h, level["down"], stride=2, padding="RB")
    h = _res_block(enc["mid_res1"], h)
    h = _attn_block(enc["mid_attn"], h)
    h = _res_block(enc["mid_res2"], h)
    h = group_norm(h, enc["norm_out"])
    h = conv2d(_swish(h), enc["conv_out"])
    mean = h[..., :cfg.z_channels]
    return cfg.scale_factor * (mean - cfg.shift_factor)


def image_vae_decode(params, cfg: ImageVAEConfig, z: jnp.ndarray
                     ) -> jnp.ndarray:
    """scaled latent [B, h, w, z] -> image [B, H, W, 3]."""
    z = z / cfg.scale_factor + cfg.shift_factor
    dec = params["decoder"]
    h = conv2d(z, dec["conv_in"])
    h = _res_block(dec["mid_res1"], h)
    h = _attn_block(dec["mid_attn"], h)
    h = _res_block(dec["mid_res2"], h)
    for i in reversed(range(len(cfg.ch_mult))):
        level = dec[f"up{i}"]
        for j in range(cfg.num_res_blocks + 1):
            h = _res_block(level[f"res{j}"], h)
        if "up" in level:
            b, hh, ww, c = h.shape
            h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                 (b, hh, 2, ww, 2, c)) \
                .reshape(b, hh * 2, ww * 2, c)
            h = conv2d(h, level["up"])
    h = group_norm(h, dec["norm_out"])
    return conv2d(_swish(h), dec["conv_out"])
