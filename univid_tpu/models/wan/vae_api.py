"""Wan2.2 video VAE: parameter init + public encode/decode.

Mirrors Wan2_2_VAE (vae2_2.py:888-1051): spatial patchify p=2, per-channel
latent mean/std normalization, deterministic encode (mu), decode clamped to
[-1, 1]. Streaming chunking (1 + 4k pixel frames encode / per-latent-frame
decode, vae2_2.py:783-839) runs as first-chunk + `lax.scan`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ...core.config import WanVAEConfig
from .vae import (
    Stream,
    _dec_dims,
    _enc_dims,
    causal_conv_stream,
    decoder_forward,
    encoder_forward,
)

# Per-channel latent statistics of the pretrained Wan2.2 VAE
# (vae2_2.py:904-1012) — model data constants, required for checkpoint
# parity. latents are normalized as (mu - mean) / std.
WAN22_LATENT_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
], dtype=np.float32)

WAN22_LATENT_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
], dtype=np.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv3d_init(key, kt, kh, kw, cin, cout, dtype):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), dtype) \
        * (1.0 / np.sqrt(fan_in))
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _res_block_init(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": jnp.ones((cin,), dtype),
        "conv1": _conv3d_init(k1, 3, 3, 3, cin, cout, dtype),
        "norm2": jnp.ones((cout,), dtype),
        "conv2": _conv3d_init(k2, 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv3d_init(k3, 1, 1, 1, cin, cout, dtype)
    return p


def _attn_block_init(key, c, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm": jnp.ones((c,), dtype),
        "qkv": nn.linear_init(k1, c, 3 * c, dtype=dtype),
        "proj": nn.linear_init(k2, c, c, init="zeros", dtype=dtype),
    }


def init_wan_vae(key, cfg: WanVAEConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    px = cfg.spatial_patch
    in_ch = 3 * px * px
    enc_dims = _enc_dims(cfg)
    dec_dims = _dec_dims(cfg)
    z2 = cfg.z_dim * 2

    enc = {"conv1": _conv3d_init(next(keys), 3, 3, 3, in_ch, enc_dims[0],
                                 param_dtype)}
    for i in range(len(cfg.dim_mult)):
        cin, cout = enc_dims[i], enc_dims[i + 1]
        t_down = cfg.temporal_downsample[i] if i < len(
            cfg.temporal_downsample) else False
        down_flag = i != len(cfg.dim_mult) - 1
        sp = {}
        for j in range(cfg.num_res_blocks):
            sp[f"res{j}"] = _res_block_init(next(keys),
                                            cin if j == 0 else cout, cout,
                                            param_dtype)
        if down_flag:
            sp["resample"] = {
                "w": jax.random.normal(next(keys), (3, 3, cout, cout),
                                       param_dtype) / np.sqrt(9 * cout),
                "b": jnp.zeros((cout,), param_dtype)}
            if t_down:
                sp["time_conv"] = _conv3d_init(next(keys), 3, 1, 1, cout,
                                               cout, param_dtype)
        enc[f"down{i}"] = sp
    c_mid = enc_dims[-1]
    enc["mid_res1"] = _res_block_init(next(keys), c_mid, c_mid, param_dtype)
    enc["mid_attn"] = _attn_block_init(next(keys), c_mid, param_dtype)
    enc["mid_res2"] = _res_block_init(next(keys), c_mid, c_mid, param_dtype)
    enc["head_norm"] = jnp.ones((c_mid,), param_dtype)
    enc["head_conv"] = _conv3d_init(next(keys), 3, 3, 3, c_mid, z2,
                                    param_dtype)

    dec = {"conv1": _conv3d_init(next(keys), 3, 3, 3, cfg.z_dim,
                                 dec_dims[0], param_dtype)}
    dec["mid_res1"] = _res_block_init(next(keys), dec_dims[0], dec_dims[0],
                                      param_dtype)
    dec["mid_attn"] = _attn_block_init(next(keys), dec_dims[0], param_dtype)
    dec["mid_res2"] = _res_block_init(next(keys), dec_dims[0], dec_dims[0],
                                      param_dtype)
    ups = cfg.temporal_upsample
    for i in range(len(cfg.dim_mult)):
        cin, cout = dec_dims[i], dec_dims[i + 1]
        t_up = ups[i] if i < len(ups) else False
        up_flag = i != len(cfg.dim_mult) - 1
        sp = {}
        for j in range(cfg.num_res_blocks + 1):
            sp[f"res{j}"] = _res_block_init(next(keys),
                                            cin if j == 0 else cout, cout,
                                            param_dtype)
        if up_flag:
            if t_up:
                sp["time_conv"] = _conv3d_init(next(keys), 3, 1, 1, cout,
                                               2 * cout, param_dtype)
            sp["resample"] = {
                "w": jax.random.normal(next(keys), (3, 3, cout, cout),
                                       param_dtype) / np.sqrt(9 * cout),
                "b": jnp.zeros((cout,), param_dtype)}
        dec[f"up{i}"] = sp
    dec["head_norm"] = jnp.ones((dec_dims[-1],), param_dtype)
    dec["head_conv"] = _conv3d_init(next(keys), 3, 3, 3, dec_dims[-1],
                                    in_ch, param_dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        # WanVAE_ 1x1 bottleneck convs (vae2_2.py:766-767)
        "conv_mu": _conv3d_init(next(keys), 1, 1, 1, z2, z2, param_dtype),
        "conv_z": _conv3d_init(next(keys), 1, 1, 1, cfg.z_dim, cfg.z_dim,
                               param_dtype),
    }


# ---------------------------------------------------------------------------
# patchify
# ---------------------------------------------------------------------------


def spatial_patchify(x, p):
    """[B,T,H,W,C] -> [B,T,H/p,W/p,C*p*p], channel order (c, w_off, h_off)
    matching the reference einops 'b c f (h q) (w r) -> b (c r q) f h w'."""
    if p == 1:
        return x
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)       # (.., q, .., r, c)
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)               # [..., c, r, q]
    return x.reshape(b, t, h // p, w // p, c * p * p)


def spatial_unpatchify(x, p):
    if p == 1:
        return x
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)                 # [..., c, r, q]
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)               # [b,t,h,q,w,r,c]
    return x.reshape(b, t, h * p, w * p, c)


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def _normalize(mu, cfg):
    if cfg.z_dim == 48:
        mean = jnp.asarray(WAN22_LATENT_MEAN)
        std = jnp.asarray(WAN22_LATENT_STD)
        return (mu - mean) / std
    return mu


def _denormalize(z, cfg):
    if cfg.z_dim == 48:
        mean = jnp.asarray(WAN22_LATENT_MEAN)
        std = jnp.asarray(WAN22_LATENT_STD)
        return z * std + mean
    return z


def vae_encode(params, cfg: WanVAEConfig, video: jnp.ndarray,
               streaming: bool = True) -> jnp.ndarray:
    """video [B, T, H, W, 3] in [-1,1], T = 1 + 4k ->
    normalized latent [B, 1+k, H/16, W/16, z]."""
    x = spatial_patchify(video, cfg.spatial_patch)
    t = x.shape[1]
    enc = params["encoder"]

    if not streaming or t == 1:
        out = encoder_forward(enc, cfg, x, None)
    else:
        nchunks = (t - 1) // cfg.encode_chunk
        s0 = Stream(None)
        first = encoder_forward(enc, cfg, x[:, :1], s0)
        cache0 = s0.done()
        rest = x[:, 1:1 + nchunks * cfg.encode_chunk]
        b, _, hh, ww, cc = rest.shape
        chunks = rest.reshape(b, nchunks, cfg.encode_chunk, hh, ww, cc)
        chunks = jnp.moveaxis(chunks, 1, 0)  # [n, B, ck, H, W, C]

        def body(cache, chunk):
            s = Stream(cache)
            y = encoder_forward(enc, cfg, chunk, s)
            return s.done(), y

        _, ys = jax.lax.scan(body, cache0, chunks)
        ys = jnp.moveaxis(ys, 0, 1)  # [B, n, t', h, w, c]
        ys = ys.reshape(b, -1, *ys.shape[3:])
        out = jnp.concatenate([first, ys], axis=1)

    moments = causal_conv_stream(params["conv_mu"], out, None)
    mu = moments[..., :cfg.z_dim]
    return _normalize(mu, cfg)


def vae_decode(params, cfg: WanVAEConfig, z: jnp.ndarray,
               streaming: bool = True) -> jnp.ndarray:
    """normalized latent [B, T', h, w, z] -> video [B, T, H, W, 3] in
    [-1,1] (clamped), T = 1 + 4*(T'-1)."""
    z = _denormalize(z, cfg)
    x = causal_conv_stream(params["conv_z"], z, None)
    dec = params["decoder"]
    t = x.shape[1]

    if not streaming:
        out = decoder_forward(dec, cfg, x, None, first_chunk=True)
    else:
        s0 = Stream(None)
        first = decoder_forward(dec, cfg, x[:, :1], s0, first_chunk=True)
        cache0 = s0.done()
        if t > 1:
            # cfg.decode_chunk latent frames per scan step: larger
            # chunks amortize the sequential scan's small-op launch and
            # conv setup cost (streaming==full equivalence holds for any
            # chunking — the causal feat-cache carries across chunks,
            # proven in tests/test_vae.py); falls back to 1 when the
            # frame count doesn't divide.
            ck = max(int(getattr(cfg, "decode_chunk", 1)), 1)
            if (t - 1) % ck:
                ck = 1
            # [(t-1)/ck, B, ck, h, w, c]
            chunks = jnp.swapaxes(x[:, 1:], 0, 1)
            chunks = chunks.reshape((t - 1) // ck, ck,
                                    *chunks.shape[1:]).swapaxes(1, 2)

            def body(cache, chunk):
                s = Stream(cache)
                y = decoder_forward(dec, cfg, chunk, s, first_chunk=False)
                return s.done(), y

            _, ys = jax.lax.scan(body, cache0, chunks)
            ys = jnp.moveaxis(ys, 0, 1)
            ys = ys.reshape(ys.shape[0], -1, *ys.shape[3:])
            out = jnp.concatenate([first, ys], axis=1)
        else:
            out = first

    out = spatial_unpatchify(out, cfg.spatial_patch)
    return jnp.clip(out, -1.0, 1.0)
