"""LIA motion encoder (the StyleGAN-ish face-motion tower).

Behavioral parity with reference
models/wan/utils/modules/animate/motion_encoder.py (adapted there from
github.com/wyhsirius/LIA): EqualConv2d/EqualLinear with runtime 1/sqrt(fan)
scaling, blur( [1,3,3,1] ) + stride-2 downsampling ResBlocks with the
/sqrt(2) skip merge, fused leaky-relu (slope 0.2, gain sqrt(2)),
EncoderApp 512->4 pyramid + 4x4 valid conv to a 512-d appearance code, a
5-layer EqualLinear motion head to 20 dims, and the Direction module
projecting motion alphas through the Q factor of a QR decomposition
(get_motion = direction(enc_motion(img)), :295-307).

JAX redesign: channels-last NHWC, blur as a depthwise 4x4 convolution,
QR via jnp.linalg.qr in fp32 (custom_qr parity, :8-13). All host-free —
the whole get_motion runs inside jit (the reference chunks frames by 8
through torch checkpoint; here the caller vmaps/batches freely).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....core import nn

BLUR_KERNEL = (1.0, 3.0, 3.0, 1.0)

# EncoderApp channel schedule (motion_encoder.py:210-220)
CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128, 256: 64,
            512: 32, 1024: 16}


def _blur_kernel_2d() -> np.ndarray:
    k = np.asarray(BLUR_KERNEL, np.float32)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def fused_leaky_relu(x, bias, negative_slope=0.2, scale=math.sqrt(2.0)):
    return jax.nn.leaky_relu(x + bias, negative_slope) * scale


def scaled_leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope) * math.sqrt(2.0)


def equal_conv2d(p, x, stride=1, padding=0):
    """EqualConv2d: weight scaled by 1/sqrt(in*k*k) at run time
    (:90-108). x NHWC; weight stored [kh, kw, in, out]."""
    w = p["w"]
    scale = 1.0 / math.sqrt(w.shape[0] * w.shape[1] * w.shape[2])
    out = jax.lax.conv_general_dilated(
        x, w * scale, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def equal_linear(p, x, lr_mul=1.0, activate=False):
    """EqualLinear (:116-143): scale = 1/sqrt(in) * lr_mul."""
    w = p["w"]
    scale = (1.0 / math.sqrt(w.shape[0])) * lr_mul
    out = x @ (w * scale)
    if activate:
        return fused_leaky_relu(out, p["b"] * lr_mul)
    return out + p["b"] * lr_mul


def blur(x, pad: Tuple[int, int]):
    """upfirdn2d(kernel=[1,3,3,1]^2/sum, up=1, down=1, pad) as a
    depthwise conv (:19-77)."""
    c = x.shape[-1]
    k = jnp.asarray(_blur_kernel_2d())[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [pad, pad], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def conv_layer(p, x, kernel_size, downsample=False, activate=True,
               bias=True):
    """ConvLayer (:146-183): [Blur ->] EqualConv2d [-> leaky]."""
    if downsample:
        pth = (len(BLUR_KERNEL) - 2) + (kernel_size - 1)
        pad = ((pth + 1) // 2, pth // 2)
        x = blur(x, pad)
        x = equal_conv2d(p, x, stride=2, padding=0)
    else:
        x = equal_conv2d(p, x, stride=1, padding=kernel_size // 2)
    if activate:
        if bias:
            x = fused_leaky_relu(x, p["act_b"])
        else:
            x = scaled_leaky_relu(x)
    return x


def res_block(p, x):
    """ResBlock (:186-202): conv1 (same) -> conv2 (down) + down skip,
    /sqrt(2)."""
    out = conv_layer(p["conv1"], x, 3)
    out = conv_layer(p["conv2"], out, 3, downsample=True)
    skip = conv_layer(p["skip"], x, 1, downsample=True, activate=False,
                      bias=False)
    return (out + skip) / math.sqrt(2.0)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, bias=True, act_bias=True,
               dtype=jnp.float32):
    p = {"w": jax.random.normal(key, (kh, kw, cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    if act_bias:
        p["act_b"] = jnp.zeros((cout,), dtype)
    return p


def init_motion_encoder(key, size: int = 512, dim: int = 512,
                        motion_dim: int = 20, channels=None,
                        dtype=jnp.float32) -> Dict:
    channels = channels or CHANNELS
    keys = iter(jax.random.split(key, 64))
    log_size = int(math.log2(size))

    convs = [_conv_init(next(keys), 1, 1, 3, channels[size])]
    cin = channels[size]
    blocks = []
    for i in range(log_size, 2, -1):
        cout = channels[2 ** (i - 1)]
        blocks.append({
            "conv1": _conv_init(next(keys), 3, 3, cin, cin),
            "conv2": _conv_init(next(keys), 3, 3, cin, cout),
            "skip": _conv_init(next(keys), 1, 1, cin, cout, bias=False,
                               act_bias=False),
        })
        cin = cout
    final = {"w": jax.random.normal(next(keys), (4, 4, cin, dim), dtype)}

    fc = []
    for i in range(4):
        fc.append({"w": jax.random.normal(next(keys), (dim, dim), dtype),
                   "b": jnp.zeros((dim,), dtype)})
    fc.append({"w": jax.random.normal(next(keys), (dim, motion_dim),
                                      dtype),
               "b": jnp.zeros((motion_dim,), dtype)})

    direction = jax.random.normal(next(keys), (dim, motion_dim), dtype)
    return {"first": convs[0], "blocks": blocks, "final": final, "fc": fc,
            "direction": direction}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def enc_motion(params, img: jnp.ndarray) -> jnp.ndarray:
    """img [B, S, S, 3] -> motion alphas [B, motion_dim]
    (Encoder.enc_motion, :265-269)."""
    h = conv_layer(params["first"], img, 1)
    for bp in params["blocks"]:
        h = res_block(bp, h)
    h = equal_conv2d(params["final"], h, stride=1, padding=0)  # [B,1,1,d]
    h = h.reshape(h.shape[0], -1)
    for fp in params["fc"]:
        h = equal_linear(fp, h)
    return h


def direction(params, alphas: jnp.ndarray) -> jnp.ndarray:
    """Direction (:271-287): project through the orthonormal Q of
    qr(weight + 1e-8); out = alphas @ Q.T (the diag-embed + sum form
    reduces to this)."""
    w = params["direction"].astype(jnp.float32) + 1e-8
    q, _ = jnp.linalg.qr(w)
    return alphas.astype(jnp.float32) @ q.T


def get_motion(params, img: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] in [-1, 1] -> motion vector [B, 512]
    (Generator.get_motion, :302-307)."""
    return direction(params, enc_motion(params, img))
