"""Wan2.2 3D causal video VAE, TPU-native.

Behavioral parity with reference models/wan/utils/modules/vae2_2.py
(Wan2_2_VAE / WanVAE_: spatial patchify p=2 -> causal 3D encoder with
AvgDown3D shortcuts -> z_dim 48 latent with per-channel mean/std
normalization; decoder with DupUp3D shortcuts), re-designed for XLA:

  * channels-last [B, T, H, W, C]; causal convs via lax.conv with explicit
    front-only temporal padding.
  * The reference's Python-list feat_cache streaming (CACHE_T=2 per
    CausalConv3d, vae2_2.py:112-235, 783-839) is re-derived as an exact
    mathematical equivalence: every cached causal conv equals a causal
    conv over the full concatenated frame stream. Two execution paths:
      - full-sequence: one batched conv per layer (fastest when the
        activations fit in HBM);
      - streaming: first chunk + `lax.scan` over fixed-size chunks with a
        static cache pytree (last-2-input-frames per causal conv) —
        bounded memory, identical outputs (tested in tests/test_vae.py).
  * The upsample3d "Rep" first-chunk special case (vae2_2.py:115-151)
    reduces to: the temporal up-conv never sees latent frame 0 (frame 0
    takes the no-time-conv path; its stream starts at frame 1 with a
    zero cache).
  * The downsample3d cache (vae2_2.py:157-168) reduces to: keep frame 0
    as-is, then VALID stride-2 conv over windows starting at even indices.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ...core.config import WanVAEConfig
from ...kernels.attention import attention

CACHE_T = 2


# ---------------------------------------------------------------------------
# Streaming cache plumbing
# ---------------------------------------------------------------------------


class Stream:
    """Threads per-conv temporal caches through the layer graph in
    construction order (the functional replacement for the reference's
    mutable feat_cache/feat_idx lists)."""

    def __init__(self, cache: Optional[Tuple] = None):
        self.cache_in = cache
        self.idx = 0
        self.cache_out: List = []

    @property
    def first(self) -> bool:
        return self.cache_in is None

    def pull(self):
        assert self.cache_in is not None
        v = self.cache_in[self.idx]
        self.idx += 1
        return v

    def push(self, v):
        self.cache_out.append(v)

    def done(self) -> Tuple:
        if self.cache_in is not None:
            assert self.idx == len(self.cache_in), \
                f"cache mismatch: used {self.idx}/{len(self.cache_in)}"
        return tuple(self.cache_out)


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def conv3d(x, w, b=None, *, stride=(1, 1, 1), padding="CAUSAL"):
    """x [B, T, H, W, Cin], w [kt, kh, kw, Cin, Cout].

    padding: 'CAUSAL' = (2*pt front, 0 back) temporal + symmetric spatial
    (reference CausalConv3d, vae2_2.py:17-42); 'VALID'; or explicit list.
    """
    kt, kh, kw = w.shape[:3]
    if padding == "CAUSAL":
        pads = [(kt - 1, 0), ((kh - 1) // 2, (kh - 1) // 2),
                ((kw - 1) // 2, (kw - 1) // 2)]
    elif padding == "VALID":
        pads = [(0, 0)] * 3
    else:
        pads = padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pads,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def causal_conv_stream(p, x, stream: Optional[Stream], dtype=None):
    """CausalConv3d (kernel 3) with streaming cache = last 2 input frames
    of the stream, zero-filled before the stream starts."""
    w, b = p["w"], p.get("b")
    kt = w.shape[0]
    if stream is None:
        return conv3d(x, w, b)
    if kt == 1:
        return conv3d(x, w, b)  # pointwise: no temporal state
    if stream.first:
        y = conv3d(x, w, b)  # full front zero padding
        # last-2 frames of the stream so far (zero-filled pre-stream,
        # matching the reference's front zero padding)
        tail = x[:, -CACHE_T:]
        if tail.shape[1] < CACHE_T:
            tail = jnp.pad(tail, ((0, 0), (CACHE_T - tail.shape[1], 0),
                                  (0, 0), (0, 0), (0, 0)))
    else:
        cache = stream.pull()
        xin = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
        y = conv3d(xin, w, b, padding=[
            (0, 0), (1, 1), (1, 1)])  # temporal VALID over cache+chunk
        # short chunks borrow the previous cache's tail (vae2_2.py:220-229)
        tail = xin[:, -CACHE_T:]
    stream.push(tail)
    return y


def conv2d_per_frame(x, w, b=None, *, stride=(1, 1), padding="SAME"):
    """2D conv applied framewise: x [B, T, H, W, C], w [kh, kw, Cin, Cout].
    Implemented as a 3D conv with kt=1 (XLA batches T for free)."""
    w3 = w[None]
    if padding == "SAME":
        kh, kw = w.shape[:2]
        pads = [(0, 0), ((kh - 1) // 2, (kh - 1) // 2),
                ((kw - 1) // 2, (kw - 1) // 2)]
    elif padding == "ZEROPAD_RB":
        # reference downsample: ZeroPad2d((0,1,0,1)) + stride-2 3x3 conv
        pads = [(0, 0), (0, 1), (0, 1)]
    else:
        pads = padding
    return conv3d(x, w3, b, stride=(1,) + tuple(stride), padding=pads)


def vae_rms_norm(x, gamma):
    """Channel-wise F.normalize RMS norm (vae2_2.py:45-59)."""
    return nn.l2_normalize_rms(x, gamma.astype(x.dtype), axis=-1)


def nearest_up2x(x):
    """nearest-exact 2x spatial upsample == pixel repeat for scale 2."""
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                         (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# Temporal resampling (the streaming-sensitive pieces)
# ---------------------------------------------------------------------------


def time_down_conv(p, x, stream: Optional[Stream]):
    """downsample3d time conv (vae2_2.py:157-168).

    Full-sequence: out = [x_0, conv_valid_s2(x)] — frame 0 passes through,
    stride-2 windows start at frame 0. Streaming: cache = last frame.
    """
    w, b = p["w"], p.get("b")
    if stream is None:
        head = x[:, :1]
        body = conv3d(x, w, b, stride=(2, 1, 1), padding="VALID")
        return jnp.concatenate([head, body], axis=1)
    if stream.first:
        stream.push(x[:, -1:])
        return x  # single frame chunk: no time conv yet
    cache = stream.pull()
    xin = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    y = conv3d(xin, w, b, stride=(2, 1, 1), padding="VALID")
    stream.push(x[:, -1:])
    return y


def time_up_conv(p, x, stream: Optional[Stream]):
    """upsample3d time conv (vae2_2.py:114-151, "Rep" semantics).

    The conv's stream starts at frame 1 (frame 0 bypasses); output frames
    interleave the 2x-channel conv output. Full-sequence:
      y = causal_conv(x[:, 1:]) -> [B, T-1, ..., 2C] -> interleave
      out = [x_0, y_interleaved]
    """
    w, b = p["w"], p.get("b")
    c = x.shape[-1]

    def interleave(y):
        bb, tt, hh, ww, _ = y.shape
        y = y.reshape(bb, tt, hh, ww, 2, c)
        y = y.transpose(0, 1, 4, 2, 3, 5)
        return y.reshape(bb, tt * 2, hh, ww, c)

    if stream is None:
        if x.shape[1] == 1:
            return x
        y = conv3d(x[:, 1:], w, b)  # causal: 2-zero front pad
        return jnp.concatenate([x[:, :1], interleave(y)], axis=1)

    if stream.first:
        # chunk 0 never feeds the time conv; zero cache starts the stream
        zero = jnp.zeros(x[:, :1].shape[:1] + (CACHE_T,) + x.shape[2:],
                         x.dtype)
        stream.push(zero)
        return x
    cache = stream.pull()
    xin = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    y = conv3d(xin, w, b, padding=[(0, 0), (0, 0), (0, 0)])
    tail = xin[:, -CACHE_T:]
    stream.push(tail)
    return interleave(y)


# ---------------------------------------------------------------------------
# Shortcut resamplers (stateless per chunk)
# ---------------------------------------------------------------------------


def avg_down3d(x, out_c, ft, fs):
    """AvgDown3D (vae2_2.py:316-367): front-pad T to a multiple of ft,
    group channels as (C, ft, fs, fs) and mean over the group."""
    b, t, h, w, c = x.shape
    pad_t = (ft - t % ft) % ft
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t += pad_t
    factor = ft * fs * fs
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # [..., C, ft, fs, fs]
    x = x.reshape(b, t // ft, h // fs, w // fs, c * factor)
    group = c * factor // out_c
    x = x.reshape(*x.shape[:-1], out_c, group)
    return x.mean(axis=-1)


def dup_up3d(x, out_c, ft, fs, first_chunk: bool):
    """DupUp3D (vae2_2.py:370-412): channel repeat -> (C, ft, fs, fs)
    unpack; first chunk drops the leading ft-1 frames."""
    b, t, h, w, c = x.shape
    repeats = out_c * ft * fs * fs // c
    x = jnp.repeat(x, repeats, axis=-1)            # [..., C*repeats]
    x = x.reshape(b, t, h, w, out_c, ft, fs, fs)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)        # [B,T,ft,H,fs,W,fs,C]
    x = x.reshape(b, t * ft, h * fs, w * fs, out_c)
    if first_chunk:
        x = x[:, ft - 1:]
    return x


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def residual_block(p, x, stream: Optional[Stream]):
    """RMSnorm-SiLU-conv x2 with shortcut (vae2_2.py:193-235)."""
    if "shortcut" in p:
        h = causal_conv_stream(p["shortcut"], x, None)  # 1x1, stateless
    else:
        h = x
    y = vae_rms_norm(x, p["norm1"])
    y = nn.silu(y)
    y = causal_conv_stream(p["conv1"], y, stream)
    y = vae_rms_norm(y, p["norm2"])
    y = nn.silu(y)
    y = causal_conv_stream(p["conv2"], y, stream)
    return y + h


def attention_block(p, x):
    """Single-head per-frame spatial attention (vae2_2.py:238-277)."""
    b, t, h, w, c = x.shape
    y = vae_rms_norm(x, p["norm"])
    y = y.reshape(b * t, h * w, c)
    qkv = nn.linear(p["qkv"], y)  # [BT, HW, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
    o = nn.linear(p["proj"], o[:, :, 0, :])
    return x + o.reshape(b, t, h, w, c)


def spatial_resample(p, x, mode):
    if mode == "up":
        return conv2d_per_frame(nearest_up2x(x), p["w"], p.get("b"))
    elif mode == "down":
        return conv2d_per_frame(x, p["w"], p.get("b"), stride=(2, 2),
                                padding="ZEROPAD_RB")
    return x


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------


def _enc_dims(cfg: WanVAEConfig):
    return [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]


def _dec_dims(cfg: WanVAEConfig):
    m = tuple(cfg.dim_mult)
    return [cfg.dec_dim * u for u in (m[-1],) + m[::-1]]


def encoder_forward(p, cfg: WanVAEConfig, x, stream: Optional[Stream]):
    """Encoder3d (vae2_2.py:500-613). x: [B, T, H, W, 12] patchified."""
    dims = _enc_dims(cfg)
    x = causal_conv_stream(p["conv1"], x, stream)
    for i in range(len(cfg.dim_mult)):
        sp = p[f"down{i}"]
        t_down = cfg.temporal_downsample[i] if i < len(
            cfg.temporal_downsample) else False
        down_flag = i != len(cfg.dim_mult) - 1
        x_copy = x
        for j in range(cfg.num_res_blocks):
            x = residual_block(sp[f"res{j}"], x, stream)
        if down_flag:
            if t_down:
                x = spatial_resample(sp["resample"], x, "down")
                x = time_down_conv(sp["time_conv"], x, stream)
            else:
                x = spatial_resample(sp["resample"], x, "down")
        x = x + avg_down3d(x_copy, dims[i + 1],
                           2 if t_down else 1, 2 if down_flag else 1)
    x = residual_block(p["mid_res1"], x, stream)
    x = attention_block(p["mid_attn"], x)
    x = residual_block(p["mid_res2"], x, stream)
    x = vae_rms_norm(x, p["head_norm"])
    x = nn.silu(x)
    x = causal_conv_stream(p["head_conv"], x, stream)
    return x


def decoder_forward(p, cfg: WanVAEConfig, x, stream: Optional[Stream],
                    first_chunk: bool):
    """Decoder3d (vae2_2.py:616-723). x: [B, T, h, w, z]."""
    dims = _dec_dims(cfg)
    ups = cfg.temporal_upsample
    x = causal_conv_stream(p["conv1"], x, stream)
    x = residual_block(p["mid_res1"], x, stream)
    x = attention_block(p["mid_attn"], x)
    x = residual_block(p["mid_res2"], x, stream)
    for i in range(len(cfg.dim_mult)):
        sp = p[f"up{i}"]
        t_up = ups[i] if i < len(ups) else False
        up_flag = i != len(cfg.dim_mult) - 1
        x_in = x
        for j in range(cfg.num_res_blocks + 1):
            x = residual_block(sp[f"res{j}"], x, stream)
        if up_flag:
            if t_up:
                x = time_up_conv(sp["time_conv"], x, stream)
                x = spatial_resample(sp["resample"], x, "up")
            else:
                x = spatial_resample(sp["resample"], x, "up")
            x = x + dup_up3d(x_in, dims[i + 1], 2 if t_up else 1, 2,
                             first_chunk)
    x = vae_rms_norm(x, p["head_norm"])
    x = nn.silu(x)
    x = causal_conv_stream(p["head_conv"], x, stream)
    return x
