"""Hiera image encoder trunk + FPN neck for the SAM2 video segmenter.

The reference animate preprocess drives SAM2 ("sam2_hiera_l.yaml") through
thin wrappers (reference models/wan/utils/modules/animate/preprocess/
sam_utils.py:122-155, video_predictor.py:14-157); the model itself comes
from the pip `sam2` package (a CUDA/torch binary dep per SURVEY.md §2.4).
This is the TPU-native re-implementation of its image encoder: the Hiera
hierarchical ViT (window attention, stage-wise 2x2 max-pool query pooling,
stage-doubling widths) and the FPN neck that projects the four stage
feature maps to a shared 256-d space with sine position encodings.

Architecture constants are pinned from the published SAM2.1 Hiera-L
configuration (facebookresearch/sam2 sam2.1_hiera_l.yaml): embed 144,
2 heads, stages (2, 6, 36, 4), q-pool 3, window spec (8, 4, 16, 8),
global-attention blocks (23, 33, 43), 7x7/stride-4 patch embed, neck
d_model 256 with top-down fusion on the two lowest-resolution levels.

TPU notes: channels-last layout throughout; window partitioning is a
reshape/transpose (static shapes); attention over windows is one batched
MXU matmul per block. The per-frame encoder is jitted once and reused
across the whole video.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn


@dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    q_pool: int = 3                      # number of pooling stage transitions
    q_stride: int = 2
    dim_mul: float = 2.0
    head_mul: float = 2.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    window_pos_embed_bkg_size: int = 7   # background pos-embed grid
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    mlp_ratio: float = 4.0

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> Tuple[int, ...]:
        ends, total = [], 0
        for s in self.stages:
            total += s
            ends.append(total - 1)
        return tuple(ends)

    @property
    def q_pool_blocks(self) -> Tuple[int, ...]:
        return tuple(e + 1 for e in self.stage_ends[: self.q_pool])

    def block_layout(self):
        """Per-block (dim_in, dim_out, heads, window_size, pooled) table.

        Mirrors the published Hiera constructor: the window size "lags by
        a block" — the first block of a new stage still uses the previous
        stage's window size; global-attention blocks use no windowing.
        """
        layout = []
        dim, heads, stage = self.embed_dim, self.num_heads, 1
        for i in range(self.depth):
            dim_out = dim
            window = self.window_spec[stage - 1]
            if i in self.global_att_blocks:
                window = 0
            if i - 1 in self.stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                stage += 1
            layout.append(dict(dim=dim, dim_out=dim_out, heads=heads,
                               window=window,
                               pooled=i in self.q_pool_blocks))
            dim = dim_out
        return layout

    @property
    def channel_list(self) -> Tuple[int, ...]:
        """Per-stage output channels, high-res first."""
        dims, d = [], self.embed_dim
        for i in range(len(self.stages)):
            if i > 0:
                d = int(d * self.dim_mul)
            dims.append(d)
        return tuple(dims)


@dataclass(frozen=True)
class NeckConfig:
    d_model: int = 256
    num_pos_feats: int = 256
    # top-down fusion levels, indexed from the HIGH-res end like the
    # published FpnNeck (levels 2 and 3 = strides 16 and 32)
    top_down_levels: Tuple[int, ...] = (2, 3)
    scalp: int = 1                       # drop this many lowest-res levels


def conv2d(x, w, b=None, *, stride=1, padding=0, groups=1):
    """NHWC conv with HWIO weights (torch OIHW weights are converted at
    checkpoint-ingestion time)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if b is not None:
        out = out + b
    return out


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    bound = float(1.0 / np.sqrt(fan_in))
    kw_, kb_ = jax.random.split(key)
    return {"w": jax.random.uniform(kw_, (kh, kw, cin, cout), dtype,
                                    -bound, bound),
            "b": jax.random.uniform(kb_, (cout,), dtype, -bound, bound)}


def init_hiera(key, cfg: HieraConfig, param_dtype=jnp.float32):
    layout = cfg.block_layout()
    keys = iter(jax.random.split(key, 3 + cfg.depth))
    params = {
        "patch_embed": _conv_init(next(keys), cfg.patch_kernel,
                                  cfg.patch_kernel, 3, cfg.embed_dim,
                                  param_dtype),
        # background pos embed (interpolated to the full grid) plus a
        # window-tiled local pos embed, both added post-patch-embed
        "pos_embed": nn.normal_init(
            next(keys), (cfg.window_pos_embed_bkg_size,
                         cfg.window_pos_embed_bkg_size, cfg.embed_dim),
            0.02, param_dtype),
        "pos_embed_window": nn.normal_init(
            next(keys), (cfg.window_spec[0], cfg.window_spec[0],
                         cfg.embed_dim), 0.02, param_dtype),
        "blocks": [],
    }
    for spec in layout:
        k = iter(jax.random.split(next(keys), 5))
        d, do, hidden = spec["dim"], spec["dim_out"], \
            int(spec["dim_out"] * cfg.mlp_ratio)
        blk = {
            "norm1": {"w": jnp.ones((d,), param_dtype),
                      "b": jnp.zeros((d,), param_dtype)},
            "qkv": nn.linear_init(next(k), d, 3 * do, dtype=param_dtype),
            "attn_proj": nn.linear_init(next(k), do, do,
                                        dtype=param_dtype),
            "norm2": {"w": jnp.ones((do,), param_dtype),
                      "b": jnp.zeros((do,), param_dtype)},
            "mlp0": nn.linear_init(next(k), do, hidden, dtype=param_dtype),
            "mlp1": nn.linear_init(next(k), hidden, do, dtype=param_dtype),
        }
        if d != do:
            blk["proj"] = nn.linear_init(next(k), d, do, dtype=param_dtype)
        params["blocks"].append(blk)
    return params


def init_neck(key, cfg: NeckConfig, channel_list, param_dtype=jnp.float32):
    keys = jax.random.split(key, len(channel_list))
    # convs[0] maps the LOWEST-res stage like the published FpnNeck
    # (backbone_channel_list is given top-down)
    return {"convs": [_conv_init(k, 1, 1, c, cfg.d_model, param_dtype)
                      for k, c in zip(keys, reversed(channel_list))]}


def _window_partition(x, ws: int):
    """[B, H, W, C] -> windows [B*nH*nW, ws, ws, C], padding to multiples."""
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(x, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _max_pool2x2(x):
    """2x2/stride-2 max pool over [B, H, W, C] (floor mode)."""
    b, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2]
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4))


def _attention(q, k, v, num_heads: int):
    """Plain SDPA over [B, N, C] with fp32 softmax; window batches are
    small enough that the XLA fusion is already MXU-bound."""
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // num_heads
    q = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, c)


def _block_forward(blk, spec, x, compute_dtype):
    """One MultiScaleBlock: pre-LN windowed attention with optional
    query pooling at stage transitions, then a GELU MLP."""
    d, do, heads = spec["dim"], spec["dim_out"], spec["heads"]
    ws = spec["window"]
    shortcut = x
    y = nn.layer_norm(x, weight=blk["norm1"]["w"].astype(x.dtype),
                      bias=blk["norm1"]["b"].astype(x.dtype), eps=1e-6)
    if d != do:
        # dim-change shortcut: linear proj of the NORMED input, pooled
        shortcut = nn.linear(blk["proj"], y, compute_dtype=compute_dtype)
        if spec["pooled"]:
            shortcut = _max_pool2x2(shortcut)

    pad_hw = hw = y.shape[1:3]
    if ws > 0:
        y, pad_hw = _window_partition(y, ws)
    b, h, w, _ = y.shape
    qkv = nn.linear(blk["qkv"], y, compute_dtype=compute_dtype)
    qkv = qkv.reshape(b, h * w, 3, do)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if spec["pooled"]:
        q = _max_pool2x2(q.reshape(b, h, w, do))
        qh, qw = q.shape[1:3]
        q = q.reshape(b, qh * qw, do)
    out = _attention(q, k, v, heads)
    if spec["pooled"]:
        out = out.reshape(b, qh, qw, do)
        # the token grid halved: unpartition with the pooled geometry
        ws_out = max(ws // 2, 1) if ws > 0 else 0
        hw = (hw[0] // 2, hw[1] // 2)
        pad_hw = (pad_hw[0] // 2, pad_hw[1] // 2)
    else:
        ws_out = ws
        out = out.reshape(b, h, w, do)
    out = nn.linear(blk["attn_proj"], out, compute_dtype=compute_dtype)
    if ws > 0:
        out = _window_unpartition(out, ws_out, pad_hw, hw)
    x = shortcut + out

    y = nn.layer_norm(x, weight=blk["norm2"]["w"].astype(x.dtype),
                      bias=blk["norm2"]["b"].astype(x.dtype), eps=1e-6)
    y = nn.linear(blk["mlp0"], y, compute_dtype=compute_dtype)
    y = nn.gelu_tanh(y)
    y = nn.linear(blk["mlp1"], y, compute_dtype=compute_dtype)
    return x + y


def hiera_forward(params, cfg: HieraConfig, x: jnp.ndarray,
                  compute_dtype=jnp.float32) -> List[jnp.ndarray]:
    """[B, H, W, 3] normalized image -> per-stage features, high-res
    first: [(B, H/4, W/4, C0), ..., (B, H/32, W/32, C3)]."""
    x = conv2d(x.astype(compute_dtype),
               params["patch_embed"]["w"].astype(compute_dtype),
               params["patch_embed"]["b"].astype(compute_dtype),
               stride=cfg.patch_stride, padding=cfg.patch_padding)
    h, w = x.shape[1:3]
    bg = jax.image.resize(params["pos_embed"].astype(x.dtype),
                          (h, w, cfg.embed_dim), method="bicubic")
    win = params["pos_embed_window"].astype(x.dtype)
    reps = (h // win.shape[0], w // win.shape[1], 1)
    x = x + bg + jnp.tile(win, reps)

    outputs = []
    layout = cfg.block_layout()
    for i, (blk, spec) in enumerate(zip(params["blocks"], layout)):
        x = _block_forward(blk, spec, x, compute_dtype)
        if i in cfg.stage_ends:
            outputs.append(x)
    return outputs


def sine_pos_encoding(h: int, w: int, num_feats: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, num_feats] normalized sine/cosine position encoding (the
    published PositionEmbeddingSine: y-half then x-half, interleaved
    sin/cos per frequency, scale 2*pi, temperature 10000)."""
    half = num_feats // 2
    y = (jnp.arange(1, h + 1, dtype=jnp.float32))[:, None]
    x = (jnp.arange(1, w + 1, dtype=jnp.float32))[None, :]
    eps = 1e-6
    y = y / (h + eps) * (2 * np.pi)
    x = x / (w + eps) * (2 * np.pi)
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / half)
    yy = jnp.broadcast_to(y, (h, w))[:, :, None] / dim_t
    xx = jnp.broadcast_to(x, (h, w))[:, :, None] / dim_t
    pos_y = jnp.stack([jnp.sin(yy[:, :, 0::2]), jnp.cos(yy[:, :, 1::2])],
                      axis=3).reshape(h, w, half)
    pos_x = jnp.stack([jnp.sin(xx[:, :, 0::2]), jnp.cos(xx[:, :, 1::2])],
                      axis=3).reshape(h, w, half)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def neck_forward(params, cfg: NeckConfig, features: List[jnp.ndarray]):
    """FPN neck: 1x1 lateral convs to d_model + nearest top-down fusion
    on `top_down_levels`; returns (features, positions), high-res first,
    with the `scalp` lowest-resolution levels dropped."""
    n = len(features) - 1
    out: List[Optional[jnp.ndarray]] = [None] * len(features)
    pos: List[Optional[jnp.ndarray]] = [None] * len(features)
    prev = None
    for i in range(n, -1, -1):
        lat = conv2d(features[i], params["convs"][n - i]["w"].astype(
            features[i].dtype), params["convs"][n - i]["b"].astype(
            features[i].dtype))
        if i in cfg.top_down_levels and prev is not None:
            b, ph, pw, c = prev.shape
            up = jax.image.resize(prev.astype(jnp.float32),
                                  (b, ph * 2, pw * 2, c), method="nearest")
            prev = lat + up.astype(lat.dtype)
        else:
            prev = lat
        out[i] = prev
        pos[i] = jnp.broadcast_to(
            sine_pos_encoding(prev.shape[1], prev.shape[2],
                              cfg.num_pos_feats, prev.dtype)[None],
            prev.shape)
    if cfg.scalp > 0:
        out, pos = out[: -cfg.scalp], pos[: -cfg.scalp]
    return out, pos
