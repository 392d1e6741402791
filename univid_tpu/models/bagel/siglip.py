"""SigLIP NaViT vision tower (packed variable-resolution ViT).

Behavioral parity with reference models/BAGEL/modeling/bagel/
siglip_navit.py: conv-as-linear patch embedding (:167-183), flattened 2D
position ids with a learned position table (or optional split-head 2D
RoPE, :100-143), pre-LN encoder layers with full per-image attention
(:198-245 flash varlen), final post layernorm, no CLS/pooling (:330-401).

TPU: per-image full attention maps to the shared attention path with
segment ids reproducing cu_seqlens packing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ...kernels.attention import attention


@dataclass(frozen=True)
class SiglipConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    patch_size: int = 14
    num_channels: int = 3
    image_size: int = 980
    layer_norm_eps: float = 1e-6
    use_rope: bool = False

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.patch_size ** 2

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


def init_siglip(key, cfg: SiglipConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + cfg.num_layers))
    d = cfg.hidden_size

    params = {
        "patch_embed": nn.linear_init(next(keys), cfg.patch_dim, d,
                                      init="normal", dtype=param_dtype),
        "post_ln": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
    }
    if not cfg.use_rope:
        params["pos_embed"] = nn.normal_init(
            next(keys), (cfg.num_patches_per_side ** 2, d), 0.02,
            param_dtype)

    def init_layer(k):
        ks = iter(jax.random.split(k, 6))
        return {
            "ln1": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
            "attn": {
                "q": nn.linear_init(next(ks), d, d, init="normal",
                                    dtype=param_dtype),
                "k": nn.linear_init(next(ks), d, d, init="normal",
                                    dtype=param_dtype),
                "v": nn.linear_init(next(ks), d, d, init="normal",
                                    dtype=param_dtype),
                "o": nn.linear_init(next(ks), d, d, init="normal",
                                    dtype=param_dtype),
            },
            "ln2": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
            "mlp": nn.mlp_init(next(ks), (d, cfg.intermediate_size, d),
                               init="normal", dtype=param_dtype),
        }

    layer_keys = jax.random.split(next(keys), cfg.num_layers)
    params["layers"] = jax.vmap(init_layer)(layer_keys)
    return params


def vit_aligned_resize(image: jnp.ndarray, patch: int, max_side: int
                       ) -> jnp.ndarray:
    """Stride-aligned bilinear resize for the ViT path (the reference
    ImageTransform role, data/transforms.py:15-287: dims to multiples of
    the patch stride, long edge clamped to max_side)."""
    import numpy as np

    h, w = image.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    th = int(np.clip(round(h * scale / patch), 1, max_side // patch)) * patch
    tw = int(np.clip(round(w * scale / patch), 1, max_side // patch)) * patch
    if (th, tw) == (h, w):
        return image
    return jax.image.resize(image, (th, tw, image.shape[2]),
                            method="bilinear")


def image_to_patches(image: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[H, W, C] -> [h*w, patch*patch*C] raster order; inner ordering
    (ph, pw, c) matches data_utils.patchify's 'chpwq->hwpqc' (:43-50)."""
    h, w, c = image.shape
    x = image.reshape(h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, patch * patch * c)


def siglip_forward(params, cfg: SiglipConfig, patches: jnp.ndarray,
                   pos_ids: jnp.ndarray,
                   segment_ids: Optional[jnp.ndarray] = None,
                   compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """patches [N, patch_dim], pos_ids [N] -> features [N, hidden].

    segment_ids packs multiple images (cu_seqlens equivalent); None means
    one image."""
    n = patches.shape[0]
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh

    x = nn.linear(params["patch_embed"], patches.astype(compute_dtype),
                  compute_dtype=compute_dtype)
    if not cfg.use_rope:
        x = x + params["pos_embed"][pos_ids].astype(compute_dtype)

    segs = segment_ids[None] if segment_ids is not None else None

    def layer_fn(h, layer):
        y = nn.layer_norm(h, weight=layer["ln1"]["w"].astype(h.dtype),
                          bias=layer["ln1"]["b"].astype(h.dtype),
                          eps=cfg.layer_norm_eps)
        a = layer["attn"]
        q = nn.linear(a["q"], y, compute_dtype=compute_dtype)
        k = nn.linear(a["k"], y, compute_dtype=compute_dtype)
        v = nn.linear(a["v"], y, compute_dtype=compute_dtype)
        o = attention(q.reshape(1, n, nh, hd), k.reshape(1, n, nh, hd),
                      v.reshape(1, n, nh, hd),
                      q_segments=segs, kv_segments=segs)
        o = nn.linear(a["o"], o.reshape(n, cfg.hidden_size),
                      compute_dtype=compute_dtype)
        h = h + o
        y = nn.layer_norm(h, weight=layer["ln2"]["w"].astype(h.dtype),
                          bias=layer["ln2"]["b"].astype(h.dtype),
                          eps=cfg.layer_norm_eps)
        y = nn.linear(layer["mlp"]["fc0"], y, compute_dtype=compute_dtype)
        y = nn.gelu_tanh(y)
        y = nn.linear(layer["mlp"]["fc1"], y, compute_dtype=compute_dtype)
        return h + y

    def scan_body(h, layer):
        return layer_fn(h, layer), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])
    return nn.layer_norm(x, weight=params["post_ln"]["w"].astype(x.dtype),
                         bias=params["post_ln"]["b"].astype(x.dtype),
                         eps=cfg.layer_norm_eps)
