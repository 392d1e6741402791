"""CLIP ViT-H/14 visual tower (the open-clip XLM-Roberta-CLIP image side).

Behavioral parity with reference
models/wan/utils/modules/animate/clip.py: the animate pipeline only uses
`CLIPModel.visual` (:501-541), which resizes the reference frame to
224x224 (bicubic), normalizes with the CLIP mean/std, and runs the
VisionTransformer with use_31_block=True — i.e. cls token + 256 patch
tokens through 31 of the 32 pre-norm blocks, returning the raw 257x1280
hidden states (no final norm / head). Config from
clip_xlm_roberta_vit_h_14 (:471-499): dim 1280, heads 16, mlp_ratio 4,
gelu (not quick_gelu), pre_norm present for vision_pool='token'.

The text tower (XLM-Roberta) is unused at inference and omitted; the
checkpoint converter maps only visual weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ....core import nn
from ....kernels.attention import attention

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    num_heads: int = 16
    num_layers: int = 32          # use_31_block runs num_layers - 1
    norm_eps: float = 1e-5
    activation: str = "gelu"


def init_clip_vision(key, cfg: ClipVisionConfig, dtype=jnp.float32
                     ) -> Dict:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers))
    d = cfg.dim
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    gain = 1.0 / np.sqrt(d)
    params = {
        "patch_embed": nn.linear_init(
            next(ks), cfg.patch_size ** 2 * 3, d, bias=False,
            init="normal", dtype=dtype),
        "cls": gain * jax.random.normal(next(ks), (1, d), dtype),
        "pos_embed": gain * jax.random.normal(
            next(ks), (n_patches + 1, d), dtype),
        "pre_norm": {"w": jnp.ones((d,), dtype),
                     "b": jnp.zeros((d,), dtype)},
    }

    def layer(k):
        kk = iter(jax.random.split(k, 6))
        mid = int(d * cfg.mlp_ratio)
        return {
            "ln1": {"w": jnp.ones((d,), dtype),
                    "b": jnp.zeros((d,), dtype)},
            "attn": {name: nn.linear_init(next(kk), d, d, init="normal",
                                          dtype=dtype)
                     for name in ("q", "k", "v", "o")},
            "ln2": {"w": jnp.ones((d,), dtype),
                    "b": jnp.zeros((d,), dtype)},
            "mlp": nn.mlp_init(next(kk), (d, mid, d), init="normal",
                               dtype=dtype),
        }

    params["layers"] = jax.vmap(layer)(
        jax.random.split(next(ks), cfg.num_layers))
    return params


def clip_preprocess(frame: jnp.ndarray, cfg: ClipVisionConfig
                    ) -> jnp.ndarray:
    """[H, W, 3] in [-1, 1] -> [S, S, 3] CLIP-normalized
    (CLIPModel.visual preprocessing, clip.py:520-529)."""
    img = jax.image.resize(frame, (cfg.image_size, cfg.image_size, 3),
                           method="bicubic")
    img = img * 0.5 + 0.5
    return (img - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def clip_visual_forward(params, cfg: ClipVisionConfig, image: jnp.ndarray,
                        use_31_block: bool = True,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """image [S, S, 3] (CLIP-normalized) -> tokens [257, dim]
    (VisionTransformer.forward, clip.py:279-300)."""
    p = cfg.patch_size
    s = cfg.image_size // p
    x = image.reshape(s, p, s, p, 3).transpose(0, 2, 1, 3, 4) \
        .reshape(s * s, p * p * 3)
    x = nn.linear(params["patch_embed"], x.astype(compute_dtype),
                  compute_dtype=compute_dtype)
    x = jnp.concatenate([params["cls"].astype(compute_dtype), x], axis=0)
    x = x + params["pos_embed"].astype(compute_dtype)
    x = nn.layer_norm(x, weight=params["pre_norm"]["w"].astype(x.dtype),
                      bias=params["pre_norm"]["b"].astype(x.dtype),
                      eps=cfg.norm_eps)

    l = x.shape[0]
    nh = cfg.num_heads
    hd = cfg.dim // nh
    n_run = cfg.num_layers - 1 if use_31_block else cfg.num_layers

    def layer_fn(h, layer):
        y = nn.layer_norm(h, weight=layer["ln1"]["w"].astype(h.dtype),
                          bias=layer["ln1"]["b"].astype(h.dtype),
                          eps=cfg.norm_eps)
        a = layer["attn"]
        q = nn.linear(a["q"], y, compute_dtype=compute_dtype)
        k = nn.linear(a["k"], y, compute_dtype=compute_dtype)
        v = nn.linear(a["v"], y, compute_dtype=compute_dtype)
        o = attention(q.reshape(1, l, nh, hd), k.reshape(1, l, nh, hd),
                      v.reshape(1, l, nh, hd)).reshape(l, cfg.dim)
        h = h + nn.linear(a["o"], o, compute_dtype=compute_dtype)
        y = nn.layer_norm(h, weight=layer["ln2"]["w"].astype(h.dtype),
                          bias=layer["ln2"]["b"].astype(h.dtype),
                          eps=cfg.norm_eps)
        y = nn.linear(layer["mlp"]["fc0"], y, compute_dtype=compute_dtype)
        y = jax.nn.gelu(y, approximate=False) if cfg.activation == "gelu" \
            else y * jax.nn.sigmoid(1.702 * y)
        y = nn.linear(layer["mlp"]["fc1"], y, compute_dtype=compute_dtype)
        return h + y

    layers = jax.tree_util.tree_map(lambda a: a[:n_run], params["layers"])
    x, _ = jax.lax.scan(lambda h, lyr: (layer_fn(h, lyr), None), x, layers)
    return x
