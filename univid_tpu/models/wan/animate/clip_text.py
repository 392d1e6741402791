"""XLM-Roberta CLIP text tower (open-clip XLM-Roberta-Large text side).

Behavioral parity with reference
models/wan/utils/modules/animate/xlm_roberta.py (XLMRoberta, post_norm
variant) + clip.py:303-325 (XLMRobertaWithHead): token/type/position
embeddings with the Roberta position-id rule
(pad_id + cumsum(mask) * mask), post-embedding LayerNorm, 24 POST-norm
attention blocks with pad-key masking, masked mean pooling and a
2-layer bias-free GELU head into the 1024-d CLIP embedding space.

No reference pipeline ever calls this tower at inference
(`CLIPModel.visual` is the only consumer, clip.py:501-541) — it exists
for checkpoint-complete CLIP scoring/training parity and closes the one
remaining partial row of the animate aux nets (PARITY row 66 sibling).
Default config = xlm_roberta_large (xlm_roberta.py:146-171): vocab
250002, max_seq 514, pad_id 1, dim 1024, 16 heads, 24 layers.

Note the GELUs here are torch `nn.GELU()` — the EXACT erf form, not the
tanh approximation the rest of the stacks use.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ....core import nn
from ....kernels.attention import attention


@dataclass(frozen=True)
class ClipTextXlmRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    out_dim: int = 1024     # CLIP embed dim (head output)
    eps: float = 1e-5


def init_clip_text(key, cfg: ClipTextXlmRobertaConfig,
                   dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers))
    d = cfg.dim
    mid = (cfg.dim + cfg.out_dim) // 2
    params = {
        "token_embed": nn.normal_init(next(ks), (cfg.vocab_size, d), 0.02,
                                      dtype),
        "type_embed": nn.normal_init(next(ks), (cfg.type_size, d), 0.02,
                                     dtype),
        "pos_embed": nn.normal_init(next(ks), (cfg.max_seq_len, d), 0.02,
                                    dtype),
        "embed_norm": {"w": jnp.ones((d,), dtype),
                       "b": jnp.zeros((d,), dtype)},
        "head": {
            "fc0": nn.linear_init(next(ks), d, mid, bias=False,
                                  init="normal", dtype=dtype),
            "fc1": nn.linear_init(next(ks), mid, cfg.out_dim, bias=False,
                                  init="normal", dtype=dtype),
        },
    }

    def layer(k):
        kk = iter(jax.random.split(k, 6))
        return {
            "attn": {name: nn.linear_init(next(kk), d, d, init="normal",
                                          dtype=dtype)
                     for name in ("q", "k", "v", "o")},
            "norm1": {"w": jnp.ones((d,), dtype),
                      "b": jnp.zeros((d,), dtype)},
            "mlp": nn.mlp_init(kk.__next__(), (d, d * 4, d),
                               init="normal", dtype=dtype),
            "norm2": {"w": jnp.ones((d,), dtype),
                      "b": jnp.zeros((d,), dtype)},
        }

    params["layers"] = jax.vmap(layer)(
        jax.random.split(next(ks), cfg.num_layers))
    return params


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def clip_text_forward(params, cfg: ClipTextXlmRobertaConfig,
                      ids: jnp.ndarray,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    """ids [B, L] (pad_id-suffix-padded) -> CLIP text embedding
    [B, out_dim] (XLMRobertaWithHead.forward: tower -> masked mean pool
    -> bias-free GELU head). Unnormalized, like the reference."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id)
    # Roberta position ids: pad_id + cumsum(mask) * mask
    pos = cfg.pad_id + jnp.cumsum(mask.astype(jnp.int32), axis=1) \
        * mask.astype(jnp.int32)
    x = (params["token_embed"][ids]
         + params["type_embed"][jnp.zeros_like(ids)]
         + params["pos_embed"][pos])
    # post_norm variant: LayerNorm right after the embeddings
    x = nn.layer_norm(x.astype(jnp.float32),
                      weight=params["embed_norm"]["w"].astype(jnp.float32),
                      bias=params["embed_norm"]["b"].astype(jnp.float32),
                      eps=cfg.eps).astype(compute_dtype)

    n, dh = cfg.num_heads, cfg.dim // cfg.num_heads
    kv_len = mask.sum(axis=1).astype(jnp.int32)  # suffix padding

    def layer_fn(h, layer):
        a = layer["attn"]
        q = nn.linear(a["q"], h, compute_dtype=compute_dtype)
        k = nn.linear(a["k"], h, compute_dtype=compute_dtype)
        v = nn.linear(a["v"], h, compute_dtype=compute_dtype)
        o = attention(q.reshape(b, s, n, dh), k.reshape(b, s, n, dh),
                      v.reshape(b, s, n, dh), kv_len=kv_len)
        o = nn.linear(a["o"], o.reshape(b, s, cfg.dim),
                      compute_dtype=compute_dtype)
        # POST-norm block (xlm_roberta.py:66-69)
        h = nn.layer_norm((h + o).astype(jnp.float32),
                          weight=layer["norm1"]["w"].astype(jnp.float32),
                          bias=layer["norm1"]["b"].astype(jnp.float32),
                          eps=cfg.eps).astype(compute_dtype)
        y = nn.linear(layer["mlp"]["fc0"], h, compute_dtype=compute_dtype)
        y = _gelu_exact(y)
        y = nn.linear(layer["mlp"]["fc1"], y, compute_dtype=compute_dtype)
        h = nn.layer_norm((h + y).astype(jnp.float32),
                          weight=layer["norm2"]["w"].astype(jnp.float32),
                          bias=layer["norm2"]["b"].astype(jnp.float32),
                          eps=cfg.eps).astype(compute_dtype)
        return h

    x, _ = jax.lax.scan(lambda h, lyr: (layer_fn(h, lyr), None), x,
                        params["layers"])

    # masked mean pooling (clip.py:319-321)
    m = mask[..., None].astype(x.dtype)
    pooled = (x * m).sum(axis=1) / m.sum(axis=1)
    y = nn.linear(params["head"]["fc0"], pooled,
                  compute_dtype=compute_dtype)
    y = _gelu_exact(y)
    return nn.linear(params["head"]["fc1"], y,
                     compute_dtype=compute_dtype).astype(jnp.float32)


def convert_clip_text_xlm_roberta(sd, cfg: ClipTextXlmRobertaConfig,
                                  dtype=jnp.float32,
                                  prefix: str = "textual.") -> Dict:
    """Reference XLMRobertaWithHead state_dict -> params (checkpoint key
    layout of clip.py's `textual` submodule)."""
    import numpy as np

    def t(key):
        return jnp.asarray(np.asarray(sd[prefix + key]), dtype)

    def lin(key, bias=True):
        p = {"w": jnp.asarray(np.asarray(sd[prefix + key + ".weight"]).T,
                              dtype)}
        if bias:
            p["b"] = t(key + ".bias")
        return p

    layers = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        layers.append({
            "attn": {nm: lin(f"{b}.attn.{nm}")
                     for nm in ("q", "k", "v", "o")},
            "norm1": {"w": t(f"{b}.norm1.weight"),
                      "b": t(f"{b}.norm1.bias")},
            "mlp": {"fc0": lin(f"{b}.ffn.0"), "fc1": lin(f"{b}.ffn.2")},
            "norm2": {"w": t(f"{b}.norm2.weight"),
                      "b": t(f"{b}.norm2.bias")},
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "token_embed": t("token_embedding.weight"),
        "type_embed": t("type_embedding.weight"),
        "pos_embed": t("pos_embedding.weight"),
        "embed_norm": {"w": t("norm.weight"), "b": t("norm.bias")},
        "layers": stacked,
        "head": {"fc0": lin("head.0", bias=False),
                 "fc1": lin("head.2", bias=False)},
    }
