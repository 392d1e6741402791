"""CLIP-L/14 text encoder (FLUX's pooled-prompt conditioner), TPU-native.

FLUX-Kontext conditions its AdaLN modulation vector on the CLIP text
tower's pooled output (the reference drives this through diffusers'
`FluxKontextPipeline`, process_pipepline.py:36-37; the pipeline's
`text_encoder` is openai/clip-vit-large-patch14). Architecture: learned
token+position embeddings, 12 pre-norm blocks with causal self-attention
and quickGELU MLPs, final LayerNorm; the pooled vector is the final
hidden state at the EOT token (highest token id in CLIP's vocab, so
`argmax(ids)` finds it).

TPU notes: 77 tokens x 768 dim is tiny — blocks run as a scanned stack
for compile time, attention through the XLA path (head_dim 64), one jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core import nn
from ...kernels.attention import attention


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 77


TINY_CLIP_TEXT = ClipTextConfig(vocab_size=512, hidden_size=32,
                                intermediate_size=64, num_layers=2,
                                num_heads=2, max_len=16)


def init_clip_text(key, cfg: ClipTextConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + cfg.num_layers))
    d = cfg.hidden_size
    params = {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, d), param_dtype) * 0.02,
        "position_embedding": jax.random.normal(
            next(keys), (cfg.max_len, d), param_dtype) * 0.01,
        "final_norm": {"w": jnp.ones((d,), param_dtype),
                       "b": jnp.zeros((d,), param_dtype)},
    }

    def init_block(k):
        ks = iter(jax.random.split(k, 6))
        return {
            "ln1": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
            "ln2": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
            "attn": {nm: nn.linear_init(next(ks), d, d, dtype=param_dtype)
                     for nm in ("q", "k", "v", "o")},
            "mlp": nn.mlp_init(next(ks), (d, cfg.intermediate_size, d),
                               dtype=param_dtype),
        }

    params["blocks"] = jax.vmap(init_block)(
        jax.random.split(next(keys), cfg.num_layers))
    return params


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_text_encode(params, cfg: ClipTextConfig, ids: jnp.ndarray,
                     compute_dtype=jnp.float32):
    """ids [B, L] int32 -> (hidden [B, L, d], pooled [B, d]).

    Causal attention; pooled = post-LN hidden at argmax(ids) (EOT)."""
    b, l = ids.shape
    n = cfg.num_heads
    dh = cfg.hidden_size // n
    x = (params["token_embedding"][ids]
         + params["position_embedding"][:l]).astype(compute_dtype)

    def body(x, bp):
        y = nn.layer_norm(x.astype(jnp.float32),
                          weight=bp["ln1"]["w"].astype(jnp.float32),
                          bias=bp["ln1"]["b"].astype(jnp.float32)
                          ).astype(compute_dtype)
        q = nn.linear(bp["attn"]["q"], y, compute_dtype=compute_dtype)
        k = nn.linear(bp["attn"]["k"], y, compute_dtype=compute_dtype)
        v = nn.linear(bp["attn"]["v"], y, compute_dtype=compute_dtype)
        a = attention(q.reshape(b, l, n, dh), k.reshape(b, l, n, dh),
                      v.reshape(b, l, n, dh), causal=True)
        x = x + nn.linear(bp["attn"]["o"], a.reshape(b, l, -1),
                          compute_dtype=compute_dtype)
        y = nn.layer_norm(x.astype(jnp.float32),
                          weight=bp["ln2"]["w"].astype(jnp.float32),
                          bias=bp["ln2"]["b"].astype(jnp.float32)
                          ).astype(compute_dtype)
        h = _quick_gelu(nn.linear(bp["mlp"]["fc0"], y,
                                  compute_dtype=compute_dtype))
        x = x + nn.linear(bp["mlp"]["fc1"], h,
                          compute_dtype=compute_dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = nn.layer_norm(x.astype(jnp.float32),
                      weight=params["final_norm"]["w"].astype(jnp.float32),
                      bias=params["final_norm"]["b"].astype(jnp.float32))
    pooled = jnp.take_along_axis(
        x, jnp.argmax(ids, axis=-1)[:, None, None].astype(jnp.int32),
        axis=1)[:, 0]
    return x.astype(compute_dtype), pooled.astype(compute_dtype)
