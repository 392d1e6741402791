"""ContextProjector — the trained adapter bridging BAGEL -> Wan.

Behavioral parity with reference model_pipeline.py:1506-1622:
  Linear(3584 -> 8192) -> LayerNorm -> GELU -> Dropout -> Linear(8192 ->
  4096) -> LayerNorm, plus 1-D linear interpolation of the token axis to
  wan_text_length (512), and the semantic-alignment training loss
  (cosine similarity vs T5 supervision features + L2 + diversity).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...core import nn
from ...core.config import FusionConfig


def init_context_projector(key, cfg: FusionConfig,
                           param_dtype=jnp.float32):
    hidden = cfg.wan_text_dim * cfg.projector_hidden_mult
    k1, k2 = jax.random.split(key)
    return {
        "fc0": nn.linear_init(k1, cfg.bagel_hidden_dim, hidden,
                              dtype=param_dtype),
        "ln0": {"w": jnp.ones((hidden,), param_dtype),
                "b": jnp.zeros((hidden,), param_dtype)},
        "fc1": nn.linear_init(k2, hidden, cfg.wan_text_dim,
                              dtype=param_dtype),
        "ln1": {"w": jnp.ones((cfg.wan_text_dim,), param_dtype),
                "b": jnp.zeros((cfg.wan_text_dim,), param_dtype)},
    }


def adapt_sequence_length(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """1-D linear interpolation along the token axis, matching
    F.interpolate(mode='linear', align_corners=False)
    (model_pipeline.py:1529-1550). x: [..., L, D]."""
    src = x.shape[-2]
    if src == target_len:
        return x
    # sample positions: centers map (i + 0.5) * src/tgt - 0.5
    pos = (jnp.arange(target_len, dtype=jnp.float32) + 0.5) \
        * (src / target_len) - 0.5
    pos = jnp.clip(pos, 0.0, src - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src - 1)
    frac = (pos - lo)[..., None]
    xl = jnp.take(x, lo, axis=-2)
    xh = jnp.take(x, hi, axis=-2)
    return xl * (1.0 - frac) + xh * frac


def context_projector_forward(params, cfg: FusionConfig,
                              bagel_tokens: jnp.ndarray,
                              *, dropout_rng: Optional[jax.Array] = None,
                              compute_dtype=jnp.float32) -> jnp.ndarray:
    """[B, L, 3584] BAGEL hidden states -> [B, 512, 4096] Wan context."""
    x = bagel_tokens.astype(compute_dtype)
    x = nn.linear(params["fc0"], x, compute_dtype=compute_dtype)
    x = nn.layer_norm(x, weight=params["ln0"]["w"].astype(compute_dtype),
                      bias=params["ln0"]["b"].astype(compute_dtype),
                      eps=1e-5)
    x = jax.nn.gelu(x, approximate=False)
    if dropout_rng is not None and cfg.projector_dropout > 0:
        keep = 1.0 - cfg.projector_dropout
        mask = jax.random.bernoulli(dropout_rng, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    x = nn.linear(params["fc1"], x, compute_dtype=compute_dtype)
    x = nn.layer_norm(x, weight=params["ln1"]["w"].astype(compute_dtype),
                      bias=params["ln1"]["b"].astype(compute_dtype),
                      eps=1e-5)
    return adapt_sequence_length(x, cfg.wan_text_length)


def projector_training_loss(params, cfg: FusionConfig,
                            bagel_tokens: jnp.ndarray,
                            supervision: jnp.ndarray,
                            *, dropout_rng=None
                            ) -> Dict[str, jnp.ndarray]:
    """Semantic-alignment loss (model_pipeline.py:1576-1622): cosine
    similarity of mean-pooled features vs T5 supervision + L2 reg +
    diversity bonus. bagel_tokens [B, L, 3584], supervision [B, Ls, 4096].
    """
    projected = context_projector_forward(params, cfg, bagel_tokens,
                                          dropout_rng=dropout_rng)
    if supervision.shape[-2] != projected.shape[-2]:
        supervision = adapt_sequence_length(supervision,
                                            projected.shape[-2])

    if cfg.use_cosine_similarity_loss:
        p_mean = projected.mean(axis=-2)
        s_mean = supervision.mean(axis=-2)
        cos = jnp.sum(p_mean * s_mean, axis=-1) / (
            jnp.linalg.norm(p_mean, axis=-1)
            * jnp.linalg.norm(s_mean, axis=-1) + 1e-8)
        semantic = jnp.mean(1.0 - cos)
    else:
        semantic = jnp.mean(jnp.square(projected - supervision))
    semantic = jnp.clip(semantic, 0.0, 10.0)

    l2_reg = jnp.sum(jnp.square(projected)) * 1e-6 / projected.shape[0]
    feature_std = jnp.mean(jnp.std(projected, axis=-2))
    diversity = jnp.exp(-feature_std * 10.0)

    total = semantic + l2_reg + diversity * 0.1
    return {"total_loss": total, "semantic_loss": semantic,
            "l2_reg": l2_reg, "diversity_loss": diversity,
            "feature_std": feature_std}
