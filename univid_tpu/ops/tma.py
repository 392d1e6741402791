"""Temperature Modality Alignment (TMA) — "Dynamic Text Weight Scheduling".

UniVid's first contribution: a per-sampling-step scalar weight multiplied
onto the text portion of the cross-attention context inside every Wan DiT
block (reference model_pipeline.py:1699-1810, defaults inference.py:69-74:
1.3 -> 1.0 cosine over the first 40% of steps).

The reference implements this by monkey-patching WanCrossAttention.forward;
here it is an explicit per-step input: precompute the weight for every step
on the host and scale the context prefix before the DiT call.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.config import TMAConfig


def tma_schedule_weights(cfg: TMAConfig, total_steps: int) -> np.ndarray:
    """Per-step text weights [total_steps] float32.

    Matches Wan22ContextWrapper._calculate_text_weight
    (model_pipeline.py:1699-1735).
    """
    if not cfg.enabled:
        return np.ones(total_steps, dtype=np.float32)
    transition = int(total_steps * cfg.transition_ratio)
    out = np.full(total_steps, cfg.weight_min, dtype=np.float64)
    for step in range(min(transition, total_steps)):
        progress = step / max(transition, 1)
        if cfg.schedule == "linear":
            w = cfg.weight_max - (cfg.weight_max - cfg.weight_min) * progress
        elif cfg.schedule == "cosine":
            cos_f = (1.0 + math.cos(math.pi * progress)) / 2.0
            w = cfg.weight_min + (cfg.weight_max - cfg.weight_min) * cos_f
        elif cfg.schedule == "exponential":
            exp_f = math.exp(-5.0 * progress)
            w = cfg.weight_min + (cfg.weight_max - cfg.weight_min) * exp_f
        else:
            w = 1.0
        out[step] = w
    return out.astype(np.float32)


def apply_text_weight(context: jnp.ndarray, weight,
                      text_prefix_len: int) -> jnp.ndarray:
    """Scale the first `text_prefix_len` context tokens by `weight`.

    The reference weights prefix min(bagel_sequence_length, ctx_len // 2)
    (model_pipeline.py:1766-1792); the caller computes that prefix and
    passes it statically. `weight` may be a traced scalar.
    """
    if text_prefix_len <= 0:
        return context
    ctx_len = context.shape[-2]
    prefix = min(text_prefix_len, ctx_len)
    weight = jnp.asarray(weight, context.dtype)
    head = context[..., :prefix, :] * weight
    return jnp.concatenate([head, context[..., prefix:, :]], axis=-2)
