"""Classifier-free guidance combine + renorm.

Covers both stacks:
  * Wan denoise loop: v = v_uncond + scale * (v_cond - v_uncond)
    (textimage2video.py:385-386)
  * BAGEL image generation: dual CFG (text & image contexts) with
    global / channel / text_channel renorm (bagel.py:873-905).
"""

from __future__ import annotations

import jax.numpy as jnp


def classifier_free_guidance(v_cond: jnp.ndarray, v_uncond: jnp.ndarray,
                             scale) -> jnp.ndarray:
    return v_uncond + scale * (v_cond - v_uncond)


def cfg_renorm(v_guided: jnp.ndarray, v_cond: jnp.ndarray,
               renorm_min: float = 0.0, mode: str = "global") -> jnp.ndarray:
    """Rescale the guided prediction so its norm does not exceed the
    conditional prediction's norm (reference bagel.py:873-905).

    mode:
      global  — one norm over all dims (per sample)
      channel — per-channel norms (norm over the token axis)
    The reference clamps the ratio at 1 and blends with renorm_min:
      scale = min(1, |v_cond| / |v_guided|); scale = renorm_min + (1-renorm_min)*scale
    """
    axes_keep = None
    if mode == "global":
        axes = tuple(range(1, v_guided.ndim))
    elif mode in ("channel", "text_channel"):
        # norm over the sequence/token axis, keep channels
        axes = (1,)
    else:
        raise ValueError(mode)
    del axes_keep
    norm_g = jnp.linalg.norm(v_guided.astype(jnp.float32), axis=axes,
                             keepdims=True)
    norm_c = jnp.linalg.norm(v_cond.astype(jnp.float32), axis=axes,
                             keepdims=True)
    scale = jnp.minimum(norm_c / jnp.maximum(norm_g, 1e-12), 1.0)
    scale = renorm_min + (1.0 - renorm_min) * scale
    return (v_guided.astype(jnp.float32) * scale).astype(v_guided.dtype)


def dual_cfg(v_cond: jnp.ndarray, v_cfg_text: jnp.ndarray,
             v_cfg_img: jnp.ndarray, cfg_text_scale, cfg_img_scale,
             renorm_mode: str = "global",
             renorm_min: float = 0.0) -> jnp.ndarray:
    """BAGEL dual classifier-free guidance (bagel.py:873-905):

      v_t = v_img + cfg_text*(v_cond - v_text_dropped)  [text guidance]
      then image guidance against v_cfg_img, with renorm.
    """
    v_text_guided = v_cfg_text + cfg_text_scale * (v_cond - v_cfg_text)
    v_text_guided = cfg_renorm(v_text_guided, v_cond, renorm_min, renorm_mode)
    v = v_cfg_img + cfg_img_scale * (v_text_guided - v_cfg_img)
    v = cfg_renorm(v, v_text_guided, renorm_min, renorm_mode)
    return v
