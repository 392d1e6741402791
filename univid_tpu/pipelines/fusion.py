"""Cross-attention fusion pipeline — UniVid proper.

Behavioral parity with reference CrossAttentionFusionPipeline
(model_pipeline.py:2110-3230) and Wan22ContextWrapper (:1624-1902),
without the monkey-patching: BAGEL semantic tokens -> ContextProjector ->
Wan context, TMA per-step text weighting, then the TI2V denoise loop.

Context-replacement semantics (model_pipeline.py:1669-1697):
  * fusion_alpha >= 1: the projected BAGEL context replaces the T5 output
    for BOTH the prompt and the negative prompt — note this makes CFG
    degenerate in the reference (cond == uncond context); the only
    per-branch difference there comes from its TMA step counter
    incrementing per DiT *forward* (model_pipeline.py:1856-1886), i.e.
    cond/uncond see slightly different text weights.
  * fusion_alpha < 1: per-token mix alpha*bagel + (1-alpha)*t5.

Deviations (documented):
  * TMA weights are indexed by sampling step (the paper's schedule), not
    by raw forward count — the reference's counter advances twice per
    step, compressing the transition to the first 20% of steps and
    de-synchronizing cond/uncond. Set `tma_per_forward_compat=True` on
    TMAConfig usage upstream if bit-matching that quirk ever matters.
  * `null_context` selects what the uncond branch sees: "bagel"
    (reference-faithful degenerate), "t5" (negative-prompt T5 features),
    or "zeros".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import FusionConfig, TMAConfig
from ..models.fusion.projector import context_projector_forward
from .ti2v import WanTI2VPipeline


class FusionPipeline:
    """Composition root (reference model_pipeline.py:2151-2243): BAGEL
    extractor + projector + Wan TI2V pipeline on one mesh (the reference's
    3-GPU placement dissolves into a single jit program boundary)."""

    def __init__(
        self,
        wan: WanTI2VPipeline,
        projector_params,
        fusion_cfg: FusionConfig,
        bagel_extractor: Optional[Callable] = None,
        t5_encode_fn: Optional[Callable] = None,
    ):
        self.wan = wan
        self.projector_params = projector_params
        self.cfg = fusion_cfg
        self.bagel_extractor = bagel_extractor
        self.t5_encode_fn = t5_encode_fn

    # ------------------------------------------------------------------
    def project_context(self, bagel_tokens: jnp.ndarray) -> jnp.ndarray:
        """[L, 3584] or [1, L, 3584] BAGEL tokens -> [512, 4096]."""
        if bagel_tokens.ndim == 2:
            bagel_tokens = bagel_tokens[None]
        ctx = context_projector_forward(self.projector_params, self.cfg,
                                        bagel_tokens)
        return ctx[0]

    def _mix(self, bagel_ctx: jnp.ndarray, t5_ctx: Optional[jnp.ndarray]
             ) -> jnp.ndarray:
        alpha = self.cfg.fusion_alpha
        if alpha >= 1.0 or t5_ctx is None:
            return bagel_ctx
        return alpha * bagel_ctx + (1.0 - alpha) * t5_ctx

    # ------------------------------------------------------------------
    def generate_video_with_bagel_context(
        self,
        text: Optional[str] = None,
        image=None,
        *,
        bagel_tokens: Optional[jnp.ndarray] = None,
        t5_context: Optional[jnp.ndarray] = None,
        t5_context_null: Optional[jnp.ndarray] = None,
        null_context: str = "bagel",
        tma: Optional[TMAConfig] = None,
        **gen_kwargs,
    ):
        """Returns video [T, H, W, 3] in [-1, 1].

        Either pass `bagel_tokens` directly (precomputed semantic tokens)
        or `text`/`image` with a bagel_extractor configured.
        """
        if bagel_tokens is None:
            if self.bagel_extractor is None:
                raise ValueError(
                    "need bagel_tokens or a configured bagel_extractor")
            bagel_tokens = self.bagel_extractor(text, image)

        bagel_ctx = self.project_context(bagel_tokens)
        ctx = self._mix(bagel_ctx, t5_context)

        if null_context == "bagel":
            nctx = self._mix(bagel_ctx, t5_context_null)
        elif null_context == "t5":
            if t5_context_null is None:
                raise ValueError("null_context='t5' needs t5_context_null")
            nctx = t5_context_null
        elif null_context == "zeros":
            nctx = jnp.zeros_like(ctx)
        else:
            raise ValueError(null_context)

        if tma is None:
            tma = TMAConfig(
                text_prefix_len=self.cfg.bagel_sequence_length)

        return self.wan.generate(ctx, nctx, tma=tma, img=image,
                                 **gen_kwargs)
