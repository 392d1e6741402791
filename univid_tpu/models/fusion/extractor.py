"""BAGEL semantic token extraction for the fusion pipeline.

Behavioral parity with reference BagelSemanticExtractor
(model_pipeline.py:837-1504): the "semantic tokens" fed to the
ContextProjector are BAGEL *input-space* embeddings —
  * text: embed_tokens([bos] + ids + [eos])  (:942-946)
  * image: SigLIP features -> connector -> + vit position embedding
    (:1003-1018)
concatenated (image first when present, matching the interleave order),
then padded/truncated to `target_len` (the KV-fallback path pads to 256,
:1361-1504).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from ...core import nn
from ..bagel.bagel import BagelConfig, flattened_position_ids
from ..bagel.siglip import (SiglipConfig, image_to_patches, siglip_forward,
                            vit_aligned_resize)


class BagelSemanticExtractor:
    def __init__(self, bagel_params, bagel_cfg: BagelConfig, tokenizer,
                 siglip_params=None, siglip_cfg: Optional[SiglipConfig] = None,
                 target_len: int = 256, compute_dtype=jnp.bfloat16):
        self.params = bagel_params
        self.cfg = bagel_cfg
        self.tokenizer = tokenizer
        self.siglip_params = siglip_params
        self.siglip_cfg = siglip_cfg
        self.target_len = target_len
        self.dtype = compute_dtype

    def _text_tokens(self, text: str) -> jnp.ndarray:
        ids = [self.cfg.bos_token_id] + self.tokenizer.encode(text) + \
            [self.cfg.eos_token_id]
        emb = self.params["llm"]["embed_tokens"]
        return emb[jnp.asarray(ids, jnp.int32)].astype(self.dtype)

    def _image_tokens(self, image: jnp.ndarray) -> jnp.ndarray:
        scfg = self.siglip_cfg
        image = vit_aligned_resize(image, scfg.patch_size, scfg.image_size)
        patches = image_to_patches(image, scfg.patch_size)
        h_p = image.shape[0] // scfg.patch_size
        w_p = image.shape[1] // scfg.patch_size
        pos = jnp.asarray(flattened_position_ids(
            h_p, w_p, self.cfg.vit_max_num_patch_per_side))
        feats = siglip_forward(self.siglip_params, scfg, patches, pos,
                               compute_dtype=self.dtype)
        tok = nn.linear(self.params["connector"]["fc0"], feats,
                        compute_dtype=self.dtype)
        tok = nn.gelu_tanh(tok)
        tok = nn.linear(self.params["connector"]["fc1"], tok,
                        compute_dtype=self.dtype)
        return tok + self.params["vit_pos_embed"][pos].astype(self.dtype)

    def extract_semantic_tokens(self, text: str,
                                image: Optional[jnp.ndarray] = None
                                ) -> jnp.ndarray:
        """-> [target_len, hidden] (pad with zeros / truncate, matching
        model_pipeline.py:1361-1504)."""
        parts: List[jnp.ndarray] = []
        if image is not None:
            parts.append(self._image_tokens(image))
        parts.append(self._text_tokens(text))
        tokens = jnp.concatenate(parts, axis=0)
        n = tokens.shape[0]
        if n >= self.target_len:
            return tokens[: self.target_len]
        pad = jnp.zeros((self.target_len - n, tokens.shape[1]),
                        tokens.dtype)
        return jnp.concatenate([tokens, pad], axis=0)

    # callable interface used by FusionPipeline
    def __call__(self, text, image=None):
        return self.extract_semantic_tokens(text, image)
