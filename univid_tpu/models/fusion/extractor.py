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

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ..bagel.bagel import BagelConfig, flattened_position_ids
from ..bagel.siglip import (SiglipConfig, image_to_patches, siglip_forward,
                            vit_aligned_resize)


class BagelSemanticExtractor:
    # patch-count / prompt-length buckets shared with
    # InterleaveInferencer: one compiled program per bucket instead of
    # one per frame size / prompt length (each new shape costs a
    # multi-second remote compile through the TPU tunnel)
    VIT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)
    TEXT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)

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
        # run eagerly, the 27-layer SigLIP tower dissolves into hundreds
        # of per-op dispatches (~3.4 s/image through the remote TPU
        # tunnel vs ~30 ms compiled) — same hazard the interleave
        # appenders had; ONE jit object per path, trace-cached per bucket
        if siglip_params is not None:

            def _image_tower(params, sig_params, patches, pos, segs):
                feats = siglip_forward(sig_params, self.siglip_cfg,
                                       patches, pos, segment_ids=segs,
                                       compute_dtype=self.dtype)
                tok = nn.linear(params["connector"]["fc0"], feats,
                                compute_dtype=self.dtype)
                tok = nn.gelu_tanh(tok)
                tok = nn.linear(params["connector"]["fc1"], tok,
                                compute_dtype=self.dtype)
                return tok + params["vit_pos_embed"][pos].astype(self.dtype)

            self._jit_image_tower = jax.jit(_image_tower)

        def _assemble(params, text_ids, n_text, image_tok, n_img):
            """Length-masked [image ; text] -> pad/truncate to target_len
            at STATIC bucketed shapes (n_text/n_img are traced scalars, so
            one compiled program serves every length in a bucket)."""
            emb = params["llm"]["embed_tokens"]
            L = self.target_len
            idx = jnp.arange(L)
            t_row = jnp.clip(idx - n_img, 0, text_ids.shape[0] - 1)
            text_part = emb[text_ids[t_row]].astype(self.dtype)
            if image_tok.shape[0] < L:
                image_tok = jnp.pad(
                    image_tok, ((0, L - image_tok.shape[0]), (0, 0)))
            out = jnp.where((idx < n_img)[:, None], image_tok[:L],
                            text_part)
            return jnp.where((idx < n_img + n_text)[:, None], out,
                             jnp.zeros((), self.dtype))

        self._jit_assemble = jax.jit(_assemble)

    def _text_ids_bucketed(self, text: str):
        ids = [self.cfg.bos_token_id] + self.tokenizer.encode(text) + \
            [self.cfg.eos_token_id]
        n = len(ids)
        bucket = next((b for b in self.TEXT_BUCKETS if b >= n),
                      ((n + 63) // 64) * 64)
        return np.asarray(ids + [0] * (bucket - n), np.int32), n

    def _image_tokens(self, image: jnp.ndarray):
        """-> ([bucket, hidden] padded tower output, n_valid)."""
        scfg = self.siglip_cfg
        image = vit_aligned_resize(image, scfg.patch_size, scfg.image_size)
        patches = image_to_patches(image, scfg.patch_size)
        h_p = image.shape[0] // scfg.patch_size
        w_p = image.shape[1] // scfg.patch_size
        n = h_p * w_p
        bucket = next((b for b in self.VIT_BUCKETS if b >= n), n)
        pos = np.asarray(flattened_position_ids(
            h_p, w_p, self.cfg.vit_max_num_patch_per_side))
        pad = bucket - n
        patches = jnp.pad(patches, ((0, pad), (0, 0)))
        pos = np.pad(pos, (0, pad))
        segs = np.concatenate([np.zeros(n, np.int32),
                               np.full(pad, -1, np.int32)])
        tok = self._jit_image_tower(self.params, self.siglip_params,
                                    patches, jnp.asarray(pos),
                                    jnp.asarray(segs))
        return tok, n

    def extract_semantic_tokens(self, text: str,
                                image: Optional[jnp.ndarray] = None
                                ) -> jnp.ndarray:
        """-> [target_len, hidden] (pad with zeros / truncate, matching
        model_pipeline.py:1361-1504); image tokens first when present,
        matching the interleave order."""
        text_ids, n_text = self._text_ids_bucketed(text)
        if image is not None:
            image_tok, n_img = self._image_tokens(image)
        else:
            image_tok = jnp.zeros((0, self.params["llm"]["embed_tokens"]
                                   .shape[1]), self.dtype)
            n_img = 0
        return self._jit_assemble(self.params, jnp.asarray(text_ids),
                                  jnp.asarray(n_text, jnp.int32),
                                  image_tok,
                                  jnp.asarray(n_img, jnp.int32))

    # callable interface used by FusionPipeline
    def __call__(self, text, image=None):
        return self.extract_semantic_tokens(text, image)
