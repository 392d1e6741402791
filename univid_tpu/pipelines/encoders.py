"""Prompt -> context encoders for the Wan pipelines.

The reference wires T5EncoderModel into each Wan pipeline constructor and
calls `text_encoder([prompt], device)` per generation
(models/wan/textimage2video.py:64-76,255-262; t5.py:472-513). Here the
tokenizer + UMT5 forward live in one object producing the padded-and-
zeroed [text_len, dim] context tensors the DiT consumes; the same object
serves the real checkpoint path and the hermetic random-init path, so CI
exercises the identical code path the real model runs.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import T5Config, WanModelSpec
from ..models.wan.t5 import encode_padded, init_t5_encoder


class WanTextEncoder:
    """Tokenize + UMT5-encode prompts into Wan DiT context tensors."""

    def __init__(self, t5_params, t5_cfg: T5Config, tokenizer,
                 compute_dtype=jnp.bfloat16):
        self.params = t5_params
        self.cfg = t5_cfg
        self.tokenizer = tokenizer
        self.compute_dtype = compute_dtype
        self._jit = jax.jit(functools.partial(
            encode_padded, cfg=t5_cfg, compute_dtype=compute_dtype))

    def __call__(self, texts: List[str]) -> jnp.ndarray:
        """texts -> [B, text_len, dim]; padded rows zeroed (the Wan
        contract, t5.py:506-513 + model.py:473-478)."""
        ids, lens = self.tokenizer.batch_encode_padded(texts)
        ids = np.asarray(ids, np.int32)
        if ids.shape[1] != self.cfg.text_len:  # pad/trim to model length
            out = np.zeros((ids.shape[0], self.cfg.text_len), np.int32)
            n = min(ids.shape[1], self.cfg.text_len)
            out[:, :n] = ids[:, :n]
            ids = out
        ids = np.clip(ids, 0, self.cfg.vocab_size - 1)
        lens = np.minimum(np.asarray(lens, np.int32), self.cfg.text_len)
        return self._jit(self.params, ids=jnp.asarray(ids),
                         seq_lens=jnp.asarray(lens))

    # ------------------------------------------------------------------
    @classmethod
    def random_init(cls, spec: WanModelSpec, key=None,
                    compute_dtype=jnp.float32) -> "WanTextEncoder":
        """Hermetic encoder: random T5 weights + hash tokenizer, same
        forward path as the real checkpoint."""
        from ..utils.tokenizers import HashTokenizer

        key = key if key is not None else jax.random.PRNGKey(0)
        params = init_t5_encoder(key, spec.t5)
        tok = HashTokenizer(vocab_size=spec.t5.vocab_size)
        tok_wrap = _FixedLenTokenizer(tok, spec.t5.text_len)
        return cls(params, spec.t5, tok_wrap, compute_dtype=compute_dtype)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, spec: WanModelSpec,
                        dtype=jnp.bfloat16) -> "WanTextEncoder":
        """Load the reference UMT5 .pth + HF tokenizer from a Wan
        checkpoint dir (textimage2video.py:64-70: models_t5_umt5-xxl-
        enc-bf16.pth + google/umt5-xxl tokenizer subdir)."""
        from ..core.checkpoint import load_state_dict, convert_umt5
        from ..utils.tokenizers import load_tokenizer

        t5_path = None
        for cand in ("models_t5_umt5-xxl-enc-bf16.pth", "umt5.pth",
                     "t5.safetensors"):
            p = os.path.join(checkpoint_dir, cand)
            if os.path.exists(p):
                t5_path = p
                break
        if t5_path is None:
            raise FileNotFoundError(
                f"no UMT5 checkpoint in {checkpoint_dir}")
        params = convert_umt5(load_state_dict(t5_path), spec.t5, dtype)
        tok_dir = os.path.join(checkpoint_dir, "google", "umt5-xxl")
        tokenizer = load_tokenizer(
            tok_dir if os.path.isdir(tok_dir) else checkpoint_dir,
            seq_len=spec.t5.text_len)
        return cls(params, spec.t5, tokenizer, compute_dtype=dtype)


class _FixedLenTokenizer:
    """Adapts HashTokenizer's (texts, seq_len) signature to the fixed
    seq_len batch_encode_padded interface."""

    def __init__(self, tok, seq_len: int):
        self.tok = tok
        self.seq_len = seq_len

    def encode(self, text):
        return self.tok.encode(text)

    def decode(self, ids):
        return self.tok.decode(ids)

    def batch_encode_padded(self, texts):
        return self.tok.batch_encode_padded(texts, seq_len=self.seq_len)
