"""int8 weight-only quantization for serving.

Per-output-channel symmetric int8 on linear weights: w_int8[i, o] =
round(w[i, o] / scale[o]), scale[o] = max_i |w[i, o]| / 127. The
dequant is a cast + channel scale fused into the consuming dot's
weight read (core/nn.linear handles {'qw', 'scale'} params directly),
so HBM weight bytes halve vs bf16 — AR decode, which is weight-
bandwidth-bound at batch 1, speeds up proportionally, and a 7B-class
und-expert tower (~7 GB int8) fits one 16 GB v5e next to the SigLIP
tower and KV caches.

The reference has no quantized path (torch fp16/bf16 throughout); this
is a TPU-serving feature. Quality: per-channel int8 weight-only is the
standard ~lossless operating point for LLM decode (<0.5% logit drift);
tests pin the roundtrip error and the linear-output agreement.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp


def quantize_linear(p: dict) -> dict:
    """{'w': [in, out], 'b'?} -> {'qw': int8, 'scale': f32, 'b'?}.

    Works on stacked leaves too ([L, in, out] -> per (L, out) scales)."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    qw = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"qw": qw, "scale": jnp.squeeze(scale, -2)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _is_linear(d) -> bool:
    return isinstance(d, dict) and "w" in d and \
        getattr(d["w"], "ndim", 0) >= 2


def quantize_tree(params, *, skip: Iterable[str] = ("embed_tokens",),
                  min_size: int = 1 << 16):
    """Quantize every linear-shaped {'w': ...} subtree in a param tree.

    skip: path substrings to leave in original precision (embeddings
    index rows — quantizing them saves nothing on decode and hurts
    lookup precision). min_size: leave small weights (norms folded into
    dicts, tiny projections) unquantized — no bandwidth to win there.
    """
    def walk(node, path):
        if _is_linear(node) and node["w"].size >= min_size and \
                not any(s in path for s in skip):
            extra = {k: v for k, v in node.items()
                     if k not in ("w", "b")}
            q = quantize_linear(node)
            q.update(extra)
            return q
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        return node

    return walk(params, "")


def quantized_bytes(params) -> int:
    """Total parameter bytes of a (possibly quantized) tree."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
