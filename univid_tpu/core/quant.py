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


def quantize_linear_w8a8(p: dict) -> dict:
    """{'w': [in, out], 'b'?} -> {'qw8': int8, 'scale': f32, 'b'?}.

    Same per-output-channel weight quantization as quantize_linear, but
    stored under the `qw8` key: core/nn.linear dispatches that key to
    the DYNAMIC-activation int8 path (per-token symmetric activation
    quant + int8 x int8 -> int32 MXU dot), which runs the matmul at the
    TPU's int8 rate (~2x bf16 on v5e) instead of merely halving weight
    bytes. Works on stacked scan leaves ([L, in, out]) too.
    """
    q = quantize_linear(p)
    return {"qw8": q.pop("qw"), **q}


def w8a8_linear(p: dict, x, *, compute_dtype=None):
    """Dynamic W8A8 linear: y = (q(x) @ qw8) * a_scale * w_scale + b.

    Activation quant is per-token symmetric (scale = row amax / 127,
    computed in fp32); the int32 accumulator is rescaled in fp32. The
    amax/round/clip prologue is elementwise VPU work XLA fuses into the
    dot's operand read; the dot itself hits the int8 MXU path.
    """
    dt = compute_dtype or x.dtype
    xf = x.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    a_scale = jnp.maximum(a_scale, 1e-8)
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["qw8"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * a_scale * p["scale"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dt)


_DIT_W8A8_SUBPATHS = ("self_attn/q", "self_attn/k", "self_attn/v",
                      "self_attn/o", "cross_attn/q", "cross_attn/k",
                      "cross_attn/v", "cross_attn/o", "ffn/fc0",
                      "ffn/fc1")


def quantize_dit_w8a8(dit_params: dict) -> dict:
    """int8 W8A8 serving mode for the Wan DiT: quantize the per-block
    GEMMs (self/cross attention projections + FFN — ~99% of the linear
    FLOPs at 33k tokens) to dynamic-activation int8; patch embed, time/
    text embeds, AdaLN modulation tables and the output head stay bf16
    (fp32-island semantics unchanged — reference model.py:237,469).
    Quality gate: tools/quality_sweep.py QS_INT8=1 (PSNR vs the exact
    fp32-residual program at the 480p x 81f operating point)."""
    def walk(node, path):
        if _is_linear(node) and any(path.endswith(s)
                                    for s in _DIT_W8A8_SUBPATHS):
            extra = {k: v for k, v in node.items()
                     if k not in ("w", "b")}
            q = quantize_linear_w8a8(node)
            q.update(extra)
            return q
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        return node

    return walk(dit_params, "")


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
