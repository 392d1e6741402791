"""UMT5-XXL text encoder, TPU-native.

Behavioral parity with reference models/wan/utils/modules/t5.py (T5Encoder
used by T5EncoderModel:472-513): pre-norm blocks, relative-position
attention bias PER LAYER (umt5: shared_pos=False, t5.py:456-469), gated
GELU-tanh feed-forward, unscaled T5 attention, final T5LayerNorm.

TPU redesign:
  * the relative-position bucket table for a fixed (Lq, Lk) is precomputed
    on host (static per text_len); per-layer bias is one embedding gather.
  * attention runs through the shared XLA/Pallas path with an additive
    bias; fp32 softmax.
  * encoder weights shard over fsdp (t5_fsdp in the reference,
    textimage2video.py:87-94) via parallel.sharding rules.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ...core.config import T5Config


# ---------------------------------------------------------------------------
# relative position buckets (host-side, static)
# ---------------------------------------------------------------------------


def relative_position_buckets(lq: int, lk: int, num_buckets: int = 32,
                              max_dist: int = 128,
                              bidirectional: bool = True) -> np.ndarray:
    """[Lq, Lk] int32 bucket ids (t5.py:244-264)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        out = (rel > 0).astype(np.int64) * nb
        rel = np.abs(rel)
    else:
        nb = num_buckets
        out = np.zeros_like(rel)
        rel = -np.minimum(rel, 0)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel, 1) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out = out + np.where(rel < max_exact, rel, large)
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_t5_encoder(key, cfg: T5Config, param_dtype=jnp.float32):
    """Init std's follow t5.py init_weights:27-43."""
    keys = iter(jax.random.split(key, 4 + 2 * cfg.num_layers))
    d, da, dff, nh = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_heads

    params = {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, d), param_dtype),
        "norm": jnp.ones((d,), param_dtype),
        "blocks": {},
    }
    for i in range(cfg.num_layers):
        k = iter(jax.random.split(next(keys), 8))
        params["blocks"][str(i)] = {
            "norm1": jnp.ones((d,), param_dtype),
            "attn": {
                "q": {"w": jax.random.normal(next(k), (d, da), param_dtype)
                      * (d * da) ** -0.5},
                "k": {"w": jax.random.normal(next(k), (d, da), param_dtype)
                      * d ** -0.5},
                "v": {"w": jax.random.normal(next(k), (d, da), param_dtype)
                      * d ** -0.5},
                "o": {"w": jax.random.normal(next(k), (da, d), param_dtype)
                      * (nh * da) ** -0.5},
            },
            # pos key drawn HERE unconditionally to keep the per-leaf
            # key sequence identical to the original umt5 init (pinned
            # by tests/goldens/t5_out.npz)
            "pos_embedding": (jax.random.normal(
                next(k), (cfg.num_buckets, nh), param_dtype)
                * (2 * cfg.num_buckets * nh) ** -0.5),
            "norm2": jnp.ones((d,), param_dtype),
            "ffn": {
                "gate": {"w": jax.random.normal(next(k), (d, dff),
                                                param_dtype) * d ** -0.5},
                "fc1": {"w": jax.random.normal(next(k), (d, dff),
                                               param_dtype) * d ** -0.5},
                "fc2": {"w": jax.random.normal(next(k), (dff, d),
                                               param_dtype) * dff ** -0.5},
            },
        }
        # t5-v1.1 (shared_pos=True, FLUX's text_encoder_2) keeps ONE
        # relative-position table, on the first layer; umt5 has one per
        # layer (reference t5.py:456-469 shared_pos switch)
        if cfg.shared_pos and i > 0:
            del params["blocks"][str(i)]["pos_embedding"]
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _t5_attention(p, x, pos_bias, mask, num_heads, compute_dtype):
    """Unscaled attention with additive position bias (t5.py:71-120).

    Context lengths here are <=512, so a biased XLA attention (one fused
    softmax over [B, N, L, L]) is the right tool — no flash tiling needed.
    """
    b, l, _ = x.shape
    q = nn.linear(p["q"], x, compute_dtype=compute_dtype)
    k = nn.linear(p["k"], x, compute_dtype=compute_dtype)
    v = nn.linear(p["v"], x, compute_dtype=compute_dtype)
    dh = q.shape[-1] // num_heads
    q = q.reshape(b, l, num_heads, dh)
    k = k.reshape(b, l, num_heads, dh)
    v = v.reshape(b, l, num_heads, dh)
    s = jnp.einsum("bind,bjnd->bnij", q, k,
                   preferred_element_type=jnp.float32)
    s = s + pos_bias[None]  # [B, N, L, L]
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    p_attn = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bnij,bjnd->bind", p_attn.astype(compute_dtype), v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(b, l, num_heads * dh).astype(compute_dtype)
    return nn.linear(p["o"], o, compute_dtype=compute_dtype)


def t5_encode(params, cfg: T5Config, ids: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """ids [B, L] int32 -> embeddings [B, L, dim].

    Masked (padding) positions are NOT zeroed here; T5EncoderModel returns
    unpadded slices (t5.py:506-513) and WanModel re-pads with zeros — the
    caller applies `mask` to zero padded rows for that contract.
    """
    b, l = ids.shape
    buckets = jnp.asarray(relative_position_buckets(
        l, l, cfg.num_buckets, cfg.rel_pos_max_dist))
    x = params["token_embedding"][ids].astype(compute_dtype)
    shared_bias = None
    if cfg.shared_pos:
        # t5-v1.1: layer-0 table reused by every layer
        shared_bias = params["blocks"]["0"]["pos_embedding"] \
            .astype(jnp.float32)[buckets].transpose(2, 0, 1)
    for i in range(cfg.num_layers):
        bp = params["blocks"][str(i)]
        # per-layer position bias (umt5 shared_pos=False): [N, L, L]
        bias = shared_bias if shared_bias is not None else \
            bp["pos_embedding"].astype(jnp.float32)[buckets] \
            .transpose(2, 0, 1)
        y = nn.rms_norm(x, bp["norm1"].astype(compute_dtype), eps=1e-6)
        x = x + _t5_attention(bp["attn"], y, bias, mask, cfg.num_heads,
                              compute_dtype)
        y = nn.rms_norm(x, bp["norm2"].astype(compute_dtype), eps=1e-6)
        ff = bp["ffn"]
        gate = nn.gelu_tanh(nn.linear(ff["gate"], y,
                                      compute_dtype=compute_dtype))
        h = nn.linear(ff["fc1"], y, compute_dtype=compute_dtype) * gate
        x = x + nn.linear(ff["fc2"], h, compute_dtype=compute_dtype)
    x = nn.rms_norm(x, params["norm"].astype(compute_dtype), eps=1e-6)
    return x


def encode_padded(params, cfg: T5Config, ids: jnp.ndarray,
                  seq_lens: jnp.ndarray,
                  compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """The Wan contract (t5.py:506-513 + model.py:473-478): run with an
    attention mask, then zero out padded rows (so the DiT sees zeros
    there, exactly like re-padding the unpadded per-sample slices)."""
    mask = jnp.arange(ids.shape[1])[None, :] < seq_lens[:, None]
    x = t5_encode(params, cfg, ids, mask, compute_dtype)
    return jnp.where(mask[..., None], x, 0.0)
