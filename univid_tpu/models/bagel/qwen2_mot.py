"""Qwen2 with Mixture-of-Transformers (und/gen experts) — BAGEL's LLM.

Behavioral parity with reference models/BAGEL/modeling/bagel/qwen2_navit.py
(PackedAttentionMoT :380-600, Qwen2MoTDecoderLayer :687-833, Qwen2Model
:943-1092): dual expert weights ("und" understanding / "gen" generation
twins of every projection, norm and MLP), per-head-dim qk RMS-norm, GQA,
KV cache with position-ordered merge, dual final norms.

TPU redesign:
  * Fixed-capacity KV cache [layers, capacity, n_kv, head_dim] with an
    append cursor — the reference's NaiveCache scatter-merge by global
    index (qwen2_navit.py:340-356, 559-574) keeps keys position-ordered,
    which an append at the cursor reproduces exactly for the sequential
    context building the pipelines do.
  * Queries are padded to static bucket lengths; a q_valid count masks the
    tail (cache slots past the cursor are masked by kv_len until
    overwritten).
  * MoT routing in 'gen' mode: the only und-expert tokens are the
    start/end-of-image text slots (bagel.py:756-833), a static tiny set —
    they run through the und projections via gather/scatter while the gen
    expert processes the full row block (no flops wasted on a dual full
    pass).
  * Cache update is functional: attention always sees (cache + fresh KV);
    callers keep the old cache when update_past_key_values=False
    (the _forward_flow CFG passes, bagel.py:820-871).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ...kernels.attention import attention


@dataclass(frozen=True)
class Qwen2MoTConfig:
    """BAGEL-7B-MoT shape (Qwen2-7B backbone)."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    qk_norm: bool = True
    moe: bool = True  # MoT dual experts (layer_module Qwen2MoTDecoderLayer)
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _attn_init(key, cfg: Qwen2MoTConfig, dtype):
    ks = iter(jax.random.split(key, 8))
    d, hd = cfg.hidden_size, cfg.head_dim
    qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
    p = {
        "q": nn.linear_init(next(ks), d, qd, init="normal", dtype=dtype),
        "k": nn.linear_init(next(ks), d, kvd, init="normal", dtype=dtype),
        "v": nn.linear_init(next(ks), d, kvd, init="normal", dtype=dtype),
        "o": nn.linear_init(next(ks), qd, d, bias=False, init="normal",
                            dtype=dtype),
    }
    if cfg.qk_norm:
        p["q_norm"] = jnp.ones((hd,), dtype)
        p["k_norm"] = jnp.ones((hd,), dtype)
    return p


def _mlp_init(key, cfg: Qwen2MoTConfig, dtype):
    ks = iter(jax.random.split(key, 3))
    d, m = cfg.hidden_size, cfg.intermediate_size
    return {
        "gate": nn.linear_init(next(ks), d, m, bias=False, init="normal",
                               dtype=dtype),
        "up": nn.linear_init(next(ks), d, m, bias=False, init="normal",
                             dtype=dtype),
        "down": nn.linear_init(next(ks), m, d, bias=False, init="normal",
                               dtype=dtype),
    }


def init_qwen2_mot(key, cfg: Qwen2MoTConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))
    d = cfg.hidden_size

    def init_layer(k):
        ks = iter(jax.random.split(k, 4))
        layer = {
            "input_ln": jnp.ones((d,), param_dtype),
            "attn": _attn_init(next(ks), cfg, param_dtype),
            "post_ln": jnp.ones((d,), param_dtype),
            "mlp": _mlp_init(next(ks), cfg, param_dtype),
        }
        if cfg.moe:
            layer["input_ln_gen"] = jnp.ones((d,), param_dtype)
            layer["attn_gen"] = _attn_init(next(ks), cfg, param_dtype)
            layer["post_ln_gen"] = jnp.ones((d,), param_dtype)
            layer["mlp_gen"] = _mlp_init(next(ks), cfg, param_dtype)
        return layer

    layer_keys = jax.random.split(next(keys), cfg.num_layers)
    params = {
        "embed_tokens": nn.normal_init(next(keys),
                                       (cfg.vocab_size, d), 0.02,
                                       param_dtype),
        "layers": jax.vmap(init_layer)(layer_keys),
        "norm": jnp.ones((d,), param_dtype),
        "lm_head": nn.linear_init(next(keys), d, cfg.vocab_size, bias=False,
                                  init="normal", dtype=param_dtype),
    }
    if cfg.moe:
        params["norm_gen"] = jnp.ones((d,), param_dtype)
    return params


def init_kv_cache(cfg: Qwen2MoTConfig, capacity: int, dtype=jnp.bfloat16):
    shape = (cfg.num_layers, capacity, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
            "len": jnp.zeros((), jnp.int32)}


# ---------------------------------------------------------------------------
# rope (HF rotate-half convention)
# ---------------------------------------------------------------------------


def rope_tables(pos_ids: jnp.ndarray, head_dim: int, theta: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [L, head_dim] for rotate-half RoPE (HF qwen2 layout:
    angles over the first half, duplicated into the second)."""
    half = head_dim // 2
    inv = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = pos_ids.astype(jnp.float32)[:, None] * inv[None, :]
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                    ) -> jnp.ndarray:
    """x [L, N, D]; rotate_half convention (q*cos + rotate_half(q)*sin)."""
    d = x.shape[-1]
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :d // 2], x32[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    out = x32 * cos[:, None, :] + rot * sin[:, None, :]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _expert_linear(p_und, p_gen, x, und_rows, compute_dtype):
    """Run `x` [L, D] through the gen projection, then overwrite the (tiny,
    static) set of und rows with the und projection of those rows.
    und_rows None -> pure und; und_rows 'all' handled by caller."""
    y = nn.linear(p_gen, x, compute_dtype=compute_dtype)
    if und_rows is not None and und_rows.shape[0] > 0:
        x_und = x[und_rows]
        y_und = nn.linear(p_und, x_und, compute_dtype=compute_dtype)
        y = y.at[und_rows].set(y_und)
    return y


def _expert_norm(w_und, w_gen, x, und_rows, eps):
    y = nn.rms_norm(x, w_gen.astype(x.dtype), eps=eps)
    if und_rows is not None and und_rows.shape[0] > 0:
        y_und = nn.rms_norm(x[und_rows], w_und.astype(x.dtype), eps=eps)
        y = y.at[und_rows].set(y_und)
    return y


def _qwen_mlp(p, x, compute_dtype):
    g = nn.linear(p["gate"], x, compute_dtype=compute_dtype)
    u = nn.linear(p["up"], x, compute_dtype=compute_dtype)
    return nn.linear(p["down"], nn.silu(g) * u,
                     compute_dtype=compute_dtype)


def qwen2_mot_forward(
    params,
    cfg: Qwen2MoTConfig,
    x: jnp.ndarray,                  # [L, hidden] input embeddings
    pos_ids: jnp.ndarray,            # [L] rope positions
    cache,                           # kv cache dict (may be fresh)
    *,
    q_valid: Optional[jnp.ndarray] = None,  # scalar count of valid rows
    mode: str = "und",               # 'und' | 'gen'
    und_rows: Optional[jnp.ndarray] = None,  # [n] static und-token rows
    is_causal: bool = True,
    compute_dtype=jnp.bfloat16,
    final_norm: bool = True,
):
    """Returns (hidden [L, hidden], new_cache).

    The new cache always contains the appended KV; callers that must not
    persist it (CFG branches) simply keep their old cache object.
    """
    l = x.shape[0]
    hd = cfg.head_dim
    if q_valid is None:
        q_valid = jnp.asarray(l, jnp.int32)
    kv_len = cache["len"]
    capacity = cache["k"].shape[1]
    new_len = kv_len + q_valid

    cos, sin = rope_tables(pos_ids, hd, cfg.rope_theta)
    x = x.astype(compute_dtype)

    if mode == "und":
        und_rows_eff = None   # whole row block is und: use und weights only
    else:
        und_rows_eff = und_rows if und_rows is not None else \
            jnp.zeros((0,), jnp.int32)

    def ln(layer, name, h):
        if mode == "und" or not cfg.moe:
            return nn.rms_norm(h, layer[name].astype(h.dtype),
                               eps=cfg.rms_norm_eps)
        return _expert_norm(layer[name], layer[name + "_gen"], h,
                            und_rows_eff, cfg.rms_norm_eps)

    def proj(layer_attn, layer_attn_gen, name, h):
        if mode == "und" or not cfg.moe:
            return nn.linear(layer_attn[name], h,
                             compute_dtype=compute_dtype)
        return _expert_linear(layer_attn[name], layer_attn_gen[name], h,
                              und_rows_eff, compute_dtype)

    def layer_fn(h, layer, k_cache_in, v_cache_in):
        attn_p = layer["attn"]
        attn_g = layer.get("attn_gen", attn_p)

        y = ln(layer, "input_ln", h)
        q = proj(attn_p, attn_g, "q", y).reshape(l, cfg.num_heads, hd)
        k = proj(attn_p, attn_g, "k", y).reshape(l, cfg.num_kv_heads, hd)
        v = proj(attn_p, attn_g, "v", y).reshape(l, cfg.num_kv_heads, hd)

        if cfg.qk_norm:
            if mode == "und" or not cfg.moe:
                q = nn.rms_norm(q, attn_p["q_norm"].astype(q.dtype),
                                eps=cfg.rms_norm_eps)
                k = nn.rms_norm(k, attn_p["k_norm"].astype(k.dtype),
                                eps=cfg.rms_norm_eps)
            else:
                q = _expert_norm(attn_p["q_norm"], attn_g["q_norm"], q,
                                 und_rows_eff, cfg.rms_norm_eps)
                k = _expert_norm(attn_p["k_norm"], attn_g["k_norm"], k,
                                 und_rows_eff, cfg.rms_norm_eps)

        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)

        # append fresh KV at the cursor
        k_cache = jax.lax.dynamic_update_slice(
            k_cache_in, k.astype(k_cache_in.dtype), (kv_len, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache_in, v.astype(v_cache_in.dtype), (kv_len, 0, 0))

        groups = cfg.num_heads // cfg.num_kv_heads
        if l <= _GQA_DENSE_MAX_Q and groups > 1:
            # decode path: GQA-native dense attention over the
            # UN-REPEATED cache — jnp.repeat would materialize (and the
            # kernel would read) groups x the KV bytes per layer per
            # token; at a 16-frame video-QA context (~12k cached tokens,
            # 7 groups) that repeat traffic dominates decode
            attn = _gqa_dense_attention(q, k_cache, v_cache, kv_len,
                                        new_len, is_causal, compute_dtype)
        else:
            # prefill path: the one-off repeat amortizes over the
            # compute-bound flash prefill
            kk = jnp.repeat(k_cache, groups, axis=1)
            vv = jnp.repeat(v_cache, groups, axis=1)
            attn = _cached_attention(q, kk, vv, kv_len, new_len,
                                     is_causal, compute_dtype)
        attn = attn.reshape(l, cfg.num_heads * hd)
        attn = proj(attn_p, attn_g, "o", attn)
        h = h + attn

        y = ln(layer, "post_ln", h)
        if mode == "und" or not cfg.moe:
            m = _qwen_mlp(layer["mlp"], y, compute_dtype)
        else:
            m = _qwen_mlp(layer["mlp_gen"], y, compute_dtype)
            if und_rows_eff is not None and und_rows_eff.shape[0] > 0:
                m_und = _qwen_mlp(layer["mlp"], y[und_rows_eff],
                                  compute_dtype)
                m = m.at[und_rows_eff].set(m_und)
        return h + m, k_cache, v_cache

    def scan_body(h, xs):
        layer, kc, vc = xs
        h, k_new, v_new = layer_fn(h, layer, kc, vc)
        return h, (k_new, v_new)

    h, (new_k, new_v) = jax.lax.scan(
        scan_body, x, (params["layers"], cache["k"], cache["v"]))

    new_cache = {"k": new_k, "v": new_v, "len": new_len}

    if final_norm:
        if mode == "gen" and cfg.moe:
            h = _expert_norm(params["norm"], params["norm_gen"], h,
                             und_rows_eff, cfg.rms_norm_eps)
        else:
            h = nn.rms_norm(h, params["norm"].astype(h.dtype),
                            eps=cfg.rms_norm_eps)
    return h, new_cache


# AR decode appends <= a handful of tokens per step; the dense GQA path
# materializes [l, n, S] fp32 scores, so cap the q rows it serves
_GQA_DENSE_MAX_Q = 32


def _gqa_dense_attention(q, k_cache, v_cache, kv_len, new_len, is_causal,
                         compute_dtype):
    """Decode-shaped attention with native grouped-query heads.

    q [l, n, d] over caches [S, kvh, d] with n = g * kvh — contracts
    directly against the kv heads (no repeat), fp32 scores/softmax like
    the flash kernel. Masks: col < new_len, plus absolute causal
    col <= kv_len + row when is_causal."""
    l, n, d = q.shape
    s_cap, kvh, _ = k_cache.shape
    g = n // kvh
    qg = q.reshape(l, kvh, g, d).astype(compute_dtype)
    scores = jnp.einsum(
        "lkgd,skd->lkgs", qg, k_cache.astype(compute_dtype),
        preferred_element_type=jnp.float32) * (1.0 / math.sqrt(d))
    col = jnp.arange(s_cap)
    mask = col[None, :] < new_len
    if is_causal:
        row_pos = kv_len + jnp.arange(l)
        mask = mask & (col[None, :] <= row_pos[:, None])
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("lkgs,skd->lkgd", p.astype(compute_dtype),
                     v_cache.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(l, n, d).astype(compute_dtype)


def _cached_attention(q, k_cache, v_cache, kv_len, new_len, is_causal,
                      compute_dtype):
    """Attention of fresh queries (global positions kv_len..kv_len+L-1)
    over the full cache buffer, masked to new_len."""
    if is_causal:
        # absolute causal: col <= kv_len + row, a per-call DYNAMIC offset
        # — handled by the flash kernel's q_offsets scalar prefetch (the
        # dense-XLA fallback round 1 used is gone; this is the Pallas
        # causal-with-cache prefill path the kernel was designed for).
        return attention(
            q[None].astype(compute_dtype),
            k_cache[None].astype(compute_dtype),
            v_cache[None].astype(compute_dtype),
            causal=True,
            q_offsets=kv_len[None].astype(jnp.int32),
            kv_len=new_len[None].astype(jnp.int32))[0]
    else:
        return attention(
            q[None].astype(compute_dtype),
            k_cache[None].astype(compute_dtype),
            v_cache[None].astype(compute_dtype),
            kv_len=new_len[None].astype(jnp.int32))[0]


def lm_head_logits(params, cfg: Qwen2MoTConfig, hidden: jnp.ndarray,
                   compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    return nn.linear(params["lm_head"], hidden.astype(compute_dtype),
                     compute_dtype=compute_dtype).astype(jnp.float32)
