"""BAGEL packed-sequence TRAINING forward.

Behavioral parity with reference Bagel.forward
(models/BAGEL/modeling/bagel/bagel.py:101-229): multiple samples packed
into one flat token sequence; text tokens embedded by the LM, ViT images
encoded by NaViT SigLIP + connector, VAE latents noised by per-split flow
timesteps and bridged by vae2llm; the LM runs once over the pack with the
mixed causal/full/noise sparse mask (data/data_utils.py:13-41) and MoT
expert routing (und = text+vit rows, gen = vae rows); losses are velocity
MSE on noised vae rows and next-token CE on labeled text rows.

TPU redesign: the flex-attention block mask becomes the packed-code mode
of the Pallas flash kernel (kernels/attention.py pack_mask_codes) — three
per-token id arrays packed into one int32 lane, evaluated per tile; all
scatter placement uses static index arrays built by the PackedDataset so
the whole step jits with fixed shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from ...kernels.attention import attention, pack_mask_codes
from .bagel import BagelConfig, timestep_embedding
from .qwen2_mot import (Qwen2MoTConfig, _expert_linear, _expert_norm,
                        _qwen_mlp, apply_rope_half, rope_tables)
from .siglip import siglip_forward


def build_mask_ids(sample_lens: List[int], split_lens: List[int],
                   attn_modes: List[str]
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_id, fn_id, noise_id) per token, the create_sparse_mask id
    arrays (data_utils.py:27-40). doc ids start at 1.

    The fn/noise split ids are re-indexed PER DOCUMENT (1-based): the
    mask predicate ANDs a same-document check, so ids only need to be
    unique within a document — this keeps them inside the 8-bit fields
    of pack_mask_codes for arbitrarily many splits per pack. Bounds are
    checked (255 full/noise splits per sample, 65535 documents)."""
    if len(sample_lens) > 0xFFFF:
        raise ValueError(f"{len(sample_lens)} documents exceed the 16-bit "
                         "doc field")
    doc_id = np.concatenate([np.full(l, i + 1, np.int32)
                             for i, l in enumerate(sample_lens)])
    fn = np.full(int(np.sum(split_lens)), -1, np.int32)
    nz = np.full(fn.shape[0], -1, np.int32)
    # walk splits, tracking which document each split belongs to
    doc_bounds = np.cumsum(sample_lens)
    pos = 0
    doc_i = 0
    fn_next = nz_next = 1
    for l, mode in zip(split_lens, attn_modes):
        while pos >= doc_bounds[doc_i]:
            doc_i += 1
            fn_next = nz_next = 1
        if mode in ("full", "noise"):
            if fn_next > 0xFE:
                raise ValueError("more than 254 full/noise splits in one "
                                 "sample exceed the 8-bit mask field")
            fn[pos:pos + l] = fn_next - 1  # pack_mask_codes adds 1
            fn_next += 1
        if mode == "noise":
            nz[pos:pos + l] = nz_next - 1
            nz_next += 1
        pos += l
    return doc_id, fn, nz


def _detach_rows(h, rows):
    """stop_gradient on the given rows only (reference .detach() on
    packed_und_token_indexes slices)."""
    return h.at[rows].set(jax.lax.stop_gradient(h[rows]))


def qwen2_mot_packed_forward(params, cfg: Qwen2MoTConfig, seq, pos_ids,
                             mask_codes, und_rows,
                             compute_dtype=jnp.bfloat16,
                             freeze_und: bool = False):
    """Cache-free packed LM forward with the composite training mask.

    seq [L, hidden]; und_rows: index array of understanding tokens
    (text + vit) routed through the base experts; all other rows use the
    gen experts (qwen2_navit.py:406-497 training routing).

    freeze_und=True reproduces the reference's config.freeze_und detach
    points (qwen2_navit.py:434,441,446,737,747,980,1011): every
    und-expert output (q/k post-norm, v, attention out, mlp out, final
    norm, and the und input rows) is stop-gradiented, so gen-expert
    training cannot backprop into und weights — including via gen tokens
    attending to und k/v rows.
    """
    l = seq.shape[0]
    hd = cfg.head_dim
    cos, sin = rope_tables(pos_ids, hd, cfg.rope_theta)
    x = seq.astype(compute_dtype)
    if freeze_und:
        x = _detach_rows(x, und_rows)  # qwen2_navit.py:980
    codes = mask_codes[None]

    def ln(layer, name, h):
        if not cfg.moe:
            return nn.rms_norm(h, layer[name].astype(h.dtype),
                               eps=cfg.rms_norm_eps)
        return _expert_norm(layer[name], layer[name + "_gen"], h,
                            und_rows, cfg.rms_norm_eps)

    def proj(attn_p, attn_g, name, h):
        if not cfg.moe:
            return nn.linear(attn_p[name], h, compute_dtype=compute_dtype)
        return _expert_linear(attn_p[name], attn_g[name], h, und_rows,
                              compute_dtype)

    def layer_fn(h, layer):
        attn_p = layer["attn"]
        attn_g = layer.get("attn_gen", attn_p)
        y = ln(layer, "input_ln", h)
        q = proj(attn_p, attn_g, "q", y).reshape(l, cfg.num_heads, hd)
        k = proj(attn_p, attn_g, "k", y).reshape(l, cfg.num_kv_heads, hd)
        v = proj(attn_p, attn_g, "v", y).reshape(l, cfg.num_kv_heads, hd)
        if cfg.qk_norm:
            if not cfg.moe:
                q = nn.rms_norm(q, attn_p["q_norm"].astype(q.dtype),
                                eps=cfg.rms_norm_eps)
                k = nn.rms_norm(k, attn_p["k_norm"].astype(k.dtype),
                                eps=cfg.rms_norm_eps)
            else:
                q = _expert_norm(attn_p["q_norm"], attn_g["q_norm"], q,
                                 und_rows, cfg.rms_norm_eps)
                k = _expert_norm(attn_p["k_norm"], attn_g["k_norm"], k,
                                 und_rows, cfg.rms_norm_eps)
        if freeze_und:
            # qwen2_navit.py:434,441,446 — cuts grads into und q/k/v
            # projections, including from GEN tokens attending to und k/v
            q = _detach_rows(q, und_rows)
            k = _detach_rows(k, und_rows)
            v = _detach_rows(v, und_rows)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)

        groups = cfg.num_heads // cfg.num_kv_heads
        kk = jnp.repeat(k, groups, axis=1)
        vv = jnp.repeat(v, groups, axis=1)
        o = attention(q[None], kk[None], vv[None], q_segments=codes,
                      kv_segments=codes, packed_mode=True)[0]
        o = proj(attn_p, attn_g, "o", o.reshape(l, cfg.num_heads * hd))
        if freeze_und:
            o = _detach_rows(o, und_rows)  # qwen2_navit.py:737
        h = h + o

        y = ln(layer, "post_ln", h)
        if not cfg.moe:
            m = _qwen_mlp(layer["mlp"], y, compute_dtype)
        else:
            m = _qwen_mlp(layer["mlp_gen"], y, compute_dtype)
            if und_rows.shape[0] > 0:
                m_und = _qwen_mlp(layer["mlp"], y[und_rows], compute_dtype)
                if freeze_und:
                    m_und = jax.lax.stop_gradient(m_und)  # :747
                m = m.at[und_rows].set(m_und)
        return h + m

    def scan_body(h, layer):
        return layer_fn(h, layer), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])
    if cfg.moe:
        x = _expert_norm(params["norm"], params["norm_gen"], x, und_rows,
                         cfg.rms_norm_eps)
    else:
        x = nn.rms_norm(x, params["norm"].astype(x.dtype),
                        eps=cfg.rms_norm_eps)
    if freeze_und:
        x = _detach_rows(x, und_rows)  # qwen2_navit.py:1011
    return x


def bagel_packed_forward(
    params,
    cfg: BagelConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    rng: jax.Array,
    siglip_params=None,
    siglip_cfg=None,
    compute_dtype=jnp.bfloat16,
    freeze_und: bool = False,
) -> Dict[str, Optional[jnp.ndarray]]:
    """Packed multi-sample training step (bagel.py:101-229).

    batch keys (static shapes, built by data/packed_dataset.py):
      seq_len (int), mask_codes [L], packed_position_ids [L]
      packed_text_ids [Nt], packed_text_indexes [Nt]
      (vit) packed_vit_patches [Nv, vit_patch_dim], packed_vit_pos_ids
            [Nv], packed_vit_token_indexes [Nv], vit_seg_ids [Nv]
      (vae) packed_latent_clean [Ng, patch_latent_dim],
            packed_latent_pos_ids [Ng], packed_vae_token_indexes [Ng],
            packed_timesteps [Ng] (raw; -inf = clean condition image)
      (ce)  ce_loss_indexes [Nc], packed_label_ids [Nc],
            ce_loss_weights [Nc]
    Returns {'mse': [Ng] per-token masked MSE terms, 'ce': [Nc],
    'ce_weights', 'mse_mask'}.
    """
    l = int(batch["seq_len"])
    d = cfg.llm.hidden_size
    emb = params["llm"]["embed_tokens"]

    seq = jnp.zeros((l, d), jnp.float32)
    text_idx = batch["packed_text_indexes"]
    seq = seq.at[text_idx].set(
        emb[batch["packed_text_ids"]].astype(jnp.float32))

    und_rows = [text_idx]
    if "packed_vit_patches" in batch:
        feats = siglip_forward(siglip_params, siglip_cfg,
                               batch["packed_vit_patches"],
                               batch["packed_vit_pos_ids"],
                               segment_ids=batch["vit_seg_ids"],
                               compute_dtype=compute_dtype)
        tok = nn.linear(params["connector"]["fc0"], feats,
                        compute_dtype=compute_dtype)
        tok = nn.gelu_tanh(tok)
        tok = nn.linear(params["connector"]["fc1"], tok,
                        compute_dtype=compute_dtype)
        tok = tok + params["vit_pos_embed"][
            batch["packed_vit_pos_ids"]].astype(compute_dtype)
        seq = seq.at[batch["packed_vit_token_indexes"]].set(
            tok.astype(jnp.float32))
        und_rows.append(batch["packed_vit_token_indexes"])

    noise = target = mse_mask = None
    if "packed_latent_clean" in batch:
        clean = batch["packed_latent_clean"].astype(jnp.float32)
        raw_t = batch["packed_timesteps"].astype(jnp.float32)
        t = jax.nn.sigmoid(raw_t)
        t = cfg.timestep_shift * t / (1 + (cfg.timestep_shift - 1) * t)
        noise = jax.random.normal(rng, clean.shape, jnp.float32)
        x_t = (1 - t[:, None]) * clean + t[:, None] * noise
        t_emb = nn.linear(
            params["time_embedder"]["fc1"],
            nn.silu(nn.linear(params["time_embedder"]["fc0"],
                              timestep_embedding(t, 256),
                              compute_dtype=jnp.float32)),
            compute_dtype=jnp.float32)
        tok = nn.linear(params["vae2llm"], x_t, compute_dtype=jnp.float32)
        tok = tok + t_emb + params["latent_pos_embed"][
            batch["packed_latent_pos_ids"]].astype(jnp.float32)
        seq = seq.at[batch["packed_vae_token_indexes"]].set(tok)
        target = noise - clean  # v_t = x_1 - x_0 (bagel.py:223)
        mse_mask = raw_t > float("-inf")
        mse_mask = mse_mask & jnp.isfinite(raw_t)

    und_rows = jnp.concatenate(und_rows) if len(und_rows) > 1 \
        else und_rows[0]

    h = qwen2_mot_packed_forward(
        params["llm"], cfg.llm, seq, batch["packed_position_ids"],
        batch["mask_codes"], und_rows, compute_dtype=compute_dtype,
        freeze_und=freeze_und)

    out: Dict[str, Optional[jnp.ndarray]] = {"mse": None, "ce": None}
    if target is not None:
        preds = nn.linear(params["llm2vae"],
                          h[batch["packed_vae_token_indexes"]].astype(
                              jnp.float32), compute_dtype=jnp.float32)
        mse = jnp.square(preds - target) * mse_mask[:, None]
        out["mse"] = mse
        out["mse_mask"] = mse_mask
    if "ce_loss_indexes" in batch:
        logits = nn.linear(params["llm"]["lm_head"],
                           h[batch["ce_loss_indexes"]].astype(jnp.float32),
                           compute_dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(
            logp, batch["packed_label_ids"][:, None], axis=-1)[:, 0]
        out["ce"] = ce
        out["ce_weights"] = batch.get("ce_loss_weights")
    return out
