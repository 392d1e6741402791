"""SAM prompt encoder + two-way transformer mask decoder (SAM2 variant).

TPU-native re-implementation of the promptable mask head the reference's
animate preprocess drives through the pip `sam2` package
(process_pipepline.py:318-341: positive point prompts from body
keypoints, single object). Architecture pinned from the published SAM /
SAM2 mask decoder: random-Fourier point encoding, 4 point-type
embeddings, a depth-2 two-way transformer (queries<->image cross
attention with 2x internal downsampling), 4 mask tokens + IoU token +
SAM2's object-score token, transposed-conv upscaling fused with the two
high-resolution FPN skip levels, per-token hypernetwork MLPs, and the
dynamic multimask-via-stability fallback the reference enables
(sam_utils.py:136-139: delta 0.05, threshold 0.98).

Everything is a pure function over a params pytree; the per-frame decode
is one jitted call with static token counts (points padded to capacity
with label -1 "not a point" entries, exactly the published padding
semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from .hiera import conv2d, _conv_init

NO_OBJ_SCORE = -1024.0


@dataclass(frozen=True)
class SamHeadConfig:
    embed_dim: int = 256
    image_size: int = 1024
    embedding_grid: int = 64            # image_size // 16
    num_multimask: int = 3
    transformer_depth: int = 2
    transformer_heads: int = 8
    transformer_mlp_dim: int = 2048
    attn_downsample: int = 2            # cross-attn internal dim // 2
    upscale_ch: Tuple[int, int] = (64, 32)
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    pred_obj_scores: bool = True
    use_high_res_features: bool = True
    stability_delta: float = 0.05
    stability_thresh: float = 0.98

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask + 1


def _mlp_init(key, dims, dtype):
    ks = jax.random.split(key, len(dims) - 1)
    return {"layers": [nn.linear_init(k, a, b, dtype=dtype)
                       for k, a, b in zip(ks, dims[:-1], dims[1:])]}


def _mlp(p, x, *, sigmoid_output=False, compute_dtype=None):
    n = len(p["layers"])
    for i, layer in enumerate(p["layers"]):
        x = nn.linear(layer, x, compute_dtype=compute_dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def _deconv_init(key, k, cin, cout, dtype):
    # torch ConvTranspose2d default init: U(-1/sqrt(fan_in), ...) with
    # fan_in = cin * k * k; weights stored HWIO for lax.conv_transpose
    fan_in = cin * k * k
    bound = float(1.0 / np.sqrt(fan_in))
    kw_, kb_ = jax.random.split(key)
    return {"w": jax.random.uniform(kw_, (k, k, cin, cout), dtype,
                                    -bound, bound),
            "b": jax.random.uniform(kb_, (cout,), dtype, -bound, bound)}


def deconv2x(x, p):
    """2x2/stride-2 transposed conv over NHWC."""
    out = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(x.dtype)


def init_prompt_encoder(key, cfg: SamHeadConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))
    d = cfg.embed_dim
    return {
        # PositionEmbeddingRandom gaussian matrix [2, d/2]
        "pe_gaussian": jax.random.normal(next(keys), (2, d // 2),
                                         param_dtype),
        # 0: negative point, 1: positive point, 2/3: box corners
        "point_embeddings": nn.normal_init(next(keys), (4, d), 1.0,
                                           param_dtype),
        "not_a_point": nn.normal_init(next(keys), (d,), 1.0, param_dtype),
        "no_mask": nn.normal_init(next(keys), (d,), 1.0, param_dtype),
    }


def point_pe(pe_gaussian, coords01):
    """Random-Fourier positional encoding of [..., 2] coords in [0,1]."""
    c = 2.0 * coords01 - 1.0
    c = c @ pe_gaussian.astype(c.dtype)
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(pe_gaussian, grid: int):
    """[grid, grid, d] positional encoding of pixel centers."""
    g = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    coords = jnp.stack(jnp.meshgrid(g, g, indexing="xy"), axis=-1)
    return point_pe(pe_gaussian, coords)


def encode_points(pe, cfg: SamHeadConfig, points: jnp.ndarray,
                  labels: jnp.ndarray) -> jnp.ndarray:
    """points [B, N, 2] in input-image pixels, labels [B, N] in
    {-1: pad, 0: negative, 1: positive} -> sparse embeddings [B, N, d].

    The published semantics: +0.5 pixel-center shift, normalize by the
    input image size, zero the PE for pad entries and add the
    not-a-point embedding, else add the per-label point embedding.
    """
    coords = (points + 0.5) / cfg.image_size
    emb = point_pe(pe["pe_gaussian"], coords)
    lab = labels[..., None]
    emb = jnp.where(lab == -1, 0.0, emb)
    emb = emb + jnp.where(
        lab == -1, pe["not_a_point"].astype(emb.dtype),
        jnp.where(lab == 0, pe["point_embeddings"][0].astype(emb.dtype),
                  pe["point_embeddings"][1].astype(emb.dtype)))
    return emb


def _attn_init(key, d, internal, dtype, kv_in=None):
    kv_in = kv_in or d
    ks = iter(jax.random.split(key, 4))
    return {"q": nn.linear_init(next(ks), d, internal, dtype=dtype),
            "k": nn.linear_init(next(ks), kv_in, internal, dtype=dtype),
            "v": nn.linear_init(next(ks), kv_in, internal, dtype=dtype),
            "o": nn.linear_init(next(ks), internal, d, dtype=dtype)}


def _attn(p, q, k, v, num_heads: int, compute_dtype=None):
    """Multi-head attention over [B, N, *] with fp32 softmax."""
    q = nn.linear(p["q"], q, compute_dtype=compute_dtype)
    k = nn.linear(p["k"], k, compute_dtype=compute_dtype)
    v = nn.linear(p["v"], v, compute_dtype=compute_dtype)
    b, nq, c = q.shape
    hd = c // num_heads
    qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
    return nn.linear(p["o"], out, compute_dtype=compute_dtype)


def _ln_init(d, dtype):
    return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _ln(p, x):
    return nn.layer_norm(x, weight=p["w"].astype(x.dtype),
                         bias=p["b"].astype(x.dtype), eps=1e-5)


def init_two_way_transformer(key, cfg: SamHeadConfig,
                             param_dtype=jnp.float32):
    d = cfg.embed_dim
    internal = d // cfg.attn_downsample
    layers = []
    keys = iter(jax.random.split(key, cfg.transformer_depth + 1))
    for _ in range(cfg.transformer_depth):
        ks = iter(jax.random.split(next(keys), 8))
        layers.append({
            "self_attn": _attn_init(next(ks), d, d, param_dtype),
            "norm1": _ln_init(d, param_dtype),
            "cross_t2i": _attn_init(next(ks), d, internal, param_dtype),
            "norm2": _ln_init(d, param_dtype),
            "mlp0": nn.linear_init(next(ks), d, cfg.transformer_mlp_dim,
                                   dtype=param_dtype),
            "mlp1": nn.linear_init(next(ks), cfg.transformer_mlp_dim, d,
                                   dtype=param_dtype),
            "norm3": _ln_init(d, param_dtype),
            "cross_i2t": _attn_init(next(ks), d, internal, param_dtype),
            "norm4": _ln_init(d, param_dtype),
        })
    ks = iter(jax.random.split(next(keys), 2))
    return {"layers": layers,
            "final_attn": _attn_init(next(ks), d, internal, param_dtype),
            "norm_final": _ln_init(d, param_dtype)}


def two_way_transformer(p, cfg: SamHeadConfig, image_embed, image_pe,
                        tokens, compute_dtype=None):
    """queries=tokens [B, T, d] <-> keys=image [B, HW, d]; returns
    (queries, keys). Published structure: layer 0 self-attention skips
    the positional re-add (skip_first_layer_pe)."""
    heads = cfg.transformer_heads
    queries, keys = tokens, image_embed
    for i, layer in enumerate(p["layers"]):
        if i == 0:
            queries = _attn(layer["self_attn"], queries, queries, queries,
                            heads, compute_dtype=compute_dtype)
        else:
            q = queries + tokens
            queries = queries + _attn(layer["self_attn"], q, q, queries,
                                      heads, compute_dtype=compute_dtype)
        queries = _ln(layer["norm1"], queries)
        q = queries + tokens
        k = keys + image_pe
        queries = queries + _attn(layer["cross_t2i"], q, k, keys, heads,
                                  compute_dtype=compute_dtype)
        queries = _ln(layer["norm2"], queries)
        m = nn.linear(layer["mlp0"], queries, compute_dtype=compute_dtype)
        m = nn.linear(layer["mlp1"], jax.nn.relu(m),
                      compute_dtype=compute_dtype)
        queries = _ln(layer["norm3"], queries + m)
        q = queries + tokens
        keys = keys + _attn(layer["cross_i2t"], k, q, queries, heads,
                            compute_dtype=compute_dtype)
        keys = _ln(layer["norm4"], keys)
    q = queries + tokens
    k = keys + image_pe
    queries = queries + _attn(p["final_attn"], q, k, keys, heads,
                              compute_dtype=compute_dtype)
    queries = _ln(p["norm_final"], queries)
    return queries, keys


def init_mask_decoder(key, cfg: SamHeadConfig, param_dtype=jnp.float32):
    d = cfg.embed_dim
    c1, c2 = cfg.upscale_ch
    nm = cfg.num_mask_tokens
    keys = iter(jax.random.split(key, 12 + nm))
    p = {
        "transformer": init_two_way_transformer(next(keys), cfg,
                                                param_dtype),
        "iou_token": nn.normal_init(next(keys), (d,), 1.0, param_dtype),
        "mask_tokens": nn.normal_init(next(keys), (nm, d), 1.0,
                                      param_dtype),
        "upscale0": _deconv_init(next(keys), 2, d, c1, param_dtype),
        "upscale_ln": _ln_init(c1, param_dtype),
        "upscale1": _deconv_init(next(keys), 2, c1, c2, param_dtype),
        # hypernetwork MLPs are depth 3 (d -> d -> d -> c2)
        "hyper_mlps": [_mlp_init(k, (d, d, d, c2), param_dtype)
                       for k in jax.random.split(next(keys), nm)],
        "iou_head": _mlp_init(next(keys), (d,) + (cfg.iou_head_hidden,)
                              * (cfg.iou_head_depth - 1) + (nm,),
                              param_dtype),
    }
    if cfg.pred_obj_scores:
        p["obj_score_token"] = nn.normal_init(next(keys), (d,), 1.0,
                                              param_dtype)
        p["pred_obj_score_head"] = _mlp_init(next(keys), (d, d, d, 1),
                                             param_dtype)
    if cfg.use_high_res_features:
        p["conv_s0"] = _conv_init(next(keys), 1, 1, d, c2, param_dtype)
        p["conv_s1"] = _conv_init(next(keys), 1, 1, d, c1, param_dtype)
    return p


def mask_decoder_forward(p, cfg: SamHeadConfig, image_embed, image_pe,
                         sparse_prompt, dense_prompt,
                         high_res_feats=None, compute_dtype=None):
    """image_embed [B, g, g, d]; sparse_prompt [B, N, d]; dense_prompt
    [B, g, g, d]. Returns (masks [B, nm, 4g, 4g], iou [B, nm],
    mask_tokens_out [B, nm, d], obj_score [B, 1])."""
    b, g = image_embed.shape[0], image_embed.shape[1]
    d = cfg.embed_dim
    toks = [p["iou_token"], ] if not cfg.pred_obj_scores else \
        [p["obj_score_token"], p["iou_token"]]
    output_tokens = jnp.concatenate(
        [jnp.stack(toks), p["mask_tokens"]], axis=0).astype(
        sparse_prompt.dtype)
    s = 1 if cfg.pred_obj_scores else 0
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None],
                          (b,) + output_tokens.shape), sparse_prompt],
        axis=1)

    src = (image_embed + dense_prompt).reshape(b, g * g, d)
    pe = jnp.broadcast_to(image_pe.reshape(1, g * g, d),
                          (b, g * g, d)).astype(src.dtype)
    hs, src = two_way_transformer(p["transformer"], cfg, src, pe, tokens,
                                  compute_dtype=compute_dtype)
    iou_tok = hs[:, s]
    mask_toks = hs[:, s + 1: s + 1 + cfg.num_mask_tokens]

    x = src.reshape(b, g, g, d)
    if cfg.use_high_res_features and high_res_feats is not None:
        f_s0, f_s1 = high_res_feats   # strides 4 and 8, d channels
        s0 = conv2d(f_s0, p["conv_s0"]["w"].astype(f_s0.dtype),
                    p["conv_s0"]["b"].astype(f_s0.dtype))
        s1 = conv2d(f_s1, p["conv_s1"]["w"].astype(f_s1.dtype),
                    p["conv_s1"]["b"].astype(f_s1.dtype))
        x = deconv2x(x, p["upscale0"]) + s1
        x = jax.nn.gelu(_ln(p["upscale_ln"], x), approximate=False)
        x = jax.nn.gelu(deconv2x(x, p["upscale1"]) + s0,
                        approximate=False)
    else:
        x = deconv2x(x, p["upscale0"])
        x = jax.nn.gelu(_ln(p["upscale_ln"], x), approximate=False)
        x = jax.nn.gelu(deconv2x(x, p["upscale1"]), approximate=False)

    hyper = jnp.stack(
        [_mlp(m, mask_toks[:, i], compute_dtype=compute_dtype)
         for i, m in enumerate(p["hyper_mlps"])], axis=1)  # [B, nm, c2]
    g4 = 4 * g
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper,
                       x.astype(hyper.dtype)).reshape(
        b, cfg.num_mask_tokens, g4, g4)
    iou = _mlp(p["iou_head"], iou_tok, sigmoid_output=True,
               compute_dtype=compute_dtype)
    if cfg.pred_obj_scores:
        obj = _mlp(p["pred_obj_score_head"], hs[:, 0],
                   compute_dtype=compute_dtype)
    else:
        obj = 10.0 * jnp.ones((b, 1), iou.dtype)
    return masks, iou, mask_toks, obj


def _stability_score(mask_logits, delta: float):
    area_u = jnp.sum(mask_logits > -delta, axis=(-1, -2)).astype(
        jnp.float32)
    area_i = jnp.sum(mask_logits > delta, axis=(-1, -2)).astype(
        jnp.float32)
    return jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)


def select_masks(cfg: SamHeadConfig, masks, iou, mask_toks,
                 multimask: bool):
    """Published SAM2 selection: multimask -> argmax-IoU over slots 1..3;
    single-mask -> slot 0 unless its stability < 0.98, then fall back to
    the best multimask slot (dynamic_multimask_via_stability,
    sam_utils.py:136-139)."""
    if multimask:
        best = jnp.argmax(iou[:, 1:], axis=-1) + 1
        m = jnp.take_along_axis(masks, best[:, None, None, None],
                                axis=1)[:, 0]
        t = jnp.take_along_axis(mask_toks, best[:, None, None],
                                axis=1)[:, 0]
        s = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
        return m, t, s
    stab = _stability_score(masks[:, 0], cfg.stability_delta)
    best = jnp.argmax(iou[:, 1:], axis=-1) + 1
    m_best = jnp.take_along_axis(masks, best[:, None, None, None],
                                 axis=1)[:, 0]
    t_best = jnp.take_along_axis(mask_toks, best[:, None, None],
                                 axis=1)[:, 0]
    s_best = jnp.take_along_axis(iou, best[:, None], axis=1)[:, 0]
    keep = (stab >= cfg.stability_thresh)
    m = jnp.where(keep[:, None, None], masks[:, 0], m_best)
    t = jnp.where(keep[:, None], mask_toks[:, 0], t_best)
    s = jnp.where(keep, iou[:, 0], s_best)
    return m, t, s
