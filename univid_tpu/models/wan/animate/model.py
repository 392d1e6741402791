"""WanAnimateModel — the character-animation DiT variant.

Behavioral parity with reference
models/wan/utils/modules/animate/model_animate.py:246-500 (WanAnimateModel):
  * in_dim 36 = latent(16) + i2v conditioning y(4 mask + 16 latent);
    pose latents get their own patch embedding ADDED to the video tokens
    of every latent frame except the first (the reference frame slot),
    after_patch_embedding (:339-346).
  * face path (:347-361): per-frame LIA motion vectors -> FaceEncoder ->
    a zero "pad" frame prepended for the reference slot; a FaceBlock
    cross-attends video tokens to their frame's motion tokens every 5th
    transformer block (after_transformer_block, :365-371).
  * CLIP image context: MLPProj(1280 -> dim) over 257 visual tokens,
    prepended to the text context (:423-425); the cross attention runs
    separate k_img/v_img projections over the first 257 rows and sums
    both attention outputs (WanAnimateCrossAttention, :88-146).
  * standard AdaLN-6 modulation with a per-sample (not per-token)
    timestep; HeadAnimate 2-way modulated output (:39-52).

TPU redesign mirrors models/wan/dit.py: stacked block leaves scanned with
`lax.scan`, the every-5th-block face injection as a `lax.cond` on the
scanned layer index with the adapter blocks gathered by idx//5; 3D RoPE
over the (lat_t+1)-frame grid; fp32 modulation islands; channels-last.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ....core import nn
from ....core.dtypes import DTypePolicy, DEFAULT_POLICY
from ....kernels.attention import attention
from ....ops.embeddings import sinusoidal_embedding_1d
from ....ops.rope import apply_rope, build_rope_3d
from ..dit import patchify_latent, unpatchify_tokens
from .face_blocks import (face_block_forward, face_encoder_forward,
                          init_face_block, init_face_encoder)
from .motion_encoder import get_motion, init_motion_encoder


@dataclass(frozen=True)
class WanAnimateConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 36
    dim: int = 5120
    ffn_dim: int = 13824
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 40
    num_layers: int = 40
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    motion_encoder_dim: int = 512
    use_img_emb: bool = True
    clip_tokens: int = 257
    clip_dim: int = 1280
    motion_size: int = 512
    motion_dim: int = 20
    vae_z_dim: int = 16          # pose latents / y channels
    face_width: int = 1024       # FaceEncoder conv width
    motion_channels: tuple = ()  # override CHANNELS for tiny configs

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def adapter_layers(self) -> int:
        return self.num_layers // 5


def init_wan_animate(key, cfg: WanAnimateConfig, param_dtype=jnp.float32
                     ) -> Dict:
    keys = iter(jax.random.split(key, 24))
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    params = {
        "patch_embed": nn.linear_init(next(keys), pt * ph * pw * cfg.in_dim,
                                      d, dtype=param_dtype),
        "pose_patch_embed": nn.linear_init(
            next(keys), pt * ph * pw * cfg.vae_z_dim, d,
            dtype=param_dtype),
        "text_embedding": nn.mlp_init(next(keys), (cfg.text_dim, d, d),
                                      init="normal", dtype=param_dtype),
        "time_embedding": nn.mlp_init(next(keys), (cfg.freq_dim, d, d),
                                      init="normal", dtype=param_dtype),
        "time_projection": nn.mlp_init(next(keys), (d, d * 6),
                                       dtype=param_dtype),
        "head": {
            "head": nn.linear_init(next(keys), d,
                                   pt * ph * pw * cfg.out_dim,
                                   init="zeros", dtype=param_dtype),
            "modulation": (jax.random.normal(next(keys), (2, d),
                                             param_dtype) / d ** 0.5)},
    }
    if cfg.use_img_emb:
        cd = cfg.clip_dim
        params["img_emb"] = {
            "ln0": {"w": jnp.ones((cd,), param_dtype),
                    "b": jnp.zeros((cd,), param_dtype)},
            "fc0": nn.linear_init(next(keys), cd, cd, dtype=param_dtype),
            "fc1": nn.linear_init(next(keys), cd, d, dtype=param_dtype),
            "ln1": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
        }

    def init_attn(k, img_kv=False):
        ks = jax.random.split(k, 6)
        p = {name: nn.linear_init(kk, d, d, dtype=param_dtype)
             for name, kk in zip(("q", "k", "v", "o"), ks)}
        if cfg.qk_norm:
            p["norm_q"] = jnp.ones((d,), param_dtype)
            p["norm_k"] = jnp.ones((d,), param_dtype)
        if img_kv:
            p["k_img"] = nn.linear_init(ks[4], d, d, dtype=param_dtype)
            p["v_img"] = nn.linear_init(ks[5], d, d, dtype=param_dtype)
            if cfg.qk_norm:
                p["norm_k_img"] = jnp.ones((d,), param_dtype)
        return p

    def init_block(k):
        k0, k1, k2, k3 = jax.random.split(k, 4)
        block = {
            "self_attn": init_attn(k0),
            "cross_attn": init_attn(k1, img_kv=cfg.use_img_emb),
            "ffn": nn.mlp_init(k2, (d, cfg.ffn_dim, d), dtype=param_dtype),
            "modulation": (jax.random.normal(k3, (6, d), param_dtype)
                           / d ** 0.5),
        }
        if cfg.cross_attn_norm:
            block["norm3"] = {"w": jnp.ones((d,), param_dtype),
                              "b": jnp.zeros((d,), param_dtype)}
        return block

    params["blocks"] = jax.vmap(init_block)(
        jax.random.split(next(keys), cfg.num_layers))

    params["motion_encoder"] = init_motion_encoder(
        next(keys), size=cfg.motion_size, dim=cfg.motion_encoder_dim,
        motion_dim=cfg.motion_dim,
        channels=dict(cfg.motion_channels) or None, dtype=param_dtype)
    params["face_encoder"] = init_face_encoder(
        next(keys), cfg.motion_encoder_dim, d, num_heads=4,
        width=cfg.face_width, dtype=param_dtype)
    params["face_adapter"] = jax.vmap(
        lambda k: init_face_block(k, d, cfg.num_heads,
                                  dtype=param_dtype))(
        jax.random.split(next(keys), cfg.adapter_layers))
    return params


def _qkv(p, x, n, policy, qk_norm):
    b, l, d = x.shape
    q = nn.linear(p["q"], x, compute_dtype=policy.compute_dtype)
    k = nn.linear(p["k"], x, compute_dtype=policy.compute_dtype)
    if qk_norm:
        q = nn.rms_norm(q, p["norm_q"].astype(q.dtype), eps=1e-6)
        k = nn.rms_norm(k, p["norm_k"].astype(k.dtype), eps=1e-6)
    v = nn.linear(p["v"], x, compute_dtype=policy.compute_dtype)
    dh = d // n
    return (q.reshape(b, l, n, dh), k.reshape(b, l, n, dh),
            v.reshape(b, l, n, dh))


def wan_animate_forward(
    params,
    cfg: WanAnimateConfig,
    x: jnp.ndarray,              # [B, F_lat+1, H, W, 36] (ref frame first)
    t: jnp.ndarray,              # [B]
    context: jnp.ndarray,        # [B, text_len, text_dim]
    clip_fea: Optional[jnp.ndarray],     # [B, 257, 1280]
    pose_latents: jnp.ndarray,   # [B, F_lat, H, W, 16]
    face_pixel_values: jnp.ndarray,      # [B, T_pix, S, S, 3] in [-1,1]
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
) -> jnp.ndarray:
    """Velocity prediction [B, F_lat+1, H, W, out_dim] (fp32)."""
    b = x.shape[0]
    n = cfg.num_heads

    # ---- patch embedding + pose injection (:339-346) ---------------------
    tokens, grid = patchify_latent(x.astype(policy.compute_dtype),
                                   cfg.patch_size)
    h = nn.linear(params["patch_embed"], tokens,
                  compute_dtype=policy.compute_dtype)
    pose_tok, pose_grid = patchify_latent(
        pose_latents.astype(policy.compute_dtype), cfg.patch_size)
    pose_h = nn.linear(params["pose_patch_embed"], pose_tok,
                       compute_dtype=policy.compute_dtype)
    per_frame = grid[1] * grid[2]
    # frames 1: get the pose embedding; frame 0 is the reference slot
    h = h.at[:, per_frame:].add(pose_h)
    l = h.shape[1]

    # ---- motion vectors (:347-361) ----------------------------------------
    bt, t_pix = face_pixel_values.shape[:2]
    flat_faces = face_pixel_values.reshape((bt * t_pix,)
                                           + face_pixel_values.shape[2:])
    motion = get_motion(params["motion_encoder"], flat_faces)
    motion = motion.reshape(bt, t_pix, -1)
    motion_vec = face_encoder_forward(params["face_encoder"], motion,
                                      num_heads=4)
    pad = jnp.zeros_like(motion_vec[:, :1])
    motion_vec = jnp.concatenate([pad, motion_vec], axis=1)

    # ---- time embeddings (fp32) -------------------------------------------
    e = sinusoidal_embedding_1d(cfg.freq_dim, t.astype(jnp.float32))
    e = nn.linear(params["time_embedding"]["fc0"], e,
                  compute_dtype=jnp.float32)
    e = nn.silu(e)
    e = nn.linear(params["time_embedding"]["fc1"], e,
                  compute_dtype=jnp.float32)                  # [B, dim]
    e0 = nn.linear(params["time_projection"]["fc0"], nn.silu(e),
                   compute_dtype=jnp.float32).reshape(b, 6, cfg.dim)

    # ---- context: [img(257) | text] (:414-425) ----------------------------
    ctx = context.astype(policy.compute_dtype)
    ctx = nn.linear(params["text_embedding"]["fc0"], ctx,
                    compute_dtype=policy.compute_dtype)
    ctx = nn.gelu_tanh(ctx)
    ctx_text = nn.linear(params["text_embedding"]["fc1"], ctx,
                         compute_dtype=policy.compute_dtype)
    if cfg.use_img_emb:
        ie = params["img_emb"]
        ci = nn.layer_norm(clip_fea.astype(jnp.float32),
                           weight=ie["ln0"]["w"].astype(jnp.float32),
                           bias=ie["ln0"]["b"].astype(jnp.float32))
        ci = nn.linear(ie["fc0"], ci, compute_dtype=jnp.float32)
        ci = jax.nn.gelu(ci, approximate=False)
        ci = nn.linear(ie["fc1"], ci, compute_dtype=jnp.float32)
        ci = nn.layer_norm(ci, weight=ie["ln1"]["w"].astype(jnp.float32),
                           bias=ie["ln1"]["b"].astype(jnp.float32))
        ctx_img = ci.astype(policy.compute_dtype)
    else:
        ctx_img = None

    rope_cos, rope_sin = build_rope_3d(cfg.head_dim, grid)
    x32 = h.astype(jnp.float32)
    dh = cfg.head_dim

    def block_fn(x32, bp, adapter_bp, use_adapter):
        mod = bp["modulation"].astype(jnp.float32)[None] + e0  # [B, 6, d]

        def m(i):
            return mod[:, i][:, None]                  # [B, 1, dim]

        # self attention
        y = nn.layer_norm(x32, eps=cfg.eps) * (1 + m(1)) + m(0)
        y = y.astype(policy.compute_dtype)
        q, k, v = _qkv(bp["self_attn"], y, n, policy, cfg.qk_norm)
        q = apply_rope(q, rope_cos, rope_sin).astype(policy.compute_dtype)
        k = apply_rope(k, rope_cos, rope_sin).astype(policy.compute_dtype)
        # softmax_bf16 threaded like the base DiT (dit.py): the CLI
        # --bf16_softmax knob must not silently no-op on the animate path
        sbound = None
        if policy.bounded_softmax and cfg.qk_norm:
            # bounded softmax (exact, core/dtypes.py): same qk-norm
            # score bound as the base DiT; rope preserves row norms
            sbound = 1.01 * dh * jnp.max(jnp.abs(
                bp["self_attn"]["norm_q"].astype(jnp.float32))) \
                * jnp.max(jnp.abs(
                    bp["self_attn"]["norm_k"].astype(jnp.float32)))
        attn = attention(q, k, v,
                         softmax_bf16=policy.softmax_bf16,
                         score_bound=sbound
                         ).reshape(b, l, cfg.dim)
        attn = nn.linear(bp["self_attn"]["o"], attn,
                         compute_dtype=policy.compute_dtype)
        x32 = x32 + attn.astype(jnp.float32) * m(2)

        # cross attention: text + img kv (:112-146)
        if "norm3" in bp:
            y = nn.layer_norm(x32, weight=bp["norm3"]["w"].astype(
                jnp.float32), bias=bp["norm3"]["b"].astype(jnp.float32),
                eps=cfg.eps)
        else:
            y = x32
        y = y.astype(policy.compute_dtype)
        ca = bp["cross_attn"]
        q = nn.linear(ca["q"], y, compute_dtype=policy.compute_dtype)
        if cfg.qk_norm:
            q = nn.rms_norm(q, ca["norm_q"].astype(q.dtype), eps=1e-6)
        q = q.reshape(b, l, n, dh)
        k = nn.linear(ca["k"], ctx_text,
                      compute_dtype=policy.compute_dtype)
        if cfg.qk_norm:
            k = nn.rms_norm(k, ca["norm_k"].astype(k.dtype), eps=1e-6)
        v = nn.linear(ca["v"], ctx_text,
                      compute_dtype=policy.compute_dtype)
        lt = ctx_text.shape[1]

        def _cbound(nk_name):
            if not (policy.bounded_softmax and cfg.qk_norm):
                return None
            return 1.01 * dh * jnp.max(jnp.abs(
                ca["norm_q"].astype(jnp.float32))) \
                * jnp.max(jnp.abs(ca[nk_name].astype(jnp.float32)))

        o = attention(q, k.reshape(b, lt, n, dh),
                      v.reshape(b, lt, n, dh),
                      score_bound=_cbound("norm_k")
                      ).reshape(b, l, cfg.dim)
        if ctx_img is not None:
            ki = nn.linear(ca["k_img"], ctx_img,
                           compute_dtype=policy.compute_dtype)
            if cfg.qk_norm:
                ki = nn.rms_norm(ki, ca["norm_k_img"].astype(ki.dtype),
                                 eps=1e-6)
            vi = nn.linear(ca["v_img"], ctx_img,
                           compute_dtype=policy.compute_dtype)
            li = ctx_img.shape[1]
            oi = attention(q, ki.reshape(b, li, n, dh),
                           vi.reshape(b, li, n, dh),
                           score_bound=_cbound("norm_k_img")
                           ).reshape(b, l, cfg.dim)
            o = o + oi
        o = nn.linear(ca["o"], o, compute_dtype=policy.compute_dtype)
        x32 = x32 + o.astype(jnp.float32)

        # ffn
        y = nn.layer_norm(x32, eps=cfg.eps) * (1 + m(4)) + m(3)
        y = y.astype(policy.compute_dtype)
        y = nn.linear(bp["ffn"]["fc0"], y,
                      compute_dtype=policy.compute_dtype)
        y = nn.gelu_tanh(y)
        y = nn.linear(bp["ffn"]["fc1"], y,
                      compute_dtype=policy.compute_dtype)
        x32 = x32 + y.astype(jnp.float32) * m(5)

        # face adapter every 5th block (:365-371)
        def with_face(x32):
            res = face_block_forward(adapter_bp, x32.astype(
                policy.compute_dtype), motion_vec, cfg.num_heads)
            return x32 + res.astype(jnp.float32)

        return jax.lax.cond(use_adapter, with_face, lambda z: z, x32)

    def scan_body(carry, inp):
        x32, idx = carry
        bp = inp
        adapter_bp = jax.tree_util.tree_map(
            lambda a: a[jnp.minimum(idx // 5, cfg.adapter_layers - 1)],
            params["face_adapter"])
        x32 = block_fn(x32, bp, adapter_bp, idx % 5 == 0)
        return (x32, idx + 1), None

    (x32, _), _ = jax.lax.scan(scan_body, (x32, jnp.asarray(0)),
                               params["blocks"])

    # ---- head (:39-52) -----------------------------------------------------
    hp = params["head"]
    hm = hp["modulation"].astype(jnp.float32)[None] + e[:, None]  # [B,2,d]
    y = nn.layer_norm(x32, eps=cfg.eps) * (1 + hm[:, 1][:, None]) \
        + hm[:, 0][:, None]
    out = nn.linear(hp["head"], y, compute_dtype=jnp.float32)
    return unpatchify_tokens(out.astype(jnp.float32), grid, cfg.patch_size,
                             cfg.out_dim)
