"""BAGEL unified multimodal model (Qwen2-MoT + SigLIP NaViT + image VAE).

Behavioral parity with reference models/BAGEL/modeling/bagel/bagel.py:
context building (prepare_prompts:232, prepare_vit_images:299,
prepare_vae_latent:552), cache updaters (forward_cache_update_text:266,
_vit:361), autoregressive text decode (generate_text:929-1000) and native
image generation via Euler flow matching inside the LLM with dual CFG and
renorm (generate_image:643-754, _forward_flow:756-907).

TPU redesign:
  * GenContext is a pytree {kv cache, rope position}; every reference
    "packed index bookkeeping" list op reduces to appending at the cache
    cursor (see qwen2_mot.py) because contexts are built sequentially.
  * Text decode is a `lax.scan` over a fixed max_length with an end-token
    finished mask (no data-dependent while loop; the reference breaks at
    eos for batch=1, generate_text:996).
  * The image-gen flow loop is a scan over precomputed shifted timesteps;
    the three CFG branches run as three cache-frozen LM calls per step
    (bagel.py:820-871), combined with global/channel/text_channel renorm.
  * All image tokens share one rope position (prepare_vae_latent:591);
    spatial structure enters via the frozen 2D sin-cos latent position
    table (modeling_utils.py:127-143).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn
from .qwen2_mot import (
    Qwen2MoTConfig,
    init_kv_cache,
    init_qwen2_mot,
    lm_head_logits,
    qwen2_mot_forward,
)


@dataclass(frozen=True)
class BagelConfig:
    llm: Qwen2MoTConfig = Qwen2MoTConfig()
    latent_patch_size: int = 2
    max_latent_size: int = 64
    latent_channel: int = 16
    vae_downsample: int = 8
    vit_hidden_size: int = 1152
    vit_patch_size: int = 14
    vit_max_num_patch_per_side: int = 70
    timestep_shift: float = 1.0
    # special token ids (data/data_utils.py:130-165 adds these)
    start_of_image: int = 151652
    end_of_image: int = 151653
    bos_token_id: int = 151644
    eos_token_id: int = 151645

    @property
    def latent_downsample(self) -> int:
        return self.vae_downsample * self.latent_patch_size

    @property
    def patch_latent_dim(self) -> int:
        return self.latent_patch_size ** 2 * self.latent_channel


# ---------------------------------------------------------------------------
# frozen 2D sin-cos tables (modeling_utils.py:24-68; [sin|cos] per half,
# first half encodes the column (w) coordinate)
# ---------------------------------------------------------------------------


def sincos_2d_table(dim: int, side: int) -> np.ndarray:
    def emb_1d(pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 4, dtype=np.float64)
                                / (dim / 4))
        out = np.outer(pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    idx = np.arange(side * side)
    h_idx, w_idx = idx // side, idx % side
    return np.concatenate([emb_1d(w_idx), emb_1d(h_idx)],
                          axis=1).astype(np.float32)


def flattened_position_ids(h_patches: int, w_patches: int,
                           max_per_side: int) -> np.ndarray:
    """Extrapolate variant (data_utils.py:53-58)."""
    hh = np.arange(h_patches)
    ww = np.arange(w_patches)
    return (hh[:, None] * max_per_side + ww[None, :]).reshape(-1)


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """DiT-style [cos|sin] embedding (modeling_utils.py:88-104)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_bagel(key, cfg: BagelConfig, param_dtype=jnp.float32,
               init_llm: bool = True):
    keys = iter(jax.random.split(key, 8))
    d = cfg.llm.hidden_size
    params = {
        "time_embedder": nn.mlp_init(next(keys), (256, d, d),
                                     init="normal", dtype=param_dtype),
        "vae2llm": nn.linear_init(next(keys), cfg.patch_latent_dim, d,
                                  init="normal", dtype=param_dtype),
        # zero-init (bagel.py:97-100)
        "llm2vae": nn.linear_init(next(keys), d, cfg.patch_latent_dim,
                                  init="zeros", dtype=param_dtype),
        "latent_pos_embed": jnp.asarray(
            sincos_2d_table(d, cfg.max_latent_size), param_dtype),
        "connector": nn.mlp_init(next(keys), (cfg.vit_hidden_size, d, d),
                                 init="normal", dtype=param_dtype),
        "vit_pos_embed": jnp.asarray(
            sincos_2d_table(d, cfg.vit_max_num_patch_per_side),
            param_dtype),
    }
    if init_llm:
        params["llm"] = init_qwen2_mot(next(keys), cfg.llm, param_dtype)
    return params


def init_gen_context(cfg: BagelConfig, capacity: int = 4096,
                     dtype=jnp.bfloat16):
    """gen_context equivalent (influencer.py:34-40): KV cache + rope pos."""
    return {"cache": init_kv_cache(cfg.llm, capacity, dtype),
            "rope": jnp.zeros((), jnp.int32)}


# ---------------------------------------------------------------------------
# context updaters
# ---------------------------------------------------------------------------


def update_context_text(params, cfg: BagelConfig, ctx, text_ids,
                        compute_dtype=jnp.bfloat16, n_valid=None):
    """Causal prefill of [bos] + text + [eos] ids (already wrapped by the
    caller/tokenizer, prepare_prompts:245-246). text_ids: [L] int32.

    n_valid (traced scalar) enables BUCKETED prefill: ids are padded to a
    fixed length, only the first n_valid advance the cache/rope — so one
    compiled program serves every prompt length in the bucket."""
    x = params["llm"]["embed_tokens"][text_ids].astype(compute_dtype)
    pos = ctx["rope"] + jnp.arange(text_ids.shape[0])
    q_valid = None if n_valid is None else jnp.asarray(n_valid, jnp.int32)
    _, cache = qwen2_mot_forward(
        params["llm"], cfg.llm, x, pos, ctx["cache"], mode="und",
        q_valid=q_valid, is_causal=True, compute_dtype=compute_dtype,
        final_norm=False)
    advance = text_ids.shape[0] if n_valid is None else q_valid
    return {"cache": cache, "rope": ctx["rope"] + advance}


def update_context_vit(params, cfg: BagelConfig, ctx, vit_embeds,
                       vit_pos_ids, compute_dtype=jnp.bfloat16,
                       n_valid=None):
    """Append [start_of_image] + connector(vit_embeds)+pos + [end_of_image]
    non-causally (forward_cache_update_vit:361-419). vit_embeds: [N, vit_d]
    from the SigLIP encoder.

    n_valid (traced scalar) enables BUCKETED appends: vit_embeds is padded
    to a fixed bucket, the end-of-image token is scattered to row
    n_valid+1, and only n_valid+2 rows advance the cache — one compiled
    program per bucket instead of one per image shape."""
    emb = params["llm"]["embed_tokens"]
    tok = nn.linear(params["connector"]["fc0"],
                    vit_embeds.astype(compute_dtype),
                    compute_dtype=compute_dtype)
    tok = nn.gelu_tanh(tok)
    tok = nn.linear(params["connector"]["fc1"], tok,
                    compute_dtype=compute_dtype)
    tok = tok + params["vit_pos_embed"][vit_pos_ids].astype(compute_dtype)

    start = emb[cfg.start_of_image][None].astype(compute_dtype)
    end = emb[cfg.end_of_image][None].astype(compute_dtype)
    if n_valid is None:
        seq = jnp.concatenate([start, tok, end], axis=0)
        q_valid = None
    else:
        n_valid = jnp.asarray(n_valid, jnp.int32)
        seq = jnp.concatenate([start, tok, end], axis=0)
        seq = seq.at[n_valid + 1].set(end[0])
        q_valid = n_valid + 2
    pos = jnp.full((seq.shape[0],), ctx["rope"], jnp.int32)
    _, cache = qwen2_mot_forward(
        params["llm"], cfg.llm, seq, pos, ctx["cache"], mode="und",
        q_valid=q_valid, is_causal=False, compute_dtype=compute_dtype,
        final_norm=False)
    return {"cache": cache, "rope": ctx["rope"] + 1}


def patchify_latent(latent: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[H_lat, W_lat, c] -> [h*w, p*p*c], inner order (p, q, c) — matches
    the reference's 'chpwq->hwpqc' einsum (bagel.py:517-521) and is the
    exact inverse of unpatchify_latent."""
    hl, wl, c = latent.shape
    x = latent.reshape(hl // patch, patch, wl // patch, patch, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(-1, patch * patch * c)


def update_context_vae(params, cfg: BagelConfig, ctx, latent,
                       timestep: float = 0.0, compute_dtype=jnp.bfloat16):
    """Append the VAE-latent view of a context image:
    [start_of_image] + (vae2llm(patchified latent) + t_emb(timestep) +
    2D latent pos-embed) + [end_of_image], non-causally, all rows at one
    rope position, latent rows routed to the GEN expert and the start/end
    tokens to the und expert (reference prepare_vae_images +
    forward_cache_update_vae, bagel.py:417-551 — packed_timesteps
    defaults to 0, mode='gen' with packed_vae/text_indexes when MoE).

    This is the second tower of `update_context_image(vae=True)`
    (influencer.py:72-110): image *editing* / image-conditioned generation
    conditions on BOTH the semantic (ViT) and reconstructive (VAE) views.

    latent: [H_lat, W_lat, latent_channel] — an image_vae_encode output.
    """
    p = cfg.latent_patch_size
    hl, wl, _ = latent.shape
    hh, ww = hl // p, wl // p
    n_tok = hh * ww
    tokens = patchify_latent(latent.astype(jnp.float32), p)
    pos_rows = jnp.asarray(flattened_position_ids(hh, ww,
                                                  cfg.max_latent_size))
    t_emb = nn.linear(
        params["time_embedder"]["fc1"],
        nn.silu(nn.linear(params["time_embedder"]["fc0"],
                          timestep_embedding(
                              jnp.asarray([timestep], jnp.float32), 256),
                          compute_dtype=jnp.float32)),
        compute_dtype=jnp.float32)[0]
    x_tok = nn.linear(params["vae2llm"], tokens, compute_dtype=jnp.float32)
    x_tok = x_tok + t_emb[None] + \
        params["latent_pos_embed"][pos_rows].astype(jnp.float32)

    emb = params["llm"]["embed_tokens"]
    seq = jnp.concatenate([
        emb[cfg.start_of_image][None].astype(compute_dtype),
        x_tok.astype(compute_dtype),
        emb[cfg.end_of_image][None].astype(compute_dtype)], axis=0)
    pos = jnp.full((n_tok + 2,), ctx["rope"], jnp.int32)
    und_rows = jnp.asarray([0, n_tok + 1], jnp.int32)
    _, cache = qwen2_mot_forward(
        params["llm"], cfg.llm, seq, pos, ctx["cache"], mode="gen",
        und_rows=und_rows, is_causal=False, compute_dtype=compute_dtype,
        final_norm=False)
    return {"cache": cache, "rope": ctx["rope"] + 1}


# ---------------------------------------------------------------------------
# text generation (AR decode as lax.scan)
# ---------------------------------------------------------------------------


def generate_text(params, cfg: BagelConfig, ctx, max_length: int,
                  do_sample: bool = False, temperature: float = 1.0,
                  end_token_id: Optional[int] = None,
                  rng: Optional[jax.Array] = None,
                  compute_dtype=jnp.bfloat16):
    """Greedy/temperature decode from [bos] (generate_text:929-1000).

    Returns (tokens [max_length] int32, length scalar). Positions after the
    finished mask hold end_token_id.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    end_id = end_token_id if end_token_id is not None else cfg.eos_token_id

    def step(carry, rng_i):
        cache, rope, cur, finished = carry
        x = params["llm"]["embed_tokens"][cur[None]].astype(compute_dtype)
        h, cache = qwen2_mot_forward(
            params["llm"], cfg.llm, x, rope[None], cache, mode="und",
            is_causal=True, compute_dtype=compute_dtype, final_norm=True)
        logits = lm_head_logits(params["llm"], cfg.llm, h,
                                compute_dtype=compute_dtype)[0]
        if do_sample:
            nxt = jax.random.categorical(rng_i, logits / temperature)
        else:
            nxt = jnp.argmax(logits)
        nxt = nxt.astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        finished = finished | (nxt == end_id)
        return (cache, rope + 1, nxt, finished), nxt

    init = (ctx["cache"], ctx["rope"],
            jnp.asarray(cfg.bos_token_id, jnp.int32),
            jnp.asarray(False))
    rngs = jax.random.split(rng, max_length)
    (_, _, _, _), tokens = jax.lax.scan(step, init, rngs)
    length = jnp.argmax(tokens == end_id) + 1
    length = jnp.where(jnp.any(tokens == end_id), length, max_length)
    return tokens, length


# ---------------------------------------------------------------------------
# image generation (Euler flow with dual CFG + renorm)
# ---------------------------------------------------------------------------


def _flow_hidden(params, cfg: BagelConfig, x_t, t_scalar, text_rows,
                 pos_table_rows, start_end_ids, rope_pos, cache,
                 compute_dtype):
    """One LM pass in gen mode -> last-layer hidden (pre final-norm)
    [n_tok+2, hidden] (_forward_flow:796-833). Split from the norm +
    llm2vae tail so TaylorSeer can cache/extrapolate exactly the feature
    the reference hooks (qwen2_navit.py:825-830)."""
    l = x_t.shape[0] + 2
    emb = params["llm"]["embed_tokens"]
    t_emb = nn.linear(
        params["time_embedder"]["fc1"],
        nn.silu(nn.linear(params["time_embedder"]["fc0"],
                          timestep_embedding(t_scalar[None], 256),
                          compute_dtype=jnp.float32)),
        compute_dtype=jnp.float32)[0]
    x_tok = nn.linear(params["vae2llm"], x_t.astype(jnp.float32),
                      compute_dtype=jnp.float32)
    x_tok = x_tok + t_emb[None] + \
        params["latent_pos_embed"][pos_table_rows].astype(jnp.float32)

    seq = jnp.zeros((l, cfg.llm.hidden_size), compute_dtype)
    seq = seq.at[0].set(emb[start_end_ids[0]].astype(compute_dtype))
    seq = seq.at[-1].set(emb[start_end_ids[1]].astype(compute_dtype))
    seq = seq.at[1:-1].set(x_tok.astype(compute_dtype))

    pos = jnp.full((l,), rope_pos, jnp.int32)
    h, _ = qwen2_mot_forward(
        params["llm"], cfg.llm, seq, pos, cache, mode="gen",
        und_rows=text_rows, is_causal=False, compute_dtype=compute_dtype,
        final_norm=False)
    return h


def _flow_post(params, cfg: BagelConfig, h, text_rows, compute_dtype):
    """Final dual norm + llm2vae + vae-row slice (the tail of
    qwen2_mot_forward(final_norm=True) and _forward_flow)."""
    from .qwen2_mot import _expert_norm

    llm = params["llm"]
    h = h.astype(compute_dtype)
    if cfg.llm.moe:
        h = _expert_norm(llm["norm"], llm["norm_gen"], h, text_rows,
                         cfg.llm.rms_norm_eps)
    else:
        h = nn.rms_norm(h, llm["norm"].astype(h.dtype),
                        eps=cfg.llm.rms_norm_eps)
    v = nn.linear(params["llm2vae"], h.astype(jnp.float32),
                  compute_dtype=jnp.float32)
    return v[1:-1]


def _flow_velocity(params, cfg: BagelConfig, x_t, t_scalar, text_rows,
                   vae_rows, pos_table_rows, start_end_ids, rope_pos,
                   cache, compute_dtype):
    """One LM pass in gen mode -> velocity on the vae rows."""
    h = _flow_hidden(params, cfg, x_t, t_scalar, text_rows,
                     pos_table_rows, start_end_ids, rope_pos, cache,
                     compute_dtype)
    return _flow_post(params, cfg, h, text_rows, compute_dtype)


def generate_image_latent(
    params,
    cfg: BagelConfig,
    ctx,                           # conditioning context (text [+ vit])
    image_shape: Tuple[int, int],  # (H, W) pixels
    *,
    cfg_text_ctx=None,             # context without the text prompt
    cfg_img_ctx=None,              # text-only context (no image)
    num_timesteps: int = 50,
    timestep_shift: float = 3.0,
    cfg_text_scale: float = 4.0,
    cfg_img_scale: float = 1.5,
    cfg_interval: Tuple[float, float] = (0.4, 1.0),
    cfg_renorm_min: float = 0.0,
    cfg_renorm_type: str = "global",
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    enable_taylorseer: bool = False,
    taylorseer_cfg=None,
):
    """Returns the denoised patched latent [num_tokens, patch_latent_dim]
    plus the (h, w) latent grid (generate_image:643-754)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    hh = image_shape[0] // cfg.latent_downsample
    ww = image_shape[1] // cfg.latent_downsample
    n_tok = hh * ww
    pos_rows = jnp.asarray(flattened_position_ids(
        hh, ww, cfg.max_latent_size))
    text_rows = jnp.asarray([0, n_tok + 1], jnp.int32)
    se_ids = (cfg.start_of_image, cfg.end_of_image)

    x = jax.random.normal(rng, (n_tok, cfg.patch_latent_dim), jnp.float32)

    # shifted timestep ladder (generate_image:698-701)
    ts = np.linspace(1.0, 0.0, num_timesteps)
    ts = timestep_shift * ts / (1 + (timestep_shift - 1) * ts)
    dts = ts[:-1] - ts[1:]
    ts_dev = jnp.asarray(ts[:-1], jnp.float32)
    dts_dev = jnp.asarray(dts, jnp.float32)
    # cfg gating per step (generate_image:705-711)
    gate = np.asarray([(t > cfg_interval[0]) and (t <= cfg_interval[1])
                       for t in ts[:-1]], np.float32)
    gate_dev = jnp.asarray(gate)

    # TaylorSeer: precomputed host schedule + fixed-slot factor stacks
    # carried through the scan, one per CFG branch (bagel.py:680-689)
    if enable_taylorseer:
        from ...ops.taylorseer import (TaylorSeerConfig, init_taylor_cache,
                                       taylor_predict, taylor_update,
                                       taylorseer_schedule)
        ts_cfg = taylorseer_cfg or TaylorSeerConfig()
        sched = {k: jnp.asarray(v) for k, v in
                 taylorseer_schedule(num_timesteps - 1, ts_cfg).items()}
        feat_shape = (n_tok + 2, cfg.llm.hidden_size)
        caches0 = tuple(init_taylor_cache(feat_shape, ts_cfg.max_order)
                        for _ in range(3))
    else:
        sched = None
        caches0 = (jnp.zeros(()),) * 3

    def hidden(x_t, t, ctx_i):
        return _flow_hidden(params, cfg, x_t, t, text_rows, pos_rows,
                            se_ids, ctx_i["rope"], ctx_i["cache"],
                            compute_dtype)

    def vel(x_t, t, ctx_i, cache, ts_xs):
        """LM velocity, via TaylorSeer cache when enabled."""
        if not enable_taylorseer:
            h = hidden(x_t, t, ctx_i)
            return _flow_post(params, cfg, h, text_rows, compute_dtype), \
                cache

        def full(c):
            h = hidden(x_t, t, ctx_i)
            return h.astype(jnp.float32), \
                taylor_update(c, h, ts_xs["dd"], ts_xs["n_upd"])

        def taylor(c):
            return taylor_predict(c, ts_xs["x"], ts_xs["n_stored"]), c

        h, cache = jax.lax.cond(ts_xs["is_full"] > 0, full, taylor, cache)
        return _flow_post(params, cfg, h, text_rows, compute_dtype), cache

    def step(carry, xs):
        x_t, c0, c1, c2 = carry
        (t, dt, g), ts_xs = xs
        v, c0 = vel(x_t, t, ctx, c0, ts_xs)
        text_scale = 1.0 + g * (cfg_text_scale - 1.0)
        img_scale = 1.0 + g * (cfg_img_scale - 1.0)
        if cfg_text_ctx is not None and cfg_text_scale > 1.0:
            v_text, c1 = vel(x_t, t, cfg_text_ctx, c1, ts_xs)
            v_ = v_text + text_scale * (v - v_text)
            if cfg_img_ctx is not None and cfg_img_scale > 1.0:
                v_img, c2 = vel(x_t, t, cfg_img_ctx, c2, ts_xs)
                v_ = v_img + img_scale * (v_ - v_img)
            # renorm towards the cond velocity norm (bagel.py:873-905)
            if cfg_renorm_type == "global":
                norm_v = jnp.linalg.norm(v)
                norm_g = jnp.linalg.norm(v_)
            else:  # "channel" / "text_channel"
                norm_v = jnp.linalg.norm(v, axis=-1, keepdims=True)
                norm_g = jnp.linalg.norm(v_, axis=-1, keepdims=True)
            scale = jnp.clip(norm_v / (norm_g + 1e-8), cfg_renorm_min, 1.0)
            v = v_ * scale
        x_t = x_t - v * dt
        return (x_t, c0, c1, c2), None

    ts_scan = sched if sched is not None else {
        "is_full": jnp.ones_like(ts_dev), "dd": jnp.zeros_like(ts_dev),
        "x": jnp.zeros_like(ts_dev),
        "n_upd": jnp.zeros_like(ts_dev, jnp.int32),
        "n_stored": jnp.zeros_like(ts_dev, jnp.int32)}
    (x, _, _, _), _ = jax.lax.scan(
        step, (x,) + caches0, ((ts_dev, dts_dev, gate_dev), ts_scan))
    return x, (hh, ww)


def unpatchify_latent(latent_tokens: jnp.ndarray, grid: Tuple[int, int],
                      patch: int, channels: int) -> jnp.ndarray:
    """[h*w, p*p*c] -> [H_lat, W_lat, c] (influencer decode path)."""
    h, w = grid
    x = latent_tokens.reshape(h, w, patch, patch, channels)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(h * patch, w * patch, channels)
