"""Wan2.2 diffusion transformer (DiT), TPU-native.

Behavioral parity with reference models/wan/utils/modules/model.py:294-546
(WanModel: Conv3d patch embed -> N x WanAttentionBlock with 3D-RoPE
self-attention, cross-attention to text context and 6-way AdaLN modulation
-> modulated Head -> unpatchify), re-designed for XLA:

  * channels-last [B, F, H, W, C] layout; patch embedding as a
    reshape+matmul (kernel == stride, so Conv3d is exactly a dense layer
    over flattened patches — MXU-friendly, no conv windowing).
  * per-token timesteps (model.py:460-469 expands t to [B, L]) carried as
    a TWO-VALUE form: the reference only ever mixes the sample timestep t
    with t=0 (i2v first-frame clamping via mask2, textimage2video.py:
    373-378), so we embed {t, 0} once ([B, 2, ...]) and select per token —
    O(2) time-MLP evaluations instead of O(L).
  * fp32 islands exactly where the reference asserts fp32: time
    embeddings, AdaLN modulation, residual stream accumulation
    (model.py:237-258, 462-469), RoPE rotation, norm statistics.
  * CFG cond/uncond run as one batch-2 call (the reference runs them
    sequentially, textimage2video.py:380-386 — batching is free speedup).
  * TMA (dynamic text weight) is an explicit argument: the caller scales
    the context prefix per step (ops/tma.py) instead of monkey-patching
    cross-attention (model_pipeline.py:1742-1810).
  * optional Ulysses sequence parallelism: pass sp_axis inside shard_map;
    self-attention does all-to-all over heads (parallel/ulysses.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.ad_checkpoint  # noqa: F401  (registers jax.ad_checkpoint)
import jax.numpy as jnp

from ...core import nn
from ...core.config import WanDiTConfig
from ...core.dtypes import DTypePolicy, DEFAULT_POLICY
from ...kernels.attention import attention
from ...ops.embeddings import sinusoidal_embedding_1d
from ...ops.rope import apply_rope
from ...parallel.ulysses import ulysses_attention


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_wan_dit(key, cfg: WanDiTConfig, param_dtype=jnp.float32):
    """Parameter pytree. Weight layouts are [in, out]; the patch embed is a
    dense layer over (pt, ph, pw, c_in)-flattened patches.

    Blocks are STACKED: every block leaf has a leading [num_layers] axis so
    the forward runs them as one `lax.scan` (compile-once-per-block instead
    of a 30x unrolled program) and FSDP shards the stacked leaves."""
    keys = iter(jax.random.split(key, 16 + cfg.num_layers))
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    patch_in = pt * ph * pw * cfg.in_dim

    params = {
        "patch_embed": nn.linear_init(next(keys), patch_in, d,
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
                                             param_dtype) / d ** 0.5),
        },
        "blocks": {},
    }

    def init_attn(k):
        ks = jax.random.split(k, 4)
        p = {name: nn.linear_init(kk, d, d, dtype=param_dtype)
             for name, kk in zip(("q", "k", "v", "o"), ks)}
        if cfg.qk_norm:
            p["norm_q"] = jnp.ones((d,), param_dtype)
            p["norm_k"] = jnp.ones((d,), param_dtype)
        return p

    def init_block(k):
        k0, k1, k2, k3 = jax.random.split(k, 4)
        block = {
            "self_attn": init_attn(k0),
            "cross_attn": init_attn(k1),
            "ffn": nn.mlp_init(k2, (d, cfg.ffn_dim, d), dtype=param_dtype),
            "modulation": (jax.random.normal(k3, (6, d), param_dtype)
                           / d ** 0.5),
        }
        if cfg.cross_attn_norm:
            block["norm3"] = {"w": jnp.ones((d,), param_dtype),
                              "b": jnp.zeros((d,), param_dtype)}
        return block

    block_keys = jax.random.split(next(keys), cfg.num_layers)
    params["blocks"] = jax.vmap(init_block)(block_keys)
    return params


# ---------------------------------------------------------------------------
# patch <-> token
# ---------------------------------------------------------------------------


def patchify_latent(x: jnp.ndarray, patch_size: Tuple[int, int, int]
                    ) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """[B, F, H, W, C] -> [B, L, pt*ph*pw*C] tokens in (f, h, w) raster
    order (matches model.py:448-451 flatten order); returns token grid."""
    b, f, h, w, c = x.shape
    pt, ph, pw = patch_size
    gf, gh, gw = f // pt, h // ph, w // pw
    x = x.reshape(b, gf, pt, gh, ph, gw, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B, gf, gh, gw, pt, ph, pw, C]
    return x.reshape(b, gf * gh * gw, pt * ph * pw * c), (gf, gh, gw)


def unpatchify_tokens(tokens: jnp.ndarray, grid: Tuple[int, int, int],
                      patch_size: Tuple[int, int, int], out_dim: int
                      ) -> jnp.ndarray:
    """[B, L, pt*ph*pw*C] -> [B, F, H, W, C]. Inner ordering (pt, ph, pw, c)
    matches the reference unpatchify einsum 'fhwpqrc->cfphqwr'
    (model.py:499-522)."""
    b = tokens.shape[0]
    gf, gh, gw = grid
    pt, ph, pw = patch_size
    x = tokens[:, :gf * gh * gw].reshape(b, gf, gh, gw, pt, ph, pw, out_dim)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, gf * pt, gh * ph, gw * pw, out_dim)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _attn_qkv(p, x, n_heads, policy):
    b, l, d = x.shape
    dh = d // n_heads
    q = nn.linear(p["q"], x, compute_dtype=policy.compute_dtype)
    k = nn.linear(p["k"], x, compute_dtype=policy.compute_dtype)
    if "norm_q" in p:
        q = nn.rms_norm(q, p["norm_q"].astype(policy.compute_dtype),
                        eps=1e-6)
        k = nn.rms_norm(k, p["norm_k"].astype(policy.compute_dtype),
                        eps=1e-6)
    v = nn.linear(p["v"], x, compute_dtype=policy.compute_dtype)
    return (q.reshape(b, l, n_heads, dh), k.reshape(b, l, n_heads, dh),
            v.reshape(b, l, n_heads, dh))


def _modulated(x32, shift, scale, eps):
    """AdaLN: LayerNorm(x) * (1 + scale) + shift, fp32 statistics
    regardless of the residual dtype (model.py:243-253)."""
    y = nn.layer_norm(x32.astype(jnp.float32), eps=eps)
    return y * (1.0 + scale) + shift


def _select_rows(e_pair, mask):
    """e_pair [B, 2, ...] -> per-token [B, L, ...] via t-zero mask [B, L].

    Row 0 = embedding of t, row 1 = embedding of 0. XLA fuses the select
    into consumers, so [B, L, 6, dim] is never materialized in HBM.
    """
    e_t = e_pair[:, 0][:, None]
    e_0 = e_pair[:, 1][:, None]
    m = mask[(...,) + (None,) * (e_pair.ndim - 2)]
    return jnp.where(m, e_0, e_t)


def _embed_inputs(params, cfg: WanDiTConfig, x, t, context,
                  policy: DTypePolicy):
    """Patch/time/text embeddings shared by the single-device and
    sequence-parallel drivers.

    Returns (h tokens [B, L, d], grid, e [B,2,dim], e0 [B,2,6,dim],
    ctx [B, text_len, dim])."""
    b = x.shape[0]
    tokens, grid = patchify_latent(x.astype(policy.compute_dtype),
                                   cfg.patch_size)
    h = nn.linear(params["patch_embed"], tokens,
                  compute_dtype=policy.compute_dtype)

    # ---- time embeddings (fp32 island), two-value form -------------------
    t_pair = jnp.stack([t.astype(jnp.float32),
                        jnp.zeros_like(t, jnp.float32)], axis=1)  # [B, 2]
    e = sinusoidal_embedding_1d(cfg.freq_dim, t_pair)             # [B,2,freq]
    e = nn.linear(params["time_embedding"]["fc0"], e,
                  compute_dtype=jnp.float32)
    e = nn.silu(e)
    e = nn.linear(params["time_embedding"]["fc1"], e,
                  compute_dtype=jnp.float32)                      # [B,2,dim]
    # time_projection = SiLU -> Linear(dim, 6*dim)  (model.py:386)
    e0 = nn.linear(params["time_projection"]["fc0"], nn.silu(e),
                   compute_dtype=jnp.float32)
    e0 = e0.reshape(b, 2, 6, cfg.dim)                             # [B,2,6,d]

    # ---- text context embedding ------------------------------------------
    ctx = context.astype(policy.compute_dtype)
    ctx = nn.linear(params["text_embedding"]["fc0"], ctx,
                    compute_dtype=policy.compute_dtype)
    ctx = nn.gelu_tanh(ctx)
    ctx = nn.linear(params["text_embedding"]["fc1"], ctx,
                    compute_dtype=policy.compute_dtype)
    return h, grid, e, e0, ctx


def _pad_rope(rope_cos, rope_sin, l):
    """Pad RoPE tables to l with the identity rotation (cos=1, sin=0)."""
    if rope_cos.shape[0] < l:
        pad = l - rope_cos.shape[0]
        rope_cos = jnp.pad(rope_cos, ((0, pad), (0, 0)),
                           constant_values=1.0)
        rope_sin = jnp.pad(rope_sin, ((0, pad), (0, 0)))
    return rope_cos, rope_sin


def _blocks_and_head(params, cfg: WanDiTConfig, h, e, e0, ctx,
                     rope_cos, rope_sin, t_zero_mask, self_kv_len, *,
                     policy: DTypePolicy, sp_axis: Optional[str] = None,
                     sp_impl: str = "ulysses",  # 'ulysses' | 'ring'
                     fused_rope: bool = False,
                     remat_blocks: bool = False) -> jnp.ndarray:
    """Block scan + modulated head over (possibly seq-local) tokens.

    h [B, L_local, d]; rope tables are the GLOBAL (padded) tables — under
    sp the per-shard slice (reference sequence_parallel.py:50-55) is
    taken here via axis_index, and the fused-rope ulysses path consumes
    the full tables post-all-to-all; t_zero_mask [B, L_local];
    self_kv_len [B] masks padded keys of the GLOBAL sequence. Returns
    head output tokens [B, L_local, patch_out].
    """
    b, l, _ = h.shape
    n = cfg.num_heads
    ctx_len = ctx.shape[1]
    rdt = policy.residual_dtype
    x32 = h.astype(rdt)  # residual stream (fp32 default; bf16 policy opt)

    # fused-rope prologue (inference fast path): the per-layer fp32
    # cast/rotate/cast chain over q/k (~300 ms/step at the 1.3B point)
    # moves into the Pallas kernel; tables built once per forward.
    # Under ulysses SP the all-to-all re-assembles the FULL sequence in
    # global order on every chip, so the global tables fuse there too;
    # the ring path keeps per-shard XLA rotation (kv chunks rotate
    # between chips, so no single in-kernel table applies).
    rope_tabs = None
    if fused_rope and (sp_axis is None or sp_impl == "ulysses"):
        from ...kernels.flash_attention import build_fused_rope_tables
        rope_tabs = build_fused_rope_tables(rope_cos, rope_sin,
                                            cfg.head_dim)
    if sp_axis is not None:
        # per-shard slice of the global tables for the XLA rotation path
        start = jax.lax.axis_index(sp_axis) * l
        rope_cos = jax.lax.dynamic_slice_in_dim(rope_cos, start, l)
        rope_sin = jax.lax.dynamic_slice_in_dim(rope_sin, start, l)

    def block_fn(x32, bp):
        mod = bp["modulation"].astype(jnp.float32)[None, None] + e0
        # mod [B, 2, 6, dim] -> per-token selections
        def sel(i):
            return _select_rows(mod[:, :, i], t_zero_mask)

        # self-attention
        y = _modulated(x32, sel(0), sel(1), cfg.eps)
        y = y.astype(policy.compute_dtype)
        q, k, v = _attn_qkv(bp["self_attn"], y, n, policy)
        # bounded-softmax score bound (exact, see core/dtypes.py): qk-norm
        # keeps every q/k row norm <= max|gain| * sqrt(d); rope preserves
        # norms, so |q.k| <= d * max|g_q| * max|g_k|. The 1% margin
        # absorbs bf16 rounding of the normalized rows (overshoot is
        # harmless: exp2 args stay ~<= 0 either way).
        bound = None
        if policy.bounded_softmax and "norm_q" in bp["self_attn"]:
            gq = jnp.max(jnp.abs(
                bp["self_attn"]["norm_q"].astype(jnp.float32)))
            gk = jnp.max(jnp.abs(
                bp["self_attn"]["norm_k"].astype(jnp.float32)))
            bound = 1.01 * cfg.head_dim * gq * gk
        if rope_tabs is None:
            q = apply_rope(q, rope_cos,
                           rope_sin).astype(policy.compute_dtype)
            k = apply_rope(k, rope_cos,
                           rope_sin).astype(policy.compute_dtype)
        if sp_axis is not None and sp_impl == "ring":
            # long-video slot: kv rotates around the ring, O(L/sp)
            # activations per chip (parallel/ring.py)
            from ...parallel.ring import ring_attention
            attn = ring_attention(q, k, v, sp_axis,
                                  seq_len_global=self_kv_len)
        elif sp_axis is not None:
            attn = ulysses_attention(q, k, v, sp_axis,
                                     kv_len=self_kv_len,
                                     rope_tables=rope_tabs,
                                     softmax_bf16=policy.softmax_bf16,
                                     qk_int8=policy.qk_int8,
                                     score_bound=bound)
        else:
            attn = attention(q, k, v, kv_len=self_kv_len,
                             rope_tables=rope_tabs,
                             softmax_bf16=policy.softmax_bf16,
                             qk_int8=policy.qk_int8,
                             score_bound=bound)
        # named for the 'attn' remat policy: saving just this tensor
        # (~100 MB/block at 33k tokens) lets the backward skip
        # re-running the flash forward while everything else remats.
        # Saved in compute dtype: the o-projection consumes it in bf16
        # anyway, and the fp32 flash output would double the saved-
        # activation footprint to 5.6 GB for 30 blocks at 33k tokens —
        # past HBM on a 16 GB v5e next to the 1.3B weights.
        attn = attn.astype(policy.compute_dtype)
        attn = jax.ad_checkpoint.checkpoint_name(attn, "attn_out")
        attn = attn.reshape(b, l, cfg.dim)
        attn = nn.linear(bp["self_attn"]["o"], attn,
                         compute_dtype=policy.compute_dtype)
        x32 = x32 + (attn.astype(jnp.float32) * sel(2)).astype(rdt)

        # cross-attention (norm3 affine if cross_attn_norm)
        if "norm3" in bp:
            y = nn.layer_norm(x32.astype(jnp.float32),
                              weight=bp["norm3"]["w"].astype(jnp.float32),
                              bias=bp["norm3"]["b"].astype(jnp.float32),
                              eps=cfg.eps)
        else:
            y = x32
        y = y.astype(policy.compute_dtype)
        ca = bp["cross_attn"]
        dh = cfg.dim // n
        q = nn.linear(ca["q"], y, compute_dtype=policy.compute_dtype)
        if "norm_q" in ca:
            q = nn.rms_norm(q, ca["norm_q"].astype(policy.compute_dtype),
                            eps=1e-6)
        k = nn.linear(ca["k"], ctx, compute_dtype=policy.compute_dtype)
        if "norm_k" in ca:
            k = nn.rms_norm(k, ca["norm_k"].astype(policy.compute_dtype),
                            eps=1e-6)
        v = nn.linear(ca["v"], ctx, compute_dtype=policy.compute_dtype)
        q = q.reshape(b, l, n, dh)
        k = k.reshape(b, ctx_len, n, dh)
        v = v.reshape(b, ctx_len, n, dh)
        cbound = None
        if policy.bounded_softmax and "norm_q" in ca and "norm_k" in ca:
            # same qk-norm bound as self-attention (no rope here)
            cbound = 1.01 * dh \
                * jnp.max(jnp.abs(ca["norm_q"].astype(jnp.float32))) \
                * jnp.max(jnp.abs(ca["norm_k"].astype(jnp.float32)))
        attn = attention(q, k, v,
                         softmax_bf16=policy.softmax_bf16,
                         score_bound=cbound
                         ).reshape(b, l, cfg.dim)
        attn = nn.linear(ca["o"], attn, compute_dtype=policy.compute_dtype)
        x32 = x32 + attn.astype(rdt)

        # ffn
        y = _modulated(x32, sel(3), sel(4), cfg.eps)
        y = y.astype(policy.compute_dtype)
        y = nn.linear(bp["ffn"]["fc0"], y,
                      compute_dtype=policy.compute_dtype)
        y = nn.gelu_tanh(y)
        y = nn.linear(bp["ffn"]["fc1"], y,
                      compute_dtype=policy.compute_dtype)
        x32 = x32 + (y.astype(jnp.float32) * sel(5)).astype(rdt)
        return x32

    if remat_blocks == "attn":
        # save-attention remat: per-block activations are recomputed in
        # the backward EXCEPT the flash-attention output — trades
        # ~100 MB/block of HBM for skipping a second full flash forward
        block_fn = jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out"))
    elif remat_blocks:
        block_fn = jax.checkpoint(block_fn)

    def scan_body(carry, bp):
        return block_fn(carry, bp), None

    x32, _ = jax.lax.scan(scan_body, x32, params["blocks"])

    # ---- head -------------------------------------------------------------
    hp = params["head"]
    head_mod = hp["modulation"].astype(jnp.float32)[None, None] \
        + e[:, :, None, :]                                   # [B, 2, 2, dim]
    shift = _select_rows(head_mod[:, :, 0], t_zero_mask)
    scale = _select_rows(head_mod[:, :, 1], t_zero_mask)
    y = nn.layer_norm(x32.astype(jnp.float32), eps=cfg.eps) \
        * (1.0 + scale) + shift
    return nn.linear(hp["head"], y, compute_dtype=jnp.float32)


def wan_dit_forward(
    params,
    cfg: WanDiTConfig,
    x: jnp.ndarray,                 # [B, F, H, W, C_in] latent (+cond concat)
    t: jnp.ndarray,                 # [B] float timesteps (0..1000)
    context: jnp.ndarray,           # [B, text_len, text_dim]
    rope_cos: jnp.ndarray,          # [L, head_dim//2]
    rope_sin: jnp.ndarray,
    *,
    t_zero_mask: Optional[jnp.ndarray] = None,  # [B, L] True -> token t=0
    seq_pad_to: Optional[int] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    fused_rope: bool = False,  # inference-only in-kernel rope prologue
    remat_blocks=False,  # False | True (full) | 'attn' (save attn_out)
) -> jnp.ndarray:
    """Velocity prediction [B, F, H, W, C_out] (fp32), single program
    (GSPMD handles any fsdp/tp sharding of params transparently)."""
    b = x.shape[0]
    h, grid, e, e0, ctx = _embed_inputs(params, cfg, x, t, context, policy)
    l_real = h.shape[1]
    if seq_pad_to is not None and seq_pad_to > l_real:
        h = jnp.pad(h, ((0, 0), (0, seq_pad_to - l_real), (0, 0)))
    l = h.shape[1]
    # pad rope (identity rotation) and mask padded keys like the reference
    # k_lens path (attention.py:94-127, model.py:452-457)
    rope_cos, rope_sin = _pad_rope(rope_cos, rope_sin, l)
    self_kv_len = (jnp.full((b,), l_real, jnp.int32) if l_real < l else None)

    if t_zero_mask is None:
        t_zero_mask = jnp.zeros((b, l), dtype=bool)
    elif t_zero_mask.shape[1] < l:
        t_zero_mask = jnp.pad(t_zero_mask,
                              ((0, 0), (0, l - t_zero_mask.shape[1])))

    out = _blocks_and_head(params, cfg, h, e, e0, ctx, rope_cos, rope_sin,
                           t_zero_mask, self_kv_len, policy=policy,
                           fused_rope=fused_rope,
                           remat_blocks=remat_blocks)
    return unpatchify_tokens(out.astype(jnp.float32), grid, cfg.patch_size,
                             cfg.out_dim)


def wan_dit_forward_sp(
    params,
    cfg: WanDiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    *,
    mesh,
    sp_axis: str = "sp",
    sp_impl: str = "ulysses",  # 'ulysses' | 'ring' (long-video slot)
    t_zero_mask: Optional[jnp.ndarray] = None,
    seq_pad_to: Optional[int] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    fused_rope: bool = False,  # in-kernel rope (ulysses only; no-op ring)
    remat_blocks=False,  # False | True (full) | 'attn' (save attn_out)
) -> jnp.ndarray:
    """Sequence-parallel velocity prediction: context-parallel token
    chunking + Ulysses all-to-all self-attention.

    TPU-native re-design of reference sp_dit_forward
    (models/wan/distributed/sequence_parallel.py:64-176): embeddings run
    replicated, tokens are padded to a multiple of sp and sharded over
    the `sp` mesh axis inside `jax.shard_map` (partial-manual: only sp is
    manual, so fsdp/tp param shardings still flow through GSPMD). Each
    shard applies its GLOBAL slice of the RoPE tables
    (sequence_parallel.py:50-55); self-attention is Ulysses all-to-all
    over heads (ulysses.py:9-47) with padded keys masked via kv_len;
    cross-attn/FFN stay shard-local; the final gather is the out_specs
    resharding before unpatchify (sequence_parallel.py:140).

    MUST be called under `jax.jit` — partial-manual shard_map only
    lowers inside a jitted computation.
    """
    import functools as _ft
    from jax.sharding import PartitionSpec as P

    b = x.shape[0]
    sp = mesh.shape[sp_axis]
    if cfg.num_heads % sp:
        raise ValueError(f"num_heads {cfg.num_heads} % sp {sp} != 0")

    h, grid, e, e0, ctx = _embed_inputs(params, cfg, x, t, context, policy)
    l_real = h.shape[1]
    l = max(seq_pad_to or 0, l_real)
    l = -(-l // sp) * sp  # round up to sp multiple
    if l > l_real:
        h = jnp.pad(h, ((0, 0), (0, l - l_real), (0, 0)))
    rope_cos, rope_sin = _pad_rope(rope_cos, rope_sin, l)
    self_kv_len = jnp.full((b,), l_real, jnp.int32)

    if t_zero_mask is None:
        t_zero_mask = jnp.zeros((b, l), dtype=bool)
    elif t_zero_mask.shape[1] < l:
        t_zero_mask = jnp.pad(t_zero_mask,
                              ((0, 0), (0, l - t_zero_mask.shape[1])))

    inner = _ft.partial(_blocks_and_head, cfg=cfg, policy=policy,
                        sp_axis=sp_axis, sp_impl=sp_impl,
                        fused_rope=fused_rope, remat_blocks=remat_blocks)

    def body(params, h, e, e0, ctx, rope_cos, rope_sin, t_zero_mask,
             self_kv_len):
        return inner(params, h=h, e=e, e0=e0, ctx=ctx, rope_cos=rope_cos,
                     rope_sin=rope_sin, t_zero_mask=t_zero_mask,
                     self_kv_len=self_kv_len)

    # rope tables enter REPLICATED (global length): _blocks_and_head
    # slices the per-shard window via axis_index for the XLA rotation
    # path, and the fused-rope ulysses path consumes the full tables
    # after its all-to-all re-assembles the global sequence
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, sp_axis, None), P(), P(), P(),
                  P(), P(), P(None, sp_axis),
                  P()),
        out_specs=P(None, sp_axis, None),
        axis_names={sp_axis}, check_vma=False,
    )(params, h, e, e0, ctx, rope_cos, rope_sin, t_zero_mask, self_kv_len)

    return unpatchify_tokens(out.astype(jnp.float32), grid, cfg.patch_size,
                             cfg.out_dim)
