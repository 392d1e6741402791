#!/usr/bin/env python
"""Per-stage numerical tolerance budget for the bf16-island dtype policy.

VERDICT r3 weak #4: the bf16-island error accumulation at full model
size had no per-stage budget — goldens catch regressions of the repo
against itself, not dtype-policy drift. This tool measures, at the REAL
1.3B 480p x 81f operating point (env-rescalable), the deviation of each
shipping-program stage from an fp32 reference run of the same stage
(fp32 params/compute, XLA attention), producing the budget table
published in PARITY.md:

  dit_default   one batch-2-CFG DiT forward, DEFAULT_POLICY (bf16
                compute / fp32 residual, Pallas flash) vs fp32 — the
                parity serving mode
  dit_bf16res   same vs BF16_RESIDUAL_POLICY (the fast serving mode)
  vae_decode    bf16 vs fp32 decode of the same latent: pixel PSNR
  projector     ContextProjector bf16 vs fp32 compute
  t5_layer      UMT5 full-width (4096d) per-layer drift at depth 8:
                rel err after the stack, divided by depth -> budget per
                layer (the full 24-layer fp32 encoder does not fit next
                to its bf16 twin in 16 GB)

Weights are random-init (fp32 master, cast to bf16) — dtype drift is a
property of the program and value distribution, not of trained values;
trained-checkpoint validation additionally needs real weights and is
noted as such where these numbers are published.

Run on CPU (JAX_PLATFORMS=cpu): the budget measures NUMERICS, not
speed, and the fp32 XLA attention reference is minutes-long on device —
past the remote-execute watchdog of tunneled dev chips.

Prints ONE JSON line. Env: TB_W/TB_H/TB_FRAMES (832x480x21 — see the
frames note in main()), TB_BATCH (1), TB_MODEL (t2v-1.3B),
TB_T5_LAYERS (8).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def rel_err(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def psnr_u8(a, b):
    a = ((np.clip(np.asarray(a, np.float64), -1, 1) + 1) * 127.5)
    b = ((np.clip(np.asarray(b, np.float64), -1, 1) + 1) * 127.5)
    mse = np.mean((a - b) ** 2)
    return float("inf") if mse == 0 else \
        float(20 * np.log10(255.0) - 10 * np.log10(mse))


def to_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def main():
    from univid_tpu.core.config import WAN_CONFIGS, latent_shape
    from univid_tpu.core.dtypes import (BF16_RESIDUAL_POLICY,
                                        DEFAULT_POLICY, FP32_POLICY)
    from univid_tpu.kernels.attention import set_attention_backend
    from univid_tpu.models.wan.dit import init_wan_dit, wan_dit_forward
    from univid_tpu.ops.rope import build_rope_3d

    model = os.environ.get("TB_MODEL", "t2v-1.3B")
    w = int(os.environ.get("TB_W", "832"))
    h = int(os.environ.get("TB_H", "480"))
    # 21 frames (8,190 tokens) default for the DiT stage: the fp32 XLA
    # reference materializes the [B, heads, L, L] score matrix, which at
    # the full 81f/33k-token point would need ~100 GB — per-token dtype
    # drift is token-count-insensitive, and the full-33k end-to-end
    # validation is quality_sweep.py's 50-step PSNR.
    frames = int(os.environ.get("TB_FRAMES", "21"))
    batch = int(os.environ.get("TB_BATCH", "1"))
    spec = WAN_CONFIGS[model]
    cfg = spec.dit
    _, lf, lh, lw = latent_shape(spec, w, h, frames)
    out = {"model": model, "resolution": f"{w}x{h}x{frames}f"}

    # ---- DiT single CFG forward ------------------------------------
    pt, ph, pw = cfg.patch_size
    cos, sin = build_rope_3d(cfg.head_dim,
                             (lf // pt, lh // ph, lw // pw))
    params32 = init_wan_dit(jax.random.PRNGKey(0), cfg,
                            param_dtype=jnp.float32)
    # the output head is zero-initialized (standard DiT init), which
    # would make every random-init forward exactly zero — randomize it
    # so the budget measures a non-degenerate program
    d = cfg.dim
    params32["head"]["head"]["w"] = jax.random.normal(
        jax.random.PRNGKey(99), params32["head"]["head"]["w"].shape,
        jnp.float32) / d ** 0.5
    x32 = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, lf, lh, lw, cfg.in_dim), jnp.float32)
    t = jnp.full((batch,), 500.0, jnp.float32)
    ctx32 = jax.random.normal(jax.random.PRNGKey(2),
                              (batch, cfg.text_len, cfg.text_dim),
                              jnp.float32)

    def run(params, x, ctx, policy, backend):
        set_attention_backend(backend)
        try:
            fn = jax.jit(lambda p, x, t, c: wan_dit_forward(
                p, cfg, x, t, c, cos, sin, policy=policy))
            v = fn(params, x, t, ctx)
            return np.asarray(jax.device_get(v), np.float32)
        finally:
            set_attention_backend(None)

    t0 = time.time()
    ref = run(params32, x32, ctx32, FP32_POLICY, "xla")
    out["dit_fp32_ref_s"] = round(time.time() - t0, 1)

    params16 = to_bf16(params32)
    del params32
    x16, ctx16 = x32.astype(jnp.bfloat16), ctx32.astype(jnp.bfloat16)
    v_def = run(params16, x16, ctx16, DEFAULT_POLICY, None)
    out["dit_default_rel_err"] = round(rel_err(v_def, ref), 5)
    v_b16 = run(params16, x16, ctx16, BF16_RESIDUAL_POLICY, None)
    out["dit_bf16res_rel_err"] = round(rel_err(v_b16, ref), 5)
    out["dit_bf16res_vs_default_rel_err"] = round(rel_err(v_b16, v_def), 5)
    del params16, v_def, v_b16, ref

    # ---- VAE decode --------------------------------------------------
    from univid_tpu.models.wan.vae_api import init_wan_vae, vae_decode
    vae32 = init_wan_vae(jax.random.PRNGKey(3), spec.vae,
                         param_dtype=jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(4),
                          (1, lf, lh, lw, spec.vae.z_dim), jnp.float32)
    dec = jax.jit(lambda vp, z: vae_decode(vp, spec.vae, z))
    vid32 = np.asarray(jax.device_get(dec(vae32, z)), np.float32)
    vae16 = to_bf16(vae32)
    del vae32
    vid16 = np.asarray(jax.device_get(
        dec(vae16, z.astype(jnp.bfloat16))), np.float32)
    out["vae_decode_bf16_psnr_db"] = round(psnr_u8(vid16, vid32), 2)
    out["vae_decode_bf16_rel_err"] = round(rel_err(vid16, vid32), 5)
    del vae16, vid16, vid32

    # ---- ContextProjector -------------------------------------------
    from univid_tpu.core.config import FusionConfig
    from univid_tpu.models.fusion.projector import (
        context_projector_forward, init_context_projector)
    fcfg = FusionConfig(wan_text_dim=cfg.text_dim,
                        wan_text_length=cfg.text_len)
    pp = init_context_projector(jax.random.PRNGKey(5), fcfg)
    tok = jax.random.normal(jax.random.PRNGKey(6),
                            (1, fcfg.bagel_sequence_length,
                             fcfg.bagel_hidden_dim), jnp.float32)
    pr32 = context_projector_forward(pp, fcfg, tok,
                                     compute_dtype=jnp.float32)
    pr16 = context_projector_forward(to_bf16(pp), fcfg,
                                     tok.astype(jnp.bfloat16),
                                     compute_dtype=jnp.bfloat16)
    out["projector_bf16_rel_err"] = round(
        rel_err(jax.device_get(pr16), jax.device_get(pr32)), 5)

    # ---- UMT5 per-layer drift ----------------------------------------
    from univid_tpu.core.config import T5Config
    from univid_tpu.models.wan.t5 import init_t5_encoder, t5_encode
    n_layers = int(os.environ.get("TB_T5_LAYERS", "8"))
    t5cfg = T5Config(num_layers=n_layers)  # full umt5-xxl width
    t5_32 = init_t5_encoder(jax.random.PRNGKey(7), t5cfg,
                            param_dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(8), (1, 128), 0,
                             t5cfg.vocab_size)
    e32 = np.asarray(jax.device_get(
        t5_encode(t5_32, t5cfg, ids, compute_dtype=jnp.float32)),
        np.float32)
    t5_16 = to_bf16(t5_32)
    del t5_32
    e16 = np.asarray(jax.device_get(
        t5_encode(t5_16, t5cfg, ids, compute_dtype=jnp.bfloat16)),
        np.float32)
    stack_err = rel_err(e16, e32)
    out["t5_stack_rel_err"] = round(stack_err, 5)
    out["t5_layers_measured"] = n_layers
    out["t5_rel_err_per_layer"] = round(stack_err / n_layers, 6)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
