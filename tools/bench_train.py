#!/usr/bin/env python
"""Benchmark the diffusion/LoRA training step at real video resolution.

The reference trains its fusion adapter through flash-attn at full
resolution (model_pipeline.py:2765-3142 via qwen2_navit.py:579 /
wan attention.py:94-127). This measures the TPU equivalent: one
`make_diffusion_train_step` step (LoRA-merged DiT forward + Pallas
flash-attention backward + AdamW update) on synthetic latents.

Env knobs: BENCH_MODEL (t2v-1.3B), BENCH_W/BENCH_H/BENCH_FRAMES
(default 832x480x81 — the full reference operating point for the 1.3B),
BENCH_TRAIN_STEPS measured steps (default 3).

Prints ONE JSON line {train_step_ms, tokens, resolution, ...}.
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

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass


def main():
    from univid_tpu.core.config import (WAN_CONFIGS, FusionConfig,
                                        dit_seq_len, latent_shape)
    from univid_tpu.train.fusion_trainer import (
        FusionTrainConfig, init_fusion_train_state,
        make_diffusion_train_step, make_fusion_optimizer)
    from univid_tpu.train.lora import LoRAConfig

    model = os.environ.get("BENCH_MODEL", "t2v-1.3B")
    w = int(os.environ.get("BENCH_W", "832"))
    h = int(os.environ.get("BENCH_H", "480"))
    frames = int(os.environ.get("BENCH_FRAMES", "81"))
    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", "3"))

    spec = WAN_CONFIGS[model]
    fusion_cfg = FusionConfig(wan_text_dim=spec.dit.text_dim,
                              wan_text_length=spec.dit.text_len)
    train_cfg = FusionTrainConfig(train_lora=True)
    _, f, lh, lw = latent_shape(spec, w, h, frames)

    key = jax.random.PRNGKey(0)
    from univid_tpu.models.wan.dit import init_wan_dit
    dit_params = init_wan_dit(key, spec.dit, param_dtype=jnp.bfloat16)

    state, tx, lora_template = init_fusion_train_state(
        jax.random.PRNGKey(1), fusion_cfg, train_cfg, dit_cfg=spec.dit,
        lora_cfg=LoRAConfig())
    remat = os.environ.get("BENCH_REMAT", "attn")
    remat_blocks = {"block": True, "attn": "attn",
                    "none": False}[remat]
    # bf16 residual stream by default: the remat boundary saves the
    # residual per block, and fp32 residuals (5.6 GB at 30L x 33k x
    # 1536) push the step past one 16 GB chip; bf16-residual training
    # is standard bf16-transformer practice. BENCH_TRAIN_FP32_RESIDUAL=1
    # restores fp32 (needs remat=block or a bigger chip).
    from univid_tpu.core.dtypes import BF16_RESIDUAL_POLICY, DEFAULT_POLICY
    policy = DEFAULT_POLICY \
        if os.environ.get("BENCH_TRAIN_FP32_RESIDUAL", "0") != "0" \
        else BF16_RESIDUAL_POLICY
    if os.environ.get("BENCH_BOUNDED", "1") != "0":
        # bounded softmax in the TRAINING forward too: the score bound
        # threads through the custom_vjp (zero cotangent) and the
        # bounded lse (= C + log2 l) feeds the unchanged recompute-p
        # backward — gradients are exact-math identical. Speeds the
        # residual-saving forward leg of the step.
        import dataclasses
        policy = dataclasses.replace(policy, bounded_softmax=True)
    step, _ = make_diffusion_train_step(
        spec, fusion_cfg, train_cfg, tx, dit_params, None, (f, lh, lw),
        lora_template=lora_template, remat_blocks=remat_blocks,
        policy=policy)

    c = spec.vae.z_dim
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2),
                                     (1, f, lh, lw, c), jnp.bfloat16),
        "bagel_tokens": jax.random.normal(
            jax.random.PRNGKey(3),
            (1, fusion_cfg.bagel_sequence_length,
             fusion_cfg.bagel_hidden_dim), jnp.bfloat16),
        "noise": jax.random.normal(jax.random.PRNGKey(4),
                                   (1, f, lh, lw, c), jnp.bfloat16),
        "t": jnp.asarray([500.0], jnp.float32),
    }

    state, loss = step(state, batch)   # compile
    # scalar readback, NOT block_until_ready: through the TPU tunnel
    # (axon) block_until_ready is a no-op — only a data-dependent D2H
    # readback proves the execution finished. The steps chain state so
    # the loop serializes on device; the final float(loss) closes the
    # timing window.
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, batch)
    float(loss)
    per_step = (time.perf_counter() - t0) / n_steps

    tokens = dit_seq_len(spec, w, h, frames)
    # analytic train-step FLOPs for the MFU estimate (batch 1):
    # forward = linear 2PT + self-attn 4T^2 D L + cross 4 T Lt D L;
    # backward dX = ~1x fwd; dW only at the trainable LoRA sites
    # (attention projections) = ~(8 D^2 T L)/(2PT) share; remat policy
    # adds one extra forward ('block') or a forward minus the flash
    # kernel ('attn')
    d = spec.dit.dim
    n_layers = spec.dit.num_layers
    import numpy as _np
    params_dit = sum(x.size for x in jax.tree.leaves(dit_params))
    lin = 2.0 * params_dit * tokens
    attn_f = 4.0 * tokens * tokens * d * n_layers
    cross_f = 4.0 * tokens * spec.dit.text_len * d * n_layers
    fwd = lin + attn_f + cross_f
    # dW at the 8 attention-projection sites/layer: 2*T*d^2 each; the
    # flash backward itself is ~2.5x the fwd kernel (dq+dk+dv) and is
    # inside the dX term approximation
    dw_sites = 8.0 * 2.0 * tokens * d * d * n_layers
    remat_extra = {"block": fwd, "attn": fwd - attn_f,
                   "none": 0.0}[remat]
    bwd_dx = lin + 2.5 * attn_f + cross_f  # flash bwd ~2.5x fwd kernel
    total = fwd + bwd_dx + dw_sites + remat_extra
    peak = {"tpu": 197e12}.get(jax.default_backend(), 0)
    est_mfu = round(total / per_step / peak, 3) if peak else None
    del _np
    print(json.dumps({
        "train_step_ms": round(per_step * 1e3, 1),
        "loss": float(loss),
        "tokens": tokens,
        "resolution": f"{w}x{h}x{frames}f",
        "model": model,
        "remat": remat,
        "residual": "fp32" if policy is DEFAULT_POLICY else "bf16",
        **({"est_mfu": est_mfu} if est_mfu is not None else {}),
        "latent_grid": [f, lh, lw],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
