#!/usr/bin/env python
"""Benchmark: Wan T2V sec/video on the current accelerator.

BASELINE.json config 3: "Wan2.1-T2V-1.3B DiT denoise loop: 480p 81 frames,
50 flow-matching steps". Measures the jitted batch-2-CFG denoise step
(lax.scan body) + streaming VAE decode and reports extrapolated
sec/video for the full 50-step sample. North-star baseline: 60 s/video
(BASELINE.md). Prints ONE JSON line.

Env knobs:
  BENCH_STEPS   measured denoise steps (default 5; per-step cost is
                constant so 50-step time = 10x the 5-step scan)
  BENCH_MODEL   WAN_CONFIGS key (default t2v-1.3B)
  BENCH_FRAMES / BENCH_W / BENCH_H
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from univid_tpu.core.config import WAN_CONFIGS, latent_shape
    from univid_tpu.models.wan.dit import init_wan_dit
    from univid_tpu.models.wan.vae_api import init_wan_vae, vae_decode
    from univid_tpu.pipelines.ti2v import WanTI2VPipeline
    from univid_tpu.core import nn as unn

    model = os.environ.get("BENCH_MODEL", "t2v-1.3B")
    steps_measured = int(os.environ.get("BENCH_STEPS", "5"))
    full_steps = 50
    w = int(os.environ.get("BENCH_W", "832"))
    h = int(os.environ.get("BENCH_H", "480"))
    frames = int(os.environ.get("BENCH_FRAMES", "81"))

    spec = WAN_CONFIGS[model]
    dit_params = init_wan_dit(jax.random.PRNGKey(0), spec.dit,
                              param_dtype=jnp.bfloat16)
    vae_params = init_wan_vae(jax.random.PRNGKey(1), spec.vae,
                              param_dtype=jnp.bfloat16)
    pipe = WanTI2VPipeline(spec, dit_params, vae_params)

    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (spec.dit.text_len, spec.dit.text_dim),
                            jnp.bfloat16)
    nctx = jax.random.normal(jax.random.PRNGKey(3),
                             (spec.dit.text_len, spec.dit.text_dim),
                             jnp.bfloat16)

    # --- denoise loop (measured-steps scan, same compiled body as 50) ----
    kw = dict(size=(w, h), frame_num=frames, sampling_steps=steps_measured,
              seed=0, decode=False)
    x0 = pipe.generate(ctx, nctx, **kw)      # compile
    x0.block_until_ready()
    t0 = time.perf_counter()
    x0 = pipe.generate(ctx, nctx, **kw)
    x0.block_until_ready()
    t_denoise = time.perf_counter() - t0
    per_step = t_denoise / steps_measured

    # --- VAE decode --------------------------------------------------------
    decode = jax.jit(lambda vp, z: vae_decode(vp, spec.vae, z))
    video = decode(vae_params, x0)
    video.block_until_ready()
    t0 = time.perf_counter()
    video = decode(vae_params, x0)
    video.block_until_ready()
    t_decode = time.perf_counter() - t0

    sec_per_video = per_step * full_steps + t_decode
    dev = jax.devices()[0]
    result = {
        "metric": f"sec_per_video_{h}p{frames}f_50step_{model}",
        "value": round(sec_per_video, 3),
        "unit": "s",
        "vs_baseline": round(sec_per_video / 60.0, 3),
        "detail": {
            "dit_step_ms": round(per_step * 1e3, 1),
            "vae_decode_s": round(t_decode, 3),
            "device": str(dev),
            "backend": jax.default_backend(),
            "params_dit": unn.count_params(dit_params),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
