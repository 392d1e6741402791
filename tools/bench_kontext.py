#!/usr/bin/env python
"""FLUX.1-Kontext editing throughput on one chip (PARITY row 64).

Times the editor at the REAL 12B shape on the reference's operating
point (process_pipepline.py:182-206: ~1MP edit at 28 steps, guidance
2.5): 4096 target + 4096 reference + 512 text tokens per forward.
Weights are zeros materialized on device by one jitted program —
timing is weight-value-independent (same matmul/attention program) —
and int8-quantized layer-by-layer by default (12B bf16 is 24 GB; int8
~12 GB fits one 16 GB v5e; KONTEXT_INT8=0 for bf16 on bigger chips).

Timing through the TPU tunnel follows bench.py: executions chained by
data dependencies + a scalar D2H readback (utils/profiling.device_sync).

Env: KONTEXT_STEPS (default 28; the timed loop reuses ONE compiled
scan program), KONTEXT_SIZE (default 1024 -> 1024x1024),
KONTEXT_INT8 (default 1).

Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from univid_tpu.models.flux import (FluxConfig, build_rope_from_ids,
                                        flux_forward, image_token_ids,
                                        init_flux)
    from univid_tpu.core.dtypes import BF16_RESIDUAL_POLICY
    from univid_tpu.utils.profiling import device_sync

    steps = int(os.environ.get("KONTEXT_STEPS", "28"))
    size = int(os.environ.get("KONTEXT_SIZE", "1024"))
    use_int8 = os.environ.get("KONTEXT_INT8", "1") != "0"
    tiny = os.environ.get("KONTEXT_TINY", "0") == "1"  # CPU smoke

    if tiny:
        from univid_tpu.models.flux import TINY_FLUX
        cfg = TINY_FLUX
    else:
        cfg = FluxConfig()
    grid = (size // 16, size // 16)
    txt_len = 512
    l_tgt = grid[0] * grid[1]
    l_img = 2 * l_tgt

    # zeros weights via one jitted program (bench.py pattern); int8
    # quantization of a zeros tree produces the same dequant-matmul
    # program as real weights
    shapes = jax.eval_shape(lambda: init_flux(
        jax.random.PRNGKey(0), cfg, param_dtype=jnp.bfloat16))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    if use_int8:
        from univid_tpu.core.quant import quantize_tree
        params = quantize_tree(params)
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree.leaves(shapes))

    ids = np.concatenate([np.zeros((txt_len, 3)),
                          image_token_ids(grid, 0),
                          image_token_ids(grid, 1)])
    rope = build_rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    policy = BF16_RESIDUAL_POLICY

    from univid_tpu.pipelines.kontext import kontext_sigmas
    sigmas = jnp.asarray(kontext_sigmas(steps, l_tgt), jnp.float32)

    @jax.jit
    def denoise(params, lat, ref, txt, pooled, sigmas):
        g = jnp.full((1,), 2.5, jnp.float32)

        def body(lat, sig):
            s_cur, s_next = sig
            x = jnp.concatenate([lat.astype(policy.compute_dtype),
                                 ref.astype(policy.compute_dtype)], 1)
            v = flux_forward(params, cfg, x, txt,
                             jnp.full((1,), s_cur, jnp.float32),
                             guidance=g, clip_pooled=pooled,
                             rope_tables=rope, policy=policy)[:, :l_tgt]
            return lat + (s_next - s_cur) * v.astype(jnp.float32), None

        pairs = jnp.stack([sigmas[:-1], sigmas[1:]], 1)
        return jax.lax.scan(body, lat, pairs)[0]

    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, l_tgt, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(key, (1, l_tgt, cfg.in_channels), jnp.float32)
    txt = jax.random.normal(key, (1, txt_len, cfg.context_dim),
                            jnp.bfloat16)
    pooled = jax.random.normal(key, (1, cfg.vec_dim), jnp.float32)

    # warm (compile) with a 2-step schedule of the same program shape?
    # no — scan length is baked into the program; compile the full
    # schedule once and time the second run
    t0 = time.time()
    device_sync(denoise(params, lat, ref, txt, pooled, sigmas))
    compile_s = time.time() - t0
    t0 = time.time()
    device_sync(denoise(params, lat, ref, txt, pooled, sigmas))
    edit_s = time.time() - t0

    # FLOPs per forward: every token does 2*N_block matmul flops over
    # the 57 blocks + in/out embeds (~all params except text towers);
    # attention adds 4*L^2*d per block
    l_all = txt_len + l_img
    lin = 2.0 * n_params * l_all
    attn = 4.0 * l_all * l_all * cfg.hidden_size * (cfg.depth_double
                                                    + cfg.depth_single)
    flops = (lin + attn) * steps
    kind = getattr(jax.devices()[0], "device_kind", "")
    peak = 197e12 if ("v5 lite" in kind.lower() or "v5e" in kind.lower()
                      ) else 0
    out = {
        "metric": f"kontext_edit_s_{size}x{size}_{steps}step",
        "value": round(edit_s, 3),
        "unit": "s",
        "detail": {
            "steps": steps, "tokens": l_all, "params": n_params,
            "int8": use_int8, "compile_s": round(compile_s, 1),
            "device": kind,
            "est_mfu": round(flops / edit_s / peak, 3) if peak else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
