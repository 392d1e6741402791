#!/usr/bin/env python
"""Full-pipeline e2e bench: prompt string -> mp4, everything on the clock.

The reference's sec/video contract is the whole inference.py entry
(inference.py:525-720): tokenizer -> UMT5-XXL encode -> 50-step CFG
denoise -> causal VAE decode -> mp4 mux. The main bench rows time only
denoise+decode from a ready context tensor; this row runs the SAME
library functions the CLI calls (WanTextEncoder.__call__,
WanTI2VPipeline.generate, data/video_io.save_video) end to end at real
shapes, with the 4.7B-param UMT5-XXL encode itemized.

HBM staging on a 16 GB v5e: the XXL encoder (9.4 GB bf16) is built
first, the prompt+negative pair is encoded and timed, then its buffers
are freed before the 1.3B DiT + VAE land — mirroring the reference's
--offload_model/t5_cpu staging (textimage2video.py:118-160).

Weights are ZEROS materialized by jitted programs: timing is
weight-value-independent (same matmuls/attention program) and eager
5.7B-param host RNG would add minutes of pure setup.

Prints ONE JSON line. Env: E2E_MODEL (default t2v-1.3B), E2E_W/H/FRAMES
(832x480x81), E2E_STEPS (default 50 — the full schedule, really
executed, not extrapolated).
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


def zeros_like_tree(shapes):
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()


def main():
    from univid_tpu.core.config import WAN_CONFIGS
    from univid_tpu.data.video_io import save_video
    from univid_tpu.models.wan.dit import init_wan_dit
    from univid_tpu.models.wan.t5 import init_t5_encoder
    from univid_tpu.models.wan.vae_api import init_wan_vae
    from univid_tpu.pipelines.encoders import (WanTextEncoder,
                                               _FixedLenTokenizer)
    from univid_tpu.pipelines.ti2v import WanTI2VPipeline
    from univid_tpu.utils.tokenizers import HashTokenizer

    model = os.environ.get("E2E_MODEL", "t2v-1.3B")
    w = int(os.environ.get("E2E_W", "832"))
    h = int(os.environ.get("E2E_H", "480"))
    frames = int(os.environ.get("E2E_FRAMES", "81"))
    steps = int(os.environ.get("E2E_STEPS", "50"))
    spec = WAN_CONFIGS[model]
    prompt = ("Two anthropomorphic cats in comfy boxing gear and bright "
              "gloves fight intensely on a spotlighted stage.")

    # ---- stage 1: tokenize + UMT5-XXL encode (timed) -------------------
    t5_shapes = jax.eval_shape(
        lambda k: init_t5_encoder(k, spec.t5, param_dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    t5_params = zeros_like_tree(t5_shapes)
    tok = _FixedLenTokenizer(HashTokenizer(vocab_size=spec.t5.vocab_size),
                             spec.t5.text_len)
    enc = WanTextEncoder(t5_params, spec.t5, tok,
                         compute_dtype=jnp.bfloat16)
    ctx_pair = enc([prompt, spec.sample_neg_prompt])  # compile
    # timing through the TPU tunnel (axon): jax.block_until_ready is a
    # no-op and independent same-input dispatches are elided — time K
    # CHAINED encodes (each one's ids depend on the previous output) and
    # close the window with a scalar D2H readback
    ids, lens = tok.batch_encode_padded([prompt, spec.sample_neg_prompt])
    ids = jnp.asarray(np.clip(np.asarray(ids, np.int32)
                              [:, :spec.t5.text_len], 0,
                              spec.t5.vocab_size - 1))
    lens = jnp.asarray(np.minimum(np.asarray(lens, np.int32),
                                  spec.t5.text_len))
    out = enc._jit(t5_params, ids=ids, seq_lens=lens)
    float(jnp.asarray(out).ravel()[0])  # sync warmup
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        dep = (out[:, 0, 0] * 0.0).astype(jnp.int32)[:, None]
        out = enc._jit(t5_params, ids=ids + dep, seq_lens=lens)
    float(jnp.asarray(out).ravel()[0])
    encode_s = (time.perf_counter() - t0) / reps
    ctx = np.asarray(ctx_pair[0])       # host copies so the device
    ctx_null = np.asarray(ctx_pair[1])  # buffers can be freed
    del out
    del ctx_pair, enc, t5_params
    import gc
    gc.collect()

    # ---- stage 2: denoise + decode (timed, REAL full schedule) ---------
    dit_shapes = jax.eval_shape(
        lambda k: init_wan_dit(k, spec.dit, param_dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    dit_params = zeros_like_tree(dit_shapes)
    vae_shapes = jax.eval_shape(
        lambda k: init_wan_vae(k, spec.vae), jax.random.PRNGKey(1))
    vae_params = zeros_like_tree(vae_shapes)
    # same dtype policy selection as bench.py (bf16 residual is the
    # quality-gated default; BENCH_BF16_RESIDUAL=0 for fp32 parity mode)
    from univid_tpu.core.dtypes import BF16_RESIDUAL_POLICY, DEFAULT_POLICY
    policy = BF16_RESIDUAL_POLICY \
        if os.environ.get("BENCH_BF16_RESIDUAL", "1") != "0" \
        else DEFAULT_POLICY
    pipe = WanTI2VPipeline(spec, dit_params, vae_params, policy=policy)

    kw = dict(size=(w, h), frame_num=frames, sampling_steps=steps,
              seed=0)
    # compile pass of exactly ONE full dispatch chunk: the chunk jit
    # program is keyed without the step count (ti2v._chunk_progs), so
    # this warmup compiles the same executable the 50-step schedule
    # reuses — the timed run then measures execution only (the
    # reference's sec/video also excludes one-time CUDA warmup)
    warm_steps = pipe.dispatch_steps if 0 < pipe.dispatch_steps < steps \
        else min(2, steps)
    warm = pipe.generate(jnp.asarray(ctx), jnp.asarray(ctx_null),
                         **{**kw, "sampling_steps": warm_steps})
    jax.block_until_ready(warm)
    del warm
    t0 = time.perf_counter()
    video = pipe.generate(jnp.asarray(ctx), jnp.asarray(ctx_null), **kw)
    video = np.asarray(video)
    gen_s = time.perf_counter() - t0

    # ---- stage 3: mp4 mux (timed) --------------------------------------
    t0 = time.perf_counter()
    u8 = ((np.clip(video, -1, 1) + 1) * 127.5).astype(np.uint8)
    out = os.environ.get("E2E_OUT", "/tmp/bench_e2e.mp4")
    save_video(u8, out, fps=int(spec.generation.fps))
    mux_s = time.perf_counter() - t0

    print(json.dumps({
        "e2e_sec_per_video": round(encode_s + gen_s + mux_s, 3),
        "encode_s": round(encode_s, 3),
        "denoise_plus_decode_s": round(gen_s, 3),
        "mux_s": round(mux_s, 3),
        "model": model, "resolution": f"{w}x{h}x{frames}f",
        "steps": steps, "mp4": out,
    }))


if __name__ == "__main__":
    main()
