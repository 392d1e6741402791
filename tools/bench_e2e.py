#!/usr/bin/env python
"""Full-pipeline e2e bench: prompt string -> mp4, everything on the clock.

The reference's sec/video contract is the whole inference.py entry
(inference.py:525-720): BAGEL semantic extraction -> ContextProjector
(the fusion path that REPLACES the UMT5 output, model_pipeline.py:
1240,1552) / tokenizer -> UMT5-XXL encode (the standalone-Wan context
path) -> 50-step CFG denoise -> causal VAE decode -> mp4 mux. The main
bench rows time only denoise+decode from a ready context tensor; this
row runs the SAME library functions the CLI calls (BagelSemanticExtractor,
context_projector_forward, WanTextEncoder.__call__,
WanTI2VPipeline.generate, data/video_io.save_video) end to end at real
shapes, with the 4.7B-param UMT5-XXL encode and the BAGEL
extract+project stage (text-only and image-conditioned) itemized.

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

    # ---- stage 0: BAGEL semantic extraction + projection (timed) -------
    # The reference headline entry is the FUSION path: BAGEL context
    # (model_pipeline.py:1240) -> ContextProjector (:1552) replaces the
    # UMT5 output. Extraction only touches embed_tokens / SigLIP /
    # connector — the 7B MoT decode stack never runs (:942-946,
    # :1003-1018) — so the footprint is ~2 GB at real shape.
    from univid_tpu.core.config import FusionConfig
    from univid_tpu.models.bagel.bagel import BagelConfig, init_bagel
    from univid_tpu.models.fusion.extractor import BagelSemanticExtractor
    from univid_tpu.models.fusion.projector import (
        context_projector_forward, init_context_projector)
    from univid_tpu.models.bagel.siglip import SiglipConfig
    from univid_tpu.utils.profiling import device_sync

    bcfg = BagelConfig()   # real BAGEL-7B / so400m-980 shapes
    scfg = SiglipConfig()
    bshapes = jax.eval_shape(
        lambda k: init_bagel(k, bcfg, param_dtype=jnp.bfloat16,
                             init_llm=False), jax.random.PRNGKey(2))
    bagel_params = zeros_like_tree(bshapes)
    bagel_params["llm"] = {"embed_tokens": jax.jit(
        lambda: jnp.zeros((bcfg.llm.vocab_size, bcfg.llm.hidden_size),
                          jnp.bfloat16))()}
    from univid_tpu.models.bagel.siglip import init_siglip
    sshapes = jax.eval_shape(
        lambda k: init_siglip(k, scfg, param_dtype=jnp.bfloat16),
        jax.random.PRNGKey(3))
    sig_params = zeros_like_tree(sshapes)
    fcfg = FusionConfig(wan_text_dim=spec.dit.text_dim,
                        wan_text_length=spec.dit.text_len)
    pshapes = jax.eval_shape(
        lambda k: init_context_projector(k, fcfg,
                                         param_dtype=jnp.bfloat16),
        jax.random.PRNGKey(4))
    proj_params = zeros_like_tree(pshapes)
    ex = BagelSemanticExtractor(
        bagel_params, bcfg, HashTokenizer(vocab_size=151640),
        siglip_params=sig_params, siglip_cfg=scfg)
    proj_jit = jax.jit(lambda p, t: context_projector_forward(
        p, fcfg, t[None], compute_dtype=jnp.bfloat16)[0])

    def _fusion_ctx(text, image=None):
        return proj_jit(proj_params, ex(text, image))

    device_sync(_fusion_ctx(prompt))  # compile
    reps = 4
    t0 = time.perf_counter()
    for i in range(reps):
        out = _fusion_ctx(prompt + " " + "take%d" % i)
    device_sync(out)
    bagel_extract_s = (time.perf_counter() - t0) / reps
    # image-conditioned (i2v fusion) extraction: the SigLIP tower is the
    # real cost; frame at the generation resolution
    frame = jnp.zeros((h, w, 3), jnp.float32)
    device_sync(_fusion_ctx(prompt, frame))  # compile
    t0 = time.perf_counter()
    for i in range(reps):
        out = _fusion_ctx(prompt + " " + "img%d" % i, frame)
    device_sync(out)
    bagel_extract_img_s = (time.perf_counter() - t0) / reps
    del bagel_params, sig_params, proj_params, ex, proj_jit, out
    import gc
    gc.collect()

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
    if os.environ.get("BENCH_BOUNDED", "1") != "0":
        # bounded softmax default, same knob as bench.py (exact math)
        import dataclasses
        policy = dataclasses.replace(policy, bounded_softmax=True)
    pipe = WanTI2VPipeline(spec, dit_params, vae_params, policy=policy)

    kw = dict(size=(w, h), frame_num=frames, sampling_steps=steps,
              seed=0, output_u8=True)  # u8 fused into decode: 4x less D2H
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
    video = np.asarray(video)  # u8 frames (output_u8): 97 MB, not 390
    gen_s = time.perf_counter() - t0

    # ---- stage 3: mp4 mux (timed) --------------------------------------
    t0 = time.perf_counter()
    out = os.environ.get("E2E_OUT", "/tmp/bench_e2e.mp4")
    save_video(video, out, fps=int(spec.generation.fps))
    mux_s = time.perf_counter() - t0

    print(json.dumps({
        "e2e_sec_per_video": round(encode_s + gen_s + mux_s, 3),
        # the reference's default (fusion) path: BAGEL context replaces
        # the UMT5 output, so its e2e swaps encode_s for the extraction
        "fusion_e2e_sec_per_video": round(
            bagel_extract_s + gen_s + mux_s, 3),
        "encode_s": round(encode_s, 3),
        "bagel_extract_project_s": round(bagel_extract_s, 4),
        "bagel_extract_project_img_s": round(bagel_extract_img_s, 4),
        "denoise_plus_decode_s": round(gen_s, 3),
        "mux_s": round(mux_s, 3),
        "model": model, "resolution": f"{w}x{h}x{frames}f",
        "steps": steps, "mp4": out,
    }))


if __name__ == "__main__":
    main()
