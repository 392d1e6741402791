#!/usr/bin/env python
"""VQA-side throughput bench (BASELINE.md target: "VQA clips/sec").

Measures the two Pyramid Reflection hot paths on the current device:
  * scorer: SigLIP2 dual-tower frame ranking over a 64-frame pool at the
    so400m shape the reference loads (eval_understanding.py:171-206) —
    random weights, REAL compute shape.
  * caption: vmapped batch frame captioning (ViT append -> prefill ->
    AR decode) through the Qwen2-MoT stack at a stated LM scale
    (default ~3.3B total MoT params — the largest bf16 MoT that fits
    one 16 GB v5e next to the SigLIP tower and per-frame KV caches;
    BAGEL-7B itself (~14B with expert twins) needs the fsdp/tp sharding
    path proven by __graft_entry__.dryrun_multichip's bagel_7b leg).

Prints one JSON line. Not driver-facing (the driver contract is
bench.py); run manually: `python tools/bench_qa.py`.

Env knobs: QA_FRAMES (pool size, default 64), QA_CAP_FRAMES (captioned
seed frames, default 16), QA_MAX_TOKENS (default 32), QA_LM_LAYERS /
QA_LM_HIDDEN to rescale the LM leg.
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


def bench_scorer(n_frames: int):
    from univid_tpu.models.bagel.siglip import SiglipConfig
    from univid_tpu.reflection.scorer import Siglip2Scorer, \
        SiglipTextConfig
    from univid_tpu.utils.tokenizers import HashTokenizer

    # SigLIP2 so400m shapes (vision 27L/1152d, text 27L/1152d)
    vcfg = SiglipConfig(hidden_size=1152, intermediate_size=4304,
                        num_layers=27, num_heads=16, patch_size=14,
                        image_size=224)
    tcfg = SiglipTextConfig(hidden_size=1152, intermediate_size=4304,
                            num_layers=27, num_heads=16)
    scorer = Siglip2Scorer(vision_cfg=vcfg, text_cfg=tcfg,
                           tokenizer=HashTokenizer(vocab_size=32000))
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (224, 224, 3), np.uint8)
              for _ in range(n_frames)]
    scorer.rank_frames(frames, "warmup question", topk=16)  # compile
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        scorer.rank_frames(frames, f"what happens in round {i}?",
                           topk=16)
    dt = (time.perf_counter() - t0) / reps
    return {"rank_frames_per_s": round(n_frames / dt, 1),
            "rank_pool_s": round(dt, 3), "vision": "so400m-27L-1152d"}


def bench_caption(n_frames: int, max_tokens: int):
    from univid_tpu.models.bagel.bagel import BagelConfig, init_bagel
    from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig
    from univid_tpu.models.bagel.siglip import SiglipConfig, init_siglip
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.utils.tokenizers import HashTokenizer

    layers = int(os.environ.get("QA_LM_LAYERS", "28"))
    hidden = int(os.environ.get("QA_LM_HIDDEN", "2048"))
    inter = int(os.environ.get("QA_LM_INTER", str(hidden * 4)))
    # QA_MOE=0 builds the und-only tower (captioning never routes
    # through the gen twins); with QA_INT8=1 the REAL 7B decode shape
    # (QA_LM_HIDDEN=3584 QA_LM_LAYERS=28 QA_LM_INTER=18944) fits one
    # 16 GB v5e at ~7 GB of int8 weights
    moe = os.environ.get("QA_MOE", "1") != "0"
    llm = Qwen2MoTConfig(vocab_size=32000, hidden_size=hidden,
                         intermediate_size=inter, num_layers=layers,
                         num_heads=hidden // 128, num_kv_heads=4,
                         moe=moe)
    cfg = BagelConfig(llm=llm, vit_hidden_size=1152, vit_patch_size=14,
                      start_of_image=31990, end_of_image=31991,
                      bos_token_id=31992, eos_token_id=31993)
    scfg = SiglipConfig(hidden_size=1152, intermediate_size=4304,
                        num_layers=27, num_heads=16, patch_size=14,
                        image_size=224)
    if os.environ.get("QA_INT8", "0") != "0":
        # the full bf16 7B tree (~13.4 GB) OOMs a 16 GB v5e before
        # quantize_tree can shrink it — init+quantize ONE layer per
        # jitted call (the bf16 intermediate lives only inside the jit),
        # stack the int8 layers on host, then device_put the final tree
        import dataclasses
        from univid_tpu.core.quant import quantize_tree
        cfg1 = dataclasses.replace(cfg, llm=dataclasses.replace(
            llm, num_layers=1))
        one = jax.jit(lambda k: quantize_tree(init_bagel(
            k, cfg1, param_dtype=jnp.bfloat16)))
        host_layers = [jax.device_get(one(jax.random.PRNGKey(i))["llm"]
                                      ["layers"])
                       for i in range(llm.num_layers)]
        stacked = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=0), *host_layers)
        del host_layers
        params = jax.device_get(one(jax.random.PRNGKey(0)))
        params["llm"]["layers"] = stacked
        params = jax.device_put(params)
    else:
        params = init_bagel(jax.random.PRNGKey(0), cfg,
                            param_dtype=jnp.bfloat16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg,
                      param_dtype=jnp.bfloat16)
    inf = InterleaveInferencer(params, cfg,
                               HashTokenizer(vocab_size=31990),
                               siglip_params=sig, siglip_cfg=scfg,
                               compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    frames = [jnp.asarray(rng.integers(0, 255, (224, 224, 3), np.uint8))
              for _ in range(n_frames)]
    kw = dict(max_length=max_tokens, do_sample=False)
    inf.caption_frames(frames, "Describe this frame briefly.", **kw)
    t0 = time.perf_counter()
    inf.caption_frames(frames, "What is happening here?", **kw)
    dt = time.perf_counter() - t0
    from univid_tpu.core import nn as unn
    return {"caption_frames_per_s": round(n_frames / dt, 2),
            "caption_tokens_per_s": round(n_frames * max_tokens / dt, 1),
            "lm_params": unn.count_params(params),
            "lm_scale": (f"{layers}L-{hidden}d-{inter}ffn-"
                         f"{'MoT' if moe else 'und'}"
                         + ("-int8" if os.environ.get("QA_INT8", "0")
                            != "0" else ""))}


def bench_vqa(n_ctx_frames: int, max_tokens: int):
    """video_understanding: N-frame ViT context prefill + long AR decode
    — the reflexion hot loop (SURVEY §3.3; <=512 think tokens is the
    BASELINE decode contract). Exercises the GQA-native dense decode
    over the long multi-frame cache."""
    import time as _t

    from univid_tpu.models.bagel.bagel import BagelConfig, init_bagel
    from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig
    from univid_tpu.models.bagel.siglip import SiglipConfig, init_siglip
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.utils.tokenizers import HashTokenizer

    layers = int(os.environ.get("QA_LM_LAYERS", "28"))
    hidden = int(os.environ.get("QA_LM_HIDDEN", "2048"))
    inter = int(os.environ.get("QA_LM_INTER", str(hidden * 4)))
    llm = Qwen2MoTConfig(vocab_size=32000, hidden_size=hidden,
                         intermediate_size=inter, num_layers=layers,
                         num_heads=hidden // 128, num_kv_heads=4,
                         moe=os.environ.get("QA_MOE", "1") != "0")
    cfg = BagelConfig(llm=llm, vit_hidden_size=1152, vit_patch_size=14,
                      start_of_image=31990, end_of_image=31991,
                      bos_token_id=31992, eos_token_id=31993)
    scfg = SiglipConfig(hidden_size=1152, intermediate_size=4304,
                        num_layers=27, num_heads=16, patch_size=14,
                        image_size=224)
    params = init_bagel(jax.random.PRNGKey(0), cfg,
                        param_dtype=jnp.bfloat16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg,
                      param_dtype=jnp.bfloat16)
    inf = InterleaveInferencer(params, cfg,
                               HashTokenizer(vocab_size=31990),
                               siglip_params=sig, siglip_cfg=scfg,
                               compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    frames = [jnp.asarray(rng.integers(0, 255, (224, 224, 3), np.uint8))
              for _ in range(n_ctx_frames)]
    kw = dict(max_think_token_n=max_tokens, do_sample=False)
    inf.video_understanding(frames, "warmup question?", **kw)
    t0 = _t.perf_counter()
    out = inf.video_understanding(frames, "What happens in this video?",
                                  **kw)
    dt = _t.perf_counter() - t0
    n_out = max(1, len(out.get("text", "").split()))
    return {"vqa_s_per_answer": round(dt, 2),
            "vqa_decode_tokens_per_s": round(max_tokens / dt, 1),
            "ctx_frames": n_ctx_frames, "decoded": n_out}


def bench_reflexion_e2e():
    """ONE wall-clock number for a whole Pyramid Reflection question
    (VERDICT r4 weak #7 / BASELINE.md "VQA clips/sec"): synthetic mp4 ->
    64-frame pool decode -> seed-frame captioning -> SigLIP embed+rank ->
    3 static QA rounds -> judge/fallback, through the REAL
    reflexion_answer_one state machine with offline no-op clients (the
    reference's keyless mode, eval_understanding.py:403-421 — the judge
    rejects, so all three pyramid rounds K=4,8,16 actually execute: this
    is the worst-case round mix, not the accept-at-round-1 best case).

    Env: QA_E2E_TOKENS decode budget per caption/answer (default 64;
    the reference contract is <=512 but stops at EOS — random weights
    never emit EOS, so the full 512 would time pure padding),
    QA_E2E_POOL (default 64), QA_LM_* rescale the LM as above.
    """
    import tempfile

    from univid_tpu.data.video_io import save_video
    from univid_tpu.models.bagel.bagel import BagelConfig, init_bagel
    from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig
    from univid_tpu.models.bagel.siglip import SiglipConfig, init_siglip
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.reflection.clients import NoOpJudge, NoOpReflector
    from univid_tpu.reflection.reflexion import (ReflexionConfig,
                                                 reflexion_answer_one)
    from univid_tpu.reflection.scorer import Siglip2Scorer, \
        SiglipTextConfig
    from univid_tpu.utils.tokenizers import HashTokenizer

    pool = int(os.environ.get("QA_E2E_POOL", "64"))
    tokens = int(os.environ.get("QA_E2E_TOKENS", "64"))
    layers = int(os.environ.get("QA_LM_LAYERS", "28"))
    hidden = int(os.environ.get("QA_LM_HIDDEN", "2048"))
    inter = int(os.environ.get("QA_LM_INTER", str(hidden * 4)))
    llm = Qwen2MoTConfig(vocab_size=32000, hidden_size=hidden,
                         intermediate_size=inter, num_layers=layers,
                         num_heads=hidden // 128, num_kv_heads=4,
                         moe=os.environ.get("QA_MOE", "1") != "0")
    cfg = BagelConfig(llm=llm, vit_hidden_size=1152, vit_patch_size=14,
                      start_of_image=31990, end_of_image=31991,
                      bos_token_id=31992, eos_token_id=31993)
    scfg = SiglipConfig(hidden_size=1152, intermediate_size=4304,
                        num_layers=27, num_heads=16, patch_size=14,
                        image_size=224)
    vcfg = SiglipConfig(hidden_size=1152, intermediate_size=4304,
                        num_layers=27, num_heads=16, patch_size=14,
                        image_size=224)
    tcfg = SiglipTextConfig(hidden_size=1152, intermediate_size=4304,
                            num_layers=27, num_heads=16)
    params = init_bagel(jax.random.PRNGKey(0), cfg,
                        param_dtype=jnp.bfloat16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg,
                      param_dtype=jnp.bfloat16)
    inf = InterleaveInferencer(params, cfg,
                               HashTokenizer(vocab_size=31990),
                               siglip_params=sig, siglip_cfg=scfg,
                               compute_dtype=jnp.bfloat16)
    scorer = Siglip2Scorer(vision_cfg=vcfg, text_cfg=tcfg,
                           tokenizer=HashTokenizer(vocab_size=32000))
    rcfg = ReflexionConfig(pool_frames=pool, max_think_token_n=tokens)

    # synthetic 24 fps clip on disk so the pool DECODE is on the clock
    # (the reference decodes with decord/torchvision/cv2,
    # eval_understanding.py:153-168)
    rng = np.random.default_rng(3)
    vid = rng.integers(0, 255, (pool * 2, 224, 224, 3), np.uint8)
    tmp = tempfile.mkdtemp()
    mp4 = os.path.join(tmp, "clip.mp4")
    save_video(vid.astype(np.float32) / 127.5 - 1.0, mp4, fps=24)

    judge, refl = NoOpJudge(), NoOpReflector()

    def one(q):
        t0 = time.perf_counter()
        _, trace = reflexion_answer_one(mp4, q, inf, refl, judge, scorer,
                                        cfg=rcfg)
        return time.perf_counter() - t0, trace

    one("warmup: what object appears?")        # compile everything
    dt, trace = one("what happens in this video?")
    clip_s = vid.shape[0] / 24.0
    return {"sec_per_question": round(dt, 2),
            "clips_per_sec": round(clip_s / dt, 4),
            "pool_frames": pool,
            "rounds": len(trace["rounds"]),
            "components": {
                "decode_tokens_per_answer": tokens,
                "caption_seed_frames": rcfg.caption_seed_frames,
                "static_seq": list(rcfg.static_seq),
                "lm_scale": f"{layers}L-{hidden}d-{inter}ffn",
            }}


def main():
    n_frames = int(os.environ.get("QA_FRAMES", "64"))
    cap_frames = int(os.environ.get("QA_CAP_FRAMES", "16"))
    max_tokens = int(os.environ.get("QA_MAX_TOKENS", "32"))
    if os.environ.get("BENCH_QA_E2E", "0") != "0":
        # driver-facing single-number mode (bench.py vqa_e2e row)
        r = bench_reflexion_e2e()
        r["device"] = str(jax.devices()[0])
        r["backend"] = jax.default_backend()
        print(json.dumps(r))
        return
    detail = {"device": str(jax.devices()[0]),
              "backend": jax.default_backend()}
    detail["scorer"] = bench_scorer(n_frames)
    if os.environ.get("QA_CAPTION", "1") != "0":
        detail["caption"] = bench_caption(cap_frames, max_tokens)
    if os.environ.get("QA_VQA", "0") != "0":
        detail["vqa"] = bench_vqa(
            int(os.environ.get("QA_VQA_FRAMES", "16")),
            int(os.environ.get("QA_VQA_TOKENS", "128")))
    if os.environ.get("QA_E2E", "0") != "0":
        detail["reflexion_e2e"] = bench_reflexion_e2e()
    print(json.dumps({"metric": f"qa_rank{n_frames}_caption{cap_frames}",
                      "detail": detail}))


if __name__ == "__main__":
    main()
