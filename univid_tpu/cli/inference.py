"""UniVid-TPU video generation CLI (T2V / I2V with BAGEL fusion + TMA).

Flag-compatible with reference inference.py:525-572 (mode/image/
output_dir/seed/steps/guidance/bagel_strength/video_length/video_size/
TMA flags/prompt), plus TPU-specific additions (--checkpoint_dir,
--model, --mock_weights for hermetic smoke runs). Saves mp4 + a metadata
sidecar like HighQualityVideoGenerator (inference.py:404-470).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from datetime import datetime

import numpy as np

DEFAULT_PROMPT = (
    "A cinematic shot of a corgi running through a sunlit meadow, shallow "
    "depth of field, golden hour lighting, 24fps smooth motion."
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="High-Quality Video Generation with Dynamic Text "
                    "Weight (TPU)")
    p.add_argument("--mode", type=str,
                   choices=["t2v", "i2v", "both", "animate"],
                   default="t2v")
    p.add_argument("--image", type=str, default=None,
                   help="Input image path for i2v mode")
    p.add_argument("--output_dir", type=str, default="./outputs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance", type=float, default=5.0)
    p.add_argument("--use_lora", action="store_true",
                   help="merge a trained Wan-DiT LoRA (save_lora dir) "
                        "into the denoiser at load time")
    p.add_argument("--lora_path", type=str,
                   default="./lora_checkpoints/best")
    p.add_argument("--bagel_strength", type=float, default=1.0,
                   help="BAGEL fusion strength (0=no BAGEL, 1=full BAGEL)")
    p.add_argument("--video_length", type=int, default=None)
    p.add_argument("--video_size", type=str, default="hd",
                   help="'training' (512x320), 'hd' (1280x704) or 'WxH'")
    p.add_argument("--disable_dynamic_weight", action="store_true")
    p.add_argument("--text_weight_max", type=float, default=1.3)
    p.add_argument("--text_weight_min", type=float, default=1.0)
    p.add_argument("--weight_schedule", type=str, default="cosine",
                   choices=["linear", "cosine", "exponential"])
    p.add_argument("--transition_ratio", type=float, default=0.4)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--shift", type=float, default=5.0)
    p.add_argument("--taylorseer", type=int, default=0,
                   help="TaylorSeer step-cache refresh threshold for the "
                        "denoise loop (0 = off, the parity default; 3 = "
                        "the reference's BAGEL-side setting — full DiT "
                        "forward every 3rd step, Taylor-extrapolated "
                        "velocity between; quality/speed tradeoff)")
    # --mode animate (reference animate.py:297-360 generate surface;
    # inputs are the preprocess CLI's output dir)
    p.add_argument("--src_root_path", type=str, default=None,
                   help="animate: dir holding src_pose.mp4 / "
                        "src_face.mp4 / src_ref.png (+ src_bg.mp4 / "
                        "src_mask.mp4 for --replace_flag) — the "
                        "preprocess_animate CLI output")
    p.add_argument("--replace_flag", action="store_true",
                   help="animate: character replacement mode (bg+mask "
                        "conditioning)")
    p.add_argument("--refert_num", type=int, default=1, choices=[1, 5],
                   help="animate: temporal-guidance overlap frames "
                        "between 77-frame clips")
    p.add_argument("--clip_len", type=int, default=77)
    p.add_argument("--use_relighting_lora", action="store_true")
    p.add_argument("--relight_lora_path", type=str, default=None)
    p.add_argument("--bf16_residual", action="store_true",
                   help="run the DiT residual stream in bf16 (fp32 AdaLN/"
                        "time-embed/softmax islands kept): ~35%% faster "
                        "denoise, 43.6 dB PSNR / 2.0%% latent rel err vs "
                        "the fp32-residual default at 832x480x81f/50 "
                        "steps (tools/quality_sweep.py)")
    p.add_argument("--bf16_softmax", action="store_true",
                   help="run the flash-kernel softmax chain in bf16 "
                        "(inference only; measured ~7%% SLOWER than the "
                        "fp32 chain at the 1.3B 33k-token v5e shape — "
                        "opt-in for other geometries; gate QS_SOFTMAX=1 "
                        "in tools/quality_sweep.py). Applies to the "
                        "Pallas flash kernels (self/cross attention incl. "
                        "ulysses SP and the animate path); the XLA and "
                        "ring backends keep fp32 softmax")
    p.add_argument("--int8", action="store_true",
                   help="int8 W8A8 serving mode: quantize the DiT's "
                        "per-block GEMMs to dynamic-activation int8 "
                        "(s8 x s8 -> s32 on the MXU; embeds/AdaLN/head "
                        "stay bf16). Quality gate: int8_w8a8 row of "
                        "tools/quality_sweep.py")
    p.add_argument("--qk_int8", action="store_true",
                   help="int8 QK^T inside the flash self-attention "
                        "kernel (per-row q / per-block k scales, "
                        "quantized post-rope in-kernel). MEASURED "
                        "SLOWER on v5e (96.5 vs 90.6 ms at the 1.3B "
                        "33k-token shape): QK^T contracts over "
                        "head_dim=128, too short for the MXU's int8 "
                        "contraction-packing rate — see "
                        "core/dtypes.py. Opt-in for future hardware; "
                        "Pallas-only scope like --bf16_softmax. "
                        "Quality gate: qk_int8 row of "
                        "tools/quality_sweep.py")
    p.add_argument("--bounded_softmax", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="bounded-softmax flash kernel (DEFAULT ON): the "
                        "qk-norm gains bound the raw scores by d * "
                        "max|g_q| * max|g_k| (rope preserves row "
                        "norms), so the kernel pins the online-softmax "
                        "reference point there instead of tracking a "
                        "running max — mathematically EXACT (the "
                        "constant cancels in acc/l), drops the max "
                        "reduce / correction / rescale per kv block. "
                        "Measured 89.7 -> 77.9 ms kernel (74.7 -> 86.0% "
                        "MFU) at the 1.3B 33k-token v5e shape. "
                        "Pallas-only scope like --bf16_softmax.")
    p.add_argument("--solver", type=str, default="unipc",
                   choices=["unipc", "dpm++", "dpm++3"])
    # TPU-specific
    p.add_argument("--model", type=str, default="ti2v-5B")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="Wan checkpoint directory (DiT + VAE + UMT5, see "
                        "univid_tpu.core.checkpoint)")
    p.add_argument("--bagel_path", type=str, default=None,
                   help="BAGEL checkpoint directory (ema.safetensors)")
    p.add_argument("--training_state", type=str, default=None,
                   help="Trained ContextProjector checkpoint "
                        "(training_state.pt / .npz, inference.py:227-236)")
    p.add_argument("--null_context", type=str, default="bagel",
                   choices=["bagel", "t5", "zeros"],
                   help="uncond CFG context source under fusion "
                        "('bagel' = reference-faithful degenerate CFG)")
    p.add_argument("--mock_weights", action="store_true",
                   help="Random-init weights (hermetic smoke run; the "
                        "code path is identical to real checkpoints)")
    p.add_argument("--no_bagel", action="store_true",
                   help="Skip BAGEL fusion; pure UMT5 context path")
    # prompt extension (reference inference.py prompt-extend hook +
    # utils/prompt_extend.py)
    p.add_argument("--use_prompt_extend", action="store_true")
    p.add_argument("--prompt_extend_method", default="offline",
                   choices=["dashscope", "local_qwen", "offline"])
    p.add_argument("--prompt_extend_model", default=None)
    p.add_argument("--prompt_extend_target_lang", default="en",
                   choices=["zh", "en"])
    return p


def _parse_size(s: str):
    if s == "hd":
        return (1280, 704)
    if s == "training":
        return (512, 320)
    w, h = s.replace("*", "x").split("x")
    return (int(w), int(h))


def build_pipeline(args):
    """(wan_pipeline, spec, text_encoder): the Wan stack + UMT5 prompt
    encoder — the real code path for both converted checkpoints and the
    hermetic --mock_weights configuration (reference inference.py:
    525-720 -> textimage2video.py:36-114)."""
    import jax
    import jax.numpy as jnp
    from ..core.config import WAN_CONFIGS
    from ..models.wan.dit import init_wan_dit
    from ..models.wan.vae_api import init_wan_vae
    from ..pipelines.encoders import WanTextEncoder
    from ..pipelines.ti2v import WanTI2VPipeline

    spec = WAN_CONFIGS[args.model]
    moe = spec.moe_boundary is not None
    if args.checkpoint_dir:
        if moe:
            # A14B ships two expert dirs (reference text2video.py:
            # low_noise_model/high_noise_model subfolders)
            from ..core.checkpoint import load_wan_moe_checkpoint
            dit_params, vae_params = load_wan_moe_checkpoint(
                args.checkpoint_dir, spec)
        else:
            from ..core.checkpoint import load_wan_checkpoint
            dit_params, vae_params = load_wan_checkpoint(
                args.checkpoint_dir, spec)
        text_enc = WanTextEncoder.from_checkpoint(args.checkpoint_dir, spec)
    elif args.mock_weights:
        if moe:
            dit_params = (
                init_wan_dit(jax.random.PRNGKey(0), spec.dit,
                             param_dtype=jnp.bfloat16),
                init_wan_dit(jax.random.PRNGKey(5), spec.dit,
                             param_dtype=jnp.bfloat16))
        else:
            dit_params = init_wan_dit(jax.random.PRNGKey(0), spec.dit,
                                      param_dtype=jnp.bfloat16)
        vae_params = init_wan_vae(jax.random.PRNGKey(1), spec.vae,
                                  param_dtype=jnp.bfloat16)
        text_enc = WanTextEncoder.random_init(spec)
    else:
        raise SystemExit("pass --checkpoint_dir or --mock_weights")

    if args.use_lora:
        # trained Wan-DiT LoRA merged at load time (reference
        # inference.py --use_lora/--lora_path -> LoRAManager.load +
        # merge, model_pipeline.py:601-720)
        from ..train.lora import load_lora, merge_lora
        lora, _ = load_lora(args.lora_path)
        if moe:
            dit_params = tuple(merge_lora(p, lora) for p in dit_params)
        else:
            dit_params = merge_lora(dit_params, lora)

    if getattr(args, "int8", False):
        # int8 W8A8 serving quantization AFTER any LoRA merge (quantize
        # the weights the model will actually run)
        from ..core.quant import quantize_dit_w8a8
        if moe:
            dit_params = tuple(jax.jit(quantize_dit_w8a8)(p)
                               for p in dit_params)
        else:
            dit_params = jax.jit(quantize_dit_w8a8)(dit_params)

    from ..core.dtypes import BF16_RESIDUAL_POLICY, DEFAULT_POLICY
    policy = BF16_RESIDUAL_POLICY if getattr(args, "bf16_residual", False) \
        else DEFAULT_POLICY
    if getattr(args, "bf16_softmax", False):
        import dataclasses
        policy = dataclasses.replace(policy, softmax_bf16=True)
    if getattr(args, "qk_int8", False):
        import dataclasses
        policy = dataclasses.replace(policy, qk_int8=True)
    if getattr(args, "bounded_softmax", False):
        import dataclasses
        policy = dataclasses.replace(policy, bounded_softmax=True)
    if moe:
        from ..pipelines.moe import WanMoEPipeline
        pipe = WanMoEPipeline(spec, dit_params[0], dit_params[1],
                              vae_params, policy=policy)
    else:
        pipe = WanTI2VPipeline(spec, dit_params, vae_params, policy=policy)
    return pipe, spec, text_enc


def build_fusion(args, wan_pipe, spec):
    """FusionPipeline (BAGEL extractor + ContextProjector + Wan) or None
    for the pure-T5 path. Mirrors CrossAttentionFusionPipeline
    construction (model_pipeline.py:2151-2243) without device juggling."""
    if args.no_bagel:
        return None

    import jax
    import jax.numpy as jnp
    from ..core.config import FusionConfig
    from ..models.fusion.extractor import BagelSemanticExtractor
    from ..models.fusion.projector import init_context_projector
    from ..pipelines.fusion import FusionPipeline

    if args.bagel_path and not args.mock_weights:
        from ..core.checkpoint import load_bagel_checkpoint
        params, cfg, scfg, sig_params, tokenizer = load_bagel_checkpoint(
            args.bagel_path)
        fusion_cfg = FusionConfig(
            bagel_hidden_dim=cfg.llm.hidden_size,
            wan_text_dim=spec.dit.text_dim,
            wan_text_length=spec.dit.text_len,
            fusion_alpha=args.bagel_strength)
        dtype = jnp.bfloat16
    elif args.mock_weights:
        # tiny random BAGEL, identical code path (eval_understanding CLI
        # uses the same hermetic configuration)
        from ..models.bagel.bagel import BagelConfig, init_bagel
        from ..models.bagel.qwen2_mot import Qwen2MoTConfig
        from ..models.bagel.siglip import SiglipConfig, init_siglip
        from ..utils.tokenizers import HashTokenizer

        llm = Qwen2MoTConfig(vocab_size=4096, hidden_size=64,
                             intermediate_size=128, num_layers=2,
                             num_heads=4, num_kv_heads=2)
        cfg = BagelConfig(llm=llm, vit_hidden_size=32, vit_patch_size=14,
                          start_of_image=4090, end_of_image=4091,
                          bos_token_id=4092, eos_token_id=4093)
        scfg = SiglipConfig(hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=2, patch_size=14,
                            image_size=224)
        params = init_bagel(jax.random.PRNGKey(10), cfg)
        sig_params = init_siglip(jax.random.PRNGKey(11), scfg)
        tokenizer = HashTokenizer(vocab_size=4090)
        fusion_cfg = FusionConfig(
            bagel_hidden_dim=llm.hidden_size,
            wan_text_dim=spec.dit.text_dim,
            wan_text_length=spec.dit.text_len,
            bagel_sequence_length=min(64, spec.dit.text_len),
            fusion_alpha=args.bagel_strength)
        dtype = jnp.float32
    else:
        return None  # real Wan checkpoint without BAGEL weights

    extractor = BagelSemanticExtractor(
        params, cfg, tokenizer, siglip_params=sig_params, siglip_cfg=scfg,
        target_len=fusion_cfg.bagel_sequence_length, compute_dtype=dtype)

    if args.training_state:
        from ..core.checkpoint import load_projector_checkpoint
        projector = load_projector_checkpoint(args.training_state,
                                              fusion_cfg)
    else:
        projector = init_context_projector(jax.random.PRNGKey(12),
                                           fusion_cfg)
    return FusionPipeline(wan_pipe, projector, fusion_cfg,
                          bagel_extractor=extractor)


def run_animate(args):
    """--mode animate: character animation/replacement from the
    preprocess output dir (reference animate.py:297-648 clip loop;
    file contract animate.py:362-364 src_pose/src_face/src_ref[+bg/mask])."""
    import types

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..core.config import ANIMATE_CONFIGS, T5Config
    from ..core.dtypes import BF16_RESIDUAL_POLICY, DEFAULT_POLICY
    from ..data.video_io import read_video_frames, save_video
    from ..models.wan.animate import init_clip_vision, init_wan_animate
    from ..models.wan.vae_api import init_wan_vae
    from ..pipelines.animate import WanAnimatePipeline
    from ..pipelines.encoders import WanTextEncoder
    from ..utils.profiling import PhaseTimer, trace

    if not args.src_root_path:
        raise SystemExit("--mode animate needs --src_root_path "
                         "(the preprocess_animate output dir)")
    model = args.model if args.model in ANIMATE_CONFIGS else "animate-14B"
    acfg, vae_cfg, clip_cfg = ANIMATE_CONFIGS[model]()

    def vid(name):
        path = os.path.join(args.src_root_path, name)
        frames = np.stack(read_video_frames(path))
        return frames.astype(np.float32) / 127.5 - 1.0

    cond = vid("src_pose.mp4")
    face = vid("src_face.mp4")
    ref = np.asarray(Image.open(os.path.join(
        args.src_root_path, "src_ref.png")).convert("RGB"),
        np.float32) / 127.5 - 1.0
    bg = mask = None
    if args.replace_flag:
        bg = vid("src_bg.mp4")
        mask = (vid("src_mask.mp4").mean(axis=-1) > 0.0).astype(np.float32)

    # normalize input geometry like the reference loaders: the reference
    # pads/resizes the ref image to the pose size (animate.py:281) and
    # the face stream to the motion-encoder size (512 there)
    if ref.shape[:2] != cond.shape[1:3]:
        ref = np.asarray(jax.image.resize(
            jnp.asarray(ref), cond.shape[1:3] + (3,), method="bilinear"))
    s = acfg.motion_size
    if face.shape[1] != s or face.shape[2] != s:
        face = np.asarray(jax.image.resize(
            jnp.asarray(face), (face.shape[0], s, s, 3),
            method="bilinear"))

    t5_cfg = T5Config(text_len=acfg.text_len) if not args.mock_weights \
        else T5Config(vocab_size=512, dim=acfg.text_dim,
                      dim_attn=acfg.text_dim, dim_ffn=2 * acfg.text_dim,
                      num_heads=4, num_layers=2, text_len=acfg.text_len)
    assert t5_cfg.dim == acfg.text_dim, (t5_cfg.dim, acfg.text_dim)
    t5_spec = types.SimpleNamespace(t5=t5_cfg)

    relight = args.relight_lora_path if args.use_relighting_lora else None
    if args.checkpoint_dir:
        from ..core.checkpoint import load_wan_animate_checkpoint
        params, vae_params, clip_params = load_wan_animate_checkpoint(
            args.checkpoint_dir, acfg, vae_cfg, clip_cfg)
        if clip_params is None:
            raise SystemExit("no CLIP checkpoint in --checkpoint_dir "
                             "(models_clip_open-clip-xlm-roberta-large-"
                             "vit-huge-14.pth)")
        text_enc = WanTextEncoder.from_checkpoint(args.checkpoint_dir,
                                                  t5_spec)
    elif args.mock_weights:
        params = init_wan_animate(jax.random.PRNGKey(0), acfg)
        vae_params = init_wan_vae(jax.random.PRNGKey(1), vae_cfg)
        clip_params = init_clip_vision(jax.random.PRNGKey(2), clip_cfg)
        text_enc = WanTextEncoder.random_init(t5_spec)
    else:
        raise SystemExit("pass --checkpoint_dir or --mock_weights")

    policy = BF16_RESIDUAL_POLICY if args.bf16_residual else DEFAULT_POLICY
    if getattr(args, "bf16_softmax", False):
        import dataclasses
        policy = dataclasses.replace(policy, softmax_bf16=True)
    pipe = WanAnimatePipeline(acfg, params, vae_cfg, vae_params,
                              clip_cfg=clip_cfg, clip_params=clip_params,
                              policy=policy, relight_lora=relight)

    from ..core.config import DEFAULT_NEG_PROMPT
    prompt = args.prompt or DEFAULT_PROMPT
    timer = PhaseTimer()
    ctx_pair = timer.time_phase("text_encode", text_enc,
                                [prompt, DEFAULT_NEG_PROMPT])

    t0 = time.time()
    with trace("generate"):
        video = timer.time_phase(
            "generate", pipe.generate, ctx_pair[0], ctx_pair[1],
            cond_video=cond, face_video=face, ref_image=ref,
            bg_video=bg, mask_video=mask, clip_len=args.clip_len,
            refert_num=args.refert_num, shift=args.shift,
            sample_solver=args.solver, sampling_steps=args.steps,
            guide_scale=args.guidance, seed=args.seed)
    dt = time.time() - t0

    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = os.path.join(args.output_dir, f"animate_{stamp}.mp4")
    path = save_video(np.asarray(video), out, fps=30)
    meta = {
        "prompt": prompt, "mode": "animate", "model": model,
        "frames": int(video.shape[0]),
        "size": [int(video.shape[2]), int(video.shape[1])],
        "steps": args.steps, "guidance": args.guidance,
        "seed": args.seed, "replace": bool(args.replace_flag),
        "refert_num": args.refert_num, "clip_len": args.clip_len,
        "generation_time_s": round(dt, 2),
        "phase_times_s": timer.summary(), "video_path": path,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    return [meta]


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..core.debug import apply_debug_flags
    apply_debug_flags()
    os.makedirs(args.output_dir, exist_ok=True)

    if args.mode == "animate":
        return run_animate(args)

    import jax
    import jax.numpy as jnp
    from ..core.config import TMAConfig
    from ..data.video_io import save_video

    pipe, spec, text_enc = build_pipeline(args)
    fusion = build_fusion(args, pipe, spec)
    prompt = args.prompt or DEFAULT_PROMPT
    if args.use_prompt_extend:
        from ..utils.prompt_extend import make_prompt_expander
        expander = make_prompt_expander(
            args.prompt_extend_method, task=args.model,
            is_vl=args.mode != "t2v" and args.image is not None,
            model_name=args.prompt_extend_model)
        ext = expander(prompt, tar_lang=args.prompt_extend_target_lang,
                       image=args.image if expander.is_vl else None,
                       seed=args.seed)
        if ext.status:
            prompt = ext.prompt
    size = _parse_size(args.video_size)
    frames = args.video_length or spec.generation.frame_num
    tma = TMAConfig(
        enabled=not args.disable_dynamic_weight,
        weight_max=args.text_weight_max, weight_min=args.text_weight_min,
        schedule=args.weight_schedule,
        transition_ratio=args.transition_ratio,
        text_prefix_len=spec.dit.text_len)

    from ..utils.profiling import PhaseTimer, trace
    timer = PhaseTimer()

    # prompt -> UMT5 context (+ negative prompt for CFG), the reference
    # text_encoder([input_prompt]/[n_prompt]) step (textimage2video.py:
    # 255-262); the fusion path can still use these for mixing/uncond.
    ctx_pair = timer.time_phase(
        "text_encode", text_enc, [prompt, spec.sample_neg_prompt])
    ctx, nctx = ctx_pair[0], ctx_pair[1]

    img = None
    modes = ["t2v", "i2v"] if args.mode == "both" else [args.mode]
    results = []
    for mode in modes:
        if mode == "i2v":
            if not args.image:
                print("skipping i2v: no --image")
                continue
            from PIL import Image
            pil = Image.open(args.image).convert("RGB")
            img = jnp.asarray(np.asarray(pil), jnp.float32) / 127.5 - 1.0

        gen_kwargs = dict(
            size=size, frame_num=frames, shift=args.shift,
            sample_solver=args.solver, sampling_steps=args.steps,
            guide_scale=args.guidance, seed=args.seed,
            taylorseer_threshold=args.taylorseer,
            # u8 conversion fused into the decode program: 4x less D2H
            output_u8=True)
        t0 = time.time()
        with trace("generate"):
            if fusion is not None:
                video = timer.time_phase(
                    "generate", fusion.generate_video_with_bagel_context,
                    text=prompt, image=img if mode == "i2v" else None,
                    t5_context=ctx, t5_context_null=nctx,
                    null_context=args.null_context, tma=tma, **gen_kwargs)
            else:
                video = timer.time_phase(
                    "generate", pipe.generate,
                    ctx, nctx, img=img if mode == "i2v" else None,
                    tma=tma, **gen_kwargs)
        dt = time.time() - t0

        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        out = os.path.join(args.output_dir, f"{mode}_{stamp}.mp4")
        path = save_video(np.asarray(video), out,
                          fps=spec.generation.fps)
        meta = {
            "prompt": prompt, "mode": mode, "size": list(size),
            "frames": frames, "steps": args.steps,
            "guidance": args.guidance, "seed": args.seed,
            "tma": dataclass_dict(tma), "generation_time_s": round(dt, 2),
            "phase_times_s": timer.summary(),
            "context_path": ("bagel_fusion" if fusion is not None
                             else "umt5"),
            "video_path": path,
        }
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        print(json.dumps(meta))
        results.append(meta)
    return results


def dataclass_dict(x):
    import dataclasses
    return dataclasses.asdict(x)


if __name__ == "__main__":
    main()
