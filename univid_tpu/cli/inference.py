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
    p.add_argument("--mode", type=str, choices=["t2v", "i2v", "both"],
                   default="t2v")
    p.add_argument("--image", type=str, default=None,
                   help="Input image path for i2v mode")
    p.add_argument("--output_dir", type=str, default="./outputs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance", type=float, default=5.0)
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
    p.add_argument("--solver", type=str, default="unipc",
                   choices=["unipc", "dpm++"])
    # TPU-specific
    p.add_argument("--model", type=str, default="ti2v-5B")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="Converted checkpoint directory (see "
                        "univid_tpu.core.checkpoint)")
    p.add_argument("--mock_weights", action="store_true",
                   help="Random-init weights (hermetic smoke run)")
    p.add_argument("--no_bagel", action="store_true",
                   help="Skip BAGEL; use UMT5/random context directly")
    return p


def _parse_size(s: str):
    if s == "hd":
        return (1280, 704)
    if s == "training":
        return (512, 320)
    w, h = s.replace("*", "x").split("x")
    return (int(w), int(h))


def build_pipeline(args):
    import jax
    import jax.numpy as jnp
    from ..core.config import TMAConfig, WAN_CONFIGS
    from ..models.wan.dit import init_wan_dit
    from ..models.wan.vae_api import init_wan_vae
    from ..pipelines.ti2v import WanTI2VPipeline

    spec = WAN_CONFIGS[args.model]
    if args.checkpoint_dir:
        from ..core.checkpoint import load_wan_checkpoint
        dit_params, vae_params = load_wan_checkpoint(args.checkpoint_dir,
                                                     spec)
    elif args.mock_weights:
        dit_params = init_wan_dit(jax.random.PRNGKey(0), spec.dit,
                                  param_dtype=jnp.bfloat16)
        vae_params = init_wan_vae(jax.random.PRNGKey(1), spec.vae,
                                  param_dtype=jnp.bfloat16)
    else:
        raise SystemExit("pass --checkpoint_dir or --mock_weights")
    return WanTI2VPipeline(spec, dit_params, vae_params), spec


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ..core.config import TMAConfig
    from ..data.video_io import save_video

    pipe, spec = build_pipeline(args)
    prompt = args.prompt or DEFAULT_PROMPT
    size = _parse_size(args.video_size)
    frames = args.video_length or spec.generation.frame_num
    tma = TMAConfig(
        enabled=not args.disable_dynamic_weight,
        weight_max=args.text_weight_max, weight_min=args.text_weight_min,
        schedule=args.weight_schedule,
        transition_ratio=args.transition_ratio)

    # context: BAGEL fusion when available, else deterministic placeholder
    if args.no_bagel or args.mock_weights:
        key = jax.random.PRNGKey(abs(hash(prompt)) % 2 ** 31)
        ctx = jax.random.normal(key, (spec.dit.text_len,
                                      spec.dit.text_dim), jnp.bfloat16)
        nctx = jax.random.normal(jax.random.PRNGKey(0),
                                 (spec.dit.text_len, spec.dit.text_dim),
                                 jnp.bfloat16)
    else:
        raise SystemExit(
            "full BAGEL fusion requires --checkpoint_dir with converted "
            "BAGEL weights")

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

        t0 = time.time()
        video = pipe.generate(
            ctx, nctx, size=size, frame_num=frames, shift=args.shift,
            sample_solver=args.solver, sampling_steps=args.steps,
            guide_scale=args.guidance, seed=args.seed,
            img=img if mode == "i2v" else None, tma=tma)
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
