"""Adapter/LoRA training CLI.

The reference trains via `python model_pipeline.py` -> `main()` ->
train_cross_attention_fusion(CrossAttentionConfig) with env-var-driven
settings (model_pipeline.py:3618-3723). This CLI exposes the same run as
flags: OpenVid data dir + CSV, the semantic-alignment objective
(projector [+ LoRA]), OneCycle/cosine schedule, periodic + best
checkpoints, resume, 200-step default cap.

Hermetic mode (--mock_weights) builds tiny random BAGEL/UMT5 towers so
the full loop (extract -> supervise -> step -> checkpoint) runs without
checkpoints — identical code path to real weights.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("UniVid-TPU cross-attention fusion "
                                "training")
    p.add_argument("--video_dir", default=os.getenv("OPENVID_VIDEO_PATH",
                                                    "data/openvid/videos"))
    p.add_argument("--csv_file", default=os.getenv("OPENVID_CSV",
                                                   "data/openvid.csv"))
    p.add_argument("--output_dir", default="./training_output")
    p.add_argument("--max_steps", type=int, default=200)
    p.add_argument("--save_interval", type=int, default=50)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--no_one_cycle", action="store_true")
    p.add_argument("--objective", default="semantic",
                   choices=["semantic", "diffusion"],
                   help="semantic = projector alignment vs UMT5 "
                        "(model_pipeline.py:3328-3373); diffusion = "
                        "velocity MSE through the LoRA-merged DiT "
                        "(:2765-3142)")
    p.add_argument("--train_lora", action="store_true",
                   help="train Wan DiT LoRA — implies "
                        "--objective diffusion (the semantic loss never "
                        "reaches the LoRA leaves)")
    p.add_argument("--lora_rank", type=int, default=16)
    p.add_argument("--lora_strategy", default="wan_cross_attention")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", default="ti2v-5B")
    p.add_argument("--checkpoint_dir", default=None,
                   help="Wan checkpoint dir (UMT5 supervision features)")
    p.add_argument("--bagel_path", default=None)
    p.add_argument("--mock_weights", action="store_true")
    p.add_argument("--max_samples", type=int, default=1000)
    p.add_argument("--video_size", default="512x320")
    p.add_argument("--video_length", type=int, default=21)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..core.debug import apply_debug_flags
    apply_debug_flags()
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from ..core.config import FusionConfig, WAN_CONFIGS
    from ..data.openvid import OpenVidConfig, OpenVidDataset
    from ..models.fusion.extractor import BagelSemanticExtractor
    from ..pipelines.encoders import WanTextEncoder
    from ..train.fusion_trainer import (FusionTrainConfig,
                                        train_cross_attention_fusion)
    from ..train.lora import LoRAConfig

    spec = WAN_CONFIGS[args.model]

    # ---- supervision encoder (UMT5) + BAGEL extractor -------------------
    if args.checkpoint_dir and not args.mock_weights:
        text_enc = WanTextEncoder.from_checkpoint(args.checkpoint_dir,
                                                  spec)
    else:
        text_enc = WanTextEncoder.random_init(spec)

    if args.bagel_path and not args.mock_weights:
        from ..core.checkpoint import load_bagel_checkpoint
        params, cfg, scfg, sig_params, tokenizer = load_bagel_checkpoint(
            args.bagel_path)
    else:
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
        bagel_hidden_dim=cfg.llm.hidden_size,
        wan_text_dim=spec.dit.text_dim,
        wan_text_length=spec.dit.text_len,
        bagel_sequence_length=min(256, spec.dit.text_len))
    extractor = BagelSemanticExtractor(
        params, cfg, tokenizer, siglip_params=sig_params, siglip_cfg=scfg,
        target_len=fusion_cfg.bagel_sequence_length,
        compute_dtype=jnp.float32 if args.mock_weights else jnp.bfloat16)

    def extract_tokens(caption: str):
        return extractor.extract_semantic_tokens(caption)

    def t5_supervision(caption: str):
        return text_enc([caption])[0]

    # ---- dataset ----------------------------------------------------------
    w, h = (int(v) for v in args.video_size.split("x"))
    dataset = OpenVidDataset(OpenVidConfig(
        video_base_path=args.video_dir, csv_file=args.csv_file,
        video_size=(w, h), video_length=args.video_length,
        max_samples=args.max_samples))
    if len(dataset) == 0:
        raise SystemExit(f"no samples under {args.video_dir}")

    objective = "diffusion" if args.train_lora else args.objective
    train_cfg = FusionTrainConfig(
        learning_rate=args.learning_rate,
        use_one_cycle_lr=not args.no_one_cycle,
        max_steps=args.max_steps, save_interval=args.save_interval,
        log_interval=args.log_interval, train_lora=args.train_lora)

    diffusion = None
    if objective == "diffusion":
        from ..core.config import latent_shape
        if args.checkpoint_dir and not args.mock_weights:
            from ..core.checkpoint import load_wan_checkpoint
            dit_params, vae_params = load_wan_checkpoint(
                args.checkpoint_dir, spec)
        else:
            from ..models.wan.dit import init_wan_dit
            from ..models.wan.vae_api import init_wan_vae
            dit_params = init_wan_dit(jax.random.PRNGKey(20), spec.dit)
            # fresh DiTs zero-init the head (reference init parity) which
            # blocks all gradient flow; mock runs need live weights
            hw = dit_params["head"]["head"]["w"]
            dit_params["head"]["head"]["w"] = 0.02 * jax.random.normal(
                jax.random.PRNGKey(22), hw.shape, hw.dtype)
            vae_params = init_wan_vae(jax.random.PRNGKey(21), spec.vae)
        _, f, hh, ww = latent_shape(spec, w, h, args.video_length)
        diffusion = {"spec": spec, "dit_params": dit_params,
                     "vae_params": vae_params, "latent_grid": (f, hh, ww)}

    out = train_cross_attention_fusion(
        dataset, extract_tokens, t5_supervision, fusion_cfg, train_cfg,
        args.output_dir, seed=args.seed, resume=not args.no_resume,
        dit_cfg=spec.dit if args.train_lora else None,
        lora_cfg=LoRAConfig(rank=args.lora_rank,
                            target_strategy=args.lora_strategy),
        diffusion=diffusion, log=print)
    summary = {"steps": out["steps"], "best_loss": out["best_loss"],
               "output_dir": args.output_dir}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
