"""Video QA evaluation CLI — Pyramid Reflection over a video directory.

Flag- and output-compatible with reference
models/BAGEL/eval_understanding.py:31-67,733-789: iterates video ids,
runs reflexion_answer_one per (video, question), writes per-video
`video{ID}_reflexion.json` traces plus `{output_name}.json` batch summary
with accuracy when ground truth is present.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("UniVid-TPU video QA with Pyramid "
                                "Reflection")
    p.add_argument("--video_dir", required=True)
    p.add_argument("--gt_file", required=True,
                   help="JSON with entries: video_id, question, answer")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--output_name", required=True)
    p.add_argument("--id_from", type=int, required=True)
    p.add_argument("--id_to", type=int, required=True)
    p.add_argument("--model_path", default=None,
                   help="Converted BAGEL checkpoint dir (omit with "
                        "--mock_weights)")
    p.add_argument("--siglip_ckpt",
                   default="google/siglip2-base-patch16-naflex")
    p.add_argument("--static_seq", default="4,8,16")
    p.add_argument("--dynamic_seq", default="64,32,16")
    p.add_argument("--pool_frames", type=int, default=64)
    p.add_argument("--siglip_bs", type=int, default=64)
    p.add_argument("--save_frames_root", default="sample_frames")
    p.add_argument("--deepseek_api_key",
                   default=os.getenv("DEEPSEEK_API_KEY", ""))
    p.add_argument("--max_think_token_n", type=int, default=512)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--temperature", type=float, default=0.3)
    p.add_argument("--video_exts", nargs="*",
                   default=[".mp4", ".avi", ".mov", ".mkv"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mock_weights", action="store_true",
                   help="Random-init models (hermetic smoke run)")
    # accepted-for-compatibility no-ops: the reference's CUDA device
    # placement / torchrun DDP ranker subprocess / accelerate offload
    # knobs (eval_understanding.py:40-46,61-63) have no TPU role — the
    # frame ranker is an in-process sharded-jit scorer and placement is
    # mesh-driven. Kept so reference invocations run unchanged.
    p.add_argument("--device", default=None,
                   help="(no-op on TPU; kept for compatibility)")
    p.add_argument("--no_ddp_ranker", action="store_true",
                   help="(no-op: the TPU ranker is always in-process)")
    p.add_argument("--ddp_ranker", default=None,
                   help="(no-op; kept for compatibility)")
    p.add_argument("--nproc", type=int, default=4,
                   help="(no-op; kept for compatibility)")
    p.add_argument("--max_mem_per_gpu", default=None,
                   help="(no-op; kept for compatibility)")
    p.add_argument("--offload_folder", default=None,
                   help="(no-op; kept for compatibility)")
    p.add_argument("--print_plan", action="store_true",
                   help="(No-op) kept for compatibility")
    return p


def find_video_by_id(video_dir: str, vid: int, exts):
    base = f"video{vid}"
    for ext in exts:
        p = Path(video_dir) / f"{base}{ext}"
        if p.exists():
            return str(p.resolve())
    return None


def load_models(args):
    import jax
    import jax.numpy as jnp
    from ..models.bagel.bagel import BagelConfig, init_bagel
    from ..models.bagel.qwen2_mot import Qwen2MoTConfig
    from ..models.bagel.siglip import SiglipConfig, init_siglip
    from ..pipelines.interleave import InterleaveInferencer
    from ..reflection.scorer import Siglip2Scorer
    from ..utils.tokenizers import HashTokenizer, load_tokenizer

    vae_params, vae_cfg = None, None
    if args.model_path and not args.mock_weights:
        from ..core.checkpoint import (load_bagel_checkpoint,
                                       load_flux_ae_checkpoint)
        params, cfg, scfg, sig_params, tokenizer = load_bagel_checkpoint(
            args.model_path)
        # FLUX image VAE (ae.safetensors ships next to ema.safetensors;
        # reference load_ae, autoencoder.py:339) — enables the
        # generation/editing contexts; understanding-only QA runs fine
        # without it
        if os.path.isfile(os.path.join(args.model_path, "ae.safetensors")):
            vae_params, vae_cfg = load_flux_ae_checkpoint(args.model_path)
    else:
        # hermetic smoke configuration (tiny random models)
        llm = Qwen2MoTConfig(vocab_size=4096, hidden_size=64,
                             intermediate_size=128, num_layers=2,
                             num_heads=4, num_kv_heads=2)
        cfg = BagelConfig(llm=llm, vit_hidden_size=32, vit_patch_size=14,
                          start_of_image=4090, end_of_image=4091,
                          bos_token_id=4092, eos_token_id=4093)
        scfg = SiglipConfig(hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=2, patch_size=14,
                            image_size=224)
        params = init_bagel(jax.random.PRNGKey(0), cfg)
        sig_params = init_siglip(jax.random.PRNGKey(1), scfg)
        tokenizer = HashTokenizer(vocab_size=4090)

    inferencer = InterleaveInferencer(
        params, cfg, tokenizer, siglip_params=sig_params, siglip_cfg=scfg,
        vae_params=vae_params, vae_cfg=vae_cfg,
        compute_dtype=jnp.float32 if args.mock_weights else jnp.bfloat16)
    # pretrained SigLIP2 dual tower when a local checkpoint is given
    # (reference AutoModel path, eval_understanding.py:171-206); usable
    # with --mock_weights too (real scorer + mock LM is a valid smoke
    # mix). Random-init fallback is test-only. The AutoModel dispatch:
    # config.json model_type "siglip2" -> the NaFlex variable-aspect
    # tower (the reference DEFAULT, google/siglip2-base-patch16-naflex);
    # "siglip" -> the fixed-resolution tower (so400m-class checkpoints).
    if os.path.isdir(args.siglip_ckpt):
        import json as _json
        model_type = ""
        cfg_json = os.path.join(args.siglip_ckpt, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                model_type = _json.load(f).get("model_type", "")
        cls = Siglip2Scorer
        if model_type == "siglip2":
            from ..reflection.naflex import Siglip2NaflexScorer
            cls = Siglip2NaflexScorer
        try:
            scorer = cls.from_checkpoint(args.siglip_ckpt)
        except RuntimeError as e:
            # checkpoint dir without tokenizer files (load_tokenizer is
            # offline-strict): fall back to the LM tokenizer with a
            # warning — embeddings stay real, only text tokenization
            # differs from the shipped AutoProcessor
            import sys
            print(f"WARNING: {e}; using the LM tokenizer for the SigLIP "
                  "text tower", file=sys.stderr)
            scorer = cls.from_checkpoint(args.siglip_ckpt,
                                         tokenizer=tokenizer)
    else:
        if not args.mock_weights:
            import sys
            print(f"WARNING: --siglip_ckpt '{args.siglip_ckpt}' is not a "
                  "local checkpoint directory; using a RANDOM-init SigLIP "
                  "scorer — frame-relevance ranking will be noise. Pass a "
                  "downloaded SigLIP2 checkpoint dir for real evals.",
                  file=sys.stderr)
        scorer = Siglip2Scorer(tokenizer=tokenizer)
    return inferencer, scorer


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..core.debug import apply_debug_flags
    apply_debug_flags()
    os.makedirs(args.output_dir, exist_ok=True)

    from ..reflection.clients import make_reflection_clients
    from ..reflection.reflexion import ReflexionConfig, reflexion_answer_one

    with open(args.gt_file) as f:
        gt = json.load(f)
    gt_by_id = {int(e["video_id"]): e for e in gt}

    bagel, scorer = load_models(args)
    ds_client, qwen_client = make_reflection_clients(args.deepseek_api_key)
    cfg = ReflexionConfig(
        pool_frames=args.pool_frames,
        static_seq=tuple(int(x) for x in args.static_seq.split(",")),
        dynamic_seq=tuple(int(x) for x in args.dynamic_seq.split(",")),
        max_think_token_n=args.max_think_token_n,
        do_sample=args.do_sample, temperature=args.temperature,
        siglip_bs=args.siglip_bs,
        save_frames_root=args.save_frames_root)

    results = []
    for vid in range(args.id_from, args.id_to + 1):
        entry = gt_by_id.get(vid)
        if entry is None:
            continue
        path = find_video_by_id(args.video_dir, vid, args.video_exts)
        if path is None:
            results.append({"video_id": vid, "error": "video_not_found"})
            continue
        answer, trace = reflexion_answer_one(
            path, entry["question"], bagel, ds_client, qwen_client,
            scorer, cfg)
        trace_path = os.path.join(args.output_dir,
                                  f"video{vid}_reflexion.json")
        with open(trace_path, "w") as f:
            json.dump(trace, f, indent=2, ensure_ascii=False)
        rec = {"video_id": vid, "question": entry["question"],
               "answer": answer, "gt": entry.get("answer"),
               "trace": trace_path}
        results.append(rec)
        print(json.dumps(rec, ensure_ascii=False))

    summary = {
        "num_samples": len(results),
        "results": results,
    }
    with open(os.path.join(args.output_dir,
                           f"{args.output_name}.json"), "w") as f:
        json.dump(summary, f, indent=2, ensure_ascii=False)
    return summary


if __name__ == "__main__":
    main()
