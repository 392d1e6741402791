#!/usr/bin/env python
"""Golden-activation parity harness.

Dumps per-stage activations for a pinned seed/prompt and compares them
against stored golden .npz files — the artifact that proves
bit-comparability against the reference the day real checkpoints are
available (the reference publishes no such harness; its de-facto
regression artifacts are eval JSON traces, SURVEY.md §4).

Stages (each an independent numerical contract):
  t5_out        UMT5 encoder output for a pinned prompt
                (reference t5.py:472-513 path)
  projector_out ContextProjector forward on pinned BAGEL-space tokens
                (model_pipeline.py:1506-1574)
  dit_v0        DiT velocity at step 0 for pinned latents/context
                (model.py:410 forward)
  vae_roundtrip VAE decode(encode(x)) + PSNR vs input
                (vae2_2.py:1024-1049)

Usage:
  python tools/golden.py dump --out DIR --mock            # hermetic
  python tools/golden.py dump --out DIR \
      --checkpoint_dir /path/to/Wan2.2-TI2V-5B --model ti2v-5B
  python tools/golden.py compare --dump DIR --golden DIR [--rtol 2e-2]

Mock mode uses the tiny seeded configs (the same hermetic construction
as the CLIs) so the harness runs in CI against the goldens stored in
tests/goldens/. With real checkpoints, run `dump` once on the reference
outputs (exported to .npz with the same stage names) and `compare`
gives stagewise max-abs/max-rel deltas.

Prints ONE JSON line per command.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

STAGES = ("t5_out", "projector_out", "dit_v0", "vae_roundtrip")
GOLDEN_PROMPT = "golden parity probe: a red ball bouncing"


def _build(args):
    import jax
    import jax.numpy as jnp
    from univid_tpu.core.config import WAN_CONFIGS, FusionConfig
    from univid_tpu.models.fusion.projector import init_context_projector
    from univid_tpu.models.wan.dit import init_wan_dit
    from univid_tpu.models.wan.vae_api import init_wan_vae
    from univid_tpu.pipelines.encoders import WanTextEncoder

    spec = WAN_CONFIGS[args.model]
    fusion_cfg = FusionConfig(wan_text_dim=spec.dit.text_dim,
                              wan_text_length=spec.dit.text_len)
    if args.mock:
        dit = init_wan_dit(jax.random.PRNGKey(0), spec.dit)
        vae = init_wan_vae(jax.random.PRNGKey(1), spec.vae)
        text_enc = WanTextEncoder.random_init(spec)
        projector = init_context_projector(jax.random.PRNGKey(2),
                                           fusion_cfg)
    else:
        from univid_tpu.core.checkpoint import (load_wan_checkpoint,
                                                load_projector_checkpoint)
        dit, vae = load_wan_checkpoint(args.checkpoint_dir, spec)
        text_enc = WanTextEncoder.from_checkpoint(args.checkpoint_dir,
                                                  spec)
        projector = (load_projector_checkpoint(args.projector_path,
                                               fusion_cfg)
                     if args.projector_path else
                     init_context_projector(jax.random.PRNGKey(2),
                                            fusion_cfg))
    return spec, fusion_cfg, dit, vae, text_enc, projector


def dump(args):
    import jax
    import jax.numpy as jnp
    from univid_tpu.core.config import latent_shape
    from univid_tpu.models.fusion.projector import (
        context_projector_forward)
    from univid_tpu.models.wan.dit import wan_dit_forward
    from univid_tpu.models.wan.vae_api import vae_decode, vae_encode
    from univid_tpu.ops.rope import build_rope_3d

    spec, fusion_cfg, dit, vae, text_enc, projector = _build(args)
    os.makedirs(args.out, exist_ok=True)
    out = {}

    # 1) UMT5 encode of the pinned prompt
    ctx = text_enc([GOLDEN_PROMPT])[0]
    out["t5_out"] = np.asarray(ctx, np.float32)

    # 2) projector on pinned BAGEL-space tokens
    bagel_tokens = jax.random.normal(
        jax.random.PRNGKey(7),
        (1, fusion_cfg.bagel_sequence_length, fusion_cfg.bagel_hidden_dim))
    proj = context_projector_forward(projector, fusion_cfg, bagel_tokens)
    out["projector_out"] = np.asarray(proj[0], np.float32)

    # 3) DiT velocity at the first sampling step (t = num_train_timesteps)
    c, f, lh, lw = latent_shape(spec, args.width, args.height, args.frames)
    pt, ph, pw = spec.dit.patch_size
    cos, sin = build_rope_3d(spec.dit.head_dim,
                             (f // pt, lh // ph, lw // pw))
    x = jax.random.normal(jax.random.PRNGKey(8), (1, f, lh, lw,
                                                  spec.dit.in_dim))
    t = jnp.full((1,), 1000.0, jnp.float32)
    v = wan_dit_forward(dit, spec.dit, x,
                        t, ctx[None].astype(jnp.float32), cos, sin)
    out["dit_v0"] = np.asarray(v[0], np.float32)

    # 4) VAE roundtrip PSNR on a pinned synthetic video
    tdown = spec.vae.total_stride[0] if hasattr(spec.vae, "total_stride") \
        else 4
    vid_frames = (args.frames - 1) // 1 + 1
    video = jax.random.uniform(
        jax.random.PRNGKey(9), (1, vid_frames, args.height, args.width, 3),
        minval=-1.0, maxval=1.0)
    # smooth it — VAEs are not contractive on white noise
    video = (video + jnp.roll(video, 1, 2) + jnp.roll(video, 1, 3)) / 3
    z = vae_encode(vae, spec.vae, video)
    rec = vae_decode(vae, spec.vae, z)
    rec = rec[:, :video.shape[1], :video.shape[2], :video.shape[3]]
    mse = float(jnp.mean((rec - video) ** 2))
    psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))
    out["vae_roundtrip"] = np.asarray(rec, np.float32)
    meta = {"model": args.model, "mock": bool(args.mock),
            "prompt": GOLDEN_PROMPT, "vae_psnr": round(psnr, 3),
            "resolution": f"{args.width}x{args.height}x{args.frames}f",
            "shapes": {k: list(v.shape) for k, v in out.items()}}

    for name, arr in out.items():
        np.savez_compressed(os.path.join(args.out, f"{name}.npz"),
                            value=arr)
    with open(os.path.join(args.out, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(json.dumps({"cmd": "dump", "out": args.out, **meta}))


def compare(args):
    results = {}
    ok = True
    with open(os.path.join(args.golden, "meta.json")) as fh:
        gmeta = json.load(fh)
    dmeta_path = os.path.join(args.dump, "meta.json")
    dmeta = json.load(open(dmeta_path)) if os.path.exists(dmeta_path) \
        else {}
    missing_in_golden = []
    for name in STAGES:
        gp = os.path.join(args.golden, f"{name}.npz")
        dp = os.path.join(args.dump, f"{name}.npz")
        if not os.path.exists(gp):
            # a stage present in the dump but absent from the golden dir
            # means the golden set is incomplete — surface it so a
            # truncated golden directory can't masquerade as full parity
            if os.path.exists(dp):
                missing_in_golden.append(name)
                results[name] = {"ok": False,
                                 "error": "missing in golden"}
                ok = False
            continue
        if not os.path.exists(dp):
            results[name] = {"ok": False, "error": "missing in dump"}
            ok = False
            continue
        g = np.load(gp)["value"]
        d = np.load(dp)["value"]
        if g.shape != d.shape:
            results[name] = {"ok": False,
                             "error": f"shape {d.shape} vs {g.shape}"}
            ok = False
            continue
        diff = np.abs(d - g)
        denom = np.maximum(np.abs(g), 1e-3)
        stage = {
            "max_abs": float(diff.max()),
            "max_rel": float((diff / denom).max()),
            "mean_abs": float(diff.mean()),
        }
        stage["ok"] = stage["max_rel"] <= args.rtol \
            or stage["max_abs"] <= args.atol
        results[name] = stage
        ok &= stage["ok"]
    if "vae_psnr" in gmeta and "vae_psnr" in dmeta:
        dpsnr = abs(dmeta["vae_psnr"] - gmeta["vae_psnr"])
        results["vae_psnr_delta_db"] = round(dpsnr, 3)
        ok &= dpsnr <= args.psnr_tol_db
    print(json.dumps({"cmd": "compare", "ok": bool(ok),
                      "missing_in_golden": missing_in_golden,
                      "stages": results}))
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--out", required=True)
    d.add_argument("--mock", action="store_true")
    d.add_argument("--model", default="tiny")
    d.add_argument("--checkpoint_dir", default=None)
    d.add_argument("--projector_path", default=None)
    d.add_argument("--width", type=int, default=64)
    d.add_argument("--height", type=int, default=64)
    d.add_argument("--frames", type=int, default=9)
    c = sub.add_parser("compare")
    c.add_argument("--dump", required=True)
    c.add_argument("--golden", required=True)
    c.add_argument("--rtol", type=float, default=2e-2)
    c.add_argument("--atol", type=float, default=1e-4)
    c.add_argument("--psnr_tol_db", type=float, default=0.5)
    args = p.parse_args(argv)
    if args.cmd == "dump":
        if not args.mock and not args.checkpoint_dir:
            p.error("dump needs --mock or --checkpoint_dir")
        dump(args)
        return 0
    return compare(args)


if __name__ == "__main__":
    raise SystemExit(main())
