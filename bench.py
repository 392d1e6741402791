#!/usr/bin/env python
"""Benchmark: Wan T2V sec/video on the current accelerator.

BASELINE.json config 3: "Wan2.1-T2V-1.3B DiT denoise loop: 480p 81 frames,
50 flow-matching steps". Measures the jitted batch-2-CFG denoise step
(lax.scan body) + streaming VAE decode and reports extrapolated
sec/video for the full 50-step sample. North-star baseline: 60 s/video
(BASELINE.md). Also measures the flagship ti2v-5B at the same 480p x 81f
operating point (reported under detail.flagship_5B). Prints ONE JSON line.

Env knobs:
  BENCH_STEPS   measured denoise steps (default 5; per-step cost is
                constant so 50-step time = 10x the 5-step scan)
  BENCH_MODEL   WAN_CONFIGS key (default t2v-1.3B)
  BENCH_FRAMES / BENCH_W / BENCH_H
  BENCH_FLAGSHIP  set to 0 to skip the ti2v-5B 480p row (decode incl.)
  BENCH_REF_POINT set to 0 to skip the reference operating point row
                  (ti2v-5B 1280x704x121f, 50 steps, decode included —
                  the BASELINE.md contract); BENCH_REF_STEPS measured
                  steps for it (default 3)
  BENCH_TRAIN     set to 0 to skip the real-resolution training-step row
                  (tools/bench_train.py: 1.3B diffusion/LoRA step at
                  480p x 81f through the Pallas flash-attn backward)
  BENCH_SP      sequence-parallel width: shard the denoise token axis
                over an sp mesh axis (needs >= that many devices; on the
                single-chip driver this stays 1 — the SP path itself is
                parity-tested on the 8-device CPU mesh in
                tests/test_parallel.py)
"""

import json
import os
import time

# persistent XLA compile cache (shared with __graft_entry__): the 5B
# compiles take minutes cold through the TPU tunnel, seconds cached
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass


def dit_step_flops(spec, params_dit: int, w: int, h: int,
                   frames: int) -> float:
    """Analytic FLOPs for one CFG denoise step (batch 2: cond+uncond).

    linear = 2*P*T; self-attn = 4*T^2*D*L; cross-attn = 4*T*Ltext*D*L.
    Used only to report estimated MFU next to the wall-clock number.
    """
    from univid_tpu.core.config import dit_seq_len
    d = spec.dit
    t = dit_seq_len(spec, w, h, frames)
    lin = 2.0 * params_dit * t
    attn = 4.0 * t * t * d.dim * d.num_layers
    cross = 4.0 * t * d.text_len * d.dim * d.num_layers
    return 2.0 * (lin + attn + cross)


_PEAK_BF16 = (("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
              ("v4", 275e12), ("v6 lite", 918e12), ("v6e", 918e12))


def device_peak_flops() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return 0.0


def measure(model: str, w: int, h: int, frames: int, steps_measured: int,
            full_steps: int = 50, decode: bool = True):
    from univid_tpu.core.config import WAN_CONFIGS
    from univid_tpu.models.wan.dit import init_wan_dit
    from univid_tpu.models.wan.vae_api import init_wan_vae, vae_decode
    from univid_tpu.pipelines.ti2v import WanTI2VPipeline
    from univid_tpu.core import nn as unn

    from univid_tpu.core.dtypes import BF16_RESIDUAL_POLICY, DEFAULT_POLICY
    # bf16 residual stream is the DEFAULT bench (and recommended serving)
    # mode as of round 4: quality-gated at the full 480p x 81f 50-step
    # operating point by tools/quality_sweep.py — 43.6 dB PSNR / 2.0%
    # latent rel err vs the fp32-residual program, ~35% faster denoise.
    # BENCH_BF16_RESIDUAL=0 restores the fp32-residual parity mode.
    policy = BF16_RESIDUAL_POLICY \
        if os.environ.get("BENCH_BF16_RESIDUAL", "1") != "0" \
        else DEFAULT_POLICY
    if os.environ.get("BENCH_BF16_SOFTMAX", "0") == "1":
        # bf16 flash-softmax chain: measured a ~7% KERNEL SLOWDOWN at the
        # 1.3B 33k-token shape on v5e (93.7 -> 99.9 ms at (2048,2048)
        # tiles, fused-rope path, chained-dispatch timing) — the
        # bf16<->fp32 relayouts around the score tile cost more than the
        # halved VPU width saves. Kept as an opt-in knob for other
        # geometries; NOT a default.
        import dataclasses
        policy = dataclasses.replace(policy, softmax_bf16=True)
    spec = WAN_CONFIGS[model]
    dck = int(os.environ.get("BENCH_DECODE_CHUNK", "0"))
    if dck > 1:
        import dataclasses
        spec = dataclasses.replace(
            spec, vae=dataclasses.replace(spec.vae, decode_chunk=dck))
    # zeros DiT weights, materialized by ONE jitted program: denoise
    # TIMING is weight-value-independent (identical convs/matmuls/
    # attention program; TPUs have no denormal stalls), while the
    # eager per-leaf random init costs minutes of per-dispatch latency
    # on remote backends for the 5B tree
    dit_shapes = jax.eval_shape(
        lambda: init_wan_dit(jax.random.PRNGKey(0), spec.dit,
                             param_dtype=jnp.bfloat16))
    dit_params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), dit_shapes))()
    if os.environ.get("BENCH_INT8", "0") == "1":
        # int8 W8A8 serving mode: per-block GEMMs run s8 x s8 -> s32 on
        # the MXU (v5e int8 rate ~2x bf16); quality gate int8_w8a8 in
        # tools/quality_sweep.py. Timing stays value-independent.
        from univid_tpu.core.quant import quantize_dit_w8a8
        dit_params = jax.jit(quantize_dit_w8a8)(dit_params)
    vae_params = None
    if decode:
        # init on HOST: the VAE weights must not occupy HBM during the
        # denoise phase (10 GB 5B DiT + VAE exceeds the 16 GB v5e);
        # they move to the device after the DiT is released
        # zeros instead of random init: the decode TIMING is value-
        # independent (same convs/FLOPs), and the 5B random init costs
        # 60+ s of single-threaded host RNG per bench subprocess
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            shapes = jax.eval_shape(
                lambda: init_wan_vae(jax.random.PRNGKey(1), spec.vae,
                                     param_dtype=jnp.bfloat16))
            vae_params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    sp = int(os.environ.get("BENCH_SP", "1"))
    if sp > 1:
        if len(jax.devices()) < sp:
            raise SystemExit(f"BENCH_SP={sp} needs {sp} devices, have "
                             f"{len(jax.devices())}")
        from univid_tpu.core.mesh import MeshSpec, make_mesh
        mesh = make_mesh(MeshSpec(sp=sp), devices=jax.devices()[:sp])
        pipe = WanTI2VPipeline(spec, dit_params, vae_params,
                               policy=policy, sp_size=sp, mesh=mesh)
    else:
        pipe = WanTI2VPipeline(spec, dit_params, vae_params, policy=policy)

    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (spec.dit.text_len, spec.dit.text_dim),
                            jnp.bfloat16)
    nctx = jax.random.normal(jax.random.PRNGKey(3),
                             (spec.dit.text_len, spec.dit.text_dim),
                             jnp.bfloat16)

    kw = dict(size=(w, h), frame_num=frames, sampling_steps=steps_measured,
              decode=False)
    ts = int(os.environ.get("BENCH_TAYLORSEER", "0"))
    if ts > 0:
        # TaylorSeer fast mode: per-step cost alternates between full
        # refreshes and cached Taylor extrapolations, so this is only
        # honest when the TIMED schedule is the full one
        # (BENCH_STEPS=50); quality gate in tools/quality_sweep.py
        kw["taylorseer_threshold"] = ts
    # warmup uses a different seed and the timed run is completed via a
    # host fetch (see decode note below: identical repeat calls and bare
    # block_until_ready can both under-report on remote backends)
    x0 = pipe.generate(ctx, nctx, seed=1, **kw)      # compile
    float(jnp.asarray(x0).ravel()[0])
    t0 = time.perf_counter()
    x0 = pipe.generate(ctx, nctx, seed=0, **kw)
    float(jnp.asarray(x0).ravel()[0])
    per_step = (time.perf_counter() - t0) / steps_measured

    n_params = unn.count_params(dit_params)
    t_decode = 0.0
    decode_error = None
    if decode:
        # release the DiT weights before decode: at the 5B point the
        # 10 GB parameters + decode workspace exceed the 16 GB v5e
        x0 = jax.device_get(x0)
        # the method-level lru_caches key on `self`, keeping the
        # pipeline (and its 10 GB of DiT weights) alive past `del`
        type(pipe)._denoise_fn.cache_clear()
        type(pipe)._chunk_progs.cache_clear()
        del pipe, dit_params
        x0 = jnp.asarray(x0)
        vae_params = jax.device_put(vae_params, jax.devices()[0])
        try:
            dec = jax.jit(lambda vp, z: vae_decode(vp, spec.vae, z))
            # warmup on a DIFFERENT input and force completion via a
            # host fetch: repeated identical calls can be served from a
            # live result buffer on some backends, and block_until_ready
            # alone has been observed not to await remote completion —
            # either would report a phantom ~0 s decode
            video = dec(vae_params, jnp.zeros_like(x0))
            float(np.asarray(video[0, -1, -1, -1, 0]))
            del video
            t0 = time.perf_counter()
            video = dec(vae_params, x0)
            float(np.asarray(video[0, -1, -1, -1, 0]))
            t_decode = time.perf_counter() - t0
            del video
        except Exception as e:  # noqa: BLE001 — report denoise-only
            decode_error = str(e)[:160]

    out = {
        "sec_per_video": round(per_step * full_steps + t_decode, 3),
        "dit_step_ms": round(per_step * 1e3, 1),
        "vae_decode_s": round(t_decode, 3),
        "params_dit": n_params,
    }
    if decode_error:
        out["decode_error"] = decode_error
    peak = device_peak_flops()
    if os.environ.get("BENCH_INT8", "0") == "1":
        # int8 MXU rate is 2x bf16 on v5e/v5p — report utilization
        # against the int8 peak so the number stays a true MFU
        peak *= 2
    if peak > 0:
        flops = dit_step_flops(spec, n_params, w, h, frames)
        out["est_mfu"] = round(flops / per_step / (peak * max(sp, 1)), 3)
    return out


def main():
    model = os.environ.get("BENCH_MODEL", "t2v-1.3B")
    steps_measured = int(os.environ.get("BENCH_STEPS", "5"))
    w = int(os.environ.get("BENCH_W", "832"))
    h = int(os.environ.get("BENCH_H", "480"))
    frames = int(os.environ.get("BENCH_FRAMES", "81"))

    r = measure(model, w, h, frames, steps_measured,
                decode=os.environ.get("BENCH_DECODE", "1") != "0")
    dev = jax.devices()[0]
    detail = {
        "dit_step_ms": r["dit_step_ms"],
        "vae_decode_s": r["vae_decode_s"],
        "device": str(dev),
        **({"decode_error": r["decode_error"]} if "decode_error" in r
           else {}),
        "backend": jax.default_backend(),
        "params_dit": r["params_dit"],
    }
    if "est_mfu" in r:
        detail["est_mfu"] = r["est_mfu"]

    def _sub_bench(extra_env: dict, timeout_s: int = 3600):
        """Run this script (or a tool) in a fresh process so the parent
        model's HBM is fully released before the 10 GB 5B weights land
        on the 16 GB v5e; returns the parsed last-line JSON."""
        import subprocess
        import sys
        script = extra_env.pop("_SCRIPT", os.path.abspath(__file__))
        env = dict(os.environ, **extra_env)
        out = subprocess.run([sys.executable, script], env=env,
                             capture_output=True, text=True,
                             timeout=timeout_s)
        lines = out.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(
                f"no output (rc={out.returncode}): "
                f"{out.stderr.strip()[-300:]}")
        return json.loads(lines[-1])

    if os.environ.get("BENCH_FLAGSHIP", "1") != "0" and model != "ti2v-5B":
        # flagship ti2v-5B at the same 480p x 81f point, decode INCLUDED
        try:
            f5 = _sub_bench({"BENCH_MODEL": "ti2v-5B",
                             "BENCH_FLAGSHIP": "0", "BENCH_DECODE": "1",
                             "BENCH_REF_POINT": "0", "BENCH_TRAIN": "0"})
            detail["flagship_5B"] = {
                "sec_per_video": f5["value"],
                "dit_step_ms": f5["detail"]["dit_step_ms"],
                "vae_decode_s": f5["detail"]["vae_decode_s"],
                "params_dit": f5["detail"]["params_dit"],
                **({"decode_error": f5["detail"]["decode_error"]}
                   if "decode_error" in f5["detail"] else {}),
            }
            if "est_mfu" in f5["detail"]:
                detail["flagship_5B"]["est_mfu"] = f5["detail"]["est_mfu"]
        except Exception as e:  # noqa: BLE001
            detail["flagship_5B"] = {"error": str(e)[:200]}

    if os.environ.get("BENCH_REF_POINT", "1") != "0" and model != "ti2v-5B":
        # the reference operating point (BASELINE.md contract:
        # inference.py:48-55): ti2v-5B, 1280x704, 121 frames, 50 UniPC
        # steps, VAE decode included
        try:
            rp = _sub_bench({"BENCH_MODEL": "ti2v-5B", "BENCH_W": "1280",
                             "BENCH_H": "704", "BENCH_FRAMES": "121",
                             "BENCH_STEPS": os.environ.get(
                                 "BENCH_REF_STEPS", "3"),
                             "BENCH_FLAGSHIP": "0", "BENCH_DECODE": "1",
                             "BENCH_REF_POINT": "0", "BENCH_TRAIN": "0"})
            detail["ref_point"] = {
                "resolution": "1280x704x121f",
                "sec_per_video": rp["value"],
                "dit_step_ms": rp["detail"]["dit_step_ms"],
                "vae_decode_s": rp["detail"]["vae_decode_s"],
                **({"decode_error": rp["detail"]["decode_error"]}
                   if "decode_error" in rp["detail"] else {}),
            }
            if "est_mfu" in rp["detail"]:
                detail["ref_point"]["est_mfu"] = rp["detail"]["est_mfu"]
        except Exception as e:  # noqa: BLE001
            detail["ref_point"] = {"error": str(e)[:200]}

    if os.environ.get("BENCH_TRAIN", "1") != "0" and model != "ti2v-5B":
        # real-resolution diffusion/LoRA training step (the reference
        # trains through flash-attn at full resolution,
        # model_pipeline.py:2765-3142): 1.3B at 480p x 81f through the
        # Pallas flash-attention backward
        try:
            tr = _sub_bench({"_SCRIPT": os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools",
                "bench_train.py"), "BENCH_TRAIN_STEPS": "2"})
            detail["train_step_ms"] = tr["train_step_ms"]
            detail["train_resolution"] = tr["resolution"]
            if "est_mfu" in tr:
                detail["train_est_mfu"] = tr["est_mfu"]
        except Exception as e:  # noqa: BLE001
            detail["train_step_ms"] = {"error": str(e)[:200]}

    if os.environ.get("BENCH_E2E", "1") != "0" and model != "ti2v-5B":
        # full-pipeline row (the reference sec/video contract is the
        # whole inference.py:525-720 entry): prompt -> tokenizer ->
        # real-shape UMT5-XXL encode (4.7B, HBM-staged) -> REAL 50-step
        # denoise -> decode -> mp4, encode itemized (tools/bench_e2e.py)
        try:
            ee = _sub_bench({"_SCRIPT": os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools",
                "bench_e2e.py")})
            detail["e2e"] = {k: ee[k] for k in
                             ("e2e_sec_per_video",
                              "fusion_e2e_sec_per_video", "encode_s",
                              "bagel_extract_project_s",
                              "bagel_extract_project_img_s",
                              "denoise_plus_decode_s", "mux_s",
                              "resolution", "steps") if k in ee}
        except Exception as e:  # noqa: BLE001
            detail["e2e"] = {"error": str(e)[:200]}

    if os.environ.get("BENCH_FAST", "1") != "0" and model != "ti2v-5B":
        # quality-gated fast mode: TaylorSeer threshold 2 (37.1 dB PSNR
        # vs the exact program at this operating point — see README
        # quality gates), FULL 50-step schedule actually executed so the
        # refresh/extrapolate step mix is measured, not extrapolated
        try:
            fm = _sub_bench({"BENCH_STEPS": "50", "BENCH_TAYLORSEER": "2",
                             "BENCH_FLAGSHIP": "0", "BENCH_REF_POINT": "0",
                             "BENCH_TRAIN": "0", "BENCH_E2E": "0",
                             "BENCH_FAST": "0", "BENCH_INT8_ROW": "0",
                             "BENCH_DECODE": "1"})
            detail["fast_mode"] = {
                "sec_per_video": fm["value"],
                "dit_step_ms": fm["detail"]["dit_step_ms"],
                "taylorseer_threshold": 2,
                "psnr_gate_db": 37.1,
            }
        except Exception as e:  # noqa: BLE001
            detail["fast_mode"] = {"error": str(e)[:200]}

    if os.environ.get("BENCH_INT8_ROW", "1") != "0" and model != "ti2v-5B":
        # int8 W8A8 serving mode (quality gate: int8_w8a8 row of
        # tools/quality_sweep.py — PSNR vs the exact program)
        try:
            i8 = _sub_bench({"BENCH_INT8": "1", "BENCH_FLAGSHIP": "0",
                             "BENCH_REF_POINT": "0", "BENCH_TRAIN": "0",
                             "BENCH_E2E": "0", "BENCH_FAST": "0",
                             "BENCH_INT8_ROW": "0", "BENCH_DECODE": "1"})
            detail["int8_mode"] = {
                "sec_per_video": i8["value"],
                "dit_step_ms": i8["detail"]["dit_step_ms"],
                **({"est_mfu_int8": i8["detail"]["est_mfu"]}
                   if "est_mfu" in i8["detail"] else {}),
            }
        except Exception as e:  # noqa: BLE001
            detail["int8_mode"] = {"error": str(e)[:200]}
        # flagship ti2v-5B under the same int8 serving mode — only on
        # the real headline run (not tiny CPU smoke configs)
        if model == "t2v-1.3B":
            try:
                i85 = _sub_bench({"BENCH_INT8": "1",
                                  "BENCH_MODEL": "ti2v-5B",
                                  "BENCH_FLAGSHIP": "0",
                                  "BENCH_REF_POINT": "0",
                                  "BENCH_TRAIN": "0", "BENCH_E2E": "0",
                                  "BENCH_FAST": "0", "BENCH_INT8_ROW": "0",
                                  "BENCH_DECODE": "1"})
                detail.setdefault("int8_mode", {})["flagship_5B"] = {
                    "sec_per_video": i85["value"],
                    "dit_step_ms": i85["detail"]["dit_step_ms"],
                    **({"est_mfu_int8": i85["detail"]["est_mfu"]}
                       if "est_mfu" in i85["detail"] else {}),
                }
            except Exception as e:  # noqa: BLE001
                detail.setdefault("int8_mode", {})["flagship_5B"] = {
                    "error": str(e)[:200]}

    result = {
        "metric": f"sec_per_video_{h}p{frames}f_50step_{model}",
        "value": r["sec_per_video"],
        "unit": "s",
        "vs_baseline": round(r["sec_per_video"] / 60.0, 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
