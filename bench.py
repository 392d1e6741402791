#!/usr/bin/env python
"""Benchmark: Wan T2V sec/video on the current accelerator.

BASELINE.json config 3: "Wan2.1-T2V-1.3B DiT denoise loop: 480p 81 frames,
50 flow-matching steps". Measures the jitted batch-2-CFG denoise step
(lax.scan body) + streaming VAE decode and reports extrapolated
sec/video for the full 50-step sample. North-star baseline: 60 s/video
(BASELINE.md). Also measures the flagship ti2v-5B at the same 480p x 81f
operating point (reported under detail.flagship_5B). Prints ONE JSON line.

Budget discipline (round-4 lesson: the driver's wall-clock timeout hit
with zero output, BENCH_r04.json rc=124/parsed=null): ALL optional rows
run under a global deadline. BENCH_BUDGET seconds (default 1500) from
process start; each row is skipped with {"skipped": "budget"} when the
remaining time can't cover it, subprocess rows get the remaining time as
their hard timeout, and SIGTERM/SIGALRM flush the partial result JSON
before exit so a driver kill still captures everything measured so far.

Env knobs:
  BENCH_BUDGET  global wall-clock budget in seconds (default 1500);
                rows are priority-ordered headline -> flagship ->
                ref-point -> train -> e2e -> fast -> int8 -> vqa
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
import signal
import sys
import time

_T_START = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET", "1500"))
# Written progressively as rows complete; flushed on SIGTERM/SIGALRM so
# a driver-side timeout still yields a parseable last-line JSON.
_RESULT = None


def _remaining() -> float:
    return _BUDGET - (time.time() - _T_START)


def _flush_and_exit(signum, frame):  # noqa: ARG001
    out = _RESULT if _RESULT is not None else {
        "metric": "sec_per_video_incomplete", "value": -1.0, "unit": "s",
        "vs_baseline": -1.0,
        "detail": {"error": "killed before headline row completed",
                   "elapsed_s": round(time.time() - _T_START, 1)}}
    out.setdefault("detail", {})["flushed_on_signal"] = int(signum)
    sys.stdout.write("\n" + json.dumps(out) + "\n")
    sys.stdout.flush()
    os._exit(0)

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
    if os.environ.get("BENCH_BOUNDED", "1") != "0":
        # bounded softmax — DEFAULT as of round 5: static qk-norm-derived
        # score bound replaces the flash kernel's running max.
        # Mathematically exact (the reference point cancels in acc/l; see
        # core/dtypes.py); measured 89.7 -> 77.9 ms kernel (74.7% ->
        # 86.0% MFU) at the 1.3B 33k shape, 77.2 ms with the rotated-k
        # cache that auto-enables alongside it. BENCH_BOUNDED=0 restores
        # the running-max kernel.
        import dataclasses
        policy = dataclasses.replace(policy, bounded_softmax=True)
    if os.environ.get("BENCH_QK_INT8", "0") == "1":
        # int8 QK^T flash kernel (per-row q / per-block k scales).
        # MEASURED NEGATIVE on v5e (96.5 vs 90.6 ms at the 1.3B kernel
        # shape — head_dim=128 contraction can't use the int8 MXU
        # packing rate, see core/dtypes.py); diagnostic knob only,
        # never a bench row. Quality gate: tools/quality_sweep.py.
        import dataclasses
        policy = dataclasses.replace(policy, qk_int8=True)
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
    global _RESULT
    is_sub = os.environ.get("_BENCH_SUB", "0") == "1"
    signal.signal(signal.SIGTERM, _flush_and_exit)
    if not is_sub:
        # belt-and-braces: if the driver's timeout uses SIGKILL (no
        # chance to flush), fire our own alarm just inside the budget
        # so the partial JSON still reaches stdout
        signal.signal(signal.SIGALRM, _flush_and_exit)
        signal.alarm(max(int(_BUDGET) - 5, 30))

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
    _RESULT = {
        "metric": f"sec_per_video_{h}p{frames}f_50step_{model}",
        "value": r["sec_per_video"],
        "unit": "s",
        "vs_baseline": round(r["sec_per_video"] / 60.0, 3),
        "detail": detail,
    }

    import subprocess

    def _sub_bench(extra_env: dict):
        """Run this script (or a tool) in a fresh process so the parent
        model's HBM is fully released before the 10 GB 5B weights land
        on the 16 GB v5e; returns the parsed last-line JSON. The child's
        hard timeout is the remaining global budget."""
        script = extra_env.pop("_SCRIPT", os.path.abspath(__file__))
        env = dict(os.environ, **extra_env, _BENCH_SUB="1")
        timeout_s = max(_remaining() - 15.0, 5.0)
        out = subprocess.run([sys.executable, script], env=env,
                             capture_output=True, text=True,
                             timeout=timeout_s)
        lines = out.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(
                f"no output (rc={out.returncode}): "
                f"{out.stderr.strip()[-300:]}")
        row = json.loads(lines[-1])
        if isinstance(row, dict) and \
                row.get("detail", {}).get("flushed_on_signal"):
            raise RuntimeError("sub-bench flushed on signal (timeout)")
        return row

    def _row(name: str, min_need_s: float, fn, enabled: bool = True):
        """Run one optional bench row under the global budget.

        min_need_s is a warm-cache estimate; rows that can't fit in the
        remaining budget are recorded as skipped rather than risking a
        driver-side rc=124 with no output at all (the round-4 failure)."""
        if not enabled:
            return
        if _remaining() < min_need_s:
            detail[name] = {"skipped": "budget",
                            "remaining_s": round(_remaining(), 1),
                            "needed_s": min_need_s}
            return
        try:
            fn()
        except subprocess.TimeoutExpired:
            detail[name] = {"skipped": "budget", "child_timeout": True}
        except Exception as e:  # noqa: BLE001
            detail[name] = {"error": str(e)[:200]}

    sub_rows = model != "ti2v-5B" and \
        os.environ.get("BENCH_SUBROWS", "1") != "0"

    def row_flagship():
        # flagship ti2v-5B at the same 480p x 81f point, decode INCLUDED
        f5 = _sub_bench({"BENCH_MODEL": "ti2v-5B", "BENCH_SUBROWS": "0",
                         "BENCH_DECODE": "1"})
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

    def row_ref_point():
        # the reference operating point (BASELINE.md contract:
        # inference.py:48-55): ti2v-5B, 1280x704, 121 frames, 50 UniPC
        # steps, VAE decode included
        rp = _sub_bench({"BENCH_MODEL": "ti2v-5B", "BENCH_W": "1280",
                         "BENCH_H": "704", "BENCH_FRAMES": "121",
                         "BENCH_STEPS": os.environ.get(
                             "BENCH_REF_STEPS", "3"),
                         "BENCH_SUBROWS": "0", "BENCH_DECODE": "1"})
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

    def row_train():
        # real-resolution diffusion/LoRA training step (the reference
        # trains through flash-attn at full resolution,
        # model_pipeline.py:2765-3142): 1.3B at 480p x 81f through the
        # Pallas flash-attention backward
        tr = _sub_bench({"_SCRIPT": os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools",
            "bench_train.py"), "BENCH_TRAIN_STEPS": "2"})
        detail["train_step_ms"] = tr["train_step_ms"]
        detail["train_resolution"] = tr["resolution"]
        if "est_mfu" in tr:
            detail["train_est_mfu"] = tr["est_mfu"]

    def row_e2e():
        # full-pipeline row (the reference sec/video contract is the
        # whole inference.py:525-720 entry): prompt -> tokenizer ->
        # real-shape UMT5-XXL encode (4.7B, HBM-staged) -> REAL 50-step
        # denoise -> decode -> mp4, encode itemized (tools/bench_e2e.py)
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

    def row_fast():
        # quality-gated fast mode: TaylorSeer threshold 2 (PSNR gate in
        # README quality gates), FULL 50-step schedule actually executed
        # so the refresh/extrapolate step mix is measured, not
        # extrapolated
        fm = _sub_bench({"BENCH_STEPS": "50", "BENCH_TAYLORSEER": "2",
                         "BENCH_SUBROWS": "0", "BENCH_DECODE": "1"})
        detail["fast_mode"] = {
            "sec_per_video": fm["value"],
            "dit_step_ms": fm["detail"]["dit_step_ms"],
            "taylorseer_threshold": 2,
            "psnr_gate_db": 37.1,
        }

    def row_int8():
        # int8 W8A8 serving mode (quality gate: int8_w8a8 row of
        # tools/quality_sweep.py — PSNR vs the exact program)
        i8 = _sub_bench({"BENCH_INT8": "1", "BENCH_SUBROWS": "0",
                         "BENCH_DECODE": "1"})
        detail["int8_mode"] = {
            "sec_per_video": i8["value"],
            "dit_step_ms": i8["detail"]["dit_step_ms"],
            **({"est_mfu_int8": i8["detail"]["est_mfu"]}
               if "est_mfu" in i8["detail"] else {}),
        }

    def row_int8_5b():
        # flagship ti2v-5B under the same int8 serving mode — only on
        # the real headline run (not tiny CPU smoke configs)
        i85 = _sub_bench({"BENCH_INT8": "1", "BENCH_MODEL": "ti2v-5B",
                          "BENCH_SUBROWS": "0", "BENCH_DECODE": "1"})
        detail.setdefault("int8_mode", {})["flagship_5B"] = {
            "sec_per_video": i85["value"],
            "dit_step_ms": i85["detail"]["dit_step_ms"],
            **({"est_mfu_int8": i85["detail"]["est_mfu"]}
               if "est_mfu" in i85["detail"] else {}),
        }

    def row_stages():
        # per-stage DiT step breakdown at the headline shape (VERDICT r4
        # #3: attribute the MFU claim — self-attn kernel / qkvo GEMMs /
        # cross-attn / ffn / modulation ms per step)
        st = _sub_bench({"_SCRIPT": os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools",
            "bench_stages.py")})
        detail["stages"] = {k: st[k] for k in
                            ("per_step_ms", "sum_ms", "share",
                             "self_attn_kernel_mfu", "seq") if k in st}

    def row_vqa():
        # reflexion end-to-end: one sec/question number for the whole
        # video-QA loop (pool decode -> embed -> rank -> caption ->
        # answer -> judge), tools/bench_qa.py --e2e; BASELINE.md names
        # VQA clips/sec as a first-class metric
        qa = _sub_bench({"_SCRIPT": os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools",
            "bench_qa.py"), "BENCH_QA_E2E": "1"})
        detail["vqa_e2e"] = {k: qa[k] for k in
                             ("sec_per_question", "clips_per_sec",
                              "pool_frames", "rounds", "components")
                             if k in qa}

    def _on(env_name: str, default: str = "1") -> bool:
        return os.environ.get(env_name, default) != "0"

    # priority order: each row only runs if the budget still covers its
    # warm-cache estimate; min_need values are deliberately conservative
    _row("flagship_5B", 120, row_flagship,
         sub_rows and _on("BENCH_FLAGSHIP"))
    _row("ref_point", 240, row_ref_point,
         sub_rows and _on("BENCH_REF_POINT"))
    _row("train_step_ms", 150, row_train, sub_rows and _on("BENCH_TRAIN"))
    _row("e2e", 330, row_e2e, sub_rows and _on("BENCH_E2E"))
    _row("fast_mode", 280, row_fast, sub_rows and _on("BENCH_FAST"))
    _row("int8_mode", 100, row_int8, sub_rows and _on("BENCH_INT8_ROW"))
    _row("int8_5B", 100, row_int8_5b,
         sub_rows and model == "t2v-1.3B" and _on("BENCH_INT8_ROW"))
    _row("vqa_e2e", 150, row_vqa, sub_rows and _on(
        "BENCH_VQA", "1" if model == "t2v-1.3B" else "0"))
    _row("stages", 90, row_stages, sub_rows and _on("BENCH_STAGES"))

    detail["bench_elapsed_s"] = round(time.time() - _T_START, 1)
    print(json.dumps(_RESULT))


if __name__ == "__main__":
    main()
