"""Wan TI2V generation pipeline (unified text-to-video + image-to-video).

Behavioral parity with reference models/wan/textimage2video.py:34-619
(WanTI2V.generate/t2v/i2v), re-designed for XLA:

  * The whole denoise loop is ONE jitted `lax.scan` over steps: UniPC/DPM++
    coefficients, TMA text weights and conditioning timesteps are
    precomputed per step on the host (ops/samplers.py, ops/tma.py) and fed
    as scan inputs. No host<->device sync inside the loop.
  * CFG cond/uncond run as a single batch-2 DiT call (the reference runs
    two sequential forwards per step, textimage2video.py:380-386).
  * i2v first-frame conditioning: latent clamp (1-m)*z0 + m*x each step
    and per-token t=0 on the first latent frame (textimage2video.py:
    550-598, 373-378) — expressed as a static mask, not masks_like
    tensors.
  * seq_len formula and padding match textimage2video.py:289-291.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (
    GenerationConfig,
    TMAConfig,
    WanModelSpec,
    dit_seq_len,
    latent_shape,
)
from ..core.dtypes import DTypePolicy, DEFAULT_POLICY
from ..models.wan.dit import wan_dit_forward, wan_dit_forward_sp
from ..models.wan.vae_api import vae_decode, vae_encode
from ..ops.rope import build_rope_3d
from ..ops.samplers import (
    flow_sigmas,
    get_sampling_sigmas,
    precompute_dpm_solver,
    precompute_unipc,
    unipc_init_state,
    unipc_step,
    dpm_step,
)
from ..ops.tma import apply_text_weight, tma_schedule_weights


class WanTI2VPipeline:
    """Array-in/array-out generation driver.

    Text encoding (UMT5 or the fusion projector) happens upstream; this
    pipeline consumes ready context tensors [text_len, text_dim], mirroring
    how the fusion wrapper swaps the T5 output for BAGEL context
    (model_pipeline.py:1669-1697).
    """

    def __init__(self, spec: WanModelSpec, dit_params, vae_params,
                 policy: DTypePolicy = DEFAULT_POLICY,
                 sp_size: int = 1, mesh=None,
                 dispatch_steps: Optional[int] = None):
        """mesh + sp_size>1 enables the sequence-parallel denoise: tokens
        shard over the mesh's `sp` axis inside the jitted scan
        (models/wan/dit.py wan_dit_forward_sp; reference
        sequence_parallel.py:64-176 + textimage2video.py:289-291).

        dispatch_steps bounds how many denoise steps run per device
        dispatch (see the chunked-dispatch note in _denoise_fn);
        default 5 (env UNIVID_DISPATCH_STEPS), 0 = whole schedule in
        one dispatch."""
        import os
        self.spec = spec
        self.dit_params = dit_params
        self.vae_params = vae_params
        self.policy = policy
        self.sp_size = sp_size
        self.mesh = mesh
        if dispatch_steps is None:
            dispatch_steps = int(os.environ.get(
                "UNIVID_DISPATCH_STEPS", "5"))
        self.dispatch_steps = dispatch_steps
        if sp_size > 1 and mesh is None:
            raise ValueError("sp_size > 1 requires a mesh")

    # ------------------------------------------------------------------
    def _solver(self, gen: GenerationConfig):
        if gen.sample_solver == "unipc":
            sigmas, timesteps = flow_sigmas(
                gen.sampling_steps, shift=gen.shift,
                num_train_timesteps=gen.num_train_timesteps)
            coeffs = precompute_unipc(sigmas, timesteps=timesteps)
            return sigmas, coeffs, unipc_step
        elif gen.sample_solver in ("dpm++", "dpm", "dpm++3"):
            order = 3 if gen.sample_solver == "dpm++3" else 2
            sig = get_sampling_sigmas(gen.sampling_steps, gen.shift)
            sigmas = np.concatenate([sig, [0.0]])
            timesteps = np.floor(sig * gen.num_train_timesteps)
            coeffs = precompute_dpm_solver(sigmas, solver_order=order,
                                           timesteps=timesteps)
            return sigmas, coeffs, dpm_step
        raise NotImplementedError(gen.sample_solver)

    @functools.lru_cache(maxsize=8)
    def _denoise_fn(self, latent_grid: Tuple[int, int, int], seq_len: int,
                    steps: int, shift: float, guide_scale: float,
                    solver: str, i2v: bool, tma_key,
                    taylorseer_threshold: int = 0):
        """Build + jit the scan-based denoise loop for a static shape.

        taylorseer_threshold > 1 enables TaylorSeer step caching on the
        DiT velocity: full forwards on refresh steps, order-k Taylor
        extrapolation between (ops/taylorseer.py — the reference wires
        this only for BAGEL image gen, cache_utils/taylorseer.py +
        bagel.py:680-689; extending it to the Wan denoise loop is the
        same math over the batch-2 CFG velocity, one cache per CFG
        branch by construction). threshold=1 degenerates to all-full
        steps (exact); 0 disables the machinery entirely."""
        spec = self.spec
        cfg = spec.dit
        gen = GenerationConfig(sampling_steps=steps, shift=shift,
                               guide_scale=guide_scale, sample_solver=solver)
        sigmas, coeffs, step_fn = self._solver(gen)
        arrs = coeffs.device_arrays()

        use_ts = taylorseer_threshold > 0
        if use_ts:
            from ..ops.taylorseer import (TaylorSeerConfig,
                                          init_taylor_cache,
                                          taylor_predict, taylor_update,
                                          taylorseer_schedule)
            ts_cfg = TaylorSeerConfig(
                fresh_threshold=taylorseer_threshold)
            sched = taylorseer_schedule(steps, ts_cfg)
            arrs["ts_full"] = jnp.asarray(sched["is_full"])
            arrs["ts_dd"] = jnp.asarray(sched["dd"])
            arrs["ts_x"] = jnp.asarray(sched["x"])
            arrs["ts_n_upd"] = jnp.asarray(sched["n_upd"])
            arrs["ts_n_stored"] = jnp.asarray(sched["n_stored"])

        tma_cfg = TMAConfig(**dict(tma_key)) if tma_key else None
        if tma_cfg is not None and tma_cfg.enabled:
            tma_w = tma_schedule_weights(tma_cfg, steps)
            tma_prefix = min(tma_cfg.text_prefix_len, cfg.text_len // 2)
        else:
            tma_w = np.ones(steps, np.float32)
            tma_prefix = 0
        arrs["tma_w"] = jnp.asarray(tma_w)

        # per-step arrays stay on the HOST: the chunked dispatcher below
        # slices them per dispatch and lets jit stage each slice
        arrs = {k: np.asarray(v) for k, v in arrs.items()}

        prep_j, chunk_j = self._chunk_progs(
            latent_grid, seq_len, guide_scale, solver, i2v, tma_prefix,
            use_ts, int(coeffs.pred_m.shape[1]))

        def run(dit_params, noise, context, context_null, z0):
            # CHUNKED DISPATCH: the denoise scan executes
            # dispatch_steps-at-a-time instead of as one 50-step device
            # program. A single full-schedule execute runs minutes on
            # device and environments with an execute watchdog (the
            # tunneled dev chip kills executes over ~60 s) or preemption
            # need bounded dispatches; every full chunk reuses ONE
            # compiled program, so the overhead is a handful of ~ms
            # dispatches per video. This also mirrors the reference's
            # per-step host loop granularity (textimage2video.py:367-394
            # tqdm) without its per-step sync.
            k = self.dispatch_steps
            state, factors, ctx_pair = prep_j(noise, context,
                                              context_null, z0)
            spans = [(a, min(a + k, steps))
                     for a in range(0, steps, k)] if 0 < k < steps \
                else [(0, steps)]
            for a, b in spans:
                ca = {key: v[a:b] for key, v in arrs.items()}
                state, factors = chunk_j(dit_params, state, factors,
                                         ctx_pair, z0, ca)
            return state["sample"]

        return run

    @functools.lru_cache(maxsize=8)
    def _chunk_progs(self, latent_grid: Tuple[int, int, int],
                     seq_len: int, guide_scale: float, solver: str,
                     i2v: bool, tma_prefix: int, use_ts: bool,
                     order: int):
        """jit programs for the denoise prep + chunk — deliberately keyed
        WITHOUT the step count: the chunk program consumes per-step
        coefficient slices as runtime inputs, so a dispatch_steps-long
        warmup, the full 50-step schedule, and any remainder chunk all
        share one traced jit wrapper (full-length chunks then share one
        compiled executable)."""
        cfg = self.spec.dit
        step_fn = unipc_step if solver == "unipc" else dpm_step
        if use_ts:
            from ..ops.taylorseer import (init_taylor_cache,
                                          taylor_predict, taylor_update)

        f, h, w = latent_grid
        pt, ph, pw = cfg.patch_size
        grid = (f // pt, h // ph, w // pw)
        rope_cos, rope_sin = build_rope_3d(cfg.head_dim, grid)
        per_frame_tokens = grid[1] * grid[2]

        def _masks():
            if i2v:
                l = grid[0] * per_frame_tokens
                t_zero = jnp.zeros((2, l), bool) \
                    .at[:, :per_frame_tokens].set(True)
                frame_mask = jnp.zeros((1, f, h, w, 1)) \
                    .at[:, :1].set(1.0)  # 1 where clamped to z0
                return t_zero, frame_mask
            return None, None

        def prep(noise, context, context_null, z0):
            # noise/z0: [1, F, H, W, C]; context*: [1, text_len, text_dim]
            ctx_pair = jnp.concatenate([context, context_null], axis=0)
            _, frame_mask = _masks()
            latents = (frame_mask * z0 + (1.0 - frame_mask) * noise) \
                if i2v else noise
            state = unipc_init_state(latents, order=order)
            if use_ts:
                factors = init_taylor_cache((2,) + latents.shape[1:])
            else:
                factors = jnp.zeros((0,), jnp.float32)
            return state, factors, ctx_pair

        def chunk(dit_params, state, factors, ctx_pair, z0, chunk_arrs):
            t_zero, frame_mask = _masks()
            clamp = (lambda x: frame_mask * z0 + (1.0 - frame_mask) * x) \
                if i2v else (lambda x: x)

            def dit_v(sample, xs):
                ctx = ctx_pair
                if tma_prefix > 0:
                    ctx = apply_text_weight(ctx, xs["tma_w"], tma_prefix)
                x2 = jnp.broadcast_to(sample.astype(jnp.float32),
                                      (2,) + sample.shape[1:])
                t2 = jnp.full((2,), xs["timestep"], jnp.float32)
                if self.sp_size > 1:
                    return wan_dit_forward_sp(
                        dit_params, cfg, x2, t2, ctx, rope_cos, rope_sin,
                        mesh=self.mesh, t_zero_mask=t_zero,
                        seq_pad_to=seq_len, policy=self.policy,
                        fused_rope=True)
                return wan_dit_forward(
                    dit_params, cfg, x2, t2, ctx, rope_cos, rope_sin,
                    t_zero_mask=t_zero, seq_pad_to=seq_len,
                    policy=self.policy, fused_rope=True)

            if use_ts:
                def body(carry, xs):
                    state, factors = carry

                    def full_branch(args):
                        sample, factors, xs = args
                        v = dit_v(sample, xs)
                        return v, taylor_update(factors, v, xs["ts_dd"],
                                                xs["ts_n_upd"])

                    def taylor_branch(args):
                        _, factors, xs = args
                        v = taylor_predict(
                            factors, xs["ts_x"],
                            xs["ts_n_stored"]).astype(jnp.float32)
                        return v, factors

                    v, factors = jax.lax.cond(
                        xs["ts_full"] > 0, full_branch, taylor_branch,
                        (state["sample"], factors, xs))
                    v_guided = v[1:2] + guide_scale * (v[0:1] - v[1:2])
                    state = step_fn(state, xs, v_guided)
                    state = dict(state, sample=clamp(state["sample"]))
                    return (state, factors), None

                (state, factors), _ = jax.lax.scan(body, (state, factors),
                                                   chunk_arrs)
            else:
                def body(state, xs):
                    v = dit_v(state["sample"], xs)
                    v_guided = v[1:2] + guide_scale * (v[0:1] - v[1:2])
                    state = step_fn(state, xs, v_guided)
                    state = dict(state, sample=clamp(state["sample"]))
                    return state, None

                state, _ = jax.lax.scan(body, state, chunk_arrs)
            return state, factors

        prep_j = jax.jit(prep)
        # donate solver state + Taylor factors: they are dead after each
        # dispatch, and at 704p the UniPC multistep buffers are ~100 MB
        chunk_j = jax.jit(chunk, donate_argnums=(1, 2))
        return prep_j, chunk_j

    # ------------------------------------------------------------------
    def generate(
        self,
        context: jnp.ndarray,              # [text_len, text_dim]
        context_null: jnp.ndarray,
        *,
        size: Tuple[int, int] = (1280, 704),
        frame_num: int = 121,
        shift: float = 5.0,
        sample_solver: str = "unipc",
        sampling_steps: int = 50,
        guide_scale: float = 5.0,
        seed: int = 0,
        img: Optional[jnp.ndarray] = None,   # [H, W, 3] in [-1, 1]
        tma: Optional[TMAConfig] = None,
        decode: bool = True,
        taylorseer_threshold: int = 0,
        output_u8: bool = False,
    ):
        """Returns video [T, H, W, 3] in [-1,1] (or the latent if
        decode=False). Matches WanTI2V.generate defaults
        (textimage2video.py:162-237).

        output_u8=True fuses the mp4-ready u8 conversion
        (round((clip(v)+1)*127.5), data/video_io.save_video's formula)
        into the decode program: the frame tensor leaves the device as
        uint8 — 4x less D2H traffic than fp32 frames (~390 MB -> 97 MB
        at 480p x 81f; material through the remote TPU relay) and no
        host-side clip/scale pass."""
        spec = self.spec
        c, f, h, w = latent_shape(spec, size[0], size[1], frame_num)
        seq_len = dit_seq_len(spec, size[0], size[1], frame_num,
                              self.sp_size)
        # pad the token axis ONCE to the flash-attention block multiple:
        # without this, every one of the 30 blocks re-pads q/k/v to the
        # next 2048 multiple and re-slices the output (~55 ms/step of
        # pure copy traffic at the 1.3B 480p point); padded keys are
        # masked via kv_len inside wan_dit_forward. 2048 is also a
        # multiple of every supported sp width.
        if seq_len > 2048:
            seq_len = -(-seq_len // 2048) * 2048

        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, (1, f, h, w, c), jnp.float32)

        i2v = img is not None
        if i2v:
            z0 = vae_encode(self.vae_params, spec.vae,
                            img[None, None].astype(jnp.float32))
            # z0: [1, 1, h, w, c] -> broadcast over latent frames
            z0 = jnp.pad(z0, ((0, 0), (0, f - 1), (0, 0), (0, 0), (0, 0)))
        else:
            z0 = jnp.zeros_like(noise)

        tma_key = (tuple(sorted(dataclasses.asdict(tma).items()))
                   if tma is not None else None)
        fn = self._denoise_fn((f, h, w), seq_len, sampling_steps, shift,
                              guide_scale, sample_solver, i2v, tma_key,
                              taylorseer_threshold)
        x0 = fn(self.dit_params, noise, context[None], context_null[None],
                z0)
        if not decode:
            return x0
        video = self._decode_jit(output_u8)(self.vae_params, x0)
        return video[0]

    @functools.lru_cache(maxsize=2)
    def _decode_jit(self, output_u8: bool = False):
        vae_cfg = self.spec.vae

        def run(vp, z):
            v = vae_decode(vp, vae_cfg, z)
            if output_u8:
                v = jnp.round((jnp.clip(v, -1.0, 1.0) + 1.0) * 127.5) \
                    .astype(jnp.uint8)
            return v

        return jax.jit(run)
