"""Wan2.2 A14B dual-expert (MoE) T2V / I2V pipelines.

Behavioral parity with reference models/wan/text2video.py:31-378 and
image2video.py (WanT2V / WanI2V): two full DiT parameter sets
("high_noise" for t >= boundary*1000, "low_noise" below), switched per
sampling step with a per-expert CFG guide scale
(text2video.py:169-201,306,341-344), and i2v conditioning through
y = concat(msk, vae.encode([frame0, zeros])) with the frame-grouped
first-frame mask (image2video.py:289-296,313-323).

TPU redesign: the whole denoise loop is one jitted lax.scan; the expert
choice per step is precomputed on the host as a 0/1 array and resolved
inside the scan with `lax.cond` over the two parameter trees — both
experts stay resident (sharded over fsdp for 14B), no CPU offload swaps.
The per-step guide scale rides the scan xs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GenerationConfig, TMAConfig, WanModelSpec, \
    latent_shape, dit_seq_len
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


def first_frame_mask(lat_f: int, lat_h: int, lat_w: int) -> jnp.ndarray:
    """[1, lat_f, lat_h, lat_w, 4] frame-grouped i2v mask
    (image2video.py:289-296): pixel-frame mask [1,1,0,...,0] repeats the
    first frame 4x, then groups every 4 pixel frames into one latent
    frame's 4 channels — so latent frame 0 has all-ones channels and the
    rest are zero."""
    m = jnp.zeros((1, lat_f, lat_h, lat_w, 4), jnp.float32)
    return m.at[:, 0].set(1.0)


class WanMoEPipeline:
    """A14B dual-expert generation driver (t2v + i2v by model_type)."""

    def __init__(self, spec: WanModelSpec, low_params, high_params,
                 vae_params, policy: DTypePolicy = DEFAULT_POLICY,
                 sp_size: int = 1, mesh=None,
                 dispatch_steps: Optional[int] = None):
        if spec.moe_boundary is None:
            raise ValueError(f"{spec.name} has no moe_boundary")
        import os
        self.spec = spec
        self.low_params = low_params
        self.high_params = high_params
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
            return coeffs, unipc_step
        elif gen.sample_solver in ("dpm++", "dpm", "dpm++3"):
            order = 3 if gen.sample_solver == "dpm++3" else 2
            sig = get_sampling_sigmas(gen.sampling_steps, gen.shift)
            sigmas = np.concatenate([sig, [0.0]])
            timesteps = np.floor(sig * gen.num_train_timesteps)
            coeffs = precompute_dpm_solver(sigmas, solver_order=order,
                                           timesteps=timesteps)
            return coeffs, dpm_step
        raise NotImplementedError(gen.sample_solver)

    @functools.lru_cache(maxsize=8)
    def _denoise_fn(self, latent_grid: Tuple[int, int, int], seq_len: int,
                    steps: int, shift: float,
                    guide_scale: Tuple[float, float], solver: str,
                    i2v: bool, tma_key):
        spec = self.spec
        cfg = spec.dit
        gen = GenerationConfig(sampling_steps=steps, shift=shift,
                               sample_solver=solver)
        coeffs, step_fn = self._solver(gen)
        arrs = coeffs.device_arrays()

        # expert switch + per-expert guide scale, precomputed per step
        # (text2video.py:306,341-344)
        boundary = spec.moe_boundary * spec.num_train_timesteps
        is_high = coeffs.timesteps >= boundary
        arrs["is_high"] = jnp.asarray(is_high)
        arrs["gscale"] = jnp.asarray(
            np.where(is_high, guide_scale[1], guide_scale[0]), jnp.float32)

        tma_cfg = TMAConfig(**dict(tma_key)) if tma_key else None
        if tma_cfg is not None and tma_cfg.enabled:
            tma_w = tma_schedule_weights(tma_cfg, steps)
            tma_prefix = min(tma_cfg.text_prefix_len, cfg.text_len // 2)
        else:
            tma_w = np.ones(steps, np.float32)
            tma_prefix = 0
        arrs["tma_w"] = jnp.asarray(tma_w)

        f, h, w = latent_grid
        pt, ph, pw = cfg.patch_size
        grid = (f // pt, h // ph, w // pw)
        rope_cos, rope_sin = build_rope_3d(cfg.head_dim, grid)

        def dit(params, x2, t2, ctx):
            if self.sp_size > 1:
                return wan_dit_forward_sp(
                    params, cfg, x2, t2, ctx, rope_cos, rope_sin,
                    mesh=self.mesh, seq_pad_to=seq_len, policy=self.policy,
                    fused_rope=True)
            return wan_dit_forward(
                params, cfg, x2, t2, ctx, rope_cos, rope_sin,
                seq_pad_to=seq_len, policy=self.policy, fused_rope=True)

        # host-side per-step arrays for the chunked dispatcher
        arrs = {k: np.asarray(v) for k, v in arrs.items()}

        def prep(noise, context, context_null):
            ctx_pair = jnp.concatenate([context, context_null], axis=0)
            state = unipc_init_state(noise,
                                     order=coeffs.pred_m.shape[1])
            return state, ctx_pair

        def chunk(low_params, high_params, state, ctx_pair, y,
                  chunk_arrs):
            def body(state, xs):
                ctx = ctx_pair
                if tma_prefix > 0:
                    ctx = apply_text_weight(ctx, xs["tma_w"], tma_prefix)
                x2 = jnp.broadcast_to(
                    state["sample"].astype(jnp.float32),
                    (2,) + state["sample"].shape[1:])
                if i2v:
                    y2 = jnp.broadcast_to(y.astype(jnp.float32),
                                          (2,) + y.shape[1:])
                    x2 = jnp.concatenate([x2, y2], axis=-1)
                t2 = jnp.full((2,), xs["timestep"], jnp.float32)
                v = jax.lax.cond(
                    xs["is_high"],
                    lambda x, t, c: dit(high_params, x, t, c),
                    lambda x, t, c: dit(low_params, x, t, c),
                    x2, t2, ctx)
                v_guided = v[1:2] + xs["gscale"] * (v[0:1] - v[1:2])
                return step_fn(state, xs, v_guided), None

            state, _ = jax.lax.scan(body, state, chunk_arrs)
            return state

        prep_j = jax.jit(prep)
        chunk_j = jax.jit(chunk, donate_argnums=(2,))

        def run(low_params, high_params, noise, context, context_null, y):
            # noise [1, F, H, W, z]; y [1, F, H, W, 4+z] (i2v) else unused
            # chunked dispatch (see pipelines/ti2v.py): bounded device
            # executes, one compiled program per chunk shape
            k = self.dispatch_steps
            state, ctx_pair = prep_j(noise, context, context_null)
            spans = [(a, min(a + k, steps))
                     for a in range(0, steps, k)] if 0 < k < steps \
                else [(0, steps)]
            for a, b in spans:
                ca = {key: v[a:b] for key, v in arrs.items()}
                state = chunk_j(low_params, high_params, state, ctx_pair,
                                y, ca)
            return state["sample"]

        return run

    # ------------------------------------------------------------------
    def generate(
        self,
        context: jnp.ndarray,
        context_null: jnp.ndarray,
        *,
        size: Tuple[int, int] = (1280, 720),
        frame_num: int = 81,
        shift: Optional[float] = None,
        sample_solver: str = "unipc",
        sampling_steps: int = 50,
        guide_scale: Union[float, Tuple[float, float]] = 5.0,
        seed: int = 0,
        img: Optional[jnp.ndarray] = None,  # [H, W, 3] in [-1, 1], i2v
        tma: Optional[TMAConfig] = None,
        decode: bool = True,
        taylorseer_threshold: int = 0,
        output_u8: bool = False,
    ):
        """Video [T, H, W, 3] in [-1, 1] (or latent when decode=False).
        guide_scale may be (low_noise, high_noise) like the reference
        (image2video.py:257-258). output_u8 fuses the mp4-ready u8
        conversion into the decode program (4x less D2H; see ti2v)."""
        if taylorseer_threshold > 0:
            raise NotImplementedError(
                "TaylorSeer step caching is wired for the TI2V pipeline; "
                "the dual-expert MoE denoise switches models mid-schedule "
                "and would need per-expert caches")
        spec = self.spec
        if shift is None:
            shift = spec.generation.shift
        if isinstance(guide_scale, (int, float)):
            guide_scale = (float(guide_scale), float(guide_scale))
        c, f, h, w = latent_shape(spec, size[0], size[1], frame_num)
        seq_len = dit_seq_len(spec, size[0], size[1], frame_num,
                              self.sp_size)
        # single up-front pad to the flash block multiple (see ti2v.py)
        if seq_len > 2048:
            seq_len = -(-seq_len // 2048) * 2048

        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, (1, f, h, w, c), jnp.float32)

        i2v = img is not None
        if i2v:
            # y = concat(msk, vae([img, zeros x F-1]))  (image2video.py:
            # 313-323): encode the real first frame followed by black
            # frames through the causal VAE, then prepend the mask.
            frames = jnp.concatenate(
                [img[None, None].astype(jnp.float32),
                 jnp.zeros((1, frame_num - 1) + img.shape, jnp.float32)],
                axis=1)
            z = vae_encode(self.vae_params, spec.vae, frames)  # [1,f,h,w,z]
            msk = first_frame_mask(f, h, w)
            y = jnp.concatenate([msk, z], axis=-1)
        else:
            y = jnp.zeros((1, f, h, w, 4 + c), jnp.float32)

        tma_key = (tuple(sorted(dataclasses.asdict(tma).items()))
                   if tma is not None else None)
        fn = self._denoise_fn((f, h, w), seq_len, sampling_steps, shift,
                              tuple(guide_scale), sample_solver, i2v,
                              tma_key)
        x0 = fn(self.low_params, self.high_params, noise, context[None],
                context_null[None], y)
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
