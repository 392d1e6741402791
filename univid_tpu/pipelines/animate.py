"""WanAnimate pipeline — character animation / replacement.

Behavioral parity with reference models/wan/animate.py:36-648 (WanAnimate):
  * clip-by-clip generation: clip_len (77) frames per clip with
    refert_num (1 or 5) overlap frames of temporal guidance taken from
    the previous clip's decoded tail; ping-pong input padding to a valid
    total length (inputs_padding/get_valid_len, :200-223).
  * conditioning per clip (:506-585): pose latents = vae(pose video);
    y_ref = [i2v mask | vae(reference image)]; y_reft = [i2v mask with
    mask_len=refert overlap | vae(reft frames + zeros)] (or the
    background video + inverted character mask in replace mode);
    y = concat([y_ref, y_reft]) along time; CLIP features of the
    reference frame.
  * CFG only for expression control: guide_scale > 1 runs an uncond
    branch whose face video is blanked to -1 (:594-603).
  * decode drops the reference latent frame; later clips drop the
    overlap frames (:637-646).

TPU redesign: the per-clip denoise is one jitted lax.scan (batch-2 CFG
like the other pipelines); the clip loop and video IO stay host-side.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GenerationConfig, WanVAEConfig
from ..core.dtypes import DTypePolicy, DEFAULT_POLICY
from ..models.wan.animate import (ClipVisionConfig, WanAnimateConfig,
                                  clip_preprocess, clip_visual_forward,
                                  wan_animate_forward)
from ..models.wan.vae_api import vae_decode, vae_encode
from .ti2v import WanTI2VPipeline  # solver plumbing reuse


def inputs_padding(frames: List, target_len: int) -> List:
    """Ping-pong padding to target_len (animate.py:200-212)."""
    idx = 0
    flip = False
    out: List = []
    while len(out) < target_len:
        out.append(frames[idx])
        idx = idx - 1 if flip else idx + 1
        if idx == 0 or idx == len(frames) - 1:
            flip = not flip
    return out[:target_len]


def get_valid_len(real_len: int, clip_len: int = 81, overlap: int = 1
                  ) -> int:
    """Round up so clips tile exactly (animate.py:214-223)."""
    real_clip = clip_len - overlap
    last = (real_len - overlap) % real_clip
    extra = 0 if last == 0 else real_clip - last
    return real_len + extra


def get_i2v_mask(lat_t: int, lat_h: int, lat_w: int, mask_len: int = 1,
                 mask_pixel_values: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """Frame-grouped i2v mask, channels-last [1, lat_t, h, w, 4]
    (animate.py:225-234)."""
    t_pix = (lat_t - 1) * 4 + 1
    if mask_pixel_values is None:
        msk = jnp.zeros((1, t_pix, lat_h, lat_w))
    else:
        msk = mask_pixel_values
    if mask_len > 0:
        msk = msk.at[:, :mask_len].set(1.0)
    msk = jnp.concatenate(
        [jnp.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
    msk = msk.reshape(1, msk.shape[1] // 4, 4, lat_h, lat_w)
    return msk.transpose(0, 1, 3, 4, 2)  # [1, lat_t, h, w, 4]


class WanAnimatePipeline:
    """Array-in/array-out animation driver; text context comes from the
    upstream UMT5 encoder like the other pipelines."""

    def __init__(self, animate_cfg: WanAnimateConfig, animate_params,
                 vae_cfg: WanVAEConfig, vae_params,
                 clip_cfg: Optional[ClipVisionConfig] = None,
                 clip_params=None,
                 policy: DTypePolicy = DEFAULT_POLICY,
                 num_train_timesteps: int = 1000,
                 relight_lora=None,
                 dispatch_steps: Optional[int] = None):
        import os
        self.cfg = animate_cfg
        if dispatch_steps is None:
            dispatch_steps = int(os.environ.get(
                "UNIVID_DISPATCH_STEPS", "5"))
        self.dispatch_steps = dispatch_steps
        if relight_lora is not None:
            # replacement-mode relighting LoRA merged into the animate
            # DiT weights (reference animate.py:179-189 loads a
            # rank-128 PEFT adapter over the transformer when
            # use_relighting_lora is set). Accepts a saved LoRA dir
            # (train/lora.py save_lora contract) or an in-memory lora
            # pytree.
            from ..train.lora import load_lora, merge_lora
            if isinstance(relight_lora, str):
                relight_lora, _ = load_lora(relight_lora)
            animate_params = merge_lora(animate_params, relight_lora)
        self.params = animate_params
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        self.clip_cfg = clip_cfg
        self.clip_params = clip_params
        self.policy = policy
        self.num_train_timesteps = num_train_timesteps
        # reuse the solver precompute from the TI2V pipeline
        self._solver = functools.partial(WanTI2VPipeline._solver, self)

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=4)
    def _denoise_fn(self, latent_grid, steps: int, shift: float,
                    guide_scale: float, solver: str):
        cfg = self.cfg
        gen = GenerationConfig(sampling_steps=steps, shift=shift,
                               sample_solver=solver)
        _, coeffs, step_fn = self._solver(gen)
        arrs = {k: np.asarray(v) for k, v in
                coeffs.device_arrays().items()}
        from ..ops.samplers import unipc_init_state
        use_cfg = guide_scale > 1.0

        def chunk(params, state, context, context_null, y, clip_fea,
                  pose_latents, face, face_uncond, chunk_arrs):
            def forward(x, tstep, ctx, face_in):
                x_in = jnp.concatenate(
                    [x.astype(jnp.float32), y.astype(jnp.float32)],
                    axis=-1)
                return wan_animate_forward(
                    params, cfg, x_in, tstep, ctx, clip_fea, pose_latents,
                    face_in, policy=self.policy)

            def body(state, xs):
                x = state["sample"].astype(jnp.float32)
                t1 = jnp.full((1,), xs["timestep"], jnp.float32)
                v = forward(x, t1, context, face)
                if use_cfg:
                    v_un = forward(x, t1, context_null, face_uncond)
                    v = v_un + guide_scale * (v - v_un)
                return step_fn(state, xs, v), None

            state, _ = jax.lax.scan(body, state, chunk_arrs)
            return state

        init_j = jax.jit(lambda noise: unipc_init_state(
            noise, order=coeffs.pred_m.shape[1]))
        chunk_j = jax.jit(chunk, donate_argnums=(1,))

        def run(params, noise, context, context_null, y, clip_fea,
                pose_latents, face, face_uncond):
            # chunked dispatch (see pipelines/ti2v.py): bounded device
            # executes — at 14B the per-clip schedule would otherwise be
            # one multi-minute device program
            k = self.dispatch_steps
            state = init_j(noise)
            spans = [(a, min(a + k, steps))
                     for a in range(0, steps, k)] if 0 < k < steps \
                else [(0, steps)]
            for a, b in spans:
                ca = {key: v[a:b] for key, v in arrs.items()}
                state = chunk_j(params, state, context, context_null, y,
                                clip_fea, pose_latents, face, face_uncond,
                                ca)
            return state["sample"]

        return run

    @functools.lru_cache(maxsize=2)
    def _decode_jit(self):
        return jax.jit(lambda vp, z: vae_decode(vp, self.vae_cfg, z))

    @functools.lru_cache(maxsize=2)
    def _encode_jit(self):
        return jax.jit(lambda vp, v: vae_encode(vp, self.vae_cfg, v))

    def _clip_features(self, ref_image: jnp.ndarray) -> jnp.ndarray:
        if self.clip_params is None:
            raise ValueError("animate needs CLIP params (use_img_emb)")
        img = clip_preprocess(ref_image, self.clip_cfg)
        return clip_visual_forward(self.clip_params, self.clip_cfg,
                                   img)[None]

    # ------------------------------------------------------------------
    def generate(
        self,
        context: jnp.ndarray,            # [text_len, text_dim]
        context_null: jnp.ndarray,
        *,
        cond_video: np.ndarray,          # [T, H, W, 3] pose video, [-1,1]
        face_video: np.ndarray,          # [T, S, S, 3] face crops, [-1,1]
        ref_image: np.ndarray,           # [H, W, 3] reference, [-1,1]
        bg_video: Optional[np.ndarray] = None,      # replace mode
        mask_video: Optional[np.ndarray] = None,    # [T, H, W] in {0,1}
        clip_len: int = 77,
        refert_num: int = 1,
        shift: float = 5.0,
        sample_solver: str = "dpm++",
        sampling_steps: int = 20,
        guide_scale: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """Returns [T_real, H, W, 3] in [-1, 1]."""
        assert refert_num in (1, 5), "refert_num should be 1 or 5"
        replace = bg_video is not None
        real_len = len(cond_video)
        target_len = get_valid_len(real_len, clip_len, overlap=refert_num)
        cond = inputs_padding(list(cond_video), target_len)
        face = inputs_padding(list(face_video), target_len)
        if replace:
            bg = inputs_padding(list(bg_video), target_len)
            mask = inputs_padding(list(mask_video), target_len)

        h_px, w_px = ref_image.shape[:2]
        sh = self.vae_cfg.vae_stride[1]
        lat_h, lat_w = h_px // sh, w_px // sh
        lat_t = clip_len // 4 + 1
        encode = self._encode_jit()
        decode = self._decode_jit()

        clip_fea = self._clip_features(jnp.asarray(ref_image))
        ref_lat = encode(self.vae_params,
                         jnp.asarray(ref_image)[None, None])
        mask_ref = get_i2v_mask(1, lat_h, lat_w, 1)
        y_ref = jnp.concatenate([mask_ref, ref_lat], axis=-1)

        key = jax.random.PRNGKey(seed)
        out_clips: List[np.ndarray] = []
        prev_tail: Optional[np.ndarray] = None
        start = 0
        while start + refert_num < len(cond):
            clip_cond = jnp.asarray(np.stack(cond[start:start + clip_len]))
            clip_face = jnp.asarray(np.stack(face[start:start + clip_len]))
            mask_reft_len = 0 if start == 0 else refert_num

            pose_latents = encode(self.vae_params, clip_cond[None])

            if replace:
                mask_px = np.stack(mask[start:start + clip_len])
                inv = 1.0 - mask_px
                inv_lat = inv[:, ::sh, ::sh]  # nearest downsample
                mask_pv = jnp.asarray(inv_lat)[None]
                reft_frames = jnp.asarray(
                    np.stack(bg[start:start + clip_len]))
                if mask_reft_len > 0:
                    reft_frames = reft_frames.at[:mask_reft_len].set(
                        jnp.asarray(prev_tail))
                y_reft_lat = encode(self.vae_params, reft_frames[None])
                msk_reft = get_i2v_mask(lat_t, lat_h, lat_w,
                                        mask_reft_len,
                                        mask_pixel_values=mask_pv)
            else:
                frames = jnp.zeros((clip_len, h_px, w_px, 3))
                if mask_reft_len > 0:
                    frames = frames.at[:mask_reft_len].set(
                        jnp.asarray(prev_tail))
                y_reft_lat = encode(self.vae_params, frames[None])
                msk_reft = get_i2v_mask(lat_t, lat_h, lat_w,
                                        mask_reft_len)
            y_reft = jnp.concatenate([msk_reft, y_reft_lat], axis=-1)
            y = jnp.concatenate([y_ref, y_reft], axis=1)

            key, sub = jax.random.split(key)
            noise = jax.random.normal(
                sub, (1, lat_t + 1, lat_h, lat_w, self.vae_cfg.z_dim),
                jnp.float32)
            fn = self._denoise_fn((lat_t + 1, lat_h, lat_w),
                                  sampling_steps, shift, guide_scale,
                                  sample_solver)
            face_in = clip_face[None]
            face_un = face_in * 0.0 - 1.0
            x0 = fn(self.params, noise, context[None], context_null[None],
                    y, clip_fea, pose_latents, face_in, face_un)

            frames_out = decode(self.vae_params, x0[:, 1:])[0]
            frames_np = np.asarray(frames_out)
            if start != 0:
                frames_np = frames_np[refert_num:]
            out_clips.append(frames_np)
            prev_tail = np.asarray(frames_out)[-refert_num:]
            start += clip_len - refert_num

        return np.concatenate(out_clips, axis=0)[:real_len]
