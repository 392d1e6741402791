"""FLUX.1-Kontext image-editing pipeline (TPU).

The surface the reference's animate preprocess drives
(process_pipepline.py:179-215): `pipe(image, prompt, height, width,
guidance_scale=2.5, num_inference_steps=28).images[0]` — an edited image
standardizing the subject's pose before bone-ratio estimation. Stages:

  prompt -> CLIP-L pooled + T5-XXL features
  input image -> preferred-resolution resize -> FLUX VAE encode
              -> packed reference tokens (RoPE set-id 1)
  noise tokens (set-id 0) -> 28 distilled-guidance Euler flow steps with
  the resolution-shifted sigma schedule -> unpack -> VAE decode.

TPU design: the whole denoise loop is ONE jitted `lax.scan` over the
sigma schedule (static shapes per (image size, text len) bucket); the
reference tokens are loop constants so XLA keeps them resident; no CFG
batch (Kontext is guidance-distilled). Mock weights run the identical
program at TINY_FLUX geometry for hermetic tests.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import T5Config
from ..core.dtypes import DTypePolicy, DEFAULT_POLICY
from ..models.bagel.autoencoder import (ImageVAEConfig, image_vae_decode,
                                        image_vae_encode, init_image_vae)
from ..models.flux import (ClipTextConfig, FluxConfig, TINY_CLIP_TEXT,
                           TINY_FLUX, build_rope_from_ids, clip_text_encode,
                           flux_forward, image_token_ids, init_clip_text,
                           init_flux, pack_latents, unpack_latents)
from ..models.wan.t5 import encode_padded, init_t5_encoder

# aspect buckets the published Kontext editor was trained on (the
# diffusers pipeline auto-resizes the input to the closest-aspect
# bucket, ~1MP each)
PREFERRED_KONTEXT_RESOLUTIONS = [
    (672, 1568), (688, 1504), (720, 1456), (752, 1392), (800, 1328),
    (832, 1248), (880, 1184), (944, 1104), (1024, 1024), (1104, 944),
    (1184, 880), (1248, 832), (1328, 800), (1392, 752), (1456, 720),
    (1504, 688), (1568, 672),
]

# t5-v1_1-xxl geometry (FLUX's text_encoder_2; vs UMT5: 32k vocab,
# shared relative-position table)
FLUX_T5_CONFIG = T5Config(vocab_size=32128, shared_pos=True, text_len=512)
TINY_FLUX_T5 = T5Config(vocab_size=512, dim=32, dim_attn=32, dim_ffn=64,
                        num_heads=2, num_layers=2, shared_pos=True,
                        text_len=16)
TINY_FLUX_VAE = ImageVAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                               z_channels=4)


def calculate_shift(image_seq_len: int, base_seq_len: int = 256,
                    max_seq_len: int = 4096, base_shift: float = 0.5,
                    max_shift: float = 1.15) -> float:
    """Resolution-dependent timestep-schedule shift (mu)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    return image_seq_len * m + (base_shift - m * base_seq_len)


def kontext_sigmas(num_steps: int, image_seq_len: int) -> np.ndarray:
    """[num_steps + 1] fp64 sigma schedule: linspace(1, 1/N) put through
    the exponential time shift, terminal 0 appended."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    mu = calculate_shift(image_seq_len)
    sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
    return np.concatenate([sigmas, [0.0]])


def preferred_resolution(h: int, w: int) -> Tuple[int, int]:
    """Closest-aspect (h, w) bucket from the published training set."""
    aspect = w / h
    _, bw, bh = min((abs(aspect - pw / ph), pw, ph)
                    for ph, pw in PREFERRED_KONTEXT_RESOLUTIONS)
    return bh, bw


def _resize_u8(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize((w, h),
                                                  Image.BICUBIC))


class KontextPipeline:
    """image (u8 HWC) + prompt -> edited image (u8 HWC)."""

    def __init__(self, flux_params, flux_cfg: FluxConfig, vae_params,
                 vae_cfg: ImageVAEConfig, t5_params, t5_cfg: T5Config,
                 t5_tokenizer, clip_params, clip_cfg: ClipTextConfig,
                 clip_tokenizer, policy: DTypePolicy = DEFAULT_POLICY):
        self.flux_params = flux_params
        self.flux_cfg = flux_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg
        self.t5_tokenizer = t5_tokenizer
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.clip_tokenizer = clip_tokenizer
        self.policy = policy
        self._denoise_cache = {}
        # jitted stage programs built ONCE (a fresh jax.jit(partial(...))
        # per call would re-trace on every edit)
        self._t5_jit = jax.jit(functools.partial(
            encode_padded, cfg=self.t5_cfg,
            compute_dtype=self.policy.compute_dtype))
        self._clip_jit = jax.jit(functools.partial(
            clip_text_encode, cfg=self.clip_cfg))
        self._vae_enc_jit = jax.jit(functools.partial(
            image_vae_encode, cfg=self.vae_cfg))
        self._vae_dec_jit = jax.jit(functools.partial(
            image_vae_decode, cfg=self.vae_cfg))

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    @classmethod
    def random_init(cls, key=None, tiny: bool = True,
                    policy: DTypePolicy = DEFAULT_POLICY
                    ) -> "KontextPipeline":
        """Hermetic pipeline (tiny geometry): same program, mock weights."""
        from ..utils.tokenizers import HashTokenizer

        key = key if key is not None else jax.random.PRNGKey(0)
        k0, k1, k2, k3 = jax.random.split(key, 4)
        flux_cfg = TINY_FLUX if tiny else FluxConfig()
        vae_cfg = TINY_FLUX_VAE if tiny else ImageVAEConfig()
        t5_cfg = TINY_FLUX_T5 if tiny else FLUX_T5_CONFIG
        clip_cfg = TINY_CLIP_TEXT if tiny else ClipTextConfig()
        if tiny:
            # tie tiny geometries together: packed latent channels (4 *
            # z_channels) must equal flux in_channels; text dims must
            # match context/vec dims
            assert 4 * vae_cfg.z_channels == flux_cfg.in_channels
            assert t5_cfg.dim == flux_cfg.context_dim
            assert clip_cfg.hidden_size == flux_cfg.vec_dim
        return cls(
            init_flux(k0, flux_cfg), flux_cfg,
            init_image_vae(k1, vae_cfg), vae_cfg,
            init_t5_encoder(k2, t5_cfg), t5_cfg,
            _PaddedTok(HashTokenizer(vocab_size=t5_cfg.vocab_size),
                       t5_cfg.text_len),
            init_clip_text(k3, clip_cfg), clip_cfg,
            _PaddedTok(HashTokenizer(vocab_size=clip_cfg.vocab_size),
                       clip_cfg.max_len),
            policy=policy)

    @classmethod
    def from_checkpoint(cls, flux_dir: str, dtype=jnp.bfloat16,
                        int8: bool = False,
                        policy: DTypePolicy = DEFAULT_POLICY
                        ) -> "KontextPipeline":
        """Published layout:

            flux_dir/flux1-kontext-dev.safetensors   (BFL transformer)
            flux_dir/ae.safetensors                  (BFL image VAE)
            flux_dir/text_encoder/model.safetensors  (HF CLIP-L)
            flux_dir/text_encoder_2/*.safetensors    (HF T5-XXL v1.1)
            flux_dir/tokenizer, flux_dir/tokenizer_2 (HF tokenizers)

        int8=True quantizes the 12B transformer's linears per-channel
        (core/quant) so editing fits one 16 GB v5e.
        """
        from ..core.checkpoint import load_kontext_checkpoint
        from ..utils.tokenizers import load_tokenizer

        (flux_params, flux_cfg, vae_params, vae_cfg, t5_params, t5_cfg,
         clip_params, clip_cfg) = load_kontext_checkpoint(flux_dir,
                                                          dtype=dtype)
        if int8:
            from ..core.quant import quantize_tree
            flux_params = quantize_tree(flux_params)
        return cls(
            flux_params, flux_cfg, vae_params, vae_cfg,
            t5_params, t5_cfg,
            load_tokenizer(os.path.join(flux_dir, "tokenizer_2"),
                           seq_len=t5_cfg.text_len),
            clip_params, clip_cfg,
            load_tokenizer(os.path.join(flux_dir, "tokenizer"),
                           seq_len=clip_cfg.max_len),
            policy=policy)

    # ------------------------------------------------------------------
    # programs
    # ------------------------------------------------------------------

    def _denoise_fn(self, grid_hw: Tuple[int, int],
                    ref_grid_hw: Tuple[int, int], txt_len: int,
                    num_steps: int):
        key = (grid_hw, ref_grid_hw, txt_len, num_steps)
        if key in self._denoise_cache:
            return self._denoise_cache[key]
        gh, gw = grid_hw
        ids = np.concatenate([
            np.zeros((txt_len, 3)),
            image_token_ids((gh, gw), set_id=0),
            image_token_ids(ref_grid_hw, set_id=1),
        ])
        cos, sin = build_rope_from_ids(ids, self.flux_cfg.axes_dim,
                                       self.flux_cfg.theta)
        l_tgt = gh * gw
        cfg, policy = self.flux_cfg, self.policy

        @jax.jit
        def run(flux_params, lat, ref_tokens, txt, pooled, sigmas,
                guidance):
            b = lat.shape[0]
            g = jnp.full((b,), guidance, jnp.float32)

            def body(lat, sig):
                s_cur, s_next = sig
                img_tokens = jnp.concatenate(
                    [lat.astype(policy.compute_dtype),
                     ref_tokens.astype(policy.compute_dtype)], axis=1)
                v = flux_forward(
                    flux_params, cfg, img_tokens, txt,
                    jnp.full((b,), s_cur, jnp.float32),
                    guidance=g, clip_pooled=pooled,
                    rope_tables=(cos, sin), policy=policy)[:, :l_tgt]
                lat = lat + (s_next - s_cur) * v.astype(jnp.float32)
                return lat, None

            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)
            return jax.lax.scan(body, lat.astype(jnp.float32), pairs)[0]

        self._denoise_cache[key] = run
        return run

    def encode_prompt(self, prompt: str):
        """-> (t5 features [1, text_len, ctx_dim], clip pooled [1, vec])."""
        ids, lens = self.t5_tokenizer.batch_encode_padded([prompt])
        ids = np.clip(np.asarray(ids, np.int32)[:, :self.t5_cfg.text_len],
                      0, self.t5_cfg.vocab_size - 1)
        lens = np.minimum(np.asarray(lens, np.int32),
                          self.t5_cfg.text_len)
        txt = self._t5_jit(self.t5_params, ids=jnp.asarray(ids),
                           seq_lens=jnp.asarray(lens))
        cids, _ = self.clip_tokenizer.batch_encode_padded([prompt])
        cids = np.clip(np.asarray(cids, np.int32)[:, :self.clip_cfg.max_len],
                       0, self.clip_cfg.vocab_size - 1)
        _, pooled = self._clip_jit(self.clip_params,
                                   ids=jnp.asarray(cids))
        return txt, pooled.astype(jnp.float32)

    # ------------------------------------------------------------------
    # the reference surface
    # ------------------------------------------------------------------

    def edit(self, image: np.ndarray, prompt: str, *,
             height: Optional[int] = None, width: Optional[int] = None,
             num_inference_steps: int = 28, guidance_scale: float = 2.5,
             seed: int = 0, auto_resize: bool = True) -> np.ndarray:
        """u8 [H, W, 3] + prompt -> edited u8 [height, width, 3].

        Matches the reference call (process_pipepline.py:182-206):
        height/width default to the input size; the conditioning image
        is resized to the closest-aspect preferred bucket first."""
        ih, iw = image.shape[:2]
        height = (height or ih) // 16 * 16
        width = (width or iw) // 16 * 16
        height, width = max(height, 16), max(width, 16)
        # the conditioning image keeps its OWN latent grid — resized to
        # the closest-aspect training bucket (>=64px inputs only; tiny
        # test inputs condition at their native size)
        cond = image
        if auto_resize and min(ih, iw) > 64:
            bh, bw = preferred_resolution(ih, iw)
            if (bh, bw) != (ih, iw):
                cond = _resize_u8(image, bh, bw)
        ch = max(cond.shape[0] // 16 * 16, 16)
        cw = max(cond.shape[1] // 16 * 16, 16)
        if cond.shape[:2] != (ch, cw):
            cond = _resize_u8(cond, ch, cw)

        ds = self.vae_cfg.downsample
        x = (cond.astype(np.float32) / 127.5 - 1.0)[None]
        z_ref = self._vae_enc_jit(self.vae_params, x=jnp.asarray(x))
        ref_tokens = pack_latents(z_ref)
        ref_grid = (ch // ds // 2, cw // ds // 2)

        gh, gw = height // ds // 2, width // ds // 2
        txt, pooled = self.encode_prompt(prompt)
        sigmas = jnp.asarray(
            kontext_sigmas(num_inference_steps, gh * gw), jnp.float32)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, gh * gw, 4 * self.vae_cfg.z_channels), jnp.float32)

        run = self._denoise_fn((gh, gw), ref_grid, txt.shape[1],
                               num_inference_steps)
        lat = run(self.flux_params, noise, ref_tokens, txt, pooled,
                  sigmas, float(guidance_scale))
        z = unpack_latents(lat, (gh, gw))
        img = self._vae_dec_jit(self.vae_params, z=z)
        img = np.asarray(img[0], np.float32)
        return np.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)


class _PaddedTok:
    """Fixed-length adapter over HashTokenizer for the mock pipeline."""

    def __init__(self, tok, seq_len: int):
        self.tok = tok
        self.seq_len = seq_len

    def batch_encode_padded(self, texts):
        return self.tok.batch_encode_padded(texts, seq_len=self.seq_len)


def make_edit_fn(flux_dir: Optional[str] = None,
                 pipeline: Optional[KontextPipeline] = None, *,
                 num_inference_steps: int = 28,
                 guidance_scale: float = 2.5, int8: bool = True,
                 seed: int = 0) -> Callable:
    """The animate-preprocess `edit_fn(image u8, prompt) -> u8` contract
    (data/animate_preprocess.py edit hook; reference guidance 2.5 /
    28 steps, process_pipepline.py:182-206)."""
    if pipeline is None:
        if flux_dir is None:
            raise ValueError("make_edit_fn needs flux_dir or pipeline")
        pipeline = KontextPipeline.from_checkpoint(flux_dir, int8=int8)

    def edit_fn(image: np.ndarray, prompt: str) -> np.ndarray:
        return pipeline.edit(np.asarray(image), prompt,
                             num_inference_steps=num_inference_steps,
                             guidance_scale=guidance_scale, seed=seed)

    return edit_fn
