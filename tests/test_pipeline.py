"""Tiny end-to-end TI2V pipeline tests (SURVEY.md §4d): 2-layer DiT, tiny
VAE, few-step generation; determinism + i2v first-frame conditioning."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core.config import (
    GenerationConfig,
    TMAConfig,
    WanDiTConfig,
    WanModelSpec,
    WanVAEConfig,
    dit_seq_len,
    latent_shape,
)
from univid_tpu.core.dtypes import FP32_POLICY
from univid_tpu.models.wan.dit import init_wan_dit
from univid_tpu.models.wan.vae_api import init_wan_vae
from univid_tpu.pipelines.ti2v import WanTI2VPipeline


def tiny_spec():
    dit = WanDiTConfig(
        model_type="ti2v", in_dim=4, out_dim=4, dim=64, ffn_dim=128,
        freq_dim=32, text_dim=32, num_heads=4, num_layers=2, text_len=8,
    )
    vae = WanVAEConfig(
        dim=8, dec_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
        temporal_downsample=(False, True, True), spatial_patch=2,
    )
    gen = GenerationConfig(size=(32, 32), frame_num=5, sampling_steps=4)
    return WanModelSpec(name="tiny", dit=dit, vae=vae, generation=gen)


@pytest.fixture(scope="module")
def pipe():
    spec = tiny_spec()
    dit_params = init_wan_dit(jax.random.PRNGKey(0), spec.dit)
    # randomize the zero-init head so outputs are non-trivial
    pt, ph, pw = spec.dit.patch_size
    dit_params["head"]["head"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9), (spec.dit.dim, pt * ph * pw *
                                spec.dit.out_dim)) * 0.05
    vae_params = init_wan_vae(jax.random.PRNGKey(1), spec.vae)
    return WanTI2VPipeline(spec, dit_params, vae_params, policy=FP32_POLICY)


def _ctx(spec, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (spec.dit.text_len, spec.dit.text_dim)), jnp.float32)


def test_latent_math():
    spec = tiny_spec()
    assert latent_shape(spec, 32, 32, 5) == (4, 2, 2, 2)
    assert dit_seq_len(spec, 32, 32, 5) == 2  # 2x2 latent / 2x2 patch * 2f


def test_t2v_shapes_and_determinism(pipe):
    spec = pipe.spec
    ctx, nctx = _ctx(spec, 0), _ctx(spec, 1)
    v1 = pipe.generate(ctx, nctx, size=(32, 32), frame_num=5,
                       sampling_steps=4, seed=7)
    v2 = pipe.generate(ctx, nctx, size=(32, 32), frame_num=5,
                       sampling_steps=4, seed=7)
    assert v1.shape == (5, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    arr = np.asarray(v1)
    assert np.isfinite(arr).all() and arr.min() >= -1 and arr.max() <= 1
    # different seed -> different video
    v3 = pipe.generate(ctx, nctx, size=(32, 32), frame_num=5,
                       sampling_steps=4, seed=8)
    assert not np.allclose(np.asarray(v1), np.asarray(v3))


def test_t2v_latent_only(pipe):
    spec = pipe.spec
    x0 = pipe.generate(_ctx(spec, 0), _ctx(spec, 1), size=(32, 32),
                       frame_num=5, sampling_steps=4, seed=7, decode=False)
    assert x0.shape == (1, 2, 2, 2, 4)


def test_tma_changes_output(pipe):
    spec = pipe.spec
    ctx, nctx = _ctx(spec, 0), _ctx(spec, 1)
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=4, seed=7,
              decode=False)
    base = pipe.generate(ctx, nctx, **kw)
    tma = TMAConfig(enabled=True, weight_max=1.5, text_prefix_len=8)
    with_tma = pipe.generate(ctx, nctx, tma=tma, **kw)
    assert not np.allclose(np.asarray(base), np.asarray(with_tma))


def test_i2v_first_frame_clamped(pipe):
    spec = pipe.spec
    ctx, nctx = _ctx(spec, 0), _ctx(spec, 1)
    img = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (32, 32, 3)),
                      jnp.float32)
    x0 = pipe.generate(ctx, nctx, size=(32, 32), frame_num=5,
                       sampling_steps=4, seed=7, img=img, decode=False)
    from univid_tpu.models.wan.vae_api import vae_encode
    z0 = vae_encode(pipe.vae_params, spec.vae, img[None, None])
    # first latent frame must equal the encoded image latent exactly
    np.testing.assert_allclose(np.asarray(x0[:, 0]), np.asarray(z0[:, 0]),
                               rtol=1e-5, atol=1e-5)


def test_dpm_solver_runs(pipe):
    spec = pipe.spec
    v = pipe.generate(_ctx(spec, 0), _ctx(spec, 1), size=(32, 32),
                      frame_num=5, sampling_steps=4, seed=7,
                      sample_solver="dpm++", decode=False)
    assert np.isfinite(np.asarray(v)).all()


def test_taylorseer_threshold1_exact(pipe):
    """fresh_threshold=1 makes every step a full DiT forward — the
    cached path must reproduce the plain loop bit-for-bit (the same
    exact-at-threshold-1 pin the BAGEL-side TaylorSeer tests carry)."""
    spec = pipe.spec
    ctx, nctx = _ctx(spec, 0), _ctx(spec, 1)
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=6, seed=3,
              decode=False)
    base = np.asarray(pipe.generate(ctx, nctx, **kw))
    ts1 = np.asarray(pipe.generate(ctx, nctx, taylorseer_threshold=1,
                                   **kw))
    np.testing.assert_array_equal(base, ts1)


def test_taylorseer_threshold3_bounded(pipe):
    """threshold=3 skips DiT forwards (Taylor-extrapolated velocity);
    the result differs from the exact loop but stays finite and in the
    same range — the quality/speed tradeoff knob, off by default."""
    spec = pipe.spec
    ctx, nctx = _ctx(spec, 0), _ctx(spec, 1)
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=8, seed=3,
              decode=False)
    base = np.asarray(pipe.generate(ctx, nctx, **kw))
    ts3 = np.asarray(pipe.generate(ctx, nctx, taylorseer_threshold=3,
                                   **kw))
    assert np.isfinite(ts3).all()
    assert not np.array_equal(base, ts3)  # it does skip forwards
    # extrapolation error stays bounded at tiny scale
    denom = np.abs(base).mean() + 1e-6
    assert np.abs(ts3 - base).mean() / denom < 1.0


def test_chunked_dispatch_matches_single(pipe):
    """The chunked denoise dispatcher (bounded device executes,
    pipelines/ti2v.py run()) is bit-identical to one whole-schedule
    dispatch, including a remainder chunk (7 steps @ k=2 -> 2,2,2,1)
    and the donated solver-state/Taylor-factor buffers."""
    kw = dict(size=(32, 32), frame_num=5, sampling_steps=7, seed=11,
              decode=False)
    ctx, nctx = _ctx(pipe.spec, 0), _ctx(pipe.spec, 1)
    old = pipe.dispatch_steps
    try:
        pipe.dispatch_steps = 0
        type(pipe)._denoise_fn.cache_clear()
        whole = np.asarray(pipe.generate(ctx, nctx, **kw))
        pipe.dispatch_steps = 2
        type(pipe)._denoise_fn.cache_clear()
        chunked = np.asarray(pipe.generate(ctx, nctx, **kw))
        # and with TaylorSeer factors riding across chunk boundaries
        pipe.dispatch_steps = 0
        type(pipe)._denoise_fn.cache_clear()
        whole_ts = np.asarray(pipe.generate(
            ctx, nctx, taylorseer_threshold=3, **kw))
        pipe.dispatch_steps = 2
        type(pipe)._denoise_fn.cache_clear()
        chunk_ts = np.asarray(pipe.generate(
            ctx, nctx, taylorseer_threshold=3, **kw))
    finally:
        pipe.dispatch_steps = old
        type(pipe)._denoise_fn.cache_clear()
    np.testing.assert_array_equal(whole, chunked)
    np.testing.assert_array_equal(whole_ts, chunk_ts)


def test_output_u8_matches_host_conversion(pipe):
    """output_u8 fuses save_video's u8 formula into the decode program;
    device u8 frames must equal the host-converted float frames."""
    spec = pipe.spec
    ctx, nctx = _ctx(spec, 0), _ctx(spec, 1)
    vf = np.asarray(pipe.generate(ctx, nctx, size=(32, 32), frame_num=5,
                                  sampling_steps=2, seed=3))
    v8 = np.asarray(pipe.generate(ctx, nctx, size=(32, 32), frame_num=5,
                                  sampling_steps=2, seed=3,
                                  output_u8=True))
    assert v8.dtype == np.uint8 and v8.shape == vf.shape
    want = ((np.clip(vf, -1, 1) + 1) * 127.5).round().astype(np.uint8)
    # float->u8 rounding at the exact .5 boundary may differ by 1 LSB
    # between XLA and numpy; everything else must be identical
    diff = np.abs(v8.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
