"""A14B dual-expert (MoE) pipeline tests: boundary-switched experts with
per-expert CFG (reference text2video.py:169-201,306,341-344) and i2v
y = concat(msk, vae(frame0)) conditioning (image2video.py:289-323)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from univid_tpu.core.config import WAN_CONFIGS
from univid_tpu.models.wan.dit import init_wan_dit
from univid_tpu.models.wan.vae_api import init_wan_vae
from univid_tpu.ops.samplers import flow_sigmas
from univid_tpu.pipelines.moe import WanMoEPipeline, first_frame_mask
from univid_tpu.pipelines.ti2v import WanTI2VPipeline


def _randomize_head(params, key):
    """init_wan_dit zero-inits the output head (reference model.py
    init_weights parity) which makes a fresh DiT predict exactly zero
    velocity; give it random weights so sensitivity tests can see the
    context/CFG influence."""
    w = params["head"]["head"]["w"]
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        key, w.shape, w.dtype)
    return params


def _setup(model="tiny-moe-t2v"):
    spec = WAN_CONFIGS[model]
    low = _randomize_head(init_wan_dit(jax.random.PRNGKey(0), spec.dit),
                          jax.random.PRNGKey(100))
    high = _randomize_head(init_wan_dit(jax.random.PRNGKey(1), spec.dit),
                           jax.random.PRNGKey(101))
    vae = init_wan_vae(jax.random.PRNGKey(2), spec.vae)
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (spec.dit.text_len, spec.dit.text_dim))
    return spec, low, high, vae, ctx


KW = dict(size=(64, 64), frame_num=5, sampling_steps=4, seed=5,
          decode=False)


def test_boundary_schedule():
    """With shift=5 and 4 steps, timesteps ~[999, 937, 833, 625]: the
    0.875 boundary puts steps 0-1 on the high-noise expert."""
    _, ts = flow_sigmas(4, shift=5.0)
    is_high = ts >= 875.0
    assert list(is_high) == [True, True, False, False]


def test_both_experts_used():
    spec, low, high, vae, ctx = _setup()
    nctx = jnp.zeros_like(ctx)
    base = WanMoEPipeline(spec, low, high, vae).generate(ctx, nctx, **KW)

    # perturbing the high expert changes the output...
    high2 = jax.tree.map(lambda x: x + 0.05, high)
    out_h = WanMoEPipeline(spec, low, high2, vae).generate(ctx, nctx, **KW)
    assert np.abs(np.asarray(out_h) - np.asarray(base)).max() > 1e-6
    # ...and so does perturbing the low expert
    low2 = jax.tree.map(lambda x: x + 0.05, low)
    out_l = WanMoEPipeline(spec, low2, high, vae).generate(ctx, nctx, **KW)
    assert np.abs(np.asarray(out_l) - np.asarray(base)).max() > 1e-6


def test_per_expert_guide_scale():
    """guide_scale=(low, high) tuple: changing only the high-noise scale
    changes the output (it applies on boundary steps)."""
    spec, low, high, vae, ctx = _setup()
    nctx = jax.random.normal(jax.random.PRNGKey(9), ctx.shape)
    pipe = WanMoEPipeline(spec, low, high, vae)
    a = pipe.generate(ctx, nctx, guide_scale=(3.0, 4.0), **KW)
    b = pipe.generate(ctx, nctx, guide_scale=(3.0, 7.0), **KW)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_single_expert_matches_ti2v_t2v():
    """With the boundary above every timestep, only the low expert runs
    and the MoE scan must equal the plain TI2V t2v denoise."""
    spec, low, high, vae, ctx = _setup()
    nctx = jnp.zeros_like(ctx)
    spec_low_only = dataclasses.replace(spec, moe_boundary=1.5)
    moe = WanMoEPipeline(spec_low_only, low, high, vae)
    out = moe.generate(ctx, nctx, guide_scale=5.0, shift=5.0, **KW)

    ref = WanTI2VPipeline(spec, low, vae).generate(
        ctx, nctx, guide_scale=5.0, shift=5.0, **KW)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_first_frame_mask_structure():
    m = np.asarray(first_frame_mask(3, 4, 4))
    assert m.shape == (1, 3, 4, 4, 4)
    assert (m[:, 0] == 1.0).all() and (m[:, 1:] == 0.0).all()


def test_i2v_mask_conditioning():
    """i2v: the y channels condition the DiT — a different input frame
    produces a different video; t2v-shaped call raises on in_dim."""
    spec, low, high, vae, ctx = _setup("tiny-moe-i2v")
    nctx = jnp.zeros_like(ctx)
    pipe = WanMoEPipeline(spec, low, high, vae)
    img1 = jnp.ones((64, 64, 3)) * 0.5
    img2 = -jnp.ones((64, 64, 3)) * 0.5
    a = pipe.generate(ctx, nctx, img=img1, **KW)
    b = pipe.generate(ctx, nctx, img=img2, **KW)
    assert a.shape == b.shape
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
