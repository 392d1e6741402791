"""Video VAE tests: stream/full-sequence equivalence, shapes, causality.

The key invariant: the chunked streaming path (reference feat_cache
semantics, vae2_2.py:112-235) must produce EXACTLY the same output as the
full-sequence path — that's the mathematical re-derivation the TPU
implementation rests on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core.config import WanVAEConfig
from univid_tpu.models.wan.vae import (
    Stream,
    causal_conv_stream,
    time_down_conv,
    time_up_conv,
)
from univid_tpu.models.wan.vae_api import (
    init_wan_vae,
    spatial_patchify,
    spatial_unpatchify,
    vae_decode,
    vae_encode,
)

TINY = WanVAEConfig(
    dim=8, dec_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
    temporal_downsample=(False, True, True), spatial_patch=2,
)


@pytest.fixture(scope="module")
def vae_params():
    return init_wan_vae(jax.random.PRNGKey(0), TINY)


def _video(t=9, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)), jnp.float32)


def test_patchify_roundtrip():
    x = _video(5, 16, 16)
    p = spatial_patchify(x, 2)
    assert p.shape == (1, 5, 8, 8, 12)
    np.testing.assert_allclose(np.asarray(spatial_unpatchify(p, 2)),
                               np.asarray(x))


def test_causal_conv_stream_equivalence():
    """Chunked causal conv == one causal conv over the full stream."""
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 3, 4, 6)) * 0.1,
                          jnp.float32),
         "b": jnp.zeros((6,), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((1, 9, 8, 8, 4)), jnp.float32)
    full = causal_conv_stream(p, x, None)
    s = Stream(None)
    y0 = causal_conv_stream(p, x[:, :1], s)
    outs = [y0]
    cache = s.done()
    for i in range(2):
        s = Stream(cache)
        outs.append(causal_conv_stream(p, x[:, 1 + 4 * i:1 + 4 * (i + 1)],
                                       s))
        cache = s.done()
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_time_down_conv_equivalence():
    rng = np.random.default_rng(2)
    p = {"w": jnp.asarray(rng.standard_normal((3, 1, 1, 4, 4)) * 0.1,
                          jnp.float32),
         "b": jnp.zeros((4,), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((1, 9, 4, 4, 4)), jnp.float32)
    full = time_down_conv(p, x, None)
    s = Stream(None)
    outs = [time_down_conv(p, x[:, :1], s)]
    cache = s.done()
    for i in range(2):
        s = Stream(cache)
        outs.append(time_down_conv(p, x[:, 1 + 4 * i:1 + 4 * (i + 1)], s))
        cache = s.done()
    chunked = jnp.concatenate(outs, axis=1)
    assert full.shape[1] == 5  # 1 + (9-3)//2 + 1
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_time_up_conv_equivalence():
    rng = np.random.default_rng(3)
    c = 4
    p = {"w": jnp.asarray(rng.standard_normal((3, 1, 1, c, 2 * c)) * 0.1,
                          jnp.float32),
         "b": jnp.zeros((2 * c,), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((1, 5, 4, 4, c)), jnp.float32)
    full = time_up_conv(p, x, None)
    s = Stream(None)
    outs = [time_up_conv(p, x[:, :1], s)]
    cache = s.done()
    for i in range(1, 5):
        s = Stream(cache)
        outs.append(time_up_conv(p, x[:, i:i + 1], s))
        cache = s.done()
    chunked = jnp.concatenate(outs, axis=1)
    assert full.shape[1] == 1 + 2 * 4
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_encode_shapes(vae_params):
    x = _video(t=9, h=32, w=32)
    z = vae_encode(vae_params, TINY, x)
    # stride (4, 16, 16): T 9->3, H/W 32->2
    assert z.shape == (1, 3, 2, 2, TINY.z_dim)
    assert np.isfinite(np.asarray(z)).all()


def test_encode_streaming_equals_full(vae_params):
    x = _video(t=9, h=32, w=32)
    z_s = vae_encode(vae_params, TINY, x, streaming=True)
    z_f = vae_encode(vae_params, TINY, x, streaming=False)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_f), rtol=1e-4,
                               atol=1e-4)


def test_decode_shapes_and_range(vae_params):
    z = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 3, 2, 2, TINY.z_dim)),
        jnp.float32)
    v = vae_decode(vae_params, TINY, z)
    assert v.shape == (1, 9, 32, 32, 3)
    arr = np.asarray(v)
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_decode_streaming_equals_full(vae_params):
    z = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 3, 2, 2, TINY.z_dim)),
        jnp.float32)
    v_s = vae_decode(vae_params, TINY, z, streaming=True)
    v_f = vae_decode(vae_params, TINY, z, streaming=False)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_f), rtol=1e-4,
                               atol=1e-4)


def test_encode_causality(vae_params):
    """Changing future frames must not change earlier latents (causal
    convs, vae2_2.py:17-42)."""
    x1 = _video(t=9, h=32, w=32, seed=7)
    x2 = x1.at[:, 5:].set(0.5)
    z1 = vae_encode(vae_params, TINY, x1)
    z2 = vae_encode(vae_params, TINY, x2)
    # frames 0..4 identical -> latents 0 (frame 0) identical; latent 1
    # covers frames 1-4, also identical
    np.testing.assert_allclose(np.asarray(z1[:, :2]), np.asarray(z2[:, :2]),
                               rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(z1[:, 2]), np.asarray(z2[:, 2]))


def test_decode_chunked_equals_full(vae_params):
    """decode_chunk > 1 (multi-frame scan steps) keeps streaming==full
    exactly — the causal feat-cache carries across any chunking."""
    import dataclasses

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 5, 4, 4, TINY.z_dim)),
                    jnp.float32)
    full = vae_decode(vae_params, TINY, z, streaming=False)
    for ck in (2, 4):
        cfg = dataclasses.replace(TINY, decode_chunk=ck)
        out = vae_decode(vae_params, cfg, z, streaming=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=2e-4, atol=2e-4)
