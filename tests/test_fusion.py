"""Fusion layer tests: projector shapes/interp, training loss, fusion
pipeline end-to-end with a mock BAGEL extractor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core.config import FusionConfig, TMAConfig
from univid_tpu.models.fusion.projector import (
    adapt_sequence_length,
    context_projector_forward,
    init_context_projector,
    projector_training_loss,
)
from univid_tpu.pipelines.fusion import FusionPipeline

from tests.test_pipeline import tiny_spec, pipe  # noqa: F401  (fixture)


SMALL = FusionConfig(bagel_hidden_dim=24, wan_text_dim=32,
                     wan_text_length=8, bagel_sequence_length=8,
                     projector_hidden_mult=2)


def test_adapt_sequence_length_identity_and_interp():
    x = jnp.arange(8.0).reshape(1, 4, 2)
    np.testing.assert_allclose(np.asarray(adapt_sequence_length(x, 4)),
                               np.asarray(x))
    # doubling: align_corners=False linear interp oracle vs torch semantics
    up = adapt_sequence_length(x, 8)
    assert up.shape == (1, 8, 2)
    # first/last samples clamp to the edge values
    np.testing.assert_allclose(np.asarray(up[0, 0]), np.asarray(x[0, 0]))
    np.testing.assert_allclose(np.asarray(up[0, -1]), np.asarray(x[0, -1]))
    # midpoints: pos for i=2 -> (2.5)*0.5-0.5 = 0.75 -> 0.25*x0+0.75*x1
    np.testing.assert_allclose(np.asarray(up[0, 2]),
                               0.25 * np.asarray(x[0, 0])
                               + 0.75 * np.asarray(x[0, 1]), rtol=1e-6)


def test_adapt_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 3)).astype(np.float32)
    got = np.asarray(adapt_sequence_length(jnp.asarray(x), 12))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).transpose(1, 2), size=12, mode="linear",
        align_corners=False).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_projector_forward():
    params = init_context_projector(jax.random.PRNGKey(0), SMALL)
    tokens = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 20, 24)), jnp.float32)
    out = context_projector_forward(params, SMALL, tokens)
    assert out.shape == (1, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_projector_training_loss():
    params = init_context_projector(jax.random.PRNGKey(0), SMALL)
    tokens = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 20, 24)), jnp.float32)
    sup = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 8, 32)), jnp.float32)
    losses = projector_training_loss(params, SMALL, tokens, sup)
    for k in ("total_loss", "semantic_loss", "l2_reg", "diversity_loss"):
        assert np.isfinite(float(losses[k])), k
    # gradients flow
    g = jax.grad(lambda p: projector_training_loss(
        p, SMALL, tokens, sup)["total_loss"])(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0


def test_fusion_pipeline_end_to_end(pipe):  # noqa: F811
    spec = pipe.spec
    fcfg = FusionConfig(
        bagel_hidden_dim=24, wan_text_dim=spec.dit.text_dim,
        wan_text_length=spec.dit.text_len, bagel_sequence_length=4)
    proj = init_context_projector(jax.random.PRNGKey(2), fcfg)

    def mock_extractor(text, image):
        seed = abs(hash(text)) % (2 ** 31)
        return jnp.asarray(np.random.default_rng(seed).standard_normal(
            (10, 24)), jnp.float32)

    fp = FusionPipeline(pipe, proj, fcfg, bagel_extractor=mock_extractor)
    video = fp.generate_video_with_bagel_context(
        "a cat", size=(32, 32), frame_num=5, sampling_steps=4, seed=3)
    assert video.shape == (5, 32, 32, 3)
    assert np.isfinite(np.asarray(video)).all()
    # different prompt -> different bagel tokens -> different video
    v2 = fp.generate_video_with_bagel_context(
        "a dog", size=(32, 32), frame_num=5, sampling_steps=4, seed=3)
    assert not np.allclose(np.asarray(video), np.asarray(v2))
