"""FLUX.1-Kontext editor: transformer, text towers, schedule, pipeline.

Covers the TPU rebuild of the reference's canonical-pose image editor
(process_pipepline.py:36-37,179-215 drives diffusers'
FluxKontextPipeline at guidance 2.5 / 28 steps): RoPE-from-ids against
a complex-arithmetic oracle, the resolution-shifted sigma schedule,
manifest==converter proofs at tiny configs, pinned real-scale manifest
regeneration, Kontext reference-image conditioning, and the
animate-preprocess edit_fn contract end-to-end.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core import checkpoint as C
from univid_tpu.core import manifest as M
from univid_tpu.core.config import T5Config
from univid_tpu.core.dtypes import FP32_POLICY
from univid_tpu.models.flux import (TINY_CLIP_TEXT, TINY_FLUX,
                                    ClipTextConfig, FluxConfig,
                                    build_rope_from_ids, clip_text_encode,
                                    flux_forward, image_token_ids,
                                    init_clip_text, init_flux,
                                    pack_latents, timestep_embedding,
                                    unpack_latents)
from univid_tpu.models.wan.t5 import init_t5_encoder, t5_encode
from univid_tpu.ops.rope import apply_rope
from univid_tpu.pipelines.kontext import (FLUX_T5_CONFIG, TINY_FLUX_T5,
                                          KontextPipeline,
                                          calculate_shift, kontext_sigmas,
                                          make_edit_fn,
                                          preferred_resolution)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sd_from_manifest(man):
    rng = np.random.default_rng(0)
    return {k: rng.standard_normal(s).astype(np.float32)
            for k, s in man.items()}


def _assert_template_match(params, template):
    got = jax.tree.map(lambda x: jnp.shape(x), params)
    want = jax.tree.map(lambda x: tuple(x.shape), template)
    assert jax.tree_util.tree_structure(got) == \
        jax.tree_util.tree_structure(want)
    for (pg, g), (pw, w) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want)):
        assert g == w, f"{jax.tree_util.keystr(pg)}: {g} vs {w}"


# ---------------------------------------------------------------------------
# manifests == converters
# ---------------------------------------------------------------------------


def test_flux_manifest_matches_converter():
    cfg = TINY_FLUX
    sd = _sd_from_manifest(M.flux_transformer_manifest(cfg))
    params, leftover = M.audited(
        sd, lambda s: C.convert_flux_transformer(s, cfg, jnp.float32))
    assert leftover == []
    template = jax.eval_shape(lambda k: init_flux(k, cfg),
                              jax.random.PRNGKey(0))
    _assert_template_match(params, template)


def test_t5_hf_manifest_matches_converter():
    cfg = TINY_FLUX_T5
    sd = _sd_from_manifest(M.t5_hf_manifest(cfg))
    params, leftover = M.audited(
        sd, lambda s: C.convert_t5_hf(s, cfg, jnp.float32))
    assert leftover == []
    template = jax.eval_shape(lambda k: init_t5_encoder(k, cfg),
                              jax.random.PRNGKey(0))
    _assert_template_match(params, template)


def test_clip_text_manifest_matches_converter():
    cfg = TINY_CLIP_TEXT
    sd = _sd_from_manifest(M.clip_text_manifest(cfg))
    params, leftover = M.audited(
        sd, lambda s: C.convert_clip_text(s, cfg, jnp.float32))
    assert leftover == []
    template = jax.eval_shape(lambda k: init_clip_text(k, cfg),
                              jax.random.PRNGKey(0))
    _assert_template_match(params, template)


def test_pinned_flux_manifests_regenerate():
    pins = {
        "flux1_kontext_dev": M.flux_transformer_manifest(FluxConfig()),
        "flux_t5_v1_1_xxl": M.t5_hf_manifest(FLUX_T5_CONFIG),
        "flux_clip_l_text": M.clip_text_manifest(ClipTextConfig()),
    }
    for name, man in pins.items():
        path = os.path.join(REPO, "manifests", f"{name}.json")
        with open(path) as fh:
            pinned = {k: tuple(v) for k, v in json.load(fh).items()}
        assert pinned == man, f"{name} manifest drifted"


# ---------------------------------------------------------------------------
# numerics: rope, schedule, time embedding
# ---------------------------------------------------------------------------


def test_rope_from_ids_matches_complex_oracle():
    rng = np.random.default_rng(1)
    axes = (4, 6, 6)
    theta = 10000.0
    ids = np.stack([rng.integers(0, 3, 10), rng.integers(0, 7, 10),
                    rng.integers(0, 7, 10)], axis=-1).astype(np.float64)
    cos, sin = build_rope_from_ids(ids, axes, theta)
    x = rng.standard_normal((1, 10, 2, 16)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

    # independent complex-arithmetic oracle: per axis a, channel pair k
    # rotates by pos_a * theta^(-2k/axes[a])
    want = np.empty_like(x)
    off = 0
    for a, d in enumerate(axes):
        half = d // 2
        inv = theta ** (-np.arange(half) * 2.0 / d)
        ang = ids[:, a:a + 1] * inv[None]                  # [L, half]
        z = (x[..., 2 * off:2 * (off + half):2]
             + 1j * x[..., 2 * off + 1:2 * (off + half):2])
        z = z * np.exp(1j * ang)[None, :, None, :]
        want[..., 2 * off:2 * (off + half):2] = z.real
        want[..., 2 * off + 1:2 * (off + half):2] = z.imag
        off += half
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kontext_sigma_schedule():
    # shift endpoints: base 256 tokens -> mu=0.5, max 4096 -> mu=1.15
    assert abs(calculate_shift(256) - 0.5) < 1e-9
    assert abs(calculate_shift(4096) - 1.15) < 1e-9
    s = kontext_sigmas(28, 4096)
    assert s.shape == (29,)
    assert s[0] == pytest.approx(1.0)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 0)
    # the exponential shift pushes mass toward high sigma
    raw = np.linspace(1.0, 1.0 / 28, 28)
    assert np.all(s[:-1] >= raw - 1e-9)


def test_timestep_embedding_convention():
    t = jnp.asarray([0.25])
    emb = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = 0.25 * 1000.0 * freqs
    np.testing.assert_allclose(emb[0, :half], np.cos(args), atol=1e-5)
    np.testing.assert_allclose(emb[0, half:], np.sin(args), atol=1e-5)


def test_pack_unpack_roundtrip():
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 12, 5)).astype(np.float32))
    tokens = pack_latents(z)
    assert tokens.shape == (2, 4 * 6, 20)
    np.testing.assert_array_equal(np.asarray(unpack_latents(tokens,
                                                            (4, 6))),
                                  np.asarray(z))


# ---------------------------------------------------------------------------
# model forward
# ---------------------------------------------------------------------------


def _tiny_inputs(key, l_txt=6, grid=(4, 4), ref_grid=(4, 4)):
    cfg = TINY_FLUX
    ks = jax.random.split(key, 4)
    l_img = grid[0] * grid[1] + ref_grid[0] * ref_grid[1]
    img = jax.random.normal(ks[0], (1, l_img, cfg.in_channels))
    txt = jax.random.normal(ks[1], (1, l_txt, cfg.context_dim))
    pooled = jax.random.normal(ks[2], (1, cfg.vec_dim))
    ids = np.concatenate([np.zeros((l_txt, 3)),
                          image_token_ids(grid, 0),
                          image_token_ids(ref_grid, 1)])
    rope = build_rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    return cfg, img, txt, pooled, rope


def test_flux_forward_shapes_and_determinism():
    cfg, img, txt, pooled, rope = _tiny_inputs(jax.random.PRNGKey(0))
    params = init_flux(jax.random.PRNGKey(1), cfg)
    t = jnp.asarray([0.7])
    g = jnp.asarray([2.5])
    out = flux_forward(params, cfg, img, txt, t, guidance=g,
                       clip_pooled=pooled, rope_tables=rope,
                       policy=FP32_POLICY)
    assert out.shape == (1, img.shape[1], cfg.out_channels)
    out2 = flux_forward(params, cfg, img, txt, t, guidance=g,
                        clip_pooled=pooled, rope_tables=rope,
                        policy=FP32_POLICY)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # guidance embedding is live: different scale -> different output
    out3 = flux_forward(params, cfg, img, txt, t,
                        guidance=jnp.asarray([7.5]), clip_pooled=pooled,
                        rope_tables=rope, policy=FP32_POLICY)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-6


def test_clip_text_causal_and_pooled():
    cfg = TINY_CLIP_TEXT
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 7, 9, 200, 3, 4, 2, 1]], np.int32)
    h1, p1 = clip_text_encode(params, cfg, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, -1] = 99  # later token must not change earlier hiddens
    h2, _ = clip_text_encode(params, cfg, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(h1[0, :-1]),
                               np.asarray(h2[0, :-1]), atol=1e-5)
    # pooled picks the argmax(ids) (EOT) row
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(h1[0, 3]),
                               atol=1e-6)


def test_t5_shared_pos_uses_layer0_table():
    cfg_shared = TINY_FLUX_T5
    params = init_t5_encoder(jax.random.PRNGKey(0), cfg_shared)
    assert "pos_embedding" in params["blocks"]["0"]
    assert "pos_embedding" not in params["blocks"]["1"]
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg_shared.vocab_size, (1, 8)), jnp.int32)
    out_shared = t5_encode(params, cfg_shared, ids,
                           compute_dtype=jnp.float32)
    # equivalent per-layer model with every table = layer 0's
    cfg_pl = T5Config(**{**cfg_shared.__dict__, "shared_pos": False})
    params_pl = jax.tree.map(lambda x: x, params)
    params_pl["blocks"] = dict(params_pl["blocks"])
    params_pl["blocks"]["1"] = dict(params_pl["blocks"]["1"])
    params_pl["blocks"]["1"]["pos_embedding"] = \
        params["blocks"]["0"]["pos_embedding"]
    out_pl = t5_encode(params_pl, cfg_pl, ids, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_shared),
                               np.asarray(out_pl), atol=1e-6)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


def test_kontext_edit_and_reference_conditioning():
    pipe = KontextPipeline.random_init(policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    img_a = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    img_b = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    out_a = pipe.edit(img_a, "T-pose", num_inference_steps=2, seed=3)
    assert out_a.shape == (48, 64, 3) and out_a.dtype == np.uint8
    # deterministic given (image, prompt, seed)
    np.testing.assert_array_equal(
        out_a, pipe.edit(img_a, "T-pose", num_inference_steps=2, seed=3))
    # the reference image conditions the result through the token
    # sequence (same noise, same prompt, different reference)
    out_b = pipe.edit(img_b, "T-pose", num_inference_steps=2, seed=3)
    assert np.abs(out_a.astype(int) - out_b.astype(int)).max() > 0
    # and the prompt conditions it too
    out_c = pipe.edit(img_a, "arms down by the sides",
                      num_inference_steps=2, seed=3)
    assert np.abs(out_a.astype(int) - out_c.astype(int)).max() > 0


def test_edit_fn_contract_and_preferred_resolution():
    pipe = KontextPipeline.random_init(policy=FP32_POLICY)
    fn = make_edit_fn(pipeline=pipe, num_inference_steps=2)
    img = (np.random.default_rng(1).random((32, 48, 3)) * 255
           ).astype(np.uint8)
    out = fn(img, "standardize the pose")
    assert out.shape == img.shape and out.dtype == np.uint8
    # bucket table: square stays square, wide snaps to a wide bucket
    assert preferred_resolution(1024, 1024) == (1024, 1024)
    bh, bw = preferred_resolution(720, 1280)
    assert bw > bh


def test_preprocess_cli_use_flux_with_kontext_editor(tmp_path):
    """--use_flux drives the real KontextPipeline as edit_fn through
    the preprocess chain (reference preprocess_data.py --use_flux)."""
    import imageio.v2 as imageio
    from univid_tpu.cli.preprocess_animate import main
    from univid_tpu.data.video_io import save_video

    rng = np.random.default_rng(0)
    video = tmp_path / "drive.mp4"
    save_video((rng.random((4, 64, 48, 3)) * 255).astype(np.uint8),
               str(video), fps=8)
    ref = tmp_path / "ref.png"
    imageio.imwrite(str(ref), (rng.random((64, 48, 3)) * 255
                               ).astype(np.uint8))
    out_dir = tmp_path / "prep"
    pipe = KontextPipeline.random_init(policy=FP32_POLICY)
    main(["--video_path", str(video), "--refer_path", str(ref),
          "--save_path", str(out_dir), "--resolution_area", "64", "48",
          "--retarget_flag", "--use_flux", "--mock_detectors"],
         edit_fn=make_edit_fn(pipeline=pipe, num_inference_steps=2))
    assert (out_dir / "src_pose.mp4").exists()


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@requires_8
def test_flux_fsdp_tp_sharded_matches_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from univid_tpu.core.mesh import ALL_AXES
    from univid_tpu.parallel.sharding import (apply_sharding_rules,
                                              flux_param_sharding_rules,
                                              shard_params)

    cfg, img, txt, pooled, rope = _tiny_inputs(jax.random.PRNGKey(2))
    params = init_flux(jax.random.PRNGKey(3), cfg)
    t = jnp.asarray([0.5])
    g = jnp.asarray([2.5])

    def fwd(p):
        return flux_forward(p, cfg, img, txt, t, guidance=g,
                            clip_pooled=pooled, rope_tables=rope,
                            policy=FP32_POLICY)

    want = np.asarray(fwd(params))

    devs = np.asarray(jax.devices()[:8]).reshape(1, 4, 1, 2)
    mesh = Mesh(devs, ALL_AXES)
    sharded, _ = shard_params(params, mesh, flux_param_sharding_rules())
    # every stacked block leaf must actually be sharded (rules hit)
    specs = apply_sharding_rules(params, mesh, flux_param_sharding_rules())
    for path, spec in jax.tree_util.tree_leaves_with_path(specs):
        pstr = jax.tree_util.keystr(path)
        if "qkv/w" in pstr or "linear1/w" in pstr:
            assert spec.spec != P(), f"unsharded hot leaf: {pstr}"
    with mesh:
        got = np.asarray(jax.jit(fwd)(sharded))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
