"""BAGEL model tests: context building, AR decode, image flow gen,
SigLIP, image VAE — tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.models.bagel.autoencoder import (
    ImageVAEConfig,
    image_vae_decode,
    image_vae_encode,
    init_image_vae,
)
from univid_tpu.models.bagel.bagel import (
    BagelConfig,
    flattened_position_ids,
    generate_image_latent,
    generate_text,
    init_bagel,
    init_gen_context,
    sincos_2d_table,
    timestep_embedding,
    unpatchify_latent,
    update_context_text,
    update_context_vit,
)
from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig
from univid_tpu.models.bagel.siglip import (
    SiglipConfig,
    image_to_patches,
    init_siglip,
    siglip_forward,
)

TINY_LLM = Qwen2MoTConfig(
    vocab_size=200, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2)

TINY = BagelConfig(
    llm=TINY_LLM, latent_patch_size=2, max_latent_size=8,
    latent_channel=4, vae_downsample=4, vit_hidden_size=16,
    vit_patch_size=2, vit_max_num_patch_per_side=8,
    start_of_image=190, end_of_image=191, bos_token_id=192,
    eos_token_id=193)


@pytest.fixture(scope="module")
def bagel():
    return init_bagel(jax.random.PRNGKey(0), TINY)


def test_position_helpers():
    pos = flattened_position_ids(2, 3, 8)
    np.testing.assert_array_equal(pos, [0, 1, 2, 8, 9, 10])
    tbl = sincos_2d_table(32, 8)
    assert tbl.shape == (64, 32)
    e = timestep_embedding(jnp.asarray([0.0]), 8)
    np.testing.assert_allclose(np.asarray(e[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e[0, 4:]), 0.0, atol=1e-6)


def test_context_and_decode(bagel):
    ctx = init_gen_context(TINY, capacity=128, dtype=jnp.float32)
    ids = jnp.asarray([192, 5, 6, 7, 193], jnp.int32)
    ctx = update_context_text(bagel, TINY, ctx, ids,
                              compute_dtype=jnp.float32)
    assert int(ctx["cache"]["len"]) == 5
    assert int(ctx["rope"]) == 5

    tokens, length = generate_text(bagel, TINY, ctx, max_length=8,
                                   compute_dtype=jnp.float32)
    assert tokens.shape == (8,)
    assert 1 <= int(length) <= 8
    # deterministic greedy
    tokens2, _ = generate_text(bagel, TINY, ctx, max_length=8,
                               compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_vit_context_update(bagel):
    ctx = init_gen_context(TINY, capacity=128, dtype=jnp.float32)
    vit_embeds = jnp.asarray(np.random.default_rng(0).standard_normal(
        (6, TINY.vit_hidden_size)), jnp.float32)
    pos = jnp.asarray(flattened_position_ids(2, 3, 8))
    ctx = update_context_vit(bagel, TINY, ctx, vit_embeds, pos,
                             compute_dtype=jnp.float32)
    assert int(ctx["cache"]["len"]) == 8  # start + 6 + end
    assert int(ctx["rope"]) == 1  # image advances rope by 1


def test_image_generation(bagel):
    ctx = init_gen_context(TINY, capacity=256, dtype=jnp.float32)
    ids = jnp.asarray([192, 11, 12, 193], jnp.int32)
    ctx = update_context_text(bagel, TINY, ctx, ids,
                              compute_dtype=jnp.float32)
    cfg_text_ctx = init_gen_context(TINY, capacity=256, dtype=jnp.float32)

    # 16x24 pixels -> latent grid 2x3 (downsample 4 * patch 2 = 8)
    lat, grid = generate_image_latent(
        bagel, TINY, ctx, (16, 24), cfg_text_ctx=cfg_text_ctx,
        num_timesteps=3, cfg_text_scale=2.0, cfg_img_scale=1.0,
        compute_dtype=jnp.float32, rng=jax.random.PRNGKey(5))
    assert grid == (2, 3)
    assert lat.shape == (6, TINY.patch_latent_dim)
    assert np.isfinite(np.asarray(lat)).all()
    full = unpatchify_latent(lat, grid, TINY.latent_patch_size,
                             TINY.latent_channel)
    assert full.shape == (4, 6, TINY.latent_channel)


def test_siglip():
    cfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=2,
                       num_heads=2, patch_size=2, image_size=16)
    params = init_siglip(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 6, 3)),
                      jnp.float32)
    patches = image_to_patches(img, 2)
    assert patches.shape == (12, 12)
    pos = jnp.asarray(flattened_position_ids(4, 3, 8))
    out = siglip_forward(params, cfg, patches, pos,
                         compute_dtype=jnp.float32)
    assert out.shape == (12, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_image_vae_roundtrip():
    cfg = ImageVAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=4)
    params = init_image_vae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 16, 16, 3)),
                    jnp.float32)
    z = image_vae_encode(params, cfg, x)
    assert z.shape == (1, 8, 8, 4)  # downsample 2 for 2-level
    y = image_vae_decode(params, cfg, z)
    assert y.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_bucketed_image_context_matches_exact(bagel):
    """Bucketed ViT append (padded patches + n_valid) leaves the cache in
    the same state as the exact-shape path."""
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.utils.tokenizers import HashTokenizer

    scfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                        num_heads=2, patch_size=2, image_size=16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg)
    inf = InterleaveInferencer(bagel, TINY, HashTokenizer(vocab_size=180),
                               siglip_params=sig, siglip_cfg=scfg,
                               capacity=128, compute_dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(2), (6, 8, 3))  # 3x4=12 tok

    ctx_exact = inf.update_context_image(img, inf.init_gen_context(),
                                         bucketed=False)
    ctx_bkt = inf.update_context_image(img, inf.init_gen_context(),
                                       bucketed=True)
    n_rows = int(ctx_exact["cache"]["len"])
    assert int(ctx_bkt["cache"]["len"]) == n_rows == 14  # soi+12+eoi
    for leaf in ("k", "v"):
        a = np.asarray(ctx_exact["cache"][leaf])[:, :n_rows]
        b = np.asarray(ctx_bkt["cache"][leaf])[:, :n_rows]
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_caption_frames_batched_matches_sequential(bagel):
    """vmapped caption_frames == per-frame sequential captioning."""
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.utils.tokenizers import HashTokenizer

    scfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                        num_heads=2, patch_size=2, image_size=16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg)
    inf = InterleaveInferencer(bagel, TINY, HashTokenizer(vocab_size=180),
                               siglip_params=sig, siglip_cfg=scfg,
                               capacity=256, compute_dtype=jnp.float32)
    frames = [jax.random.normal(jax.random.PRNGKey(i), (6, 8, 3))
              for i in range(3)]
    prompt = "describe the frame"

    batched = inf.caption_frames(frames, prompt, max_length=8)
    sequential = [inf(image=f, text=prompt, understanding_output=True,
                      max_think_token_n=8)["text"] for f in frames]
    assert batched == sequential


def test_chat_matches_manual_context_path(bagel):
    """chat() (the reference Bagel.chat eval helper, bagel.py:1003-1075)
    == manually building ViT-only image contexts + prompt + gen_text."""
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.utils.tokenizers import HashTokenizer

    scfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                        num_heads=2, patch_size=2, image_size=16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg)
    inf = InterleaveInferencer(bagel, TINY, HashTokenizer(vocab_size=180),
                               siglip_params=sig, siglip_cfg=scfg,
                               capacity=256, compute_dtype=jnp.float32)
    imgs = [jax.random.normal(jax.random.PRNGKey(i), (6, 8, 3))
            for i in range(2)]
    prompt = "what changed between the frames"

    ans = inf.chat(imgs, prompt, max_length=8)
    ctx = inf.init_gen_context()
    for im in imgs:
        ctx = inf.update_context_image(im, ctx, vae=False)
    ctx = inf.update_context_text(prompt, ctx)
    manual = inf.gen_text(ctx, max_length=8)
    assert ans == manual
    assert isinstance(ans, str)


def test_patchify_latent_roundtrip():
    from univid_tpu.models.bagel.bagel import patchify_latent

    lat = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6, 5)),
                      jnp.float32)
    tok = patchify_latent(lat, 2)
    assert tok.shape == (6, 2 * 2 * 5)
    back = unpatchify_latent(tok, (2, 3), 2, 5)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


def test_vae_context_update(bagel):
    """VAE-latent rows append like the reference forward_cache_update_vae:
    start + n_tok + end rows in the cache, rope advances by exactly 1."""
    from univid_tpu.models.bagel.bagel import update_context_vae

    ctx = init_gen_context(TINY, capacity=128, dtype=jnp.float32)
    # latent grid 4x4 with patch 2 -> 2x2 = 4 tokens
    lat = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 4, TINY.latent_channel)), jnp.float32)
    ctx = update_context_vae(bagel, TINY, ctx, lat,
                             compute_dtype=jnp.float32)
    assert int(ctx["cache"]["len"]) == 6  # soi + 4 + eoi
    assert int(ctx["rope"]) == 1
    assert np.isfinite(np.asarray(ctx["cache"]["k"])[:, :6]).all()


def _editing_inferencer(bagel):
    from univid_tpu.pipelines.interleave import InterleaveInferencer
    from univid_tpu.utils.tokenizers import HashTokenizer

    # llm2vae is zero-init (reference bagel.py:97-100): with it, predicted
    # velocity is identically 0 and conditioning can't reach the output —
    # randomize it so ablations are observable
    bagel = dict(bagel, llm2vae=dict(
        bagel["llm2vae"],
        w=0.1 * jax.random.normal(jax.random.PRNGKey(11),
                                  bagel["llm2vae"]["w"].shape)))
    scfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                        num_heads=2, patch_size=2, image_size=16)
    sig = init_siglip(jax.random.PRNGKey(1), scfg)
    # 3-level VAE: downsample 4 == TINY.vae_downsample, z == latent_channel
    vcfg = ImageVAEConfig(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                          z_channels=TINY.latent_channel)
    vae = init_image_vae(jax.random.PRNGKey(2), vcfg)
    return InterleaveInferencer(
        bagel, TINY, HashTokenizer(vocab_size=180), siglip_params=sig,
        siglip_cfg=scfg, vae_params=vae, vae_cfg=vcfg, capacity=256,
        compute_dtype=jnp.float32)


def test_editing_e2e_image_to_edited_image(bagel):
    """interleave_inference([image, edit_text]) — the BAGEL-native editing
    path (reference influencer.py:264-299 with vae=True) — returns a
    finite image of the input's shape."""
    inf = _editing_inferencer(bagel)
    img = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (16, 16, 3)),
                      jnp.float32)
    out = inf.interleave_inference([img, "make it red"], num_timesteps=3,
                                   cfg_text_scale=2.0, cfg_img_scale=1.5,
                                   rng=jax.random.PRNGKey(7))
    imgs = [o for o in out if not isinstance(o, str)]
    assert len(imgs) == 1
    assert imgs[0].shape == (16, 16, 3)
    assert np.isfinite(np.asarray(imgs[0])).all()


def test_editing_vae_rows_condition_the_output(bagel):
    """Ablation: the generated image must CHANGE when the VAE-latent rows
    are removed from the context — proves the conditioning includes the
    VAE tower, not just ViT (VERDICT r2 missing #1)."""
    inf = _editing_inferencer(bagel)
    img = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (16, 16, 3)),
                      jnp.float32)

    def gen(with_vae):
        ctx = inf.init_gen_context()
        ctx = inf.update_context_image(img, ctx, vae=with_vae)
        ctx = inf.update_context_text("edit", ctx)
        return np.asarray(inf.gen_image(
            (16, 16), ctx, num_timesteps=3, cfg_text_scale=1.0,
            cfg_img_scale=1.0, rng=jax.random.PRNGKey(9)))

    a, b = gen(True), gen(False)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.max(np.abs(a - b)) > 1e-6
