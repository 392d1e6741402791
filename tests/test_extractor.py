"""BagelSemanticExtractor: the bucketed/jitted towers must match the
straightline eager composition exactly (reference semantics:
model_pipeline.py:942-946 text embeds, :1003-1018 image ViT->connector
->pos-embed, :1361-1504 pad/truncate to 256) across bucket boundaries,
truncation, and the text-only / image+text paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core import nn
from univid_tpu.models.bagel.bagel import (BagelConfig,
                                           flattened_position_ids,
                                           init_bagel)
from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig
from univid_tpu.models.bagel.siglip import (SiglipConfig, image_to_patches,
                                            init_siglip, siglip_forward,
                                            vit_aligned_resize)
from univid_tpu.models.fusion.extractor import BagelSemanticExtractor
from univid_tpu.utils.tokenizers import HashTokenizer


@pytest.fixture(scope="module")
def setup():
    llm = Qwen2MoTConfig(vocab_size=4096, hidden_size=64,
                         intermediate_size=128, num_layers=2,
                         num_heads=4, num_kv_heads=2)
    cfg = BagelConfig(llm=llm, vit_hidden_size=32, vit_patch_size=14,
                     start_of_image=4090, end_of_image=4091,
                     bos_token_id=4092, eos_token_id=4093)
    scfg = SiglipConfig(hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=2, patch_size=14,
                        image_size=224)
    params = init_bagel(jax.random.PRNGKey(10), cfg)
    sig = init_siglip(jax.random.PRNGKey(11), scfg)
    tok = HashTokenizer(4090)
    ex = BagelSemanticExtractor(params, cfg, tok, siglip_params=sig,
                                siglip_cfg=scfg,
                                compute_dtype=jnp.float32)
    return ex, params, sig, cfg, scfg, tok


def _eager_ref(setup, text, image=None):
    """Unbucketed eager composition — the pre-round-4 implementation."""
    ex, params, sig, cfg, scfg, tok = setup
    parts = []
    if image is not None:
        img = vit_aligned_resize(image, scfg.patch_size, scfg.image_size)
        patches = image_to_patches(img, scfg.patch_size)
        h_p = img.shape[0] // scfg.patch_size
        w_p = img.shape[1] // scfg.patch_size
        pos = jnp.asarray(flattened_position_ids(
            h_p, w_p, cfg.vit_max_num_patch_per_side))
        feats = siglip_forward(sig, scfg, patches, pos,
                               compute_dtype=jnp.float32)
        t = nn.linear(params["connector"]["fc0"], feats,
                      compute_dtype=jnp.float32)
        t = nn.gelu_tanh(t)
        t = nn.linear(params["connector"]["fc1"], t,
                      compute_dtype=jnp.float32)
        parts.append(t + params["vit_pos_embed"][pos]
                     .astype(jnp.float32))
    ids = [cfg.bos_token_id] + tok.encode(text) + [cfg.eos_token_id]
    parts.append(params["llm"]["embed_tokens"][jnp.asarray(ids)]
                 .astype(jnp.float32))
    t = jnp.concatenate(parts, 0)
    n = t.shape[0]
    if n >= 256:
        return t[:256]
    return jnp.concatenate(
        [t, jnp.zeros((256 - n, t.shape[1]))], 0)


@pytest.mark.parametrize("name,text,img_hw", [
    ("text-short", "a cat", None),
    # crosses the 16 -> 64 text bucket and pads inside the bucket
    ("text-bucket", " ".join(["word"] * 40), None),
    # text longer than target_len: truncation inside the masked program
    ("text-trunc", " ".join(["word"] * 300), None),
    ("img+text", "a cat on a mat", (100, 180)),
    # image tokens alone exceed target_len: image-only truncation
    ("bigimg", "hi", (500, 700)),
])
def test_bucketed_matches_eager(setup, name, text, img_hw):
    ex = setup[0]
    image = None
    if img_hw is not None:
        rng = np.random.RandomState(hash(name) % 2 ** 31)
        image = jnp.asarray(
            rng.uniform(-1, 1, (*img_hw, 3)).astype(np.float32))
    got = np.asarray(ex(text, image))
    want = np.asarray(_eager_ref(setup, text, image))
    assert got.shape == (256, 64)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_same_bucket_lengths_share_one_program(setup):
    """Two prompts in the same text bucket must hit the same compiled
    assemble program (the per-length remote-compile hazard)."""
    ex = setup[0]
    ex("one two three")
    before = ex._jit_assemble._cache_size()
    ex("four five six seven")  # same 16-bucket
    assert ex._jit_assemble._cache_size() == before
