"""SigLIP2-NaFlex parity tests vs the HF torch implementation.

The reference's default ranking model is google/siglip2-base-patch16-naflex
(eval_understanding.py:42) driven through AutoProcessor (:171-206). These
tests pin every NaFlex-specific behavior against transformers' own
Siglip2Model/Siglip2ImageProcessor at tiny configs (torch CPU oracle, no
network): the max-patches resize rule, the PIL-bilinear patchify pipeline,
the antialiased position-embedding resize, the masked encoder + MAP head,
and the text tower's last-token pooling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univid_tpu.reflection.naflex import (
    NaflexTextConfig,
    NaflexVisionConfig,
    Siglip2NaflexScorer,
    convert_naflex_checkpoint,
    get_image_size_for_max_num_patches,
    naflex_preprocess,
    naflex_text_forward,
    naflex_vision_forward,
    resize_positional_embeddings_np,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# host-side pieces vs their HF/torch equivalents
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(480, 832), (97, 53), (16, 1024),
                                (224, 224), (3, 7)])
def test_resize_rule_matches_hf(hw):
    from transformers.models.siglip2.image_processing_siglip2 import \
        get_image_size_for_max_num_patches as hf_rule

    ours = get_image_size_for_max_num_patches(hw[0], hw[1], 16, 256)
    theirs = hf_rule(hw[0], hw[1], 16, 256)
    assert ours == theirs


@pytest.mark.parametrize("target", [(4, 4), (7, 2), (2, 8), (16, 16),
                                    (31, 2), (1, 5)])
def test_pos_resize_matches_torch_antialias(target):
    """resize_positional_embeddings_np == HF
    Siglip2VisionEmbeddings.resize_positional_embeddings (torch bilinear
    interpolate with antialias=True + row-0 padding), up AND down."""
    from transformers.models.siglip2.modeling_siglip2 import \
        Siglip2VisionEmbeddings

    rng = np.random.default_rng(0)
    grid = rng.normal(size=(16, 16, 8)).astype(np.float32)
    h, w = target
    max_len = 512
    ours = resize_positional_embeddings_np(grid, h, w, max_len)
    theirs = Siglip2VisionEmbeddings.resize_positional_embeddings(
        torch.from_numpy(grid), torch.tensor([[h, w]]), max_length=max_len
    )[0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-5)


def test_preprocess_matches_hf_processor():
    from transformers.models.siglip2.image_processing_siglip2 import \
        Siglip2ImageProcessor

    proc = Siglip2ImageProcessor(patch_size=4, max_num_patches=16)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (37, 61, 3), np.uint8),
            rng.integers(0, 255, (128, 16, 3), np.uint8)]
    hf = proc.preprocess(imgs, return_tensors="np")
    px, shapes, lens = naflex_preprocess(imgs, patch_size=4,
                                         max_num_patches=16)
    np.testing.assert_array_equal(shapes, np.asarray(hf["spatial_shapes"]))
    np.testing.assert_array_equal(
        lens, np.asarray(hf["pixel_attention_mask"]).sum(-1))
    # ours stays u8; HF applies rescale(1/255)+normalize(0.5,0.5) ==
    # x/127.5 - 1 (the device-side normalization)
    ours = px.astype(np.float32) / 127.5 - 1.0
    mask = np.asarray(hf["pixel_attention_mask"])[..., None]
    np.testing.assert_allclose(ours * mask,
                               np.asarray(hf["pixel_values"]) * mask,
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# full-model oracle
# ---------------------------------------------------------------------------


def _tiny_hf_model():
    from transformers import Siglip2Config, Siglip2Model

    cfg = Siglip2Config(
        text_config={"vocab_size": 128, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 4,
                     "max_position_embeddings": 8, "projection_size": 32},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "patch_size": 4, "num_patches": 16,
                       "num_channels": 3},
    )
    torch.manual_seed(0)
    model = Siglip2Model(cfg).eval()
    return model, cfg


def test_oracle_image_and_text_features():
    model, hf_cfg = _tiny_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    vision, vcfg, text, tcfg = convert_naflex_checkpoint(
        sd, vision_heads=4, text_heads=4)
    assert vcfg.num_layers == 2 and vcfg.patch_size == 4
    assert tcfg.proj_dim == 32 and tcfg.max_len == 8

    # ---- image tower ------------------------------------------------------
    from transformers.models.siglip2.image_processing_siglip2 import \
        Siglip2ImageProcessor

    proc = Siglip2ImageProcessor(patch_size=4, max_num_patches=16)
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (23, 41, 3), np.uint8),
            rng.integers(0, 255, (64, 64, 3), np.uint8)]
    hf_in = proc.preprocess(imgs, return_tensors="pt")
    with torch.no_grad():
        ref_img = model.get_image_features(
            pixel_values=hf_in["pixel_values"],
            pixel_attention_mask=hf_in["pixel_attention_mask"],
            spatial_shapes=hf_in["spatial_shapes"]).numpy()

    px, shapes, lens = naflex_preprocess(imgs, 4, 16)
    grid = np.asarray(vision["pos_embed"], np.float32).reshape(4, 4, 32)
    pos = np.stack([resize_positional_embeddings_np(grid, nh, nw, 16)
                    for nh, nw in shapes])
    ours_img = np.asarray(naflex_vision_forward(
        vision, vcfg, jnp.asarray(px), jnp.asarray(pos),
        jnp.asarray(lens)))
    np.testing.assert_allclose(ours_img, ref_img, rtol=2e-4, atol=2e-4)

    # ---- text tower (right padding, mask as key mask, last-token pool) ----
    ids = np.array([[5, 9, 17, 3, 0, 0, 0, 0]], np.int64)
    attn = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        ref_txt = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(attn)).numpy()
    ours_txt = np.asarray(naflex_text_forward(
        text, tcfg, jnp.asarray(ids, jnp.int32),
        kv_len=jnp.asarray([4], jnp.int32)))
    np.testing.assert_allclose(ours_txt, ref_txt, rtol=2e-4, atol=2e-4)


def test_oracle_ranking_order_matches_hf():
    """End-to-end rank_frames vs the reference Siglip2Scorer flow
    (normalize + cosine + topk) through the HF model."""
    model, _ = _tiny_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    vision, vcfg, text, tcfg = convert_naflex_checkpoint(
        sd, vision_heads=4, text_heads=4)

    class TinyTok:
        vocab_size = 128

        def encode(self, s):
            return [ord(c) % 127 + 1 for c in s][:8]

    scorer = Siglip2NaflexScorer(vision_params=vision, vision_cfg=vcfg,
                                 text_params=text, text_cfg=tcfg,
                                 tokenizer=TinyTok())
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (31, 47, 3), np.uint8)
              for _ in range(6)]
    idx, scores = scorer.rank_frames(frames, "a cat", topk=3)
    assert len(idx) == 3 and len(scores) == 3
    assert scores == sorted(scores, reverse=True)

    # reference path through HF
    from transformers.models.siglip2.image_processing_siglip2 import \
        Siglip2ImageProcessor
    proc = Siglip2ImageProcessor(patch_size=4, max_num_patches=16)
    hf_in = proc.preprocess(frames, return_tensors="pt")
    q = TinyTok().encode("a cat")
    ids = np.zeros((1, 8), np.int64)
    ids[0, : len(q)] = q
    attn = (ids != 0).astype(np.int64)
    with torch.no_grad():
        v = model.get_image_features(
            pixel_values=hf_in["pixel_values"],
            pixel_attention_mask=hf_in["pixel_attention_mask"],
            spatial_shapes=hf_in["spatial_shapes"])
        t = model.get_text_features(input_ids=torch.from_numpy(ids),
                                    attention_mask=torch.from_numpy(attn))
        v = torch.nn.functional.normalize(v, dim=-1)
        t = torch.nn.functional.normalize(t, dim=-1)
        sims = (v @ t.T).squeeze(-1).numpy()
    ref_idx = np.argsort(-sims)[:3].tolist()
    assert idx == ref_idx
    np.testing.assert_allclose(scores, sims[ref_idx], rtol=1e-3,
                               atol=1e-3)


def test_reflexion_loop_accepts_naflex_scorer():
    """The reflexion state machine runs unchanged over the NaFlex scorer
    (duck-typed emb_text/emb_imgs/rank_frames)."""
    from univid_tpu.reflection.mmr import mmr_select

    scorer = Siglip2NaflexScorer(
        vision_cfg=NaflexVisionConfig(hidden_size=32,
                                      intermediate_size=64, num_layers=2,
                                      num_heads=4, patch_size=4,
                                      num_patches=16, max_num_patches=16),
        text_cfg=NaflexTextConfig(vocab_size=128, hidden_size=32,
                                  intermediate_size=64, num_layers=2,
                                  num_heads=4, max_len=8, proj_dim=32),
        tokenizer=type("T", (), {
            "vocab_size": 128,
            "encode": lambda self, s: [ord(c) % 127 + 1 for c in s][:8],
        })())
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 255, (24, 36, 3), np.uint8)
              for _ in range(8)]
    v = scorer.emb_imgs(frames)
    q = scorer.emb_text("what happens?")
    assert v.shape == (8, 32) and q.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0,
                               rtol=1e-4)
    sel = mmr_select(v, q, 4, 0.5)
    assert len(sel) == 4


def test_from_checkpoint_roundtrip(tmp_path):
    """save_pretrained dir (config.json + safetensors) -> from_checkpoint
    -> features match the torch model (the CLI's --siglip_ckpt path with
    model_type=siglip2 dispatch)."""
    model, hf_cfg = _tiny_hf_model()
    ckpt = tmp_path / "siglip2_naflex"
    model.save_pretrained(ckpt, safe_serialization=True)

    class TinyTok:
        vocab_size = 128

        def encode(self, s):
            return [ord(c) % 127 + 1 for c in s][:8]

    scorer = Siglip2NaflexScorer.from_checkpoint(str(ckpt),
                                                 tokenizer=TinyTok())
    assert scorer.vision_cfg.num_heads == 4  # from config.json
    assert scorer.text_cfg.num_heads == 4
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (19, 33, 3), np.uint8)]
    v = scorer.emb_imgs(frames)

    from transformers.models.siglip2.image_processing_siglip2 import \
        Siglip2ImageProcessor
    proc = Siglip2ImageProcessor(patch_size=4, max_num_patches=16)
    hf_in = proc.preprocess(frames, return_tensors="pt")
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=hf_in["pixel_values"],
            pixel_attention_mask=hf_in["pixel_attention_mask"],
            spatial_shapes=hf_in["spatial_shapes"])
        ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    np.testing.assert_allclose(v, ref, rtol=2e-4, atol=2e-4)
