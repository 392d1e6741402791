"""Pretrained SigLIP2 scorer ingestion vs the HF torch oracle.

The reference loads an HF AutoModel dual tower for frame ranking
(eval_understanding.py:171-206); round 1 shipped a random-init scorer.
Here a real (tiny) transformers SiglipModel is converted through
load_siglip2_checkpoint and get_text_features / get_image_features are
matched numerically — so rank_frames with real checkpoints carries the
pretrained signal."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import SiglipConfig as HFSiglipConfig  # noqa: E402
from transformers import SiglipModel  # noqa: E402

from univid_tpu.core.checkpoint import load_siglip2_checkpoint  # noqa: E402
from univid_tpu.reflection.scorer import (  # noqa: E402
    Siglip2Scorer,
    map_head_forward,
    siglip_text_forward,
)


@pytest.fixture(scope="module")
def tiny_hf(tmp_path_factory):
    cfg = HFSiglipConfig.from_text_vision_configs(
        transformers.SiglipTextConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16),
        transformers.SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14),
    )
    torch.manual_seed(0)
    model = SiglipModel(cfg).eval()
    path = tmp_path_factory.mktemp("siglip2") / "model.pt"
    torch.save(model.state_dict(), str(path))
    return model, str(path)


def test_text_features_match_hf(tiny_hf):
    model, path = tiny_hf
    parts = load_siglip2_checkpoint(path, vision_heads=2, text_heads=2)
    assert parts["text_cfg"].pooling == "hf_last"

    ids = np.array([[5, 9, 2, 7, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                   np.int64)
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids))
    ref = torch.nn.functional.normalize(ref, dim=-1).numpy()

    got = np.asarray(siglip_text_forward(
        parts["text"], parts["text_cfg"], jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_image_features_match_hf(tiny_hf):
    model, path = tiny_hf
    parts = load_siglip2_checkpoint(path, vision_heads=2, text_heads=2)
    vcfg = parts["vision_cfg"]
    assert (vcfg.image_size, vcfg.patch_size) == (28, 14)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(img).permute(2, 0, 1)[None])
    ref = torch.nn.functional.normalize(ref, dim=-1).numpy()

    scorer = Siglip2Scorer(
        vision_params=parts["vision"], vision_cfg=vcfg,
        text_params=parts["text"], text_cfg=parts["text_cfg"],
        map_head=parts["map_head"], image_size=vcfg.image_size)
    got = scorer.emb_imgs([img])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_rank_frames_uses_pretrained_signal(tiny_hf):
    """End-to-end rank_frames with converted weights reproduces the HF
    similarity ordering."""
    model, path = tiny_hf
    parts = load_siglip2_checkpoint(path, vision_heads=2, text_heads=2)

    class _Tok:
        def encode(self, q):
            return [ord(c) % 120 for c in q][:8]

    scorer = Siglip2Scorer(
        vision_params=parts["vision"], vision_cfg=parts["vision_cfg"],
        text_params=parts["text"], text_cfg=parts["text_cfg"],
        map_head=parts["map_head"], tokenizer=_Tok(),
        image_size=parts["vision_cfg"].image_size)

    rng = np.random.default_rng(1)
    frames = [rng.standard_normal((28, 28, 3)).astype(np.float32)
              for _ in range(5)]
    idx, scores = scorer.rank_frames(frames, "a dog", topk=3)
    assert len(idx) == 3
    assert scores == sorted(scores, reverse=True)

    # HF ordering oracle over the same frames/ids
    ids = np.zeros((1, 16), np.int64)
    enc = _Tok().encode("a dog")
    ids[0, :len(enc)] = enc
    with torch.no_grad():
        t = model.get_text_features(input_ids=torch.from_numpy(ids))
        t = torch.nn.functional.normalize(t, dim=-1)
        v = model.get_image_features(pixel_values=torch.stack(
            [torch.from_numpy(f).permute(2, 0, 1) for f in frames]))
        v = torch.nn.functional.normalize(v, dim=-1)
        sims = (v @ t.T).squeeze(-1).numpy()
    assert list(np.argsort(-sims)[:3]) == idx


def test_raw_uint8_preprocess_matches_hf_processor(tiny_hf):
    """Processor-faithful host preprocessing: raw non-square uint8
    frames through BOTH stacks' full preprocess (HF
    SiglipImageProcessor resize(BICUBIC)+rescale+normalize vs
    scorer._prep + on-device normalize) produce matching embeddings
    and identical rank order (eval_understanding.py:171-206)."""
    from transformers import SiglipImageProcessor

    model, path = tiny_hf
    parts = load_siglip2_checkpoint(path, vision_heads=2, text_heads=2)
    vcfg = parts["vision_cfg"]
    scorer = Siglip2Scorer(
        vision_params=parts["vision"], vision_cfg=vcfg,
        text_params=parts["text"], text_cfg=parts["text_cfg"],
        map_head=parts["map_head"], image_size=vcfg.image_size)

    proc = SiglipImageProcessor(
        size={"height": vcfg.image_size, "width": vcfg.image_size})
    rng = np.random.default_rng(7)
    # smooth-ish frames: random low-res upsampled so bicubic matters
    frames = []
    for _ in range(4):
        small = rng.integers(0, 255, (10, 16, 3), np.uint8)
        big = np.kron(small, np.ones((4, 4, 1))).astype(np.uint8)
        frames.append(big)  # [40, 64, 3] non-square

    x = proc(images=[f for f in frames], return_tensors="pt")
    with torch.no_grad():
        ref = model.get_image_features(pixel_values=x["pixel_values"])
    ref = torch.nn.functional.normalize(ref, dim=-1).numpy()

    got = scorer.emb_imgs(frames)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
    # rank order against a fixed query direction must match exactly
    q = ref[0] + 0.01
    assert list(np.argsort(-(got @ q))) == list(np.argsort(-(ref @ q)))
