"""Trainer tests: trains UniVid's actual trainables (projector + LoRA),
loss decreases on a smoke run, checkpoint round-trips, diffusion step
leaves the frozen base untouched. Reference: model_pipeline.py:3232-3439,
2528-2548, 2765-3142."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from univid_tpu.core.config import FusionConfig, WAN_CONFIGS
from univid_tpu.data.openvid import OpenVidConfig, OpenVidDataset
from univid_tpu.models.wan.dit import init_wan_dit
from univid_tpu.models.wan.vae_api import init_wan_vae
from univid_tpu.train.fusion_trainer import (
    FusionTrainConfig,
    init_fusion_train_state,
    load_train_state,
    make_diffusion_train_step,
    make_semantic_train_step,
    save_train_state,
    train_cross_attention_fusion,
)
from univid_tpu.train.lora import LoRAConfig


FUSION = FusionConfig(bagel_hidden_dim=16, wan_text_dim=24,
                      wan_text_length=8, bagel_sequence_length=6,
                      projector_hidden_mult=2)


def _fake_encoders():
    def extract(caption):
        key = jax.random.PRNGKey(abs(hash(caption)) % 2 ** 31)
        return jax.random.normal(key, (6, FUSION.bagel_hidden_dim))

    def supervise(caption):
        key = jax.random.PRNGKey(abs(hash(caption + "t5")) % 2 ** 31)
        return jax.random.normal(key, (8, FUSION.wan_text_dim))

    return extract, supervise


def test_semantic_smoke_train_decreases_loss(tmp_path):
    """20-step semantic train on synthetic captions: loss goes down."""
    cfg = FusionTrainConfig(max_steps=20, save_interval=10,
                            learning_rate=3e-3, train_lora=False)
    extract, supervise = _fake_encoders()
    dataset = [{"caption": f"a video of thing number {i}"}
               for i in range(4)]
    out = train_cross_attention_fusion(
        dataset, extract, supervise, FUSION, cfg, str(tmp_path))
    assert out["steps"] == 20
    first = np.mean(out["losses"][:4])
    last = np.mean(out["losses"][-4:])
    assert last < first, (first, last)
    assert os.path.exists(tmp_path / "latest" / "train_state.npz")


def test_checkpoint_resume_roundtrip(tmp_path):
    cfg = FusionTrainConfig(max_steps=10, save_interval=5,
                            train_lora=False)
    extract, supervise = _fake_encoders()
    dataset = [{"caption": "caption one"}, {"caption": "caption two"}]
    out1 = train_cross_attention_fusion(
        dataset, extract, supervise, FUSION, cfg, str(tmp_path))
    assert out1["steps"] == 10

    # resume continues from step 10 to the raised cap
    cfg2 = FusionTrainConfig(max_steps=14, save_interval=5,
                             train_lora=False)
    out2 = train_cross_attention_fusion(
        dataset, extract, supervise, FUSION, cfg2, str(tmp_path))
    assert out2["steps"] == 14
    assert len(out2["losses"]) == 4  # only the new steps ran


def test_save_load_state_identical(tmp_path):
    cfg = FusionTrainConfig(max_steps=5, train_lora=False)
    state, tx, _ = init_fusion_train_state(jax.random.PRNGKey(0), FUSION,
                                           cfg)
    step = make_semantic_train_step(FUSION, tx)
    bt = jax.random.normal(jax.random.PRNGKey(1),
                           (1, 6, FUSION.bagel_hidden_dim))
    sup = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 8, FUSION.wan_text_dim))
    state, _, _ = step(state, bt, sup)
    save_train_state(str(tmp_path / "ck"), state)

    template, _, _ = init_fusion_train_state(jax.random.PRNGKey(7),
                                             FUSION, cfg)
    restored = load_train_state(str(tmp_path / "ck"), template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diffusion_step_trains_lora_and_projector_only():
    """The diffusion path updates projector+LoRA and decreases loss while
    the frozen DiT base/VAE stay byte-identical."""
    spec = WAN_CONFIGS["tiny"]
    fusion = FusionConfig(bagel_hidden_dim=16,
                          wan_text_dim=spec.dit.text_dim,
                          wan_text_length=spec.dit.text_len,
                          bagel_sequence_length=6, projector_hidden_mult=2)
    tcfg = FusionTrainConfig(max_steps=8, learning_rate=3e-3,
                             train_lora=True)
    base = init_wan_dit(jax.random.PRNGKey(0), spec.dit)
    # the zero-init output head (reference init_weights parity) blocks
    # all gradient flow on a fresh model — give it weights as a real
    # checkpoint would have
    base["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(50), base["head"]["head"]["w"].shape)
    vae = init_wan_vae(jax.random.PRNGKey(1), spec.vae)
    base_snapshot = jax.tree_util.tree_map(np.asarray, base)

    state, tx, lora_tmpl = init_fusion_train_state(
        jax.random.PRNGKey(2), fusion, tcfg, dit_cfg=spec.dit,
        lora_cfg=LoRAConfig(rank=2, target_strategy="cross_attention_only"))
    from univid_tpu.core.config import latent_shape
    _, f, h, w = latent_shape(spec, 64, 64, 5)
    step, encode = make_diffusion_train_step(
        spec, fusion, tcfg, tx, base, vae, (f, h, w),
        lora_template=lora_tmpl)

    video = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 64, 64, 3))
    latents = encode(video)
    assert latents.shape[1:] == (f, h, w, spec.vae.z_dim)
    batch = {
        "latents": latents,
        "bagel_tokens": jax.random.normal(jax.random.PRNGKey(4),
                                          (1, 6, 16)),
        "noise": jax.random.normal(jax.random.PRNGKey(5), latents.shape),
        "t": jnp.array([400.0]),
    }
    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    # frozen base unchanged; LoRA B no longer all-zero
    for a, b in zip(jax.tree_util.tree_leaves(base_snapshot),
                    jax.tree_util.tree_leaves(base)):
        np.testing.assert_array_equal(a, np.asarray(b))
    lora_b = state["trainable"]["lora"]["cross_attn/q"]["b"]
    assert np.abs(np.asarray(lora_b)).max() > 0


def test_openvid_dataset_fallback_and_filters(tmp_path):
    """No CSV -> file-derived records; CSV filters drop low-quality rows
    (model_pipeline.py:1966-1990)."""
    vids = tmp_path / "videos"
    vids.mkdir()
    from univid_tpu.data.video_io import save_video
    for i in range(3):
        frames = (np.random.rand(8, 32, 32, 3) * 255).astype(np.uint8)
        save_video(frames, str(vids / f"vid{i}.mp4"), fps=8)

    cfg = OpenVidConfig(video_base_path=str(vids),
                        csv_file=str(tmp_path / "missing.csv"),
                        video_size=(32, 32), video_length=6)
    ds = OpenVidDataset(cfg)
    assert len(ds) == 3
    s = ds[0]
    assert s["video"].shape == (6, 32, 32, 3)
    assert s["video"].min() >= -1.0 and s["video"].max() <= 1.0
    assert "High quality video content" in s["caption"]

    # CSV join + quality filtering
    import csv as _csv
    csv_path = tmp_path / "data.csv"
    with open(csv_path, "w", newline="") as f:
        wtr = _csv.writer(f)
        wtr.writerow(["video", "caption", "aesthetic score",
                      "motion score", "temporal consistency score",
                      "seconds"])
        wtr.writerow(["vid0.mp4", "a lovely long caption about a dog",
                      5.0, 4.0, 0.9, 5.0])
        wtr.writerow(["vid1.mp4", "too low aesthetic quality sample",
                      2.0, 4.0, 0.9, 5.0])   # filtered: aesthetic < 4.5
        wtr.writerow(["vid2.mp4", "short", 5.0, 4.0, 0.9, 5.0])  # caption
    cfg2 = OpenVidConfig(video_base_path=str(vids), csv_file=str(csv_path),
                         video_size=(32, 32), video_length=6)
    ds2 = OpenVidDataset(cfg2)
    assert len(ds2) == 1
    assert "dog" in ds2[0]["caption"]


def test_diffusion_objective_loop_trains_lora(tmp_path):
    """train_cross_attention_fusion(diffusion=...) runs the velocity-MSE
    objective: LoRA b leaves move away from zero (the semantic objective
    cannot touch them — train_lora without diffusion raises)."""
    spec = WAN_CONFIGS["tiny"]
    fusion = FusionConfig(bagel_hidden_dim=16,
                          wan_text_dim=spec.dit.text_dim,
                          wan_text_length=spec.dit.text_len,
                          bagel_sequence_length=6, projector_hidden_mult=2)
    tcfg = FusionTrainConfig(max_steps=6, learning_rate=3e-3,
                             train_lora=True, save_interval=3)
    base = init_wan_dit(jax.random.PRNGKey(0), spec.dit)
    base["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(50), base["head"]["head"]["w"].shape)
    vae = init_wan_vae(jax.random.PRNGKey(1), spec.vae)

    from univid_tpu.core.config import latent_shape
    _, f, h, w = latent_shape(spec, 64, 64, 5)
    extract, _ = _fake_encoders()
    dataset = [{"caption": f"sample {i}",
                "video": np.random.default_rng(i).standard_normal(
                    (5, 64, 64, 3)).astype(np.float32)}
               for i in range(2)]

    # train_lora without the diffusion objective must refuse loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="trains nothing"):
        train_cross_attention_fusion(
            dataset, extract, lambda c: None, fusion, tcfg,
            str(tmp_path / "bad"), dit_cfg=spec.dit,
            lora_cfg=LoRAConfig(rank=2,
                                target_strategy="cross_attention_only"))

    out = train_cross_attention_fusion(
        dataset, extract, lambda c: None, fusion, tcfg,
        str(tmp_path / "run"), dit_cfg=spec.dit,
        lora_cfg=LoRAConfig(rank=2,
                            target_strategy="cross_attention_only"),
        diffusion={"spec": spec, "dit_params": base, "vae_params": vae,
                   "latent_grid": (f, h, w)})
    assert out["steps"] == 6
    # best checkpoint saved on improvement (not only at save_interval)
    assert os.path.exists(tmp_path / "run" / "best" / "train_state.npz")

    # trained adapter exported in the save_lora format that the
    # inference CLI's --use_lora consumes: round-trips through
    # load_lora + merge_lora and changes the targeted weights
    from univid_tpu.train.lora import load_lora, merge_lora
    lora_dir = str(tmp_path / "run" / "lora_best")
    assert os.path.exists(os.path.join(lora_dir, "lora_weights.npz"))
    trained, tcfg2 = load_lora(lora_dir)
    assert tcfg2.rank == 2
    merged = merge_lora(base, trained)
    w0 = np.asarray(base["blocks"]["cross_attn"]["q"]["w"])
    w1 = np.asarray(merged["blocks"]["cross_attn"]["q"]["w"])
    assert not np.array_equal(w0, w1)
