"""Dataset adapter tests: frame-index sampling parity, VLM jsonl
conversation formatting (losses on gpt turns, <image>/<video>
interleaving), T2I caption+vae sample shape, and packing end-to-end
through PackedDataset into bagel_packed_forward-compatible batches."""

import json

import numpy as np
import pytest

from univid_tpu.data.datasets import (FrameSampler, SftJSONLIterableDataset,
                                      T2IIterableDataset,
                                      get_frame_indices, _change_format)
from univid_tpu.data.packed_dataset import PackedDataConfig, PackedDataset
from univid_tpu.data.transforms import ImageTransform


class _Tok:
    def encode(self, s):
        return [ord(c) % 100 + 2 for c in s][:12]


def test_get_frame_indices_modes():
    mid = get_frame_indices(4, 16, sample="middle")
    assert mid == [1, 5, 9, 13]
    fixed = get_frame_indices(4, 16, sample="rand", fix_start=0)
    assert fixed == [0, 4, 8, 12]
    # padding with the last frame when the video is short
    short = get_frame_indices(6, 3, sample="middle")
    assert len(short) == 6 and short[-1] == short[2]
    fps = get_frame_indices(0, 30, sample="fps0.5", input_fps=1,
                            max_num_frames=8)
    assert len(fps) == 8 and all(i < 30 for i in fps)


def test_change_format_interleaves_and_losses():
    convs = [
        {"from": "human", "value": "look <image> and <image> now"},
        {"from": "gpt", "value": "an answer"},
    ]
    els = _change_format(convs, 2)
    types = [(e["type"], e.get("has_loss")) for e in els]
    assert types == [("text", 0), ("image", None), ("text", 0),
                     ("image", None), ("text", 0), ("text", 1)]


def test_sft_jsonl_dataset(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.full((40, 30, 3), 128, np.uint8)).save(
        str(img_dir / "a.png"))
    rows = [
        {"image": "a.png", "conversations": [
            {"from": "human", "value": "<image> what is this?"},
            {"from": "gpt", "value": "a gray square"}]},
        {"image": "a.png", "conversations": [   # no gpt turn -> skipped
            {"from": "human", "value": "<image> hi"}]},
    ]
    jp = tmp_path / "d.jsonl"
    with open(jp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ds = SftJSONLIterableDataset(
        [str(jp)], [str(img_dir)],
        transform=ImageTransform(56, 28, 14), tokenizer=_Tok())
    samples = list(ds)
    assert len(samples) == 1
    s = samples[0]
    assert [p["type"] for p in s["sequence_plan"]] == \
        ["vit_image", "text", "text"]
    assert [p["loss"] for p in s["sequence_plan"]] == [0, 0, 1]
    assert s["image_list"][0].shape[0] % 14 == 0


def test_t2i_dataset_and_packing(tmp_path):
    from PIL import Image
    img_dir = tmp_path
    Image.fromarray(np.full((32, 32, 3), 200, np.uint8)).save(
        str(img_dir / "b.png"))
    jp = tmp_path / "t2i.jsonl"
    with open(jp, "w") as f:
        f.write(json.dumps({"image": "b.png",
                            "captions": {"short": "a bright square"}})
                + "\n")

    def latent_fn(pix):  # stub VAE: 8x downsample by striding, 4ch
        return np.ascontiguousarray(
            pix[::8, ::8, :1].repeat(4, -1)).astype(np.float32)

    ds = T2IIterableDataset.from_jsonl(
        str(jp), transform=ImageTransform(32, 16, 16),
        tokenizer=_Tok(), latent_fn=latent_fn, image_dir=str(img_dir))
    samples = list(ds)
    assert len(samples) == 1
    assert samples[0]["sequence_plan"][1]["type"] == "vae_image"

    packed = PackedDataset(
        [(lambda: iter(samples), 1.0)],
        data_config=PackedDataConfig(max_latent_size=8, bos_token_id=190,
                                     eos_token_id=191, start_of_image=192,
                                     end_of_image=193),
        expected_num_tokens=8, max_num_tokens=64)
    batches = list(packed)
    assert len(batches) == 1
    b = batches[0]
    assert "packed_latent_clean" in b
    assert b["packed_latent_clean"].shape[0] == 16  # 4x4 latent grid
    assert np.isfinite(b["packed_timesteps"]).all()


def test_best_output_size_matches_reference_arithmetic():
    from univid_tpu.data.video_io import best_output_size
    for (w, h) in [(1920, 1080), (704, 1280), (500, 500)]:
        ow, oh = best_output_size(w, h, 16, 16, 1280 * 704)
        assert ow % 16 == 0 and oh % 16 == 0
        assert ow * oh <= 1280 * 704
    # aspect preserved approximately for 16:9
    ow, oh = best_output_size(1920, 1080, 16, 16, 1280 * 704)
    assert abs(ow / oh - 16 / 9) < 0.1


def test_smart_resize_and_nframes():
    from univid_tpu.data.video_io import smart_nframes, smart_resize
    h, w = smart_resize(515, 333)
    assert h % 28 == 0 and w % 28 == 0
    assert smart_nframes({"nframes": 9}, 100, 30.0) == 8  # round to x2
    n = smart_nframes({"fps": 2.0}, 300, 30.0)
    assert n == 20  # 10s * 2fps


def test_unified_edit_dataset_and_video_builder():
    """Edit chain -> condition (vae+vit) + instruction + noised target;
    video builder emits one multi-frame split with frame_delta jumps
    (interleave_t2i_dataset.py:88-130, edit_dataset.py:19-80)."""
    import random as _random
    from univid_tpu.data.interleave_datasets import (
        InterleavedBuilder, UnifiedEditIterableDataset)

    def latent_fn(pix):
        return np.ascontiguousarray(
            pix[::8, ::8, :1].repeat(4, -1)).astype(np.float32)

    tf = ImageTransform(32, 16, 16)
    vtf = ImageTransform(28, 14, 14)
    rng = np.random.default_rng(0)
    images = [rng.random((32, 32, 3)).astype(np.float32)
              for _ in range(3)]
    records = [{"image_list": images,
                "instruction_list": [["make it red"], ["rotate it"]]}]
    ds = UnifiedEditIterableDataset(
        records, tokenizer=_Tok(), transform=tf, vit_transform=vtf,
        latent_fn=latent_fn, rng=_random.Random(0))
    samples = list(ds)
    assert len(samples) == 1
    plan = samples[0]["sequence_plan"]
    # starts with the condition pair: clean vae + vit
    assert plan[0]["type"] == "vae_image" and plan[0]["loss"] == 0
    assert plan[1]["type"] == "vit_image"
    assert plan[2]["type"] == "text"
    # ends with a noised vae target
    assert plan[-1] == {"type": "vae_image", "enable_cfg": 0, "loss": 1,
                        "special_token_loss": 0}

    # video builder: one split, frame_delta carries the rope jumps
    b = InterleavedBuilder(_Tok(), tf, vtf, latent_fn)
    data = b.init_data()
    data = b.add_video(data, images, [0, 4, 9], need_loss=True,
                       need_vae=False)
    plans = data["sequence_plan"]
    assert plans[0]["split_start"] and not plans[0].get("split_end")
    assert plans[-1]["split_end"] and not plans[-1].get("split_start")
    assert plans[0]["frame_delta"] == 4 and plans[1]["frame_delta"] == 5

    # packs: the multi-frame split shares one noise timestep and one
    # attention split
    from univid_tpu.data.packed_dataset import (PackedDataConfig,
                                                PackedDataset)
    data["num_tokens"] = int(data["num_tokens"])
    packed = PackedDataset(
        [(lambda: iter([data]), 1.0)],
        data_config=PackedDataConfig(max_latent_size=8, bos_token_id=190,
                                     eos_token_id=191, start_of_image=192,
                                     end_of_image=193),
        expected_num_tokens=8, max_num_tokens=128)
    batch = next(iter(packed))
    ts = batch["packed_timesteps"]
    assert len(set(ts.tolist())) == 1  # shared timestep across the split


def test_data_status_resume(tmp_path):
    """data_status resumes iteration after the last consumed row
    (reference vlm_dataset.py:97-111, dataset_base.py:139-143)."""
    from PIL import Image
    for name in ("a.png", "b.png", "c.png", "d.png"):
        Image.fromarray(np.full((32, 32, 3), 120, np.uint8)).save(
            str(tmp_path / name))
    jp = tmp_path / "t2i.jsonl"
    with open(jp, "w") as f:
        for name in ("a.png", "b.png", "c.png", "d.png"):
            f.write(json.dumps({"image": name,
                                "captions": {"s": f"img {name}"}}) + "\n")

    def latent_fn(pix):
        return np.ascontiguousarray(
            pix[::8, ::8, :1].repeat(4, -1)).astype(np.float32)

    kw = dict(transform=ImageTransform(32, 16, 16), tokenizer=_Tok(),
              latent_fn=latent_fn, image_dir=str(tmp_path))
    full = list(T2IIterableDataset.from_jsonl(str(jp), **kw))
    assert [s["data_indexes"]["data_indexes"] for s in full] == [0, 1, 2, 3]

    resumed = list(T2IIterableDataset.from_jsonl(str(jp), data_status=1,
                                                 **kw))
    assert [s["data_indexes"]["data_indexes"] for s in resumed] == [2, 3]
    # resumed rows identical to the tail of the full pass
    np.testing.assert_array_equal(resumed[0]["image_list"][0],
                                  full[2]["image_list"][0])


def test_debug_flags_env():
    import jax
    from univid_tpu.core.debug import apply_debug_flags
    applied = apply_debug_flags(env={"UNIVID_LOG_COMPILES": "1"})
    assert applied == {"jax_log_compiles": True}
    jax.config.update("jax_log_compiles", False)
    assert apply_debug_flags(env={}) == {}


def test_t2i_from_parquet(tmp_path):
    """Reference parquet layout: image bytes + json-string captions
    (t2i_dataset.py:55-85)."""
    import io
    import pyarrow as pa
    import pyarrow.parquet as pq
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(buf, "PNG")
    tbl = pa.table({
        "image": [buf.getvalue(), buf.getvalue()],
        "captions": [json.dumps({"short": "a grey square"}),
                     json.dumps({"short": "another square"})],
    })
    pp = str(tmp_path / "shard.parquet")
    pq.write_table(tbl, pp, row_group_size=1)  # 2 row groups

    def latent_fn(pix):
        return np.ascontiguousarray(
            pix[::8, ::8, :1].repeat(4, -1)).astype(np.float32)

    ds = T2IIterableDataset.from_parquet(
        [pp], transform=ImageTransform(32, 16, 16), tokenizer=_Tok(),
        latent_fn=latent_fn)
    samples = list(ds)
    assert len(samples) == 2
    for s in samples:
        assert s["sequence_plan"][1]["type"] == "vae_image"
        assert s["image_list"][0].dtype == np.float32


def test_dataset_registry_yaml_groups(tmp_path):
    """DATASET_REGISTRY + YAML group config -> PackedDataset groups
    (reference dataset_info.py:9-14 + config/example.yaml consumed at
    dataset_base.py:130-170)."""
    import io
    from PIL import Image
    from univid_tpu.data.registry import load_data_groups

    # t2i dataset: in-memory records with encoded image bytes
    buf = io.BytesIO()
    Image.fromarray(np.full((32, 32, 3), 150, np.uint8)).save(buf, "PNG")
    t2i_records = [{"image": buf.getvalue(),
                    "captions": {"short": "a gray square"}}] * 3

    # vlm dataset: jsonl + image dir
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.full((40, 30, 3), 128, np.uint8)).save(
        str(img_dir / "a.png"))
    jp = tmp_path / "d.jsonl"
    with open(jp, "w") as f:
        f.write(json.dumps({"image": "a.png", "conversations": [
            {"from": "human", "value": "<image> what is this?"},
            {"from": "gpt", "value": "a gray square"}]}) + "\n")

    yaml_text = f"""
t2i_pretrain:
  dataset_names:
  - toy_t2i
  image_transform_args:
    image_stride: 16
    max_image_size: 32
    min_image_size: 16
  is_mandatory: true
  weight: 2
vlm_sft:
  dataset_names:
  - toy_vlm
  image_transform_args:
    image_stride: 14
    max_image_size: 56
    min_image_size: 28
  is_mandatory: false
  weight: 1
"""
    cfg_path = tmp_path / "data.yaml"
    cfg_path.write_text(yaml_text)

    def latent_fn(pix):
        return np.ascontiguousarray(
            pix[::8, ::8, :1].repeat(4, -1)).astype(np.float32)

    info = {
        "t2i_pretrain": {"toy_t2i": {"records": t2i_records}},
        "vlm_sft": {"toy_vlm": {"jsonl_path": str(jp),
                                "image_dir": str(img_dir)}},
    }
    groups = load_data_groups(str(cfg_path), _Tok(), info,
                              latent_fn=latent_fn)
    assert [(w, m) for _, w, m in groups] == [(2.0, True), (1.0, False)]

    packed = PackedDataset(
        groups,
        data_config=PackedDataConfig(max_latent_size=8, bos_token_id=190,
                                     eos_token_id=191, start_of_image=192,
                                     end_of_image=193),
        expected_num_tokens=64, max_num_tokens=512)
    batch = next(iter(packed))
    # mandatory t2i group present -> vae latent tokens in the pack
    assert "packed_latent_clean" in batch
    assert batch["sample_lens"]

    # unknown group name / missing info fail loudly
    import pytest as _pytest
    with _pytest.raises(KeyError):
        load_data_groups({"nope": {"dataset_names": ["x"]}}, _Tok(), {})
    with _pytest.raises(KeyError):
        load_data_groups(
            {"t2i_pretrain": {"dataset_names": ["absent"]}}, _Tok(), {})
