"""WanAnimate host-side preprocess chain (deterministic stages).

Reference: models/wan/utils/modules/animate/preprocess/ — frame
selection, area/padding resize, face crops, replacement masks, pose
render, bone-ratio retarget, and the src_* output file contract.
"""

import numpy as np
import pytest

from univid_tpu.data.animate_preprocess import (
    AnimatePreprocessPipeline, PoseMeta, bone_ratios, composite_background,
    crop_face, dilate_mask, draw_pose, face_bbox_from_kps, fit_area_size,
    get_frame_indices, grid_quantize_mask, mask_bbox, padding_resize,
    resize_by_area, retarget_body,
)


def test_frame_indices_resample():
    # 30fps video, 2s, resampled to 16 frames at 8fps -> ~every 3.75
    idx = get_frame_indices(60, 30.0, 16, 8.0)
    assert idx[0] == 0 and len(idx) == 16
    assert idx == [int(round(t / 8.0 * 30.0)) for t in range(16)]
    # clipping at the end
    assert max(get_frame_indices(10, 30.0, 16, 8.0)) == 9


def test_fit_area_size_alignment():
    w, h = fit_area_size(1920, 1080, 1280 * 720, divisor=16)
    assert w % 16 == 0 and h % 16 == 0
    assert w * h <= 1280 * 720
    # aspect is roughly preserved
    assert abs(w / h - 1920 / 1080) < 0.2
    # area is near-maximal (>= 90% of the budget)
    assert w * h >= 0.9 * 1280 * 720


def test_padding_resize_centered():
    img = np.full((100, 50, 3), 200, np.uint8)  # tall
    out = padding_resize(img, 64, 64, padding_color=(0, 0, 0))
    assert out.shape == (64, 64, 3)
    # content centered horizontally: 50/100*64 = 32 wide
    assert out[:, :15].max() == 0 and out[:, -15:].max() == 0
    assert out[32, 32, 0] > 150


def test_resize_by_area_divisor16():
    out = resize_by_area(np.zeros((720, 1280, 3), np.uint8),
                         832 * 480, divisor=16)
    h, w = out.shape[:2]
    assert h % 16 == 0 and w % 16 == 0 and h * w <= 832 * 480


def test_face_bbox_expansion():
    # face keypoints in a 20x20 px box of a 200x200 image
    kps = np.stack([np.linspace(90, 110, 10), np.linspace(90, 110, 10)],
                   axis=1)
    x1, x2, y1, y2 = face_bbox_from_kps(kps, scale=1.3,
                                        image_shape=(200, 200),
                                        normalized=False)
    assert x1 < 90 and x2 > 110  # expanded
    # upward expansion is 3x the downward one
    assert (90 - y1) > (y2 - 110)
    assert 0 <= x1 and x2 <= 200 and 0 <= y1 and y2 <= 200


def test_crop_face_output_shape():
    frame = np.random.default_rng(0).integers(0, 255, (200, 200, 3),
                                              np.uint8)
    kps = np.stack([np.linspace(90, 110, 10), np.linspace(90, 110, 10)],
                   axis=1)
    face = crop_face(frame, kps, normalized=False)
    assert face.shape == (512, 512, 3) and face.dtype == np.uint8


def test_masks_dilate_grid_composite():
    mask = np.zeros((64, 64), np.uint8)
    mask[20:40, 25:35] = 1
    d = dilate_mask(mask, k=5, iterations=2)
    assert d.sum() > mask.sum()
    assert d[d.astype(bool) & ~mask.astype(bool)].all()  # superset
    g = grid_quantize_mask(d.copy(), w_len=2, h_len=2)
    assert g.sum() >= d.sum()
    x0, y0, x1, y1 = mask_bbox(g)
    # grid-quantized mask fills its bbox cells fully
    frame = np.full((64, 64, 3), 100, np.uint8)
    bg = composite_background(frame, g)
    assert bg[g.astype(bool)].max() == 0
    assert bg[~g.astype(bool)].min() == 100


def _t_pose(cx=100.0, cy=60.0, scale=1.0, conf=1.0):
    """Synthetic 20-kp body in T-pose around (cx, cy)."""
    s = scale
    kp = np.array([
        [cx, cy - 20 * s], [cx, cy], [cx - 10 * s, cy], [cx - 20 * s, cy],
        [cx - 30 * s, cy], [cx + 10 * s, cy], [cx + 20 * s, cy],
        [cx + 30 * s, cy], [cx - 8 * s, cy + 30 * s],
        [cx - 8 * s, cy + 55 * s], [cx - 8 * s, cy + 80 * s],
        [cx + 8 * s, cy + 30 * s], [cx + 8 * s, cy + 55 * s],
        [cx + 8 * s, cy + 80 * s], [cx - 4 * s, cy - 24 * s],
        [cx + 4 * s, cy - 24 * s], [cx - 8 * s, cy - 22 * s],
        [cx + 8 * s, cy - 22 * s], [cx + 10 * s, cy + 84 * s],
        [cx - 10 * s, cy + 84 * s]], np.float32)
    return np.concatenate([kp, np.full((20, 1), conf, np.float32)],
                          axis=1)


def test_draw_pose_nonempty_and_clean_canvas():
    canvas = np.zeros((128, 256, 3), np.uint8)
    img = draw_pose(canvas, _t_pose())
    assert img.sum() > 0
    assert canvas.sum() == 0  # input not mutated
    # low-confidence keypoints are skipped entirely
    empty = draw_pose(canvas, _t_pose(conf=0.1))
    assert empty.sum() == 0


def test_retarget_matches_reference_bone_lengths():
    src = _t_pose(scale=1.0)
    ref = _t_pose(cx=80, cy=50, scale=1.5)  # bigger character
    ratios = bone_ratios(src, ref)
    out = retarget_body(src, ratios, anchor=ref[1, :2])
    # every driven bone now has the reference character's length
    from univid_tpu.data.animate_preprocess import _PARENT, _TOPO
    for child in _TOPO:
        p = _PARENT[child]
        lr = np.linalg.norm(ref[child, :2] - ref[p, :2])
        lo = np.linalg.norm(out[child, :2] - out[p, :2])
        np.testing.assert_allclose(lo, lr, rtol=1e-5)
    # anchored at the reference neck
    np.testing.assert_allclose(out[1, :2], ref[1, :2])


def test_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (4, 120, 160, 3), np.uint8)
    refer = rng.integers(0, 255, (90, 140, 3), np.uint8)

    def pose_fn(fr):
        h, w = fr.shape[1:3]
        return [PoseMeta(body=_t_pose(cx=w / 2, cy=h / 3, scale=0.6))
                for _ in range(len(fr))]

    def mask_fn(fr, metas):
        m = np.zeros(fr.shape[:3], np.uint8)
        m[:, 20:60, 40:100] = 1
        return m

    pipe = AnimatePreprocessPipeline(pose_fn, mask_fn)
    # retarget is animation-only (reference preprocess_data.py:57):
    # replace+retarget warns and ignores the retarget
    with pytest.warns(UserWarning, match="retargeting is ignored"):
        out = pipe(frames, refer, resolution_area=(160, 96),
                   replace=True, retarget=True)
    t, h, w = out["frames"].shape[:3]
    assert t == 4 and h % 16 == 0 and w % 16 == 0
    assert out["ref_image"].shape == (h, w, 3)
    assert out["pose_video"].shape == (4, h, w, 3)
    assert out["pose_video"].sum() > 0
    assert out["face_video"].shape == (4, 512, 512, 3)
    assert out["aug_masks"].shape == (4, h, w)
    assert out["bg_video"].shape == (4, h, w, 3)
    # masked region zeroed in bg
    m0 = out["aug_masks"][0].astype(bool)
    assert out["bg_video"][0][m0].max() == 0

    paths = pipe.save(out, str(tmp_path / "prep"), fps=8)
    import os
    for p in paths.values():
        assert os.path.exists(p)
    # replacement contract includes src_mask.mp4
    assert paths["mask_video"].endswith("src_mask.mp4")


def test_empty_mask_frame_passes_through():
    m = np.zeros((32, 32), np.uint8)
    assert grid_quantize_mask(m.copy(), 2, 2).sum() == 0
    assert dilate_mask(m, k=3, iterations=1).sum() == 0


def test_preprocess_cli(tmp_path):
    """Flag-compatible CLI chain with mock detectors -> src_* files
    (reference preprocess_data.py:8-121)."""
    import os
    from univid_tpu.cli.preprocess_animate import main as prep_main
    from univid_tpu.data.video_io import save_video
    rng = np.random.default_rng(11)
    vid = str(tmp_path / "drive.mp4")
    save_video(rng.integers(0, 255, (8, 96, 128, 3), np.uint8), vid,
               fps=8)
    from PIL import Image
    ref = str(tmp_path / "ref.png")
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)
                    .astype(np.uint8)).save(ref)
    out = str(tmp_path / "prep_out")
    meta = prep_main(["--video_path", vid, "--refer_path", ref,
                      "--save_path", out, "--resolution_area", "160",
                      "96", "--fps", "-1", "--replace_flag",
                      "--retarget_flag", "--mock_detectors"])
    for key in ("ref", "pose_video", "face_video", "bg_video"):
        assert os.path.exists(meta["paths"][key])
    assert os.path.exists(os.path.join(out, "preprocess_meta.json"))
