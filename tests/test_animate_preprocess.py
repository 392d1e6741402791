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


# ---------------------------------------------------------------------------
# round-3 fidelity tail: face render, hand retarget, foot clamp,
# deterministic SAM2-role mask fallback + propagation
# ---------------------------------------------------------------------------

def _hand(cx, cy, scale=1.0, conf=1.0):
    """Synthetic 21-kp hand: root at (cx, cy), fingers fanning right."""
    pts = [(cx, cy)]
    for f in range(5):
        for j in range(1, 5):
            pts.append((cx + 4 * j * scale, cy + (f - 2) * 3 * scale))
    kp = np.asarray(pts, np.float32)
    return np.concatenate([kp, np.full((21, 1), conf, np.float32)],
                          axis=1)


def _face70(cx, cy, r=12.0):
    """Synthetic 70-pt face layout around (cx, cy)."""
    ang = np.linspace(0, 2 * np.pi, 70, endpoint=False)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                    axis=1).astype(np.float32)


def test_draw_face_keypoints_parts():
    from univid_tpu.data.animate_preprocess import (FACE_STYLE,
                                                    draw_face_keypoints)
    img = np.zeros((128, 128, 3), np.uint8)
    out = draw_face_keypoints(img, _face70(64, 64))
    assert out.sum() > 0 and img.sum() == 0
    # every styled part leaves its color on the canvas
    for item in FACE_STYLE.values():
        color = np.asarray(item["color"], np.uint8)
        assert (out == color).all(axis=-1).any(), item
    # 68-pt input (no eyeballs) still renders the other parts
    out68 = draw_face_keypoints(img, _face70(64, 64)[:68])
    assert out68.sum() > 0


def test_draw_pose_face_overlay_and_head_toggle():
    canvas = np.zeros((128, 256, 3), np.uint8)
    with_face = draw_pose(canvas, _t_pose(), kps_face=_face70(100, 40))
    without = draw_pose(canvas, _t_pose())
    assert with_face.sum() > without.sum()
    # draw_head=False suppresses the nose/eye/ear points+limbs
    # (reference draw_aapose_new:799-801)
    no_head = draw_pose(canvas, _t_pose(), draw_head=False)
    assert 0 < no_head.sum() < without.sum()


def test_retarget_hand_follows_wrist():
    from univid_tpu.data.animate_preprocess import (retarget_hand,
                                                    retarget_hands)
    src = _t_pose(scale=1.0)
    ref = _t_pose(cx=80, cy=50, scale=1.5)
    ratios = bone_ratios(src, ref)
    new_body = retarget_body(src, ratios, anchor=ref[1, :2])
    lh = _hand(*src[7, :2])   # on the left wrist
    rh = _hand(*src[4, :2])   # on the right wrist
    out_l, out_r = retarget_hands(lh, rh, src, new_body, ratios)
    # roots land exactly on the retargeted wrists
    np.testing.assert_allclose(out_l[0, :2], new_body[7, :2], atol=1e-4)
    np.testing.assert_allclose(out_r[0, :2], new_body[4, :2], atol=1e-4)
    # hand scaled by the shoulder-bone ratio (1.5 here)
    ratio = max(ratios[2], ratios[5])
    src_span = np.linalg.norm(lh[1:, :2] - lh[0, :2], axis=1)
    out_span = np.linalg.norm(out_l[1:, :2] - out_l[0, :2], axis=1)
    np.testing.assert_allclose(out_span, src_span * ratio, rtol=1e-5)
    # confidences untouched
    np.testing.assert_array_equal(out_l[:, 2], lh[:, 2])


def test_retarget_hands_crossed_swap():
    from univid_tpu.data.animate_preprocess import retarget_hands
    src = _t_pose(scale=1.0)
    ratios = {i: 1.0 for i in range(20)}
    # crossed arms: the "left" hand detection sits on the RIGHT wrist
    lh = _hand(*src[4, :2])
    rh = _hand(*src[7, :2])
    out_l, out_r = retarget_hands(lh, rh, src, src, ratios)
    # swap guard re-associates each hand with its nearest wrist
    np.testing.assert_allclose(out_l[0, :2], src[7, :2], atol=1e-4)
    np.testing.assert_allclose(out_r[0, :2], src[4, :2], atol=1e-4)


def test_retarget_foot_clamp():
    src = _t_pose(scale=1.0)
    # stretch the toes far out: foot length 40 vs calf 25
    src[18, 0] += 40
    src[19, 0] -= 40
    ratios = {i: 1.0 for i in range(20)}
    out = retarget_body(src, ratios)
    from univid_tpu.data.animate_preprocess import _PARENT
    for toe in (18, 19):
        ankle = _PARENT[toe]
        calf = np.linalg.norm(out[ankle, :2] - out[_PARENT[ankle], :2])
        foot = np.linalg.norm(out[toe, :2] - out[ankle, :2])
        assert foot <= 0.5 * calf + 1e-4


def test_replace_mode_pose_hull_fallback():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (3, 120, 160, 3), np.uint8)
    refer = rng.integers(0, 255, (90, 140, 3), np.uint8)

    def pose_fn(fr):
        h, w = fr.shape[1:3]
        return [PoseMeta(body=_t_pose(cx=w / 2, cy=h / 3, scale=0.6))
                for _ in range(len(fr))]

    pipe = AnimatePreprocessPipeline(pose_fn, mask_fn=None)
    with pytest.warns(UserWarning, match="pose-hull mask fallback"):
        out = pipe(frames, refer, resolution_area=(160, 96), replace=True)
    masks = out["aug_masks"]
    assert masks.shape == frames.shape[:1] + out["frames"].shape[1:3]
    # mask covers the skeleton keypoints
    h, w = out["frames"].shape[1:3]
    body = _t_pose(cx=w / 2, cy=h / 3, scale=0.6)
    for x, y, _ in body:
        if 0 <= int(y) < h and 0 <= int(x) < w:
            assert masks[0, int(y), int(x)] == 1
    # and not the whole frame
    assert masks[0].mean() < 0.9


def test_propagate_mask_tracks_motion():
    from univid_tpu.data.animate_preprocess import propagate_mask
    t, h, w = 6, 64, 64
    frames = np.zeros((t, h, w, 3), np.uint8)
    truth = np.zeros((t, h, w), bool)
    for i in range(t):
        x = 10 + 3 * i
        frames[i, 20:40, x:x + 12] = 255
        truth[i, 20:40, x:x + 12] = True
    out = propagate_mask(frames, truth[0].astype(np.uint8))
    assert out.shape == (t, h, w)
    for i in range(t):
        inter = (out[i].astype(bool) & truth[i]).sum()
        union = (out[i].astype(bool) | truth[i]).sum()
        assert inter / union > 0.5, f"frame {i} IoU {inter/union:.2f}"


def test_animate_relight_lora_hook():
    import jax
    import jax.numpy as jnp
    from tests.test_animate import TINY, TINY_VAE
    from univid_tpu.models.wan.animate.model import init_wan_animate
    from univid_tpu.pipelines.animate import WanAnimatePipeline
    from univid_tpu.models.wan.vae_api import init_wan_vae
    from univid_tpu.train.lora import LoRAConfig, init_lora

    params = init_wan_animate(jax.random.PRNGKey(0), TINY)
    vae = init_wan_vae(jax.random.PRNGKey(1), TINY_VAE)
    lora_cfg = LoRAConfig(rank=2, target_strategy="attention_focused")
    lora = init_lora(jax.random.PRNGKey(2), TINY, lora_cfg)
    # a trained relight adapter has non-zero B factors
    lora["sites"] = {
        site: dict(p, b=jax.random.normal(jax.random.PRNGKey(i),
                                          p["b"].shape) * 0.1)
        for i, (site, p) in enumerate(lora["sites"].items())}
    base = WanAnimatePipeline(TINY, params, TINY_VAE, vae)
    merged = WanAnimatePipeline(TINY, params, TINY_VAE, vae,
                                relight_lora=lora)
    w0 = base.params["blocks"]["cross_attn"]["q"]["w"]
    w1 = merged.params["blocks"]["cross_attn"]["q"]["w"]
    assert not jnp.allclose(w0, w1)
    # non-targeted weights untouched
    np.testing.assert_array_equal(
        np.asarray(base.params["patch_embed"]["w"]),
        np.asarray(merged.params["patch_embed"]["w"]))


def test_flux_edit_hook_drives_retarget_ratios(tmp_path):
    """The FLUX-Kontext edit seam (process_pipepline.py:180-215): in
    retarget mode with an edit_fn, both the reference image and the
    first template frame go through the editor with visibility-
    dependent canonical-pose prompts, and the bone ratios come from
    the re-detected EDITED skeletons."""
    from univid_tpu.cli.preprocess_animate import (_mock_pose_fn,
                                                   main as prep_main)
    from univid_tpu.data.video_io import save_video
    from PIL import Image

    calls = []

    def edit_fn(img, prompt):
        calls.append(prompt)
        return img

    rng = np.random.default_rng(21)
    vid = str(tmp_path / "drive.mp4")
    save_video(rng.integers(0, 255, (4, 96, 128, 3), np.uint8), vid,
               fps=8)
    ref = str(tmp_path / "ref.png")
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)
                    .astype(np.uint8)).save(ref)
    out = str(tmp_path / "prep_out")
    meta = prep_main(["--video_path", vid, "--refer_path", ref,
                      "--save_path", out, "--resolution_area", "160",
                      "96", "--fps", "-1", "--retarget_flag",
                      "--use_flux", "--mock_detectors"],
                     edit_fn=edit_fn)
    assert len(calls) == 2  # refer + first template frame
    for prompt in calls:
        assert "standard" in prompt and "pose" in prompt.lower()
    assert meta["retarget"]


def test_flux_requires_retarget(tmp_path):
    import pytest
    from univid_tpu.cli.preprocess_animate import main as prep_main

    with pytest.raises(SystemExit, match="retargeting"):
        prep_main(["--video_path", "x", "--refer_path", "y",
                   "--save_path", "z", "--use_flux"])


def test_editing_prompts_visibility_rules():
    from univid_tpu.data.animate_preprocess import (PoseMeta,
                                                    editing_prompts)

    body = np.zeros((20, 3), np.float32)
    body[:, 2] = 0.9
    body[:, 0] = 50
    body[:, 1] = 40
    m = PoseMeta(body=body.copy())
    # landscape frame with everything visible: T-pose + feet/hands
    tpl, ref = editing_prompts([m], m, (96, 160))
    assert "T-pose" in tpl and "Feet and Hands" in tpl
    # portrait: arms-down pose
    tpl, _ = editing_prompts([m], m, (160, 96))
    assert "straight down" in tpl
    # legs out of frame (below the image): hands-only suffix
    body2 = body.copy()
    for i in (9, 10, 12, 13):
        body2[i, 1] = 500.0
    m2 = PoseMeta(body=body2)
    tpl, _ = editing_prompts([m2], m2, (96, 160))
    assert "Hands are visible" in tpl and "Feet" not in tpl
