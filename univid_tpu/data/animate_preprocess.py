"""WanAnimate host-side preprocessing (deterministic chain).

Behavioral parity with reference models/wan/utils/modules/animate/
preprocess/: frame selection + area resize (utils.py:96-200), padding
resize (utils.py:160-188), face-crop bboxes from face keypoints
(utils.py:199-225), replacement-mode mask dilation + grid augmentation
(utils.py:8-49), the openpose-convention conditioning render
(human_visualization.py:750-905), and a bone-ratio pose retarget
(simplified from retarget_pose.py:309-368 rescale_skeleton).

The neural detectors the reference drives through ONNX/torch (ViTPose
wholebody, YOLO person det, SAM2 video segmentation, FLUX Kontext edit —
preprocess_data.py:99-105) are NOT reimplemented: they are injected as
callables (`pose_fn`, `mask_fn`), so any host-side detector (ONNX
runtime, a served model, or precomputed JSON) plugs in. Everything
after detection — the data contract the TPU animate pipeline consumes
(src_ref.png / src_pose.mp4 / src_face.mp4 / src_bg.mp4 + masks,
process_pipepline.py:113-160) — is produced here.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# frame selection + resizing (utils.py)
# ---------------------------------------------------------------------------


def get_frame_indices(frame_num: int, video_fps: float, clip_length: int,
                      target_fps: float) -> List[int]:
    """Time-uniform resample of a video to clip_length frames at
    target_fps (utils.py:191-198)."""
    times = np.arange(0, clip_length) / target_fps
    idx = np.round(times * video_fps).astype(int)
    return np.clip(idx, 0, frame_num - 1).tolist()


def fit_area_size(orig_w: int, orig_h: int, target_area: int,
                  divisor: int = 64) -> Tuple[int, int]:
    """Largest divisor-aligned (w, h) with w*h <= target_area, tie-broken
    by aspect-ratio fidelity (utils.py calculate_new_size:89-131)."""
    ratio = orig_w / orig_h
    best = None
    max_h = divisor * ((int(math.sqrt(target_area / ratio))
                        + divisor - 1) // divisor)
    for h in range(divisor, max_h + divisor, divisor):
        ideal_w = h * ratio
        for w in (divisor * (int(ideal_w) // divisor),
                  divisor * ((int(ideal_w) + divisor - 1) // divisor)):
            if w <= 0 or w * h > target_area:
                continue
            cand = (-w * h, abs(w / h - ratio), w, h)
            if best is None or cand < best:
                best = cand
    if best is None:
        # fallback: floor-aligned sqrt split (utils.py:141-152)
        h = math.sqrt(target_area / ratio)
        w = target_area / h
        return (int(w // divisor) * divisor, int(h // divisor) * divisor)
    return best[2], best[3]


def padding_resize(img: np.ndarray, height: int, width: int,
                   padding_color: Tuple[int, int, int] = (0, 0, 0)
                   ) -> np.ndarray:
    """Aspect-preserving resize onto a (height, width) canvas with
    centered padding (utils.py:160-188)."""
    from ..native import resize_bilinear
    oh, ow = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    img = img.reshape(oh, ow, c)
    canvas = np.empty((height, width, c), np.float32)
    canvas[:] = np.asarray(padding_color[:c], np.float32)
    if oh / ow > height / width:
        nw = int(height / oh * ow)
        resized = resize_bilinear(img, height, nw)
        pad = (width - nw) // 2
        canvas[:, pad:pad + nw] = resized
    else:
        nh = int(width / ow * oh)
        resized = resize_bilinear(img, nh, width)
        pad = (height - nh) // 2
        canvas[pad:pad + nh] = resized
    return np.uint8(np.clip(canvas, 0, 255))


def resize_by_area(img: np.ndarray, target_area: int,
                   divisor: int = 64) -> np.ndarray:
    """Resize to the best divisor-aligned size of ~target_area
    (utils.py:135-157)."""
    h, w = img.shape[:2]
    nw, nh = fit_area_size(w, h, target_area, divisor)
    return padding_resize(img, nh, nw)


# ---------------------------------------------------------------------------
# face crops (utils.py get_face_bboxes:199-225)
# ---------------------------------------------------------------------------


def face_bbox_from_kps(kps_face: np.ndarray, scale: float,
                       image_shape: Tuple[int, int],
                       normalized: bool = True
                       ) -> Tuple[int, int, int, int]:
    """(x1, x2, y1, y2): face keypoint bbox expanded to `scale`x area,
    with the upward expansion 3x the downward one (faces extend above
    the detected landmarks). kps_face: [N, 2]."""
    h, w = image_shape
    kp = np.asarray(kps_face, np.float32)[:, :2]
    if normalized:
        kp = kp[1:] * np.asarray([w, h], np.float32)
    mn, mx = kp.min(axis=0), kp.max(axis=0)
    iw, ih = mx - mn
    area = iw * ih * scale
    nw = math.sqrt(area * (iw / ih))
    nh = math.sqrt(area * (ih / iw))
    dw = (nw - iw) / 2
    dh = (nh - ih) / 4
    return (int(max(mn[0] - dw, 0)), int(min(mx[0] + dw, w)),
            int(max(mn[1] - 3 * dh, 0)), int(min(mx[1] + dh, h)))


def crop_face(frame: np.ndarray, kps_face: np.ndarray, scale: float = 1.3,
              out_size: int = 512, normalized: bool = True) -> np.ndarray:
    from ..native import resize_bilinear
    x1, x2, y1, y2 = face_bbox_from_kps(kps_face, scale, frame.shape[:2],
                                        normalized=normalized)
    crop = frame[y1:max(y2, y1 + 1), x1:max(x2, x1 + 1)]
    return np.uint8(np.clip(
        resize_bilinear(crop.astype(np.float32), out_size, out_size),
        0, 255))


# ---------------------------------------------------------------------------
# replacement-mode masks (utils.py:8-49)
# ---------------------------------------------------------------------------


def mask_bbox(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    return np.asarray([xs.min(), ys.min(), xs.max(), ys.max()], np.int32)


def dilate_mask(mask: np.ndarray, k: int = 7,
                iterations: int = 3) -> np.ndarray:
    """Binary dilation with a k x k kernel (utils.py:44-49)."""
    from scipy.ndimage import binary_dilation
    out = binary_dilation(mask.astype(bool),
                          structure=np.ones((k, k), bool),
                          iterations=iterations)
    return out.astype(mask.dtype)


def grid_quantize_mask(mask: np.ndarray, w_len: int = 1,
                       h_len: int = 1) -> np.ndarray:
    """Snap the mask outward to a w_len x h_len grid over its bbox: any
    grid cell touching the mask becomes fully masked (utils.py
    get_aug_mask:25-42 — the coarse contour of arXiv:2502.06145)."""
    mask = mask.copy()
    if not mask.any():
        return mask  # no foreground this frame (occluded/out of view)
    x0, y0, x1, y1 = mask_bbox(mask)
    ws = max((x1 - x0) // w_len, 1)
    hs = max((y1 - y0) // h_len, 1)
    for wx in range(x0, x1, ws):
        we = min(wx + ws, x1)
        for hy in range(y0, y1, hs):
            he = min(hy + hs, y1)
            if mask[hy:he, wx:we].sum() > 0:
                mask[hy:he, wx:we] = 1
    return mask


def composite_background(frame: np.ndarray,
                         mask: np.ndarray) -> np.ndarray:
    """Zero the masked (foreground) region (process_pipepline.py:144)."""
    return np.uint8(frame * (1 - mask[:, :, None]))


# ---------------------------------------------------------------------------
# pose conditioning render (openpose conventions,
# human_visualization.py:750-905)
# ---------------------------------------------------------------------------

# 20-keypoint body order: Nose Neck RShoulder RElbow RWrist LShoulder
# LElbow LWrist RHip RKnee RAnkle LHip LKnee LAnkle REye LEye REar LEar
# LToe RToe. Limb sequence + palette are the public openpose drawing
# constants the checkpoint was trained against (protocol data).
POSE_LIMBS = [(1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8),
              (8, 9), (9, 10), (1, 11), (11, 12), (12, 13), (1, 0),
              (0, 14), (14, 16), (0, 15), (15, 17), (13, 18), (10, 19)]
POSE_COLORS = [(255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0),
               (170, 255, 0), (85, 255, 0), (0, 255, 0), (0, 255, 85),
               (0, 255, 170), (0, 255, 255), (0, 170, 255), (0, 85, 255),
               (0, 0, 255), (85, 0, 255), (170, 0, 255), (255, 0, 255),
               (255, 0, 170), (255, 0, 85), (200, 200, 0), (100, 100, 0)]

HAND_EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7),
              (7, 8), (0, 9), (9, 10), (10, 11), (11, 12), (0, 13),
              (13, 14), (14, 15), (15, 16), (0, 17), (17, 18), (18, 19),
              (19, 20)]


def draw_pose(canvas: np.ndarray, kps_body: np.ndarray,
              kps_lhand: Optional[np.ndarray] = None,
              kps_rhand: Optional[np.ndarray] = None,
              threshold: float = 0.6) -> np.ndarray:
    """Render an openpose-style conditioning image: limbs as filled
    ellipses at 0.6 brightness, joints as circles, hands as white-ish
    edges. kps_*: [N, 3] (x_px, y_px, confidence)."""
    import cv2
    img = canvas.copy()
    h, w = img.shape[:2]
    stick = max(int(min(h, w) / 200) - 1, 1)
    for (a, b), color in zip(POSE_LIMBS, POSE_COLORS):
        k1, k2 = kps_body[a], kps_body[b]
        if k1[2] < threshold or k2[2] < threshold:
            continue
        mx, my = (k1[0] + k2[0]) / 2, (k1[1] + k2[1]) / 2
        length = math.hypot(k1[0] - k2[0], k1[1] - k2[1])
        angle = math.degrees(math.atan2(k1[1] - k2[1], k1[0] - k2[0]))
        poly = cv2.ellipse2Poly((int(mx), int(my)),
                                (int(length / 2), stick), int(angle),
                                0, 360, 1)
        cv2.fillConvexPoly(img, poly, [int(c * 0.6) for c in color])
    for kp, color in zip(kps_body, POSE_COLORS):
        if kp[2] >= threshold:
            cv2.circle(img, (int(kp[0]), int(kp[1])), stick, color, -1)
    for hand in (kps_lhand, kps_rhand):
        if hand is None:
            continue
        for i, (a, b) in enumerate(HAND_EDGES):
            if hand[a][2] < threshold or hand[b][2] < threshold:
                continue
            cv2.line(img, (int(hand[a][0]), int(hand[a][1])),
                     (int(hand[b][0]), int(hand[b][1])),
                     POSE_COLORS[i % len(POSE_COLORS)], stick)
    return img


# ---------------------------------------------------------------------------
# pose retarget (simplified rescale_skeleton, retarget_pose.py:309-368)
# ---------------------------------------------------------------------------

# child keypoint -> parent along POSE_LIMBS, rooted at the neck (1)
_PARENT = {c: p for p, c in
           [(1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8),
            (8, 9), (9, 10), (1, 11), (11, 12), (12, 13), (1, 0),
            (0, 14), (14, 16), (0, 15), (15, 17), (13, 18), (10, 19)]}
_TOPO = [2, 5, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 0, 14, 16, 15, 17,
         18, 19]


def bone_ratios(src_body: np.ndarray, ref_body: np.ndarray,
                threshold: float = 0.4) -> Dict[int, float]:
    """Per-bone length ratio ref/src keyed by child keypoint; bones with
    a low-confidence endpoint fall back to the median visible ratio."""
    ratios: Dict[int, float] = {}
    seen: List[float] = []
    for child in _TOPO:
        p = _PARENT[child]
        ok = (src_body[child, 2] >= threshold
              and src_body[p, 2] >= threshold
              and ref_body[child, 2] >= threshold
              and ref_body[p, 2] >= threshold)
        if ok:
            ls = np.linalg.norm(src_body[child, :2] - src_body[p, :2])
            lr = np.linalg.norm(ref_body[child, :2] - ref_body[p, :2])
            if ls > 1e-6:
                ratios[child] = float(lr / ls)
                seen.append(ratios[child])
    fallback = float(np.median(seen)) if seen else 1.0
    for child in _TOPO:
        ratios.setdefault(child, fallback)
    return ratios


def retarget_body(body: np.ndarray, ratios: Dict[int, float],
                  anchor: Optional[np.ndarray] = None) -> np.ndarray:
    """Re-chain the driving skeleton with the reference character's bone
    lengths: each child keypoint keeps the driving bone DIRECTION but
    takes ref_len = src_len * ratio, walking the tree from the neck.
    `anchor` pins the neck (defaults to the driving neck position)."""
    out = body.copy()
    out[1, :2] = body[1, :2] if anchor is None else anchor
    for child in _TOPO:
        p = _PARENT[child]
        vec = body[child, :2] - body[p, :2]
        out[child, :2] = out[p, :2] + vec * ratios[child]
    return out


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


@dataclass
class PoseMeta:
    """One frame's 2D pose: pixel-space [N, 3] (x, y, conf) arrays."""
    body: np.ndarray                       # [20, 3]
    lhand: Optional[np.ndarray] = None     # [21, 3]
    rhand: Optional[np.ndarray] = None     # [21, 3]
    face: Optional[np.ndarray] = None      # [F, 3]


class AnimatePreprocessPipeline:
    """frames + reference image -> the WanAnimate conditioning bundle.

    pose_fn(frames u8 [T, H, W, 3]) -> List[PoseMeta]  (detector hook,
    the reference's Pose2d ViTPose+YOLO stage); mask_fn(frames, metas)
    -> [T, H, W] u8 foreground masks (SAM2 stage, replacement only).
    Mirrors ProcessPipeline.__call__ (process_pipepline.py:38-210)
    minus the neural stages.
    """

    def __init__(self, pose_fn: Callable, mask_fn: Optional[Callable]
                 = None):
        self.pose_fn = pose_fn
        self.mask_fn = mask_fn

    def __call__(self, frames: np.ndarray, refer_img: np.ndarray, *,
                 resolution_area: Tuple[int, int] = (1280, 720),
                 replace: bool = False, retarget: bool = False,
                 iterations: int = 3, k: int = 7,
                 w_len: int = 1, h_len: int = 1) -> Dict[str, np.ndarray]:
        area = resolution_area[0] * resolution_area[1]
        frames = np.stack([resize_by_area(f, area, divisor=16)
                           for f in frames])
        h, w = frames.shape[1:3]
        refer = padding_resize(refer_img, h, w)
        metas: List[PoseMeta] = self.pose_fn(frames)

        if retarget and replace:
            # reference: retargeting "only supported in animation mode"
            # (preprocess_data.py:57); the replace branch never retargets
            # — a retargeted skeleton would disagree with the SAM2 masks.
            import warnings
            warnings.warn("pose retargeting is ignored in replacement "
                          "mode (animation-only, as in the reference)")
            retarget = False
        if retarget:
            ref_meta: PoseMeta = self.pose_fn(refer[None])[0]
            ratios = bone_ratios(metas[0].body, ref_meta.body)
            anchor = ref_meta.body[1, :2]
            for m in metas:
                m.body = retarget_body(m.body, ratios, anchor=anchor)

        canvas = np.zeros((h, w, 3), np.uint8)
        cond = np.stack([draw_pose(canvas, m.body, m.lhand, m.rhand)
                         for m in metas])
        faces = np.stack([
            crop_face(f, m.face if m.face is not None
                      else m.body[[0, 14, 15, 16, 17]],
                      normalized=False)
            for f, m in zip(frames, metas)])

        out = {"frames": frames, "ref_image": refer, "pose_video": cond,
               "face_video": faces}
        if replace:
            if self.mask_fn is None:
                raise ValueError("replacement mode needs mask_fn (SAM2 "
                                 "stage)")
            masks = self.mask_fn(frames, metas)
            aug = []
            for m in masks:
                d = dilate_mask(m, k=k, iterations=iterations) \
                    if iterations > 0 else m
                aug.append(grid_quantize_mask(d, w_len, h_len)
                           if iterations > 0 else d)
            aug = np.stack(aug)
            out["aug_masks"] = aug
            out["bg_video"] = np.stack(
                [composite_background(f, m)
                 for f, m in zip(frames, aug)])
        return out

    def save(self, bundle: Dict[str, np.ndarray], output_path: str,
             fps: int = 30) -> Dict[str, str]:
        """Write the reference output contract: src_ref.png,
        src_pose.mp4, src_face.mp4 (+ src_bg.mp4) under output_path."""
        from PIL import Image
        from .video_io import save_video
        os.makedirs(output_path, exist_ok=True)
        paths = {}
        p = os.path.join(output_path, "src_ref.png")
        Image.fromarray(bundle["ref_image"]).save(p)
        paths["ref"] = p
        for key, name in (("pose_video", "src_pose.mp4"),
                          ("face_video", "src_face.mp4"),
                          ("bg_video", "src_bg.mp4")):
            if key in bundle:
                paths[key] = save_video(bundle[key],
                                        os.path.join(output_path, name),
                                        fps=fps)
        if "aug_masks" in bundle:
            # src_mask.mp4 (process_pipepline.py replacement outputs):
            # 0/1 masks as a grayscale-rgb video
            m = (bundle["aug_masks"][..., None] * np.uint8(255)) \
                .repeat(3, axis=-1)
            paths["mask_video"] = save_video(
                m, os.path.join(output_path, "src_mask.mp4"), fps=fps)
        return paths
