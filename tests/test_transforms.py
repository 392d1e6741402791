"""Transform suite tests vs the reference sizing arithmetic
(data/transforms.py:15-116) — target sizes compared against a literal
transcription of _apply_scale/forward, plus corruption-aug invariants."""

import numpy as np
import pytest

from univid_tpu.data.transforms import (ImageTransform,
                                        MaxLongEdgeMinShortEdgeResize,
                                        crop, decolorization, downscale,
                                        inpainting, motion_blur,
                                        shuffle_patch, vae_transform,
                                        vit_transform)


def _ref_target(width, height, max_size, min_size, stride, max_pixels,
                img_num=1):
    def mk(v):
        return max(stride, int(round(v / stride) * stride))

    def ap(w, h, s):
        return mk(round(w * s)), mk(round(h * s))

    scale = min(max_size / max(width, height), 1.0)
    scale = max(scale, min_size / min(width, height))
    w, h = ap(width, height, scale)
    if w * h > max_pixels / img_num:
        w, h = ap(w, h, max_pixels / img_num / (w * h))
    if max(w, h) > max_size:
        w, h = ap(w, h, max_size / max(w, h))
    return w, h


@pytest.mark.parametrize("wh", [(1920, 1080), (333, 515), (4000, 500),
                                (100, 100), (224, 224), (2048, 2048)])
@pytest.mark.parametrize("cfg", [(1024, 512, 16), (980, 224, 14)])
def test_resize_target_matches_reference(wh, cfg):
    w, h = wh
    mx, mn, stride = cfg
    r = MaxLongEdgeMinShortEdgeResize(mx, mn, stride, 14 * 14 * 9 * 1024)
    assert r.target_size(w, h) == _ref_target(w, h, mx, mn, stride,
                                              14 * 14 * 9 * 1024)


def test_image_transform_normalizes():
    img = np.full((515, 333, 3), 255, np.uint8)
    out = vit_transform()(img)
    assert out.shape[0] % 14 == 0 and out.shape[1] % 14 == 0
    np.testing.assert_allclose(out, 1.0, atol=1e-6)  # (1.0-0.5)/0.5
    out = vae_transform()(np.zeros((100, 700, 3), np.uint8))
    assert out.shape[0] % 16 == 0 and out.shape[1] % 16 == 0
    np.testing.assert_allclose(out, -1.0, atol=1e-6)


def test_corruption_augs():
    import random
    rng = random.Random(0)
    img = np.random.default_rng(0).integers(0, 255, (64, 48, 3),
                                            np.uint8)
    g = decolorization(img)
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()

    d = downscale(img, 0.5)
    assert d.shape[:2] == (32, 24)

    c, box = crop(img, (16, 12), rng=rng)
    assert c.shape[:2] == (16, 12)
    (x0, y0), (x1, y1) = box
    np.testing.assert_array_equal(c, img[y0:y1, x0:x1])

    b = motion_blur(img, kernel_size=5, angle=30.0)
    assert b.shape == img.shape
    # blur preserves the mean approximately (kernel sums to 1)
    assert abs(float(b.mean()) - float(img.mean())) < 3.0

    s = shuffle_patch(img, (2, 3), gap_size=2, rng=rng)
    assert s.shape == (64 + 2, 48 + 4, 3)

    p = inpainting(img, (4, 4), blank_ratio=0.25, rng=rng)
    assert p.shape == img.shape
    blanked = (p == 255).all(axis=-1).mean()
    assert blanked >= 0.2  # ~4 of 16 patches blanked
