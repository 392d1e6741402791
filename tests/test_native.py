"""Native host-ops (C++ ctypes) parity vs the numpy reference paths.

The native module is the TPU framework's stand-in for the reference's
native data path (decord/torchvision C++): same math, ctypes-bound.
"""

import numpy as np
import pytest

from univid_tpu import native
from univid_tpu.data.openvid import _resize_bilinear


@pytest.fixture(scope="module")
def built():
    ok = native.build(verbose=True)
    assert ok, "g++ build of native/host_ops.cc failed"
    assert native.available()
    return ok


def test_resize_bilinear_f32_parity(built):
    rng = np.random.default_rng(0)
    img = rng.random((37, 53, 3), np.float32)
    got = native.resize_bilinear(img, 24, 64)
    ref = _resize_bilinear(img, 24, 64)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_bilinear_u8_fused_parity(built):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (41, 29, 3), np.uint8)
    # fused u8 -> f32 with y = x/127.5 - 1
    got = native.resize_bilinear(img, 56, 56, scale=1 / 127.5, shift=-1.0)
    ref = _resize_bilinear(img.astype(np.float32), 56, 56) / 127.5 - 1.0
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_resize_upscale_and_identity(built):
    rng = np.random.default_rng(2)
    img = rng.random((16, 16, 1), np.float32)
    up = native.resize_bilinear(img, 33, 47)
    ref = _resize_bilinear(img, 33, 47)
    np.testing.assert_allclose(up, ref, atol=1e-5)
    same = native.resize_bilinear(img, 16, 16)
    np.testing.assert_allclose(same, img, atol=1e-6)


def test_patchify_parity(built):
    rng = np.random.default_rng(3)
    img = rng.random((42, 28, 5), np.float32)
    got = native.patchify(img, 14)
    x = img.reshape(3, 14, 2, 14, 5).transpose(0, 2, 1, 3, 4)
    ref = x.reshape(-1, 14 * 14 * 5)
    np.testing.assert_array_equal(got, ref)


def test_u8_affine(built):
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (7, 9, 3), np.uint8)
    got = native.u8_to_f32_affine(x, 1 / 127.5, -1.0)
    np.testing.assert_allclose(got, x.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)


def test_patchify_matches_packed_dataset(built):
    """native.patchify == the numpy patchify the PackedDataset uses."""
    from univid_tpu.data.packed_dataset import patchify_np
    rng = np.random.default_rng(5)
    img = rng.random((28, 28, 3), np.float32)
    np.testing.assert_array_equal(native.patchify(img, 14),
                                  patchify_np(img, 14))
