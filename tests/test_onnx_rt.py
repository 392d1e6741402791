"""Tests for the in-repo ONNX runtime + pose detector drivers.

Fixtures are built by a minimal protobuf ENCODER below (mirror of the
parser in univid_tpu/data/onnx_rt.py), so no `onnx` package is needed;
convolution ops are checked against torch.nn.functional oracles.
"""

import struct

import numpy as np
import pytest

from univid_tpu.data.onnx_rt import OnnxSession, nms_indices
from univid_tpu.data.pose2d import (Pose2dDriver, decode_heatmaps,
                                    wholebody_to_pose_meta)

# ---------------------------------------------------------------------------
# minimal ONNX protobuf encoder (test-only)
# ---------------------------------------------------------------------------


def _uv(v):  # unsigned varint
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _sv(v):  # int64 varint (negatives as two's complement)
    return _uv(v & ((1 << 64) - 1))


def _tag(fn, wt):
    return _uv((fn << 3) | wt)


def _ld(fn, payload: bytes):  # length-delimited field
    return _tag(fn, 2) + _uv(len(payload)) + payload


_NP_CODE = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
            np.dtype(np.int32): 6, np.dtype(np.uint8): 2,
            np.dtype(np.bool_): 9, np.dtype(np.float64): 11}


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b""
    for d in arr.shape:
        out += _tag(1, 0) + _sv(d)
    out += _tag(2, 0) + _uv(_NP_CODE[arr.dtype])
    out += _ld(8, name.encode())
    out += _ld(9, arr.tobytes())
    return out


def attr(name: str, value) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value)
    elif isinstance(value, bool) or isinstance(value, int):
        out += _tag(3, 0) + _sv(int(value))
    elif isinstance(value, bytes):
        out += _ld(4, value)
    elif isinstance(value, str):
        out += _ld(4, value.encode())
    elif isinstance(value, np.ndarray):
        out += _ld(5, tensor_proto("", value))
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            out += _ld(8, b"".join(_sv(v) for v in value))  # packed ints
        else:
            out += _ld(7, struct.pack(f"<{len(value)}f", *value))
    else:
        raise TypeError(type(value))
    return out


def node(op: str, inputs, outputs, **attrs) -> bytes:
    out = b""
    for n in inputs:
        out += _ld(1, n.encode())
    for n in outputs:
        out += _ld(2, n.encode())
    out += _ld(4, op.encode())
    for k, v in attrs.items():
        out += _ld(5, attr(k, v))
    return out


def value_info(name: str, shape) -> bytes:
    dims = b""
    for d in shape:
        dims += _ld(1, _tag(1, 0) + _sv(d))
    tensor_type = _ld(1, _tag(1, 0) + _uv(1) + _ld(2, dims))
    return _ld(1, name.encode()) + _ld(2, tensor_type)


def build_model(nodes, inputs, outputs, initializers=()) -> bytes:
    g = b""
    for n in nodes:
        g += _ld(1, n)
    for name, arr in initializers:
        g += _ld(5, tensor_proto(name, arr))
    for name, shape in inputs:
        g += _ld(11, value_info(name, shape))
    for name, shape in outputs:
        g += _ld(12, value_info(name, shape))
    return _ld(7, g)  # ModelProto.graph


# ---------------------------------------------------------------------------
# executor op tests
# ---------------------------------------------------------------------------


def test_conv_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for group, stride, pad, dil in [(1, 1, 1, 1), (2, 2, 0, 1),
                                    (4, 1, 2, 2)]:
        x = rng.normal(size=(2, 4, 13, 11)).astype(np.float32)
        w = rng.normal(size=(8, 4 // group, 3, 3)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        model = build_model(
            [node("Conv", ["x", "w", "b"], ["y"], group=group,
                  strides=[stride, stride], dilations=[dil, dil],
                  pads=[pad, pad, pad, pad])],
            [("x", x.shape)], [("y", [0])],
            [("w", w), ("b", b)])
        (y,) = OnnxSession(model).run(["y"], {"x": x})
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                       torch.from_numpy(b), stride=stride,
                       padding=pad, dilation=dil, groups=group).numpy()
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 8, 8)).astype(np.float32)
    w = rng.normal(size=(6, 4, 4, 4)).astype(np.float32)
    model = build_model(
        [node("ConvTranspose", ["x", "w"], ["y"], strides=[2, 2],
              pads=[1, 1, 1, 1])],
        [("x", x.shape)], [("y", [0])], [("w", w)])
    (y,) = OnnxSession(model).run(["y"], {"x": x})
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=2, padding=1).numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_maxpool_and_upsample():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 10, 10)).astype(np.float32)
    model = build_model(
        [node("MaxPool", ["x"], ["p"], kernel_shape=[2, 2],
              strides=[2, 2]),
         node("Resize", ["p", "", "scales"], ["y"], mode=b"nearest",
              coordinate_transformation_mode=b"asymmetric",
              nearest_mode=b"floor")],
        [("x", x.shape)], [("y", [0])],
        [("scales", np.array([1, 1, 2, 2], np.float32))])
    (y,) = OnnxSession(model).run(["y"], {"x": x})
    ref = F.interpolate(F.max_pool2d(torch.from_numpy(x), 2),
                        scale_factor=2, mode="nearest").numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_transformer_block_ops():
    """LayerNorm -> MatMul -> Softmax -> Gemm chain (the ViTPose
    backbone op set)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 16)).astype(np.float32)
    w = rng.normal(size=(16, 16)).astype(np.float32)
    g = np.ones(16, np.float32)
    b = np.zeros(16, np.float32)
    model = build_model(
        [node("LayerNormalization", ["x", "g", "b"], ["ln"],
              epsilon=1e-5),
         node("MatMul", ["ln", "w"], ["mm"]),
         node("Softmax", ["mm"], ["sm"], axis=-1),
         node("Gemm", ["sm", "w"], ["y"], alpha=1.0, beta=1.0,
              transB=1)],
        [("x", x.shape)], [("y", [0])],
        [("w", w), ("g", g), ("b", b)])
    (y,) = OnnxSession(model).run(["y"], {"x": x})
    mu = x.mean(-1, keepdims=True)
    ln = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    mm = ln @ w
    e = np.exp(mm - mm.max(-1, keepdims=True))
    sm = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(y, sm @ w.T, rtol=1e-4, atol=1e-4)


def test_shape_plumbing_ops():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    model = build_model(
        [node("Transpose", ["x"], ["t"], perm=[0, 2, 1]),
         node("Slice", ["t", "st", "en", "ax"], ["s"]),
         node("Concat", ["s", "s"], ["c"], axis=1),
         node("Reshape", ["c", "shape"], ["y"])],
        [("x", x.shape)], [("y", [0])],
        [("st", np.array([1], np.int64)),
         ("en", np.array([3], np.int64)),
         ("ax", np.array([1], np.int64)),
         ("shape", np.array([2, -1], np.int64))])
    (y,) = OnnxSession(model).run(["y"], {"x": x})
    t = x.transpose(0, 2, 1)[:, 1:3]
    ref = np.concatenate([t, t], axis=1).reshape(2, -1)
    np.testing.assert_allclose(y, ref)


def test_split_sigmoid_mul():
    """Split + Sigmoid + Mul (SiLU decomposition used by YOLO necks)."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 8, 4, 4)).astype(np.float32)
    model = build_model(
        [node("Split", ["x"], ["a", "b"], axis=1, num_outputs=2),
         node("Sigmoid", ["a"], ["sa"]),
         node("Mul", ["a", "sa"], ["silu"]),
         node("Add", ["silu", "b"], ["y"])],
        [("x", x.shape)], [("y", [0])])
    (y,) = OnnxSession(model).run(["y"], {"x": x})
    a, b = x[:, :4], x[:, 4:]
    np.testing.assert_allclose(y, a / (1 + np.exp(-a)) + b, rtol=1e-5,
                               atol=1e-6)


def test_unsupported_op_raises():
    model = build_model([node("FancyCustomOp", ["x"], ["y"])],
                        [("x", [1])], [("y", [1])])
    with pytest.raises(NotImplementedError, match="FancyCustomOp"):
        OnnxSession(model).run(["y"], {"x": np.zeros(1, np.float32)})


def test_nms_greedy():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 5, 5]],
                     np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_indices(boxes, scores, 0.05, 0.5)
    assert keep == [0, 2]  # box 1 overlaps box 0 above IoU 0.5


# ---------------------------------------------------------------------------
# pose decode + driver tests
# ---------------------------------------------------------------------------


def _gaussian_heatmap(h, w, cx, cy, sigma=2.0):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2)
                  / (2 * sigma * sigma)).astype(np.float32)


def test_decode_heatmaps_subpixel():
    """DARK decode recovers a subpixel gaussian peak and maps it
    through center/scale to image coordinates."""
    h, w = 64, 48
    true_x, true_y = 20.3, 33.7
    hm = _gaussian_heatmap(h, w, true_x, true_y)[None]
    center = np.array([100.0, 80.0])
    scale_px = np.array([96.0, 128.0])  # maps 48x64 -> 96x128 px
    pts, prob = decode_heatmaps(hm, center, scale_px, unbiased=True)
    img_x = true_x * (96.0 / 48) + 100.0 - 48.0
    img_y = true_y * (128.0 / 64) + 80.0 - 64.0
    assert abs(pts[0, 0] - img_x) < 0.3
    assert abs(pts[0, 1] - img_y) < 0.3
    assert prob[0, 0] > 0.9


def test_wholebody_split_shapes():
    kp = np.arange(133 * 3, dtype=np.float32).reshape(133, 3)
    meta = wholebody_to_pose_meta(kp)
    assert meta.body.shape == (20, 3)
    assert meta.lhand.shape == (21, 3)
    assert meta.rhand.shape == (21, 3)
    assert meta.face.shape == (69, 3)
    # nose (idx 0 in both halves) passes through unaveraged
    np.testing.assert_allclose(meta.body[0], kp[0])
    # neck = mean of the two shoulders (rows 5, 6)
    np.testing.assert_allclose(meta.body[1], (kp[5] + kp[6]) / 2)


def _vitpose_fixture(tmp_path):
    """Tiny 'ViTPose' ONNX: Conv head emitting 133 peaked heatmaps."""
    rng = np.random.default_rng(7)
    # input 3x64x48 -> AveragePool(4) to 16x12 heatmaps, then conv to
    # 133 channels with a fixed bias pattern creating distinct peaks
    w = np.zeros((133, 3, 1, 1), np.float32)
    w[:, 0, 0, 0] = 1.0
    model = build_model(
        [node("AveragePool", ["x"], ["p"], kernel_shape=[4, 4],
              strides=[4, 4]),
         node("Conv", ["p", "w"], ["heat"], pads=[0, 0, 0, 0])],
        [("x", [1, 3, 64, 48])], [("heat", [1, 133, 16, 12])],
        [("w", w)])
    path = tmp_path / "end2end.onnx"
    path.write_bytes(model)
    del rng
    return str(path)


def test_pose2d_driver_end_to_end(tmp_path):
    """Driver runs a real ONNX graph through the numpy executor and
    returns PoseMeta with peaks where the image is brightest."""
    path = _vitpose_fixture(tmp_path)
    frames = np.zeros((2, 128, 96, 3), np.uint8)
    frames[:, 40:56, 30:42, :] = 255  # bright blob
    driver = Pose2dDriver(path)  # no detector -> full-frame box
    metas = driver(frames)
    assert len(metas) == 2
    for meta in metas:
        assert meta.body.shape == (20, 3)
        # every keypoint should land inside the frame bounds
        assert (meta.body[:, 0] >= 0).all()
        assert (meta.body[:, 0] <= 96).all()
        # the peak tracks the bright blob's rows
        assert 20 <= meta.body[:, 1].mean() <= 76


def _yolo_fixture(tmp_path):
    """Tiny 'YOLO' ONNX emitting a fixed [1, N, 6] xyxy detection set
    via Constant + Add (exercises the end-to-end output layout)."""
    dets = np.array([[[10, 10, 300, 600, 0.9, 0.0],
                      [12, 12, 280, 580, 0.8, 0.0],
                      [500, 100, 520, 130, 0.95, 16.0]]], np.float32)
    model = build_model(
        [node("ReduceMean", ["x"], ["m"], keepdims=1),
         node("Mul", ["m", "zero"], ["z"]),
         node("Add", ["dets", "z"], ["output0"])],
        [("x", [1, 3, 640, 640])], [("output0", [1, 3, 6])],
        [("dets", dets), ("zero", np.zeros(1, np.float32))])
    path = tmp_path / "det.onnx"
    path.write_bytes(model)
    return str(path)


def test_yolo_detector_selects_person(tmp_path):
    from univid_tpu.data.pose2d import YoloDetector

    det = YoloDetector(_yolo_fixture(tmp_path))
    img = np.zeros((640, 640, 3), np.uint8)
    box = det(img)
    # the class-16 box (highest score) is ignored; NMS keeps the larger
    # person box
    assert box is not None
    assert box[4] == pytest.approx(0.9)
    assert box[0] == pytest.approx(10, abs=1)
    assert box[3] == pytest.approx(600, abs=1)


def test_preprocess_cli_with_onnx_ckpt(tmp_path):
    """--ckpt_path wires the published checkpoint layout through the
    in-repo ONNX executor end-to-end (preprocess_data.py:99-105)."""
    import os

    from univid_tpu.cli.preprocess_animate import main as prep_main
    from univid_tpu.data.video_io import save_video
    from PIL import Image

    import pathlib

    ckpt = tmp_path / "ckpt"
    (ckpt / "pose2d").mkdir(parents=True)
    fx_dir = tmp_path / "fx"
    fx_dir.mkdir()
    fixture = _vitpose_fixture(fx_dir)
    (ckpt / "pose2d" / "vitpose_h_wholebody.onnx").write_bytes(
        pathlib.Path(fixture).read_bytes())

    rng = np.random.default_rng(13)
    vid = str(tmp_path / "drive.mp4")
    save_video(rng.integers(0, 255, (4, 96, 128, 3), np.uint8), vid,
               fps=8)
    ref = str(tmp_path / "ref.png")
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)
                    .astype(np.uint8)).save(ref)
    out = str(tmp_path / "prep_out")
    meta = prep_main(["--video_path", vid, "--refer_path", ref,
                      "--save_path", out, "--resolution_area", "160",
                      "96", "--fps", "-1",
                      "--ckpt_path", str(ckpt)])
    for key in ("ref", "pose_video", "face_video"):
        assert os.path.exists(meta["paths"][key])
