"""Minimal in-repo ONNX runtime (parser + numpy executor).

The reference's animate preprocess runs its neural detectors through
onnxruntime sessions (pose2d.py:20-44 `SimpleOnnxInference` wrapping
YOLO person detection and ViTPose wholebody heatmaps). onnxruntime is
not part of this deployment's baked environment, and detector inference
is offline host-side work — so instead of a binary dependency the repo
carries a small self-contained runtime:

  * a protobuf wire-format parser for ModelProto (no `onnx` package,
    no generated code — the ONNX schema field numbers are pinned below),
  * a numpy graph executor covering the CNN/ViT op set the published
    YOLO / ViTPose checkpoints use (Conv/ConvTranspose via strided-view
    im2col, pooling, resize, attention-era ops: MatMul/Gemm/Softmax/
    LayerNormalization/Erf, plus shape plumbing ops).

This is NOT a general ONNX implementation: unsupported ops raise with
the op name so coverage gaps surface loudly, and only 2-D convolutions
are implemented (all target checkpoints are 2-D). Execution order is
the node order in the graph, which the ONNX spec requires to be
topologically sorted.

Usage:
    sess = OnnxSession("yolov10m.onnx")
    (dets,) = sess.run(["output0"], {"images": x})    # ort-like API
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire-format parsing (schema: onnx/onnx.proto3)
# ---------------------------------------------------------------------------


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    v = s = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << s
        if not b & 0x80:
            return v, i
        s += 7


def _signed(v: int) -> int:
    """proto int64 fields encode negatives as 10-byte varints."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf: bytes):
    """Yield (field_number, wire_type, raw_value) triples."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _packed_varints(buf: bytes) -> List[int]:
    out, i = [], 0
    while i < len(buf):
        v, i = _varint(buf, i)
        out.append(_signed(v))
    return out


# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    """TensorProto: dims=1 name=8 data_type=2 raw_data=9 float_data=4
    int32_data=5 int64_data=7 double_data=10 uint64_data=11."""
    dims: List[int] = []
    name = ""
    dtype_code = 1
    raw: Optional[bytes] = None
    f32: List[float] = []
    i32: List[int] = []
    i64: List[int] = []
    f64: List[float] = []
    for fn, wt, v in _fields(buf):
        if fn == 1:
            dims.extend(_packed_varints(v) if wt == 2 else [_signed(v)])
        elif fn == 2:
            dtype_code = v
        elif fn == 4:
            if wt == 2:
                f32.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                f32.append(struct.unpack("<f", v)[0])
        elif fn == 5:
            i32.extend(_packed_varints(v) if wt == 2 else [_signed(v)])
        elif fn == 7:
            i64.extend(_packed_varints(v) if wt == 2 else [_signed(v)])
        elif fn == 8:
            name = v.decode()
        elif fn == 9:
            raw = bytes(v)
        elif fn == 10:
            if wt == 2:
                f64.extend(struct.unpack(f"<{len(v) // 8}d", v))
            else:
                f64.append(struct.unpack("<d", v)[0])
    dt = _DTYPES.get(dtype_code)
    if dt is None:
        raise ValueError(f"tensor '{name}': unsupported data_type "
                         f"{dtype_code}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dt)
    elif f32:
        arr = np.asarray(f32, np.float32).astype(dt)
    elif i64:
        arr = np.asarray(i64, np.int64).astype(dt)
    elif i32:
        # int32_data also carries int8/16/bool/fp16 payloads per spec
        arr = np.asarray(i32, np.int32)
        arr = arr.astype(np.uint16).view(np.float16) \
            if dt == np.float16 else arr.astype(dt)
    elif f64:
        arr = np.asarray(f64, np.float64).astype(dt)
    else:
        arr = np.zeros(0, dt)
    return name, arr.reshape(dims).copy()


def _parse_attribute(buf: bytes):
    """AttributeProto: name=1 f=2 i=3 s=4 t=5 floats=7 ints=8 strings=9."""
    name = ""
    val = None
    floats: List[float] = []
    ints: List[int] = []
    strings: List[bytes] = []
    for fn, wt, v in _fields(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 2:
            val = struct.unpack("<f", v)[0]
        elif fn == 3:
            val = _signed(v)
        elif fn == 4:
            val = bytes(v)
        elif fn == 5:
            val = _parse_tensor(v)[1]
        elif fn == 7:
            if wt == 2:
                floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                floats.append(struct.unpack("<f", v)[0])
        elif fn == 8:
            ints.extend(_packed_varints(v) if wt == 2 else [_signed(v)])
        elif fn == 9:
            strings.append(bytes(v))
    if floats:
        val = floats
    elif ints:
        val = ints
    elif strings:
        val = strings
    return name, val


class _Node:
    __slots__ = ("op", "inputs", "outputs", "attrs", "name")

    def __init__(self, buf: bytes):
        self.op = ""
        self.name = ""
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.attrs: Dict[str, object] = {}
        for fn, _wt, v in _fields(buf):
            if fn == 1:
                self.inputs.append(v.decode())
            elif fn == 2:
                self.outputs.append(v.decode())
            elif fn == 3:
                self.name = v.decode()
            elif fn == 4:
                self.op = v.decode()
            elif fn == 5:
                k, val = _parse_attribute(v)
                self.attrs[k] = val


def _parse_value_info(buf: bytes) -> Tuple[str, Optional[List[int]]]:
    """ValueInfoProto -> (name, dims or None); dim_param -> None entry."""
    name = ""
    dims: Optional[List[int]] = None
    for fn, _wt, v in _fields(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 2:  # TypeProto
            for fn2, _w2, v2 in _fields(v):
                if fn2 != 1:  # tensor_type
                    continue
                for fn3, _w3, v3 in _fields(v2):
                    if fn3 != 2:  # shape
                        continue
                    dims = []
                    for fn4, _w4, v4 in _fields(v3):
                        if fn4 != 1:  # dim
                            continue
                        dv = None
                        for fn5, _w5, v5 in _fields(v4):
                            if fn5 == 1:
                                dv = _signed(v5) if isinstance(v5, int) \
                                    else None
                        dims.append(dv)
    return name, dims


class OnnxGraph:
    def __init__(self, buf: bytes):
        self.nodes: List[_Node] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.inputs: List[Tuple[str, Optional[List[int]]]] = []
        self.outputs: List[Tuple[str, Optional[List[int]]]] = []
        for fn, _wt, v in _fields(buf):
            if fn == 1:
                self.nodes.append(_Node(v))
            elif fn == 5:
                name, arr = _parse_tensor(v)
                self.initializers[name] = arr
            elif fn == 11:
                self.inputs.append(_parse_value_info(v))
            elif fn == 12:
                self.outputs.append(_parse_value_info(v))
        # graph "inputs" include initializers in some exporters
        self.inputs = [(n, s) for n, s in self.inputs
                       if n not in self.initializers]


def parse_model(data: bytes) -> OnnxGraph:
    """ModelProto: graph=7."""
    for fn, _wt, v in _fields(data):
        if fn == 7:
            return OnnxGraph(v)
    raise ValueError("no graph in ONNX model")


# ---------------------------------------------------------------------------
# numpy op kernels
# ---------------------------------------------------------------------------


def _auto_pads(attrs, x_hw, k_hw, strides, dilations):
    """Resolve pads [t, l, b, r] honoring auto_pad."""
    ap = attrs.get("auto_pad", b"NOTSET")
    ap = ap.decode() if isinstance(ap, bytes) else ap
    if ap in ("NOTSET", ""):
        p = attrs.get("pads", [0] * 4)
        return list(p)
    if ap == "VALID":
        return [0, 0, 0, 0]
    # SAME_UPPER / SAME_LOWER
    pads = [0, 0, 0, 0]
    for ax in range(2):
        out = -(-x_hw[ax] // strides[ax])
        eff = dilations[ax] * (k_hw[ax] - 1) + 1
        total = max(0, (out - 1) * strides[ax] + eff - x_hw[ax])
        lo = total // 2 if ap == "SAME_UPPER" else -(-total // 2)
        pads[ax] = lo
        pads[ax + 2] = total - lo
    return pads


def _window_view(x, kh, kw, sh, sw, dh, dw):
    """[N, C, H, W] -> strided view [N, C, kh, kw, oh, ow]."""
    n, c, h, w = x.shape
    oh = (h - (dh * (kh - 1) + 1)) // sh + 1
    ow = (w - (dw * (kw - 1) + 1)) // sw + 1
    s = x.strides
    return np.lib.stride_tricks.as_strided(
        x, (n, c, kh, kw, oh, ow),
        (s[0], s[1], s[2] * dh, s[3] * dw, s[2] * sh, s[3] * sw)), oh, ow


def _op_conv(node, vals):
    x = vals[node.inputs[0]]
    w = vals[node.inputs[1]]
    b = vals[node.inputs[2]] if len(node.inputs) > 2 else None
    if x.ndim != 4:
        raise NotImplementedError(f"Conv rank {x.ndim} (2-D only)")
    a = node.attrs
    sh, sw = a.get("strides", [1, 1])
    dh, dw = a.get("dilations", [1, 1])
    g = a.get("group", 1)
    kh, kw = w.shape[2:]
    pt, pl, pb, pr = _auto_pads(a, x.shape[2:], (kh, kw), (sh, sw),
                                (dh, dw))
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    cols, oh, ow = _window_view(xp, kh, kw, sh, sw, dh, dw)
    cg, mg = x.shape[1] // g, w.shape[0] // g
    cols = cols.reshape(x.shape[0], g, cg, kh, kw, oh, ow)
    wg = w.reshape(g, mg, cg, kh, kw)
    out = np.einsum("ngckwhv,gmckw->ngmhv", cols, wg, optimize=True)
    out = out.reshape(x.shape[0], w.shape[0], oh, ow)
    if b is not None:
        out = out + b[None, :, None, None]
    return out.astype(x.dtype, copy=False)


def _op_conv_transpose(node, vals):
    x = vals[node.inputs[0]]
    w = vals[node.inputs[1]]  # [C, M/g, kh, kw]
    b = vals[node.inputs[2]] if len(node.inputs) > 2 else None
    if x.ndim != 4:
        raise NotImplementedError("ConvTranspose 2-D only")
    a = node.attrs
    sh, sw = a.get("strides", [1, 1])
    dh, dw = a.get("dilations", [1, 1])
    g = a.get("group", 1)
    opad = a.get("output_padding", [0, 0])
    kh, kw = w.shape[2:]
    pads = a.get("pads", [0, 0, 0, 0])
    n, c, ih, iw = x.shape
    mg = w.shape[1]
    fh = (ih - 1) * sh + dh * (kh - 1) + 1 + opad[0]
    fw = (iw - 1) * sw + dw * (kw - 1) + 1 + opad[1]
    xg = x.reshape(n, g, c // g, ih, iw)
    wg = w.reshape(g, c // g, mg, kh, kw)
    full = np.einsum("ngchw,gcmkl->ngmhwkl", xg, wg, optimize=True)
    full = full.reshape(n, g * mg, ih, iw, kh, kw)
    out = np.zeros((n, g * mg, fh, fw), full.dtype)
    for ki in range(kh):
        for kj in range(kw):
            out[:, :, ki * dh: ki * dh + ih * sh: sh,
                kj * dw: kj * dw + iw * sw: sw] += full[:, :, :, :, ki, kj]
    pt, pl, pb, pr = pads
    out = out[:, :, pt: fh - pb, pl: fw - pr]
    if b is not None:
        out = out + b[None, :, None, None]
    return out.astype(x.dtype, copy=False)


def _op_pool(node, vals, reduce_fn, init):
    x = vals[node.inputs[0]]
    a = node.attrs
    kh, kw = a.get("kernel_shape")
    sh, sw = a.get("strides", [1, 1])
    dh, dw = a.get("dilations", [1, 1])
    pt, pl, pb, pr = _auto_pads(a, x.shape[2:], (kh, kw), (sh, sw),
                                (dh, dw))
    if a.get("ceil_mode", 0):
        # extend bottom/right padding so the last partial window counts
        eff_h, eff_w = dh * (kh - 1) + 1, dw * (kw - 1) + 1
        oh = -(-(x.shape[2] + pt + pb - eff_h) // sh) + 1
        ow = -(-(x.shape[3] + pl + pr - eff_w) // sw) + 1
        pb = (oh - 1) * sh + eff_h - x.shape[2] - pt
        pr = (ow - 1) * sw + eff_w - x.shape[3] - pl
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                constant_values=init)
    cols, _, _ = _window_view(xp, kh, kw, sh, sw, dh, dw)
    if reduce_fn is np.max:
        return cols.max(axis=(2, 3))
    if a.get("count_include_pad", 0):
        return cols.mean(axis=(2, 3))
    ones = np.pad(np.ones_like(x, np.float32),
                  ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    cnt, _, _ = _window_view(ones, kh, kw, sh, sw, dh, dw)
    return cols.sum(axis=(2, 3)) / cnt.sum(axis=(2, 3))


def _op_resize(node, vals):
    x = vals[node.inputs[0]]
    a = node.attrs
    mode = a.get("mode", b"nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    ct = a.get("coordinate_transformation_mode", b"half_pixel")
    ct = ct.decode() if isinstance(ct, bytes) else ct
    sizes = scales = None
    if len(node.inputs) > 3 and node.inputs[3]:
        sizes = vals[node.inputs[3]]
    elif len(node.inputs) > 2 and node.inputs[2]:
        sc = vals[node.inputs[2]]
        scales = sc if sc.size else None
    if sizes is None and scales is None:
        raise ValueError("Resize without scales/sizes")
    in_shape = np.asarray(x.shape)
    out_shape = (np.asarray(sizes, np.int64) if sizes is not None
                 else np.floor(in_shape * np.asarray(scales)).astype(
                     np.int64))
    if tuple(out_shape[:2]) != x.shape[:2]:
        raise NotImplementedError("Resize over N/C axes")

    def src_coords(odim, idim):
        o = np.arange(odim, dtype=np.float64)
        if idim == odim:
            return o
        scale = odim / idim
        if ct == "align_corners":
            return o * (idim - 1) / max(odim - 1, 1)
        if ct == "asymmetric":
            return o / scale
        return (o + 0.5) / scale - 0.5  # half_pixel

    ys = src_coords(int(out_shape[2]), x.shape[2])
    xs = src_coords(int(out_shape[3]), x.shape[3])
    if mode == "nearest":
        nm = a.get("nearest_mode", b"round_prefer_floor")
        nm = nm.decode() if isinstance(nm, bytes) else nm
        if nm == "floor":
            yi, xi = np.floor(ys), np.floor(xs)
        elif nm == "ceil":
            yi, xi = np.ceil(ys), np.ceil(xs)
        elif nm == "round_prefer_ceil":
            yi, xi = np.floor(ys + 0.5), np.floor(xs + 0.5)
        else:  # round_prefer_floor
            yi, xi = np.ceil(ys - 0.5), np.ceil(xs - 0.5)
        yi = np.clip(yi, 0, x.shape[2] - 1).astype(np.int64)
        xi = np.clip(xi, 0, x.shape[3] - 1).astype(np.int64)
        return x[:, :, yi[:, None], xi[None, :]]
    # linear
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, x.shape[2] - 1)
    y1 = np.clip(y0 + 1, 0, x.shape[2] - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, x.shape[3] - 1)
    x1 = np.clip(x0 + 1, 0, x.shape[3] - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, None, :, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, None, :]
    g = lambda yy, xx: x[:, :, yy[:, None], xx[None, :]]  # noqa: E731
    out = (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
           + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx)
    return out.astype(x.dtype, copy=False)


def _erf(x):
    from scipy.special import erf
    return erf(x)


def _op_slice(node, vals):
    x = vals[node.inputs[0]]
    if len(node.inputs) > 1:  # opset >= 10: inputs
        starts = vals[node.inputs[1]].astype(np.int64)
        ends = vals[node.inputs[2]].astype(np.int64)
        axes = (vals[node.inputs[3]].astype(np.int64)
                if len(node.inputs) > 3 and node.inputs[3]
                else np.arange(len(starts)))
        steps = (vals[node.inputs[4]].astype(np.int64)
                 if len(node.inputs) > 4 and node.inputs[4]
                 else np.ones(len(starts), np.int64))
    else:  # opset 1: attributes
        starts = np.asarray(node.attrs["starts"], np.int64)
        ends = np.asarray(node.attrs["ends"], np.int64)
        axes = np.asarray(node.attrs.get(
            "axes", list(range(len(starts)))), np.int64)
        steps = np.ones(len(starts), np.int64)
    sl = [slice(None)] * x.ndim
    int_max = np.iinfo(np.int32).max
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % x.ndim
        open_end = (sp > 0 and en >= int_max) or \
            (sp < 0 and en <= -int_max)
        sl[ax] = slice(int(st), None if open_end else int(en), int(sp))
    return x[tuple(sl)]


def _op_split(node, vals, n_out):
    x = vals[node.inputs[0]]
    ax = node.attrs.get("axis", 0)
    if len(node.inputs) > 1 and node.inputs[1]:
        sizes = vals[node.inputs[1]].astype(np.int64).tolist()
    elif "split" in node.attrs:
        sizes = list(node.attrs["split"])
    else:
        n = node.attrs.get("num_outputs", n_out)
        d = x.shape[ax]
        base = -(-d // n)
        sizes = [base] * (d // base) + ([d % base] if d % base else [])
    return np.split(x, np.cumsum(sizes)[:-1], axis=ax)


def _op_pad(node, vals):
    x = vals[node.inputs[0]]
    if len(node.inputs) > 1:
        pads = vals[node.inputs[1]].astype(np.int64)
        cval = float(vals[node.inputs[2]]) if len(node.inputs) > 2 \
            and node.inputs[2] else 0.0
    else:
        pads = np.asarray(node.attrs["pads"], np.int64)
        cval = node.attrs.get("value", 0.0)
    mode = node.attrs.get("mode", b"constant")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    half = len(pads) // 2
    pw = list(zip(pads[:half], pads[half:]))
    if mode == "constant":
        return np.pad(x, pw, constant_values=cval)
    return np.pad(x, pw, mode={"reflect": "reflect",
                               "edge": "edge"}[mode])


def _op_gemm(node, vals):
    a = vals[node.inputs[0]]
    b = vals[node.inputs[1]]
    c = vals[node.inputs[2]] if len(node.inputs) > 2 else None
    at = node.attrs
    if at.get("transA", 0):
        a = a.T
    if at.get("transB", 0):
        b = b.T
    out = at.get("alpha", 1.0) * (a @ b)
    if c is not None:
        out = out + at.get("beta", 1.0) * c
    return out


def _reduce(np_fn):
    def run(node, vals):
        x = vals[node.inputs[0]]
        if len(node.inputs) > 1 and node.inputs[1]:
            axes = vals[node.inputs[1]].astype(np.int64)
            axes = tuple(int(a) for a in axes) or None
        else:
            axes = node.attrs.get("axes")
            axes = tuple(axes) if axes is not None else None
        keep = bool(node.attrs.get("keepdims", 1))
        return np_fn(x, axis=axes, keepdims=keep)
    return run


def _op_cast(node, vals):
    return vals[node.inputs[0]].astype(_DTYPES[node.attrs["to"]])


def _op_constant(node, vals):
    a = node.attrs
    if "value" in a:
        return a["value"]
    if "value_float" in a:
        return np.float32(a["value_float"])
    if "value_int" in a:
        return np.int64(a["value_int"])
    if "value_floats" in a:
        return np.asarray(a["value_floats"], np.float32)
    if "value_ints" in a:
        return np.asarray(a["value_ints"], np.int64)
    raise NotImplementedError("Constant variant")


def _op_layer_norm(node, vals):
    x = vals[node.inputs[0]]
    w = vals[node.inputs[1]]
    b = vals[node.inputs[2]] if len(node.inputs) > 2 else None
    ax = node.attrs.get("axis", -1)
    eps = node.attrs.get("epsilon", 1e-5)
    axes = tuple(range(ax % x.ndim, x.ndim))
    mu = x.mean(axis=axes, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=axes, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps) * w
    return y + b if b is not None else y


def _op_batch_norm(node, vals):
    x, w, b, mean, var = (vals[n] for n in node.inputs[:5])
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean.reshape(shape)) / np.sqrt(var.reshape(shape) + eps)
            * w.reshape(shape) + b.reshape(shape))


_BINARY = {
    "Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
    "Div": np.divide, "Pow": np.power, "Min": np.minimum,
    "Max": np.maximum, "Equal": np.equal, "Greater": np.greater,
    "Less": np.less, "And": np.logical_and, "Or": np.logical_or,
    "Mod": np.fmod,
}

_UNARY = {
    "Relu": lambda x: np.maximum(x, 0), "Sigmoid":
        lambda x: 1.0 / (1.0 + np.exp(-x)),
    "Tanh": np.tanh, "Exp": np.exp, "Log": np.log, "Sqrt": np.sqrt,
    "Neg": np.negative, "Abs": np.abs, "Floor": np.floor,
    "Ceil": np.ceil, "Erf": _erf, "Not": np.logical_not,
    "Identity": lambda x: x,
    "Softplus": lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0),
    "HardSwish": lambda x: x * np.clip(x / 6.0 + 0.5, 0.0, 1.0),
    "Mish": lambda x: x * np.tanh(np.log1p(np.exp(-np.abs(x)))
                                  + np.maximum(x, 0)),
}


class OnnxSession:
    """onnxruntime.InferenceSession-alike over the numpy executor."""

    def __init__(self, model_path_or_bytes):
        if isinstance(model_path_or_bytes, (bytes, bytearray)):
            data = bytes(model_path_or_bytes)
        else:
            with open(model_path_or_bytes, "rb") as fh:
                data = fh.read()
        self.graph = parse_model(data)

    # -- ort-compatible introspection --------------------------------------
    class _IO:
        def __init__(self, name, shape):
            self.name = name
            self.shape = shape

    def get_inputs(self):
        return [self._IO(n, s) for n, s in self.graph.inputs]

    def get_outputs(self):
        return [self._IO(n, s) for n, s in self.graph.outputs]

    # -- execution ----------------------------------------------------------
    def run(self, output_names: Optional[Sequence[str]],
            feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
        g = self.graph
        if not output_names:
            output_names = [n for n, _ in g.outputs]
        vals: Dict[str, np.ndarray] = dict(g.initializers)
        for k, v in feeds.items():
            vals[k] = np.asarray(v)
        # last-use positions for memory reclamation
        last_use: Dict[str, int] = {}
        for idx, node in enumerate(g.nodes):
            for nm in node.inputs:
                if nm:
                    last_use[nm] = idx
        keep = set(output_names) | set(g.initializers)
        for idx, node in enumerate(g.nodes):
            outs = self._run_node(node, vals)
            for nm, arr in zip(node.outputs, outs):
                if nm:
                    vals[nm] = arr
            for nm in node.inputs:
                if nm and nm not in keep and last_use.get(nm) == idx:
                    vals.pop(nm, None)
        missing = [n for n in output_names if n not in vals]
        if missing:
            raise KeyError(f"outputs not produced: {missing}")
        return [vals[n] for n in output_names]

    def _run_node(self, node: _Node, vals) -> List[np.ndarray]:
        op = node.op
        if op in _BINARY:
            return [_BINARY[op](vals[node.inputs[0]],
                                vals[node.inputs[1]])]
        if op in _UNARY:
            return [_UNARY[op](vals[node.inputs[0]])]
        if op == "Conv":
            return [_op_conv(node, vals)]
        if op == "ConvTranspose":
            return [_op_conv_transpose(node, vals)]
        if op == "MaxPool":
            return [_op_pool(node, vals, np.max, -np.inf)]
        if op == "AveragePool":
            return [_op_pool(node, vals, np.mean, 0.0)]
        if op == "GlobalAveragePool":
            return [vals[node.inputs[0]].mean(axis=(2, 3),
                                              keepdims=True)]
        if op == "MatMul":
            return [vals[node.inputs[0]] @ vals[node.inputs[1]]]
        if op == "Gemm":
            return [_op_gemm(node, vals)]
        if op == "BatchNormalization":
            return [_op_batch_norm(node, vals)]
        if op == "LayerNormalization":
            return [_op_layer_norm(node, vals)]
        if op == "InstanceNormalization":
            x = vals[node.inputs[0]]
            eps = node.attrs.get("epsilon", 1e-5)
            axes = tuple(range(2, x.ndim))
            mu = x.mean(axis=axes, keepdims=True)
            var = x.var(axis=axes, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return [(x - mu) / np.sqrt(var + eps)
                    * vals[node.inputs[1]].reshape(shape)
                    + vals[node.inputs[2]].reshape(shape)]
        if op == "Softmax":
            x = vals[node.inputs[0]]
            ax = node.attrs.get("axis", -1)
            m = x.max(axis=ax, keepdims=True)
            e = np.exp(x - m)
            return [e / e.sum(axis=ax, keepdims=True)]
        if op == "LeakyRelu":
            x = vals[node.inputs[0]]
            al = node.attrs.get("alpha", 0.01)
            return [np.where(x >= 0, x, al * x)]
        if op == "HardSigmoid":
            x = vals[node.inputs[0]]
            al = node.attrs.get("alpha", 0.2)
            be = node.attrs.get("beta", 0.5)
            return [np.clip(al * x + be, 0.0, 1.0)]
        if op == "Gelu":
            x = vals[node.inputs[0]]
            return [0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))]
        if op == "Clip":
            x = vals[node.inputs[0]]
            lo = (vals[node.inputs[1]] if len(node.inputs) > 1
                  and node.inputs[1] else node.attrs.get("min", -np.inf))
            hi = (vals[node.inputs[2]] if len(node.inputs) > 2
                  and node.inputs[2] else node.attrs.get("max", np.inf))
            return [np.clip(x, lo, hi)]
        if op == "Concat":
            return [np.concatenate([vals[n] for n in node.inputs],
                                   axis=node.attrs.get("axis", 0))]
        if op == "Split":
            return _op_split(node, vals, len(node.outputs))
        if op == "Slice":
            return [_op_slice(node, vals)]
        if op == "Reshape":
            x = vals[node.inputs[0]]
            shp = vals[node.inputs[1]].astype(np.int64).tolist()
            shp = [x.shape[i] if (s == 0 and not node.attrs.get(
                "allowzero", 0)) else s for i, s in enumerate(shp)]
            return [x.reshape(shp)]
        if op == "Transpose":
            x = vals[node.inputs[0]]
            perm = node.attrs.get("perm",
                                  list(range(x.ndim))[::-1])
            return [np.transpose(x, perm)]
        if op == "Flatten":
            x = vals[node.inputs[0]]
            ax = node.attrs.get("axis", 1) % (x.ndim + 1)
            return [x.reshape(int(np.prod(x.shape[:ax], initial=1)), -1)]
        if op == "Shape":
            return [np.asarray(vals[node.inputs[0]].shape, np.int64)]
        if op == "Size":
            return [np.int64(vals[node.inputs[0]].size)]
        if op == "Gather":
            x = vals[node.inputs[0]]
            idx = vals[node.inputs[1]].astype(np.int64)
            return [np.take(x, idx, axis=node.attrs.get("axis", 0))]
        if op == "GatherElements":
            x = vals[node.inputs[0]]
            idx = vals[node.inputs[1]].astype(np.int64)
            return [np.take_along_axis(x, idx,
                                       axis=node.attrs.get("axis", 0))]
        if op == "Unsqueeze":
            x = vals[node.inputs[0]]
            axes = (vals[node.inputs[1]].astype(np.int64).tolist()
                    if len(node.inputs) > 1 else node.attrs["axes"])
            for ax in sorted(a % (x.ndim + 1) for a in axes):
                x = np.expand_dims(x, ax)
            return [x]
        if op == "Squeeze":
            x = vals[node.inputs[0]]
            if len(node.inputs) > 1 and node.inputs[1]:
                axes = tuple(int(a) for a in
                             vals[node.inputs[1]].astype(np.int64))
            else:
                axes = node.attrs.get("axes")
                axes = tuple(axes) if axes else None
            return [np.squeeze(x, axis=axes)]
        if op == "Cast":
            return [_op_cast(node, vals)]
        if op == "Constant":
            return [_op_constant(node, vals)]
        if op == "ConstantOfShape":
            shp = vals[node.inputs[0]].astype(np.int64)
            v = node.attrs.get("value")
            v = v if v is not None else np.zeros(1, np.float32)
            return [np.full(shp, v.reshape(-1)[0], v.dtype)]
        if op == "Expand":
            x = vals[node.inputs[0]]
            shp = vals[node.inputs[1]].astype(np.int64)
            return [np.broadcast_to(
                x, np.broadcast_shapes(x.shape, tuple(shp))).copy()]
        if op == "Range":
            s, e, d = (vals[n].item() for n in node.inputs)
            return [np.arange(s, e, d)]
        if op == "Where":
            return [np.where(vals[node.inputs[0]], vals[node.inputs[1]],
                             vals[node.inputs[2]])]
        if op == "Tile":
            return [np.tile(vals[node.inputs[0]],
                            vals[node.inputs[1]].astype(np.int64))]
        if op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
                  "ReduceProd"):
            fn = {"ReduceMean": np.mean, "ReduceSum": np.sum,
                  "ReduceMax": np.max, "ReduceMin": np.min,
                  "ReduceProd": np.prod}[op]
            return [_reduce(fn)(node, vals)]
        if op == "ArgMax":
            x = vals[node.inputs[0]]
            ax = node.attrs.get("axis", 0)
            keep = node.attrs.get("keepdims", 1)
            out = np.argmax(x, axis=ax)
            return [np.expand_dims(out, ax) if keep else out]
        if op == "TopK":
            x = vals[node.inputs[0]]
            k = int(vals[node.inputs[1]].reshape(-1)[0])
            ax = node.attrs.get("axis", -1)
            largest = node.attrs.get("largest", 1)
            idx = np.argsort(-x if largest else x, axis=ax,
                             kind="stable")
            idx = np.take(idx, np.arange(k), axis=ax)
            return [np.take_along_axis(x, idx, axis=ax),
                    idx.astype(np.int64)]
        if op == "Pad":
            return [_op_pad(node, vals)]
        if op == "Resize":
            return [_op_resize(node, vals)]
        if op == "Upsample":
            return [_op_resize(node, vals)]
        if op == "Dropout":
            return [vals[node.inputs[0]]]
        if op == "ReduceL2":
            return [_reduce(lambda x, axis, keepdims: np.sqrt(
                np.sum(x * x, axis=axis, keepdims=keepdims)))(node, vals)]
        if op == "Einsum":
            eq = node.attrs["equation"]
            eq = eq.decode() if isinstance(eq, bytes) else eq
            return [np.einsum(eq, *[vals[n] for n in node.inputs],
                              optimize=True)]
        if op == "NonMaxSuppression":
            return [_op_nms(node, vals)]
        raise NotImplementedError(
            f"ONNX op '{op}' not implemented (node '{node.name}')")


def _op_nms(node, vals):
    """NonMaxSuppression: boxes [B, N, 4] (y1,x1,y2,x2 per center_point_
    box=0), scores [B, C, N] -> selected [K, 3] (batch, class, index)."""
    boxes = vals[node.inputs[0]]
    scores = vals[node.inputs[1]]
    max_out = int(vals[node.inputs[2]].reshape(-1)[0]) \
        if len(node.inputs) > 2 and node.inputs[2] else 0
    iou_thr = float(vals[node.inputs[3]].reshape(-1)[0]) \
        if len(node.inputs) > 3 and node.inputs[3] else 0.0
    score_thr = float(vals[node.inputs[4]].reshape(-1)[0]) \
        if len(node.inputs) > 4 and node.inputs[4] else -np.inf
    center = node.attrs.get("center_point_box", 0)
    sel = []
    for b in range(boxes.shape[0]):
        bb = boxes[b]
        if center:
            cx, cy, w, h = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
            bb = np.stack([cy - h / 2, cx - w / 2, cy + h / 2,
                           cx + w / 2], axis=1)
        for c in range(scores.shape[1]):
            keep = nms_indices(
                np.stack([bb[:, 1], bb[:, 0], bb[:, 3] - bb[:, 1],
                          bb[:, 2] - bb[:, 0]], axis=1),
                scores[b, c], score_thr, iou_thr)
            for i in keep[:max_out or None]:
                sel.append((b, c, i))
    return np.asarray(sel, np.int64).reshape(-1, 3)


def nms_indices(boxes_xywh: np.ndarray, scores: np.ndarray,
                score_threshold: float, iou_threshold: float
                ) -> List[int]:
    """Greedy NMS over [N, 4] xywh boxes; returns kept indices sorted by
    descending score (the cv2.dnn.NMSBoxes contract the reference's YOLO
    postprocess relies on, pose2d.py:192)."""
    boxes_xywh = np.asarray(boxes_xywh, np.float64)
    scores = np.asarray(scores, np.float64)
    valid = np.flatnonzero(scores >= score_threshold)
    order = valid[np.argsort(-scores[valid], kind="stable")]
    x, y, w, h = (boxes_xywh[:, i] for i in range(4))
    x2, y2 = x + w, y + h
    area = np.maximum(w, 0) * np.maximum(h, 0)
    keep: List[int] = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x[i], x[order])
        yy1 = np.maximum(y[i], y[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        inter = (np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0))
        union = area[i] + area[order] - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed[order[iou > iou_threshold]] = True
        suppressed[i] = False
    return keep
