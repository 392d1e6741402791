"""ctypes bindings for the native host-side data-loader kernels.

The reference framework leans on native code for its host data path
(decord/ffmpeg video decode, torchvision C++ transforms); this module is
the TPU framework's equivalent: `native/host_ops.cc` built as
libuv_host.so and bound via ctypes (no pybind11 in the image). Every
entry point has an exact-parity numpy fallback, so the package works
unbuilt — the native path is a drop-in speedup, not a requirement.

Build: `make -C native` from the repo root, or `build()` here (invoked
lazily on first use; failures are cached and silently fall back).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_NAME = "libuv_host.so"
_here = os.path.dirname(os.path.abspath(__file__))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(_here)),
                        "native", "host_ops.cc")


def build(verbose: bool = False) -> bool:
    """Compile host_ops.cc -> libuv_host.so next to this file.

    Compiles to a pid-unique temp name and os.rename()s into place so
    concurrent first-use builds (forked dataloader workers, pytest-xdist)
    never load a partially written library."""
    src = _src_path()
    if not os.path.exists(src):
        return False
    out = os.path.join(_here, _LIB_NAME)
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared",
           "-std=c++17", src, "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=120)
        if r.returncode != 0:
            if verbose:
                print(r.stderr)
            return False
        os.rename(tmp, out)  # atomic on POSIX
        return True
    except Exception:  # noqa: BLE001 — any toolchain failure -> fallback
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = os.path.join(_here, _LIB_NAME)
    if not os.path.exists(path) and \
            os.environ.get("UNIVID_NATIVE", "1") != "0":
        build()
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.uv_resize_bilinear_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.uv_resize_bilinear_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float]
            lib.uv_patchify_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            lib.uv_u8_to_f32_affine.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# public ops (native fast path + numpy parity fallback)
# ---------------------------------------------------------------------------


def resize_bilinear(img: np.ndarray, h: int, w: int,
                    scale: float = 1.0, shift: float = 0.0) -> np.ndarray:
    """[H, W, C] float32 or uint8 -> [h, w, C] float32 with half-pixel
    (align_corners=False) sampling; optionally fused y = x*scale+shift.
    Identical math to data/openvid._resize_bilinear."""
    lib = _load()
    img = np.ascontiguousarray(img)
    sh, sw = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    if lib is not None and img.dtype in (np.float32, np.uint8):
        dst = np.empty((h, w) + img.shape[2:], np.float32)
        if img.dtype == np.uint8:
            lib.uv_resize_bilinear_u8(
                img.ctypes.data, sh, sw, c, dst.ctypes.data, h, w,
                scale, shift)
        else:
            lib.uv_resize_bilinear_f32(
                img.ctypes.data, sh, sw, c, dst.ctypes.data, h, w)
            if scale != 1.0 or shift != 0.0:
                dst = dst * scale + shift
        return dst
    # numpy fallback (same formula)
    from ..data.openvid import _resize_bilinear
    out = _resize_bilinear(np.asarray(img, np.float32), h, w)
    if scale != 1.0 or shift != 0.0:
        out = out * scale + shift
    return out.astype(np.float32)


def patchify(image: np.ndarray, patch: int) -> np.ndarray:
    """[H, W, C] -> [(H/p)*(W/p), p*p*C], (ph, pw, c) inner order."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    if lib is not None:
        dst = np.empty(((h // patch) * (w // patch),
                        patch * patch * c), np.float32)
        lib.uv_patchify_f32(image.ctypes.data, h, w, c, patch,
                            dst.ctypes.data)
        return dst
    x = image.reshape(h // patch, patch, w // patch, patch, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(-1, patch * patch * c)


def u8_to_f32_affine(x: np.ndarray, scale: float,
                     shift: float) -> np.ndarray:
    """float32(x) * scale + shift for uint8 arrays (e.g. /127.5 - 1)."""
    lib = _load()
    x = np.ascontiguousarray(x)
    if lib is not None and x.dtype == np.uint8:
        dst = np.empty(x.shape, np.float32)
        lib.uv_u8_to_f32_affine(x.ctypes.data, dst.ctypes.data, x.size,
                                scale, shift)
        return dst
    return x.astype(np.float32) * scale + shift
