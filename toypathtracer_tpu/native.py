"""ctypes binding for the native host-runtime library (native/tptnative.cpp).

Provides the post-device presentation/validation kernels in C++ -- exact
sRGB encode (reference: Cs/Program.cs:40-47, PixelShader.hlsl:1-15), TGA
payload encode, golden-image metrics, progressive blend -- with every
entry point degrading to the numpy implementations in io.py when the
shared library is absent (build with native/build.sh)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_on_demand(path: str) -> bool:
    """Build libtptnative.so from the in-repo source when it is missing
    and a compiler is available (development checkouts; wheels ship the
    .so).  Keeps the presentation layer always-on like the reference's
    (Cs/Program.cs:34-59) instead of silently degrading to numpy."""
    import shutil
    import subprocess
    import tempfile
    src = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                       "tptnative.cpp")
    if not os.path.exists(src) or shutil.which("g++") is None:
        return False
    # Compile to a temp file in the SAME directory and rename into place:
    # os.rename is atomic on POSIX, so a concurrent process (pytest-xdist,
    # multi-process launch) can never ctypes.CDLL a partially written .so
    # (the OSError there is swallowed and would silently degrade to numpy;
    # advisor round 3).
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(path))
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-o", tmp, src],
            check=True, capture_output=True, timeout=120)
        os.rename(tmp, path)
    except (subprocess.SubprocessError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False
    return os.path.exists(path)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libtptnative.so")
    if not os.path.exists(path) and not _build_on_demand(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_f64p = ctypes.POINTER(ctypes.c_double)
        lib.tpt_srgb_encode.argtypes = [c_f32p, ctypes.c_int, ctypes.c_int,
                                        c_u8p, ctypes.c_int]
        lib.tpt_srgb_encode_tga.argtypes = lib.tpt_srgb_encode.argtypes
        lib.tpt_image_metrics.argtypes = [c_f32p, c_f32p, ctypes.c_int64,
                                          ctypes.c_float, c_f64p]
        lib.tpt_progressive_blend.argtypes = [c_f32p, c_f32p,
                                              ctypes.c_int64,
                                              ctypes.c_float]
        for fn in ("tpt_srgb_encode", "tpt_srgb_encode_tga",
                   "tpt_image_metrics", "tpt_progressive_blend",
                   "tpt_version"):
            getattr(lib, fn).restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _f32c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def srgb_encode(img: np.ndarray, cheap: bool = False) -> Optional[np.ndarray]:
    """(H, W, 3) linear bottom-up float -> (H, W, 3) uint8 top-down sRGB.
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = _f32c(img)
    h, w, _ = img.shape
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.tpt_srgb_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(cheap))
    return out if rc == 0 else None


def srgb_encode_tga(img: np.ndarray,
                    cheap: bool = False) -> Optional[np.ndarray]:
    """(H, W, 3) linear bottom-up float -> bottom-up BGR uint8 (the TGA
    payload byte order)."""
    lib = _load()
    if lib is None:
        return None
    img = _f32c(img)
    h, w, _ = img.shape
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.tpt_srgb_encode_tga(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(cheap))
    return out if rc == 0 else None


def image_metrics(a: np.ndarray, b: np.ndarray, tol: float = 1e-5):
    """dict(max_abs, mean_abs, rmse, n_over_tol) comparing two images.
    Computes natively when possible, otherwise numpy."""
    af, bf = _f32c(a).ravel(), _f32c(b).ravel()
    assert af.shape == bf.shape
    lib = _load()
    if lib is not None:
        out = np.zeros(4, np.float64)
        rc = lib.tpt_image_metrics(
            af.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            af.size, tol, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)))
        if rc == 0:
            return dict(max_abs=out[0], mean_abs=out[1], rmse=out[2],
                        n_over_tol=int(out[3]))
    d = np.abs(af.astype(np.float64) - bf.astype(np.float64))
    return dict(max_abs=d.max(), mean_abs=d.mean(),
                rmse=float(np.sqrt((d * d).mean())),
                n_over_tol=int((d > tol).sum()))


def progressive_blend(accum: np.ndarray, frame: np.ndarray,
                      fac: float) -> np.ndarray:
    """Host-side reference blend (Test.cpp:272-276 + Metal NaN guard);
    always returns a fresh array (the native kernel works in place, so the
    input is copied first -- aliasing semantics match the numpy path)."""
    lib = _load()
    accum = _f32c(accum)
    framef = _f32c(frame)
    if lib is not None:
        accum = accum.copy()
        rc = lib.tpt_progressive_blend(
            accum.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            framef.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            accum.size, float(fac))
        if rc == 0:
            return accum
    prev = np.where(np.isfinite(accum), accum, 0.0)
    return prev * fac + framef * (1.0 - fac)
