"""Native (C++) host-side data-loader core, bound via ctypes.

The reference's input pipeline rides torch's C++ DataLoader + pillow-SIMD for
the decode/augment hot path; this package is the TPU framework's equivalent:
`pixelops.cpp` implements the fused crop/normalize/collate and antialiased
resize inner loops (OpenMP-parallel), compiled on demand with the system g++
and loaded through ctypes. Every entry point has a numpy/PIL fallback so the
framework works without a compiler; the native path is an optimization, not a
dependency.

Public API (all take/return numpy arrays):
  - available() -> bool
  - u8_to_f32_norm(u8_hwc) -> float32, [-1, 1]
  - crop_norm_into(u8_hwc, top, left, oh, ow, out_slot) — fused, writes into
    a float32 view (e.g. one slot of a preallocated batch)
  - resize_bilinear(u8_hwc, oh, ow) -> uint8 (PIL BILINEAR-equivalent)
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "pixelops.cpp"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(so_path: Path) -> bool:
    """Compile pixelops.cpp -> _pixelops-<hash>.so. Returns True on success."""
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx,
        "-O3",
        "-shared",
        "-fPIC",
        "-fopenmp",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(so_path),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.debug(f"native pixelops build skipped: {e}")
        return False
    if proc.returncode != 0:
        # retry without OpenMP (not all toolchains ship libgomp)
        cmd_noomp = [c for c in cmd if c != "-fopenmp"]
        proc = subprocess.run(cmd_noomp, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            logger.debug(f"native pixelops build failed: {proc.stderr[-500:]}")
            return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NEUROSIS_NO_NATIVE"):
            return None
        if not _SRC.exists():
            return None
        # content-addressed so a source edit triggers a rebuild
        digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
        cache_dir = Path(
            os.environ.get("NEUROSIS_NATIVE_CACHE", Path.home() / ".cache" / "neurosis_tpu_native")
        )
        so_path = cache_dir / f"_pixelops-{digest}.so"
        if not so_path.exists():
            try:
                cache_dir.mkdir(parents=True, exist_ok=True)
            except OSError:
                return None
            tmp = so_path.with_suffix(f".tmp{os.getpid()}")
            if not _build(tmp):
                return None
            try:
                os.replace(tmp, so_path)  # atomic vs concurrent workers
            except OSError:
                pass
        try:
            lib = ctypes.CDLL(str(so_path))
        except OSError as e:
            logger.debug(f"native pixelops load failed: {e}")
            return None

        i64, u8p, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)
        lib.u8hwc_to_f32_norm.argtypes = [u8p, f32p, i64]
        lib.crop_norm_into.argtypes = [u8p, i64, i64, i64, i64, i64, i64, i64, f32p]
        lib.resize_bilinear_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
        lib.pixelops_num_threads.restype = ctypes.c_int
        _lib = lib
        logger.info(f"native pixelops loaded ({lib.pixelops_num_threads()} threads)")
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def u8_to_f32_norm(arr: np.ndarray) -> np.ndarray:
    """uint8 (any shape) -> float32 in [-1, 1]."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return arr.astype(np.float32) * (2.0 / 255.0) - 1.0
    out = np.empty(arr.shape, np.float32)
    lib.u8hwc_to_f32_norm(_u8p(arr), _f32p(out), arr.size)
    return out


def crop_norm_into(
    arr: np.ndarray, top: int, left: int, oh: int, ow: int, out: np.ndarray
) -> np.ndarray:
    """Fused crop+normalize of an (H, W, C) uint8 image into a contiguous
    float32 (oh, ow, C) buffer (e.g. batch[i]). Returns `out`."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    assert 0 <= top and top + oh <= h and 0 <= left and left + ow <= w, "crop out of bounds"
    assert out.shape == (oh, ow, c) and out.dtype == np.float32 and out.flags.c_contiguous
    lib = _load()
    if lib is None:
        np.multiply(
            arr[top : top + oh, left : left + ow].astype(np.float32), 2.0 / 255.0, out=out
        )
        out -= 1.0
        return out
    lib.crop_norm_into(_u8p(arr), h, w, c, top, left, oh, ow, _f32p(out))
    return out


def resize_bilinear(arr: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Antialiased bilinear resize, uint8 HWC -> uint8 (oh, ow, C).

    Matches PIL.Image.BILINEAR (triangle filter with support scaled by the
    downsample factor) to within rounding.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BILINEAR))
    out = np.empty((oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(_u8p(arr), h, w, c, _u8p(out), oh, ow)
    return out
