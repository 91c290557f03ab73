"""MSER detector: native C++ component-tree core + ctypes bridge.

The union-find over gray-sorted pixels is inherently sequential
(SURVEY.md §7.3 hard part #1), so it runs as native host code
(native/mser.cpp) while orientation/description stay on the TPU.
Conversion to affine regions mirrors the reference
(extrema.cpp:141-190): centroid + symmetric sqrt of the second-moment
matrix as the (non-unit-det) A, s = 1, response = margin,
sub_type 21 (MSER+/dark) / 20 (MSER-/bright).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

from mods_tpu.config import CapacityParams

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")

MSER_PLUS = 21   # dark regions (reference sub_type, extrema.cpp)
MSER_MIN = 20


def build_native(src_name: str, so_name: str,
                 extra_flags: tuple = ()) -> str:
    """Compile a native/ source into a machine-local cache dir (never
    committed — a .so built elsewhere may use a different ISA) and
    return the path.  Rebuilds when the source is newer."""
    import platform
    src = os.path.abspath(os.path.join(NATIVE_DIR, src_name))
    cache = os.path.join(NATIVE_DIR, ".cache", platform.machine())
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, so_name)
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        # -march=native is safe here: the cache dir is keyed by machine
        # and never committed.  The render/blur inner loops are
        # contiguous f32 streams that vectorize to AVX-512 on this host.
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
             "-fPIC", *extra_flags, "-o", so, src],
            check=True)
    return so


@functools.lru_cache(maxsize=1)
def _lib():
    so = build_native("mser.cpp", "libmods_mser.so")
    lib = ctypes.CDLL(so)
    lib.mods_mser_detect.restype = ctypes.c_int
    lib.mods_mser_detect.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int]
    return lib


def detect_msers_np(img: np.ndarray, min_size: int = 30,
                    max_area: float = 0.05, min_margin: int = 8,
                    max_out: int = 8192) -> dict:
    """img: (H, W) uint8 or float 0..255.  Returns dict of numpy arrays
    (xy, A, s, response, sub_type) like an un-masked Regions batch."""
    lib = _lib()
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    img = np.ascontiguousarray(img)
    h, w = img.shape
    out = np.zeros((max_out, 8), np.float64)
    n = lib.mods_mser_detect(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(min_size), float(max_area), int(min_margin),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out)
    out = out[:n]
    A = out[:, 2:6].reshape(-1, 2, 2)
    sub = np.where(out[:, 7] == 0, MSER_PLUS, MSER_MIN)
    return dict(
        xy=out[:, 0:2].astype(np.float32),
        A=A.astype(np.float32),
        s=np.ones(n, np.float32),
        response=out[:, 6].astype(np.float32),
        sub_type=sub.astype(np.int32),
    )


def detect_msers_padded(img: np.ndarray, valid_hw, caps: CapacityParams,
                        **kw):
    """Detect on the valid sub-image and pad to caps.per_view slots."""
    h, w = int(valid_hw[0]), int(valid_hw[1])
    d = detect_msers_np(img[:h, :w], max_out=caps.per_view, **kw)
    K = caps.per_view
    n = d["xy"].shape[0]
    out = dict(
        xy=np.zeros((K, 2), np.float32),
        A=np.tile(np.eye(2, dtype=np.float32), (K, 1, 1)),
        s=np.ones(K, np.float32),
        response=np.zeros(K, np.float32),
        sub_type=np.zeros(K, np.int32),
        mask=np.zeros(K, bool),
    )
    n = min(n, K)
    order = np.argsort(-d["response"][:len(d["response"])])[:n]
    out["xy"][:n] = d["xy"][order]
    out["A"][:n] = d["A"][order]
    out["s"][:n] = d["s"][order]
    out["response"][:n] = d["response"][order]
    out["sub_type"][:n] = d["sub_type"][order]
    out["mask"][:n] = True
    return out
