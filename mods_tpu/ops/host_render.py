"""Host-side view-group renderer (ctypes bridge to native/render.cpp).

Used by host-stage detectors (MSER): the component tree runs on the CPU,
so its input views are rendered on the CPU too — device-rendered views
never cross back over the host<->device link (the most expensive
transfer in the system; see pipeline.py MSER branch).  Semantics mirror
the device render program exactly (rotate -> anti-alias blur -> squash,
synth-detection.cpp:236-430)."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


@functools.lru_cache(maxsize=1)
def _lib():
    from mods_tpu.detectors.mser import build_native
    so = build_native("render.cpp", "libmods_render.so",
                      extra_flags=("-fopenmp",))
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mods_render_group.restype = None
    lib.mods_render_group.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int,                  # img, h, w
        f32p, ctypes.c_int,                                # rot_inv, V
        ctypes.c_int, ctypes.c_int,                        # hr, wr
        ctypes.c_int, ctypes.c_float, ctypes.c_float,      # blur, sigmas
        ctypes.c_float, ctypes.c_float,                    # squash inv
        ctypes.POINTER(ctypes.c_int32),                    # valid_hw
        ctypes.c_int, ctypes.c_int,                        # hc, wc
        ctypes.c_int, f32p]                                # identity, out
    return lib


def render_group_np(img: np.ndarray, rot_inv: np.ndarray, hr: int,
                    wr: int, do_blur: bool, sigma_x: float,
                    sigma_y: float, sx: float, sy: float,
                    valid_hw: np.ndarray, hc: int, wc: int,
                    identity: bool) -> np.ndarray:
    """img (H, W) float32; rot_inv (V, 2, 3); valid_hw (V, 2) int32.
    Returns (V, hc, wc) float32 views, gray-128 outside valid extents —
    bit-compatible in layout with the device render program's output."""
    lib = _lib()
    img = np.ascontiguousarray(img, np.float32)
    rot_flat = np.ascontiguousarray(rot_inv, np.float32).reshape(-1)
    vhw = np.ascontiguousarray(valid_hw, np.int32)
    V = int(vhw.shape[0])
    out = np.empty((V, hc, wc), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mods_render_group(
        img.ctypes.data_as(f32p), img.shape[0], img.shape[1],
        rot_flat.ctypes.data_as(f32p), V, int(hr), int(wr),
        int(bool(do_blur)), float(sigma_x), float(sigma_y),
        float(1.0 / sx), float(1.0 / sy),
        vhw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(hc), int(wc), int(bool(identity)),
        out.ctypes.data_as(f32p))
    return out
