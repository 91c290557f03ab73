"""Windowed affine patch sampling — the TPU-native form of the
reference's per-pixel bilinear `interpolate` (helpers.cpp:551-608).

Every hot loop of the reference funnels through patch sampling: Baumberg
SMM iteration (affine.cpp:26-169), dominant orientation
(synth-detection.cpp:841-919), and descriptor patch extraction
(synth-detection.hpp:169-255).  On TPU, per-sample XLA gathers run at
well under 1 G samples/s — the measured bottleneck of the whole
pipeline.  This module instead:

  1. fetches ONE aligned (136, 256) window per keypoint around its
     center from a (L, H, W) level stack (one gather of large contiguous
     slices — DMA-friendly),
  2. resolves the bilinear samples inside the window as one-hot matmuls
     on the MXU: row interpolation is ``Wy @ window`` with Wy carrying
     (1-wy, wy) pairs, column interpolation is an elementwise
     multiply-reduce with the analogous Wx.

A patch sample is valid iff floor(x) in [0, Wv-2] and floor(y) in
[0, Hv-2] (the reference's safe-interpolate rule); everything else
returns ``fill``.  Supported patch extent is ±63 px around the center
in source-level pixels — callers bound this via mip/octave level
selection (see mip_stack / select_level).

Window geometry: origins are quantized to 8 rows / 128 lanes —
sublane/lane-aligned so window reads stay tiling-friendly (and a
future Pallas DMA formulation can reuse them unchanged); source
canvases must therefore be at least 136 x 256 with
H % 8 == W % 128 == 0 (pad_canvas helps).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

WIN_Y = 136          # 17 sublane tiles of 8
WIN_X = 256          # 2 lane tiles of 128
# Max patch half-extent the samplers guarantee to cover, in source-level
# pixels.  select_level's step bound (<= 1.5 px/step) keeps every
# standard patch size below it: P=41 -> 1.5*20*sqrt2 = 42.4.  Sized so
# the Pallas fast path's (96, 128) windows cover the extent; the legacy
# (136, 256) windows cover it with room to spare.
MAX_HALF_EXTENT = 44.0
PALLAS_COLS = 128    # small-window lane width (Pallas fast path)


def pad_canvas(img: jax.Array) -> jax.Array:
    """Pad (..., H, W) up to the window-aligned minimum canvas."""
    h, w = img.shape[-2:]
    ph = max(WIN_Y, -(-h // 8) * 8)
    pw = max(WIN_X, -(-w // 128) * 128)
    if ph == h and pw == w:
        return img
    pad = [(0, 0)] * (img.ndim - 2) + [(0, ph - h), (0, pw - w)]
    # edge replication: keeps mip construction from bleeding zeros into
    # the valid region near the right/bottom borders
    return jnp.pad(img, pad, mode="edge")


def window_origins(xy: jax.Array, hc: int, wc: int):
    """Quantized window origins for centers xy (..., 2) in (x, y) order.

    y0 multiple of 8, x0 multiple of 128, clipped to the canvas; every
    in-canvas sample within +-63 px of the center lands inside
    [y0, y0+136) x [x0, x0+256) (see module docstring derivation).
    """
    cx = jnp.floor(xy[..., 0]).astype(jnp.int32)
    cy = jnp.floor(xy[..., 1]).astype(jnp.int32)
    y0 = jnp.clip(((cy - 63) // 8) * 8, 0, hc - WIN_Y)
    x0 = jnp.clip(((cx - 63) // 128) * 128, 0, wc - WIN_X)
    return y0, x0


def extract_windows(src: jax.Array, lvl: jax.Array, y0: jax.Array,
                    x0: jax.Array) -> jax.Array:
    """Gather (K, WIN_Y, WIN_X) windows from (L, H, W) at per-k level."""
    starts = jnp.stack([lvl, y0, x0], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    return jax.lax.gather(
        src, starts, dn, slice_sizes=(1, WIN_Y, WIN_X),
        mode=jax.lax.GatherScatterMode.CLIP)


def _sample_chunk(win, relx, rely, gx, gy, vw, vh, fill):
    """One keypoint chunk: windows (C, R, X), coords (C, N)."""
    R, X = win.shape[-2:]
    yf = jnp.floor(rely)
    xf = jnp.floor(relx)
    wy = (rely - yf)[..., None]                      # (C, N, 1)
    wx = (relx - xf)[..., None]
    y0i = jnp.clip(yf.astype(jnp.int32), 0, R - 2)[..., None]
    x0i = jnp.clip(xf.astype(jnp.int32), 0, X - 2)[..., None]

    ly = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)
    lx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, X), 2)
    Wy = ((ly == y0i) * (1.0 - wy) + (ly == y0i + 1) * wy)   # (C, N, R)
    Wx = ((lx == x0i) * (1.0 - wx) + (lx == x0i + 1) * wx)   # (C, N, X)
    rows = jnp.einsum("cnw,cwx->cnx", Wy, win,
                      preferred_element_type=jnp.float32)
    val = jnp.sum(rows * Wx, axis=-1)                        # (C, N)

    gxf = jnp.floor(gx)
    gyf = jnp.floor(gy)
    ok = ((gxf >= 0) & (gyf >= 0)
          & (gxf < vw[:, None] - 1) & (gyf < vh[:, None] - 1))
    return jnp.where(ok, val, fill)


def use_pallas_sampler() -> bool:
    """Pallas fast path — OPT-IN via MODS_SAMPLER=pallas.

    The kernel is correct and ~2x faster than the small-window einsum in
    isolation, but on the tunneled v5e runtime a ladder's-worth of
    pallas-bearing programs intermittently faults the TPU worker
    (r5 investigation: every program passes alone under per-program
    syncs; sequences crash nondeterministically).  Until that runtime
    stabilizes, the default everywhere is the algebraically-identical
    small-window XLA einsum path."""
    forced = os.environ.get("MODS_SAMPLER", "")
    if forced == "pallas":
        return True
    return False


def rows_for_patch(patch_size: int, max_step: float = 2.0) -> int:
    """Small-window sublane rows covering a patch's worst-case vertical
    extent (+2 px bilinear/frac margin), rounded to the 8-row sublane
    tile.  max_step = 2.0 leaves 33% headroom over select_level's
    1.5 px/step bound; extents beyond the window clamp to its edge
    (replicate), same as the legacy window's index clipping."""
    ext = max_step * (patch_size // 2) * 1.4143 + 2.0
    return min(max(-(-int(2 * ext + 2) // 8) * 8, 48), 96)


class WindowSource(NamedTuple):
    """Prefetched per-keypoint windows — reusable across resampling
    rounds with different A (Baumberg iterations).  Legacy path windows
    are (K, WIN_Y, WIN_X); the Pallas fast path uses (K, rows, 128)."""
    windows: jax.Array   # (K, rows, cols)
    y0: jax.Array        # (K,) int32
    x0: jax.Array        # (K,) int32
    vw: jax.Array        # (K,) float32 valid width of the kp's level
    vh: jax.Array        # (K,) float32 valid height


def prepare_windows(src: jax.Array, lvl: jax.Array, xy: jax.Array,
                    valid_hw: jax.Array,
                    rows: int | None = None) -> WindowSource:
    """Fetch the per-keypoint windows once.  src (L, H, W); lvl (K,);
    xy (K, 2) level coords; valid_hw (L, 2).

    rows=None: legacy (WIN_Y, WIN_X) tile-aligned windows.
    rows=R: small (R, 128) windows centered on the keypoint (the Pallas
    fast path) — origins are unquantized (the extraction gather is
    bandwidth-shaped either way, measured r5)."""
    _, hc, wc = src.shape
    if rows is None:
        y0, x0 = window_origins(xy, hc, wc)
        win = extract_windows(src, lvl, y0, x0)
    else:
        cy = jnp.floor(xy[..., 1]).astype(jnp.int32)
        cx = jnp.floor(xy[..., 0]).astype(jnp.int32)
        y0 = jnp.clip(cy - (rows // 2 - 1), 0, hc - rows)
        x0 = jnp.clip(cx - (PALLAS_COLS // 2 - 1), 0, wc - PALLAS_COLS)
        starts = jnp.stack([lvl, y0, x0], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        win = jax.lax.gather(
            src, starts, dn, slice_sizes=(1, rows, PALLAS_COLS),
            mode=jax.lax.GatherScatterMode.CLIP)
    vh = valid_hw[:, 0].astype(jnp.float32)[lvl]
    vw = valid_hw[:, 1].astype(jnp.float32)[lvl]
    return WindowSource(win, y0, x0, vw, vh)


# -- Pallas fast path -------------------------------------------------------

_SAMPLE_CB = 8       # keypoints per grid step


def _make_sample_kernel(P: int, rows: int, NP_: int):
    """One-hot bilinear sampling entirely in VMEM: per keypoint build
    the row/column interpolation weights as tent functions on the VPU
    and resolve them as ONE (NP_, rows) @ (rows, 128) MXU matmul + a
    masked lane reduction.  Equivalent arithmetic to _sample_chunk's
    einsum, minus the HBM round-trips and the (136, 256) legacy window
    (5.7x fewer MACs at P=19, 2.8x at P=41)."""
    from jax.experimental import pallas as pl

    def kernel(par_ref, win_ref, out_ref):
        half = P // 2
        n = jax.lax.broadcasted_iota(jnp.int32, (NP_, 1), 0)
        # samples are patch-row-major: n = j * P + i, offsets (i, j)
        gx = (n % P - half).astype(jnp.float32)
        gy = (n // P - half).astype(jnp.float32)
        ly = jax.lax.broadcasted_iota(
            jnp.int32, (NP_, rows), 1).astype(jnp.float32)
        lx = jax.lax.broadcasted_iota(
            jnp.int32, (NP_, PALLAS_COLS), 1).astype(jnp.float32)
        for c in range(_SAMPLE_CB):
            rx0 = par_ref[c, 0]
            ry0 = par_ref[c, 1]
            a00 = par_ref[c, 2]
            a01 = par_ref[c, 3]
            a10 = par_ref[c, 4]
            a11 = par_ref[c, 5]
            # clamp into the window -> replicate-edge semantics, same as
            # the legacy path's index clipping
            relx = jnp.clip(rx0 + a00 * gx + a01 * gy, 0.0,
                            PALLAS_COLS - 1.0)
            rely = jnp.clip(ry0 + a10 * gx + a11 * gy, 0.0, rows - 1.0)
            # tent weights == the bilinear one-hot rows/cols
            Wy = jnp.maximum(1.0 - jnp.abs(ly - rely), 0.0)
            Wx = jnp.maximum(1.0 - jnp.abs(lx - relx), 0.0)
            rowv = jnp.dot(Wy, win_ref[c],
                           preferred_element_type=jnp.float32)
            out_ref[c, :] = jnp.sum(rowv * Wx, axis=-1)

    return kernel


@functools.lru_cache(maxsize=32)
def _pallas_sample_fn(P: int, rows: int):
    """vmap-SAFE pallas sampler for one (patch, window) geometry.

    pallas_call under jax.vmap lowers through the generic batching rule
    (an extra grid dim) — measured to FAULT the TPU worker in the fused
    pipeline (r5), and the batched gallery programs vmap whole fused
    programs.  The kernel is per-keypoint elementwise, so batching ==
    flattening: a custom_vmap rule folds any leading batch axes into the
    keypoint axis and calls the same kernel once."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    NP_ = -(-P * P // 128) * 128
    CB = _SAMPLE_CB
    kernel = _make_sample_kernel(P, rows, NP_)

    @jax.custom_batching.custom_vmap
    def call(par, win):
        """par (K, 8) f32; win (K, rows, 128) f32 -> (K, NP_) f32."""
        K = par.shape[0]
        Kp = -(-K // CB) * CB
        if Kp != K:
            par = jnp.pad(par, ((0, Kp - K), (0, 0)))
            win = jnp.pad(win, ((0, Kp - K), (0, 0), (0, 0)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Kp, NP_), jnp.float32),
            grid=(Kp // CB,),
            in_specs=[
                pl.BlockSpec((CB, 8), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CB, rows, PALLAS_COLS),
                             lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CB, NP_), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(par, win)
        return out[:K]

    @call.def_vmap
    def _batch_rule(axis_size, in_batched, par, win):
        par_b, win_b = in_batched
        B = axis_size
        if not par_b:
            par = jnp.broadcast_to(par[None], (B,) + par.shape)
        if not win_b:
            win = jnp.broadcast_to(win[None], (B,) + win.shape)
        K = par.shape[1]
        out = call(par.reshape(B * K, 8),
                   win.reshape(B * K, rows, PALLAS_COLS))
        return out.reshape(B, K, -1), True

    return call


def _sample_from_windows_pallas(ws: WindowSource, xy: jax.Array,
                                A: jax.Array, patch_size: int,
                                fill: float) -> jax.Array:
    """Sample (K, P, P) patches from prefetched SMALL windows via the
    Pallas kernel; out-of-image samples filled per the reference's
    safe-interpolate rule (mask computed on the VPU outside)."""
    K = xy.shape[0]
    P = patch_size
    rows = ws.windows.shape[1]
    N = P * P

    par = jnp.concatenate([
        xy[:, 0:1] - ws.x0[:, None].astype(jnp.float32),
        xy[:, 1:2] - ws.y0[:, None].astype(jnp.float32),
        A[:, 0, 0:1], A[:, 0, 1:2], A[:, 1, 0:1], A[:, 1, 1:2],
        jnp.zeros((K, 2), jnp.float32)], axis=1)            # (K, 8)
    out = _pallas_sample_fn(P, rows)(par, ws.windows)[:, :N]

    # validity mask in GLOBAL level coordinates (reference safe
    # interpolate, helpers.cpp:574-607)
    from mods_tpu.ops.warp import patch_grid
    g = patch_grid(P).reshape(-1, 2)
    offs = jnp.einsum("kab,nb->kna", A, g)
    gx = offs[..., 0] + xy[:, None, 0]
    gy = offs[..., 1] + xy[:, None, 1]
    ok = ((jnp.floor(gx) >= 0) & (jnp.floor(gy) >= 0)
          & (jnp.floor(gx) < ws.vw[:, None] - 1)
          & (jnp.floor(gy) < ws.vh[:, None] - 1))
    return jnp.where(ok, out, fill).reshape(K, P, P)


def sample_from_windows(ws: WindowSource, xy: jax.Array, A: jax.Array,
                        patch_size: int, fill: float = 0.0,
                        chunk: int = 256) -> jax.Array:
    """Sample (K, P, P) patches from prefetched windows.

    xy must be the centers the windows were prepared around (same level
    coords); A is the CURRENT sampling matrix, ||A||*P/2*sqrt2 <=
    MAX_HALF_EXTENT.  Small (rows, 128) windows take the Pallas kernel;
    legacy (WIN_Y, WIN_X) windows take the chunked einsum path.
    """
    if ws.windows.shape[2] == PALLAS_COLS and use_pallas_sampler():
        return _sample_from_windows_pallas(ws, xy, A, patch_size, fill)
    from mods_tpu.ops.warp import patch_grid
    K = xy.shape[0]
    P = patch_size
    g = patch_grid(P).reshape(-1, 2)                 # (N, 2) (dx, dy)

    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk

    def padk(a):
        return jnp.pad(a, [(0, Kp - K)] + [(0, 0)] * (a.ndim - 1))

    parts = tuple(padk(a) for a in (ws.windows, ws.y0, ws.x0, ws.vw,
                                    ws.vh, xy, A))

    def one_chunk(args):
        win, y0_c, x0_c, vw_c, vh_c, xy_c, A_c = args
        offs = jnp.einsum("kab,nb->kna", A_c, g)     # (C, N, 2)
        gx = offs[..., 0] + xy_c[:, None, 0]
        gy = offs[..., 1] + xy_c[:, None, 1]
        relx = gx - x0_c[:, None].astype(jnp.float32)
        rely = gy - y0_c[:, None].astype(jnp.float32)
        return _sample_chunk(win, relx, rely, gx, gy, vw_c, vh_c, fill)

    resh = lambda a: a.reshape((n_chunks, chunk) + a.shape[1:])
    out = jax.lax.map(one_chunk, tuple(resh(a) for a in parts))
    return out.reshape(Kp, P, P)[:K]


def sample_affine_patches(src: jax.Array, lvl: jax.Array, xy: jax.Array,
                          A: jax.Array, patch_size: int,
                          valid_hw: jax.Array, fill: float = 0.0,
                          chunk: int = 256) -> jax.Array:
    """Batched affine patch sampling from a level stack.

    src: (L, H, W) canvas stack (H % 8 == 0, W % 128 == 0, H >= 136,
    W >= 256).  lvl: (K,) int32 source level per keypoint.  xy: (K, 2)
    centers in LEVEL pixel coordinates (x, y).  A: (K, 2, 2) sampling
    matrix (level px per patch px); ||A|| * patch_size/2 * sqrt2 must be
    <= 63 (callers guarantee via level selection).  valid_hw: (L, 2)
    int32 valid (h, w) per level.  Returns (K, P, P) float32.

    patch[k, j, i] = src[lvl_k](xy_k + A_k @ [di, dj]), bilinear, with
    the reference's out-of-bounds fill semantics.
    """
    # small (rows, 128) windows on every backend: the einsum's MAC count
    # scales with window area, so (96,128) vs the legacy (136,256) is a
    # 2.9x cut before any kernel work
    ws = prepare_windows(src, lvl, xy, valid_hw,
                         rows=rows_for_patch(patch_size))
    return sample_from_windows(ws, xy, A, patch_size, fill, chunk)


# ---------------------------------------------------------------------------
# Mip stack: bounded-step sampling for arbitrarily large regions
# ---------------------------------------------------------------------------

MIP_SIGMA = 1.3      # cumulative blur of each level in its own pixels


@functools.lru_cache(maxsize=None)
def _mip_step_sigma() -> float:
    # after 2x decimation the previous level's blur is MIP_SIGMA/2 in new
    # pixels; top up to MIP_SIGMA:  s^2 = MIP_SIGMA^2 - (MIP_SIGMA/2)^2
    return float(np.sqrt(MIP_SIGMA ** 2 - (MIP_SIGMA / 2.0) ** 2))


def mip_stack(img: jax.Array, n_levels: int):
    """(H, W) -> (levels (n, Hc, Wc), valid_hw (n, 2) int32).

    Level l is the image 2x-decimated l times with cumulative Gaussian
    blur ~MIP_SIGMA in level-l pixels, stored top-left in the padded
    canvas.  Replaces the reference's native-resolution oversampled
    patch for large regions: sampling level l at step u in [0.75, 1.5)
    sees a signal prefiltered at ~MIP_SIGMA/u sample steps.
    """
    from mods_tpu.ops.gaussian import gaussian_blur
    h, w = img.shape
    img = pad_canvas(img)
    hc, wc = img.shape
    levels = [img]
    valids = [(h, w)]
    cur = img
    for _ in range(1, n_levels):
        blurred = gaussian_blur(cur, _mip_step_sigma())
        h, w = max(h // 2, 1), max(w // 2, 1)
        dec = blurred[::2, ::2]
        cur = jnp.zeros((hc, wc), img.dtype).at[:dec.shape[0],
                                                :dec.shape[1]].set(dec)
        cur = cur[:hc, :wc]
        levels.append(cur)
        valids.append((h, w))
    stack = jnp.stack(levels)
    valid_hw = jnp.asarray(valids, jnp.int32)
    return stack, valid_hw


def op_norm_2x2(A: jax.Array) -> jax.Array:
    """Largest singular value of (..., 2, 2) matrices (closed form)."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    q = a * a + b * b + c * c + d * d
    det = a * d - b * c
    r = jnp.sqrt(jnp.maximum(q * q - 4.0 * det * det, 0.0))
    return jnp.sqrt(jnp.maximum((q + r) / 2.0, 0.0))


def select_level(A: jax.Array, patch_size: int, n_levels: int,
                 max_step: float = 1.5):
    """Pick mip level so the per-step sampling norm is <= max_step and
    the patch extent fits the +-63 window.  Returns (lvl (K,), scale
    (K,) = 2^lvl)."""
    m = op_norm_2x2(A)
    lvl = jnp.ceil(jnp.log2(jnp.maximum(m / max_step, 1e-12)))
    lvl = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
    # hard safety: extent must fit the window even at the top level
    half = patch_size // 2
    scale = jnp.exp2(lvl.astype(jnp.float32))
    ext = m / scale * half * np.sqrt(2.0)
    extra = jnp.ceil(jnp.log2(jnp.maximum(ext / MAX_HALF_EXTENT, 1e-12)))
    lvl2 = jnp.clip(lvl + jnp.maximum(extra, 0).astype(jnp.int32),
                    0, n_levels - 1)
    return lvl2, jnp.exp2(lvl2.astype(jnp.float32))
