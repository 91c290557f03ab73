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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

WIN_Y = 136          # 17 sublane tiles of 8
WIN_X = 256          # 2 lane tiles of 128
MAX_HALF_EXTENT = 63.0


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
    """One keypoint chunk: windows (C, WIN_Y, WIN_X), coords (C, N)."""
    yf = jnp.floor(rely)
    xf = jnp.floor(relx)
    wy = (rely - yf)[..., None]                      # (C, N, 1)
    wx = (relx - xf)[..., None]
    y0i = jnp.clip(yf.astype(jnp.int32), 0, WIN_Y - 2)[..., None]
    x0i = jnp.clip(xf.astype(jnp.int32), 0, WIN_X - 2)[..., None]

    ly = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN_Y), 2)
    lx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN_X), 2)
    Wy = ((ly == y0i) * (1.0 - wy) + (ly == y0i + 1) * wy)   # (C, N, WIN_Y)
    Wx = ((lx == x0i) * (1.0 - wx) + (lx == x0i + 1) * wx)   # (C, N, WIN_X)
    rows = jnp.einsum("cnw,cwx->cnx", Wy, win,
                      preferred_element_type=jnp.float32)
    val = jnp.sum(rows * Wx, axis=-1)                        # (C, N)

    gxf = jnp.floor(gx)
    gyf = jnp.floor(gy)
    ok = ((gxf >= 0) & (gyf >= 0)
          & (gxf < vw[:, None] - 1) & (gyf < vh[:, None] - 1))
    return jnp.where(ok, val, fill)


class WindowSource(NamedTuple):
    """Prefetched per-keypoint windows — reusable across resampling
    rounds with different A (Baumberg iterations)."""
    windows: jax.Array   # (K, WIN_Y, WIN_X)
    y0: jax.Array        # (K,) int32
    x0: jax.Array        # (K,) int32
    vw: jax.Array        # (K,) float32 valid width of the kp's level
    vh: jax.Array        # (K,) float32 valid height


def prepare_windows(src: jax.Array, lvl: jax.Array, xy: jax.Array,
                    valid_hw: jax.Array) -> WindowSource:
    """Fetch the per-keypoint windows once.  src (L, H, W); lvl (K,);
    xy (K, 2) level coords; valid_hw (L, 2)."""
    _, hc, wc = src.shape
    y0, x0 = window_origins(xy, hc, wc)
    win = extract_windows(src, lvl, y0, x0)
    vh = valid_hw[:, 0].astype(jnp.float32)[lvl]
    vw = valid_hw[:, 1].astype(jnp.float32)[lvl]
    return WindowSource(win, y0, x0, vw, vh)


def sample_from_windows(ws: WindowSource, xy: jax.Array, A: jax.Array,
                        patch_size: int, fill: float = 0.0,
                        chunk: int = 256) -> jax.Array:
    """Sample (K, P, P) patches from prefetched windows.

    xy must be the centers the windows were prepared around (same level
    coords); A is the CURRENT sampling matrix, ||A||*P/2*sqrt2 <= 63.
    """
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
    ws = prepare_windows(src, lvl, xy, valid_hw)
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
