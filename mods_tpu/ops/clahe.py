"""CLAHE — contrast-limited adaptive histogram equalization.

Reference: the optional photometric normalization pass in
mods.cpp:139-189 (cv::createCLAHE with clip limit 4.0 on the grayscale
input before detection).  TPU design: per-tile 256-bin histograms via
vmapped scatter-adds, clip + redistribute, CDF lookup tables, and
bilinearly interpolated application — one fused compiled program, no
data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "bins"))
def clahe(img: jax.Array, clip_limit: float = 4.0, tiles_x: int = 8,
          tiles_y: int = 8, bins: int = 256) -> jax.Array:
    """img: (H, W) float in [0, 255] -> equalized float same range.

    Matches cv::CLAHE semantics: histogram per tile, counts above
    clip_limit * mean are clipped and redistributed uniformly, mapping is
    the scaled CDF, and each output pixel bilinearly blends the mappings
    of its four surrounding tile centers.
    """
    h, w = img.shape
    # pad to a multiple of the tile grid (cv pads by replication)
    th = -(-h // tiles_y)
    tw = -(-w // tiles_x)
    ph, pw = th * tiles_y, tw * tiles_x
    imgp = jnp.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    lut_scale = (bins - 1) / 255.0
    binned = jnp.clip(jnp.round(imgp * lut_scale), 0, bins - 1
                      ).astype(jnp.int32)
    tiles = binned.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y * tiles_x, th * tw)

    def tile_lut(tile_bins):
        hist = jnp.zeros((bins,), jnp.float32).at[tile_bins].add(1.0)
        clip = jnp.maximum(clip_limit * (th * tw) / bins, 1.0)
        excess = jnp.sum(jnp.maximum(hist - clip, 0.0))
        hist = jnp.minimum(hist, clip) + excess / bins
        cdf = jnp.cumsum(hist)
        cdf = cdf / cdf[-1]
        return cdf * 255.0

    luts = jax.vmap(tile_lut)(tiles).reshape(tiles_y, tiles_x, bins)

    # bilinear interpolation between tile-center mappings
    yy = (jnp.arange(ph, dtype=jnp.float32) - th / 2.0 + 0.5) / th
    xx = (jnp.arange(pw, dtype=jnp.float32) - tw / 2.0 + 0.5) / tw
    y0 = jnp.clip(jnp.floor(yy), 0, tiles_y - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, tiles_x - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, tiles_y - 1)
    x1 = jnp.minimum(x0 + 1, tiles_x - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    b = binned
    v00 = luts[y0[:, None], x0[None, :], b]
    v01 = luts[y0[:, None], x1[None, :], b]
    v10 = luts[y1[:, None], x0[None, :], b]
    v11 = luts[y1[:, None], x1[None, :], b]
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    return out[:h, :w]


def clahe_np(img: np.ndarray, clip_limit: float = 4.0, tiles_x: int = 8,
             tiles_y: int = 8, bins: int = 256) -> np.ndarray:
    """Host-side twin of :func:`clahe` (same math in numpy).

    The photometric-normalization pass runs before any device work and
    its output is also consumed by host-stage detectors (MSER), so
    computing it on the host avoids shipping full images across the
    host<->device link twice."""
    import numpy as np
    img = np.asarray(img, np.float32)
    h, w = img.shape
    th = -(-h // tiles_y)
    tw = -(-w // tiles_x)
    ph, pw = th * tiles_y, tw * tiles_x
    imgp = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    lut_scale = (bins - 1) / 255.0
    binned = np.clip(np.round(imgp * lut_scale), 0, bins - 1
                     ).astype(np.int32)
    tiles = binned.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y * tiles_x, th * tw)

    clip = max(clip_limit * (th * tw) / bins, 1.0)
    luts = np.empty((tiles_y * tiles_x, bins), np.float32)
    for i in range(tiles.shape[0]):
        hist = np.bincount(tiles[i], minlength=bins).astype(np.float32)
        excess = np.maximum(hist - clip, 0.0).sum()
        hist = np.minimum(hist, clip) + excess / bins
        cdf = np.cumsum(hist)
        luts[i] = cdf / cdf[-1] * 255.0
    luts = luts.reshape(tiles_y, tiles_x, bins)

    yy = (np.arange(ph, dtype=np.float32) - th / 2.0 + 0.5) / th
    xx = (np.arange(pw, dtype=np.float32) - tw / 2.0 + 0.5) / tw
    y0 = np.clip(np.floor(yy), 0, tiles_y - 1).astype(np.int32)
    x0 = np.clip(np.floor(xx), 0, tiles_x - 1).astype(np.int32)
    y1 = np.minimum(y0 + 1, tiles_y - 1)
    x1 = np.minimum(x0 + 1, tiles_x - 1)
    fy = np.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xx - x0, 0.0, 1.0)[None, :]

    b = binned
    v00 = luts[y0[:, None], x0[None, :], b]
    v01 = luts[y0[:, None], x1[None, :], b]
    v10 = luts[y1[:, None], x0[None, :], b]
    v11 = luts[y1[:, None], x1[None, :], b]
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    return out[:h, :w].astype(np.float32)
