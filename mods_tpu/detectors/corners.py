"""Standalone corner detectors: FAST and STAR (CenSurE).

The reference constructs OpenCV's FastFeatureDetector and
StarFeatureDetector inline (imagerepresentation.cpp:1077-1224).  TPU
design: FAST reuses the batched FAST-9 stencil + Harris ranking of the
ORB module at a single scale; STAR's bi-level center-surround octagons
become integral-image box differences (inner box minus surround ring)
evaluated densely at every scale, with 3-D NMS across the scale stack —
the same slicing machinery as the SURF FastHessian.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams
from mods_tpu.detectors.orb import detect_orb_level
from mods_tpu.detectors.surf import _box, integral_image
from mods_tpu.regions import Regions, compact_topk

# CenSurE scale ladder (OpenCV StarDetector sizes, halved to radii)
STAR_RADII = (1, 2, 3, 4, 6, 8, 11, 16)


def detect_fast(views: jax.Array, valid_hw: jax.Array,
                caps: CapacityParams, threshold: float = 20.0,
                keypoint_size: float = 7.0,
                mr_size: float = 5.1962) -> Regions:
    """Single-scale FAST-9 with Harris ordering (cv::FAST semantics).
    Keypoints carry the fixed OpenCV size 7 -> s = size/mrSize."""
    V = views.shape[0]

    def one(img, vhw):
        xy, resp, m = detect_orb_level(img, vhw, threshold,
                                       caps.per_view, 3)
        n = xy.shape[0]
        return Regions(
            xy=xy,
            A=jnp.tile(jnp.eye(2, dtype=jnp.float32), (n, 1, 1)),
            s=jnp.full(n, keypoint_size / mr_size, jnp.float32),
            response=resp,
            sub_type=jnp.zeros(n, jnp.int32),
            mask=m)
    return jax.vmap(one)(views, valid_hw)


def _star_response(ii: jax.Array, r: int, H: int, W: int) -> jax.Array:
    """Center-surround response at radius r: inner (2r+1) box mean minus
    surround ring mean (boxes approximate CenSurE's octagons)."""
    R = 2 * r
    inner_n = (2 * r + 1) ** 2
    outer_n = (2 * R + 1) ** 2 - inner_n
    inner = _box(ii, 2 * r + 1, 2 * r + 1, -r, -r, H, W)
    outer_full = _box(ii, 2 * R + 1, 2 * R + 1, -R, -R, H, W)
    return inner / inner_n - (outer_full - inner) / outer_n


@functools.partial(jax.jit, static_argnames=("threshold", "cap"))
def _detect_star_one(img: jax.Array, valid_h, valid_w,
                     threshold: float, cap: int):
    H, W = img.shape
    ii = integral_image(img)
    vol = jnp.stack([_star_response(ii, r, H, W) for r in STAR_RADII])
    avol = jnp.abs(vol)
    mx = jax.lax.reduce_window(
        avol, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    radii = jnp.asarray(STAR_RADII, jnp.int32)[:, None, None]
    inb = ((rows >= 2 * radii) & (rows < valid_h - 2 * radii)
           & (cols >= 2 * radii) & (cols < valid_w - 2 * radii))
    L = len(STAR_RADII)
    ext = (avol > threshold) & (avol >= mx) & inb
    ext = ext.at[0].set(False).at[L - 1].set(False)
    lvl, r, c = jnp.nonzero(ext, size=cap, fill_value=(0, 0, 0))
    valid = ext[lvl, r, c]
    scale = jnp.asarray(STAR_RADII, jnp.float32)[lvl]
    n = lvl.shape[0]
    return Regions(
        xy=jnp.stack([c, r], -1).astype(jnp.float32),
        A=jnp.tile(jnp.eye(2, dtype=jnp.float32), (n, 1, 1)),
        s=scale,
        response=vol[lvl, r, c],
        sub_type=jnp.zeros(n, jnp.int32),
        mask=valid)


def detect_star(views: jax.Array, valid_hw: jax.Array,
                caps: CapacityParams, threshold: float = 4.0) -> Regions:
    """(V, H, W) -> Regions.  Threshold on the mean-difference response
    (OpenCV's responseThreshold=30 applies to a 〜7x-scaled kernel sum;
    mean-difference units make 4.0 comparable)."""
    def one(img, vhw):
        return _detect_star_one(img, vhw[0], vhw[1], threshold,
                                caps.per_view)
    regs = jax.vmap(one)(views, valid_hw)
    return compact_topk(regs, caps.per_view, by="response")
