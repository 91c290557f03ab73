"""ORB: FAST corners + Harris ranking + centroid orientation + rBRIEF,
batched TPU-style.

The reference uses OpenCV's cv::ORB (imagerepresentation.cpp:1077-1108)
with HARRIS_SCORE, scaleFactor 1.2, nlevels 8, patchSize 31, and converts
keypoints to regions with A = R(angle), s = size/mrSize.  Here:

  * FAST-9/16 is 16 static shifts + circular run-length test — pure VPU
    stencil work over the whole view batch.
  * Harris scores rank corners; per-level budgets follow the OpenCV
    area-proportional retention.
  * Orientation is the intensity centroid (IC) of a 31x31 disc computed
    on gathered patches (one batched gather instead of 2 whole-image
    convs).
  * The BRIEF pattern is OpenCV's learned rBRIEF 256-pair table (public
    constant data from OpenCV's orb.cpp bit_pattern_31_, BSD license —
    the exact table cv::ORB uses, so rung yields track the reference's;
    validated bit-for-bit against cv2's ORB descriptors apart from exact
    intensity ties).  A seeded Gaussian pair set remains as the fallback
    for non-256-bit configurations.

Descriptor bits are kept as float 0/1 so Hamming distance reduces to the
same matmul kernel as L2 (|a-b|^2 == popcount(xor) on binary vectors).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu.config import CapacityParams
from mods_tpu.detectors.scale_space import harris_response
from mods_tpu.ops.warp import bilinear_sample, extract_patches
from mods_tpu.regions import Regions, compact_topk, concat_regions

# FAST circle of radius 3 (dx, dy), standard Bresenham ring order
FAST_RING = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
    (-1, -3)], np.int32)

DET_ORB = 40


def _shift2d(img, dx, dy):
    """Shift (..., H, W) by (dx, dy) with edge padding."""
    h, w = img.shape[-2], img.shape[-1]
    py = (max(dy, 0), max(-dy, 0))
    px = (max(dx, 0), max(-dx, 0))
    pad = [(0, 0)] * (img.ndim - 2) + [py, px]
    x = jnp.pad(img, pad, mode="edge")
    return x[..., py[1]:py[1] + h, px[1]:px[1] + w]


def fast_corners(img: jax.Array, threshold: float = 20.0) -> jax.Array:
    """FAST-9/16 corner mask for (..., H, W)."""
    ring = [_shift2d(img, int(dx), int(dy)) for dx, dy in FAST_RING]
    ring = jnp.stack(ring, axis=0)           # (16, ..., H, W)
    bright = ring > img[None] + threshold
    dark = ring < img[None] - threshold

    def has_run9(m):
        mm = jnp.concatenate([m, m[:8]], axis=0)   # wrap for circular runs
        acc = mm[:16]
        for k in range(1, 9):
            acc = acc & mm[k:k + 16]
        return jnp.any(acc, axis=0)

    return has_run9(bright) | has_run9(dark)


# OpenCV's learned rBRIEF pattern (orb.cpp bit_pattern_31_, BSD): 256
# rows of (x1, y1, x2, y2) int8 point pairs in the 31px patch frame.
# Public constant data — the test-point set learned offline in the ORB
# paper (Rublee et al., ICCV 2011) and shipped with every OpenCV build.
_BIT_PATTERN_31_B64 = (
    "CP0JBQQCB/T1CfgCB/QM8wLzAgwB+QEG/vb+/PPz9fjz/fT3CgQLCfP4+Pf1B/cMBwcM"
    "Bvz7/QDzAvT99wD5BQz6DP/9Bv4M+vP8+AvzDPgEBwUBBf0K/QP5Bgz4+fr+/gv/9vMM"
    "+Ar5A/v9/AL9B/b0+gsF9Ab5BfoH/wEABPsJCwvzBAcEDAL/BAT89P4H+Pv59gQLCQwA"
    "+AHz8/74Av3+/gP6Cfz3CAwKBwAJAQMH+wv28/r1AAoHDAH6/foMCvcM/PMI+PTzAPj8"
    "AwMHCAUHCvn/BwH0A/YFBgL8A/bzAPMF8/n0DPMD9Qj5DPwHBvYMCPf/+fr++wAM9AX5"
    "BQP2CPP5+fwF/f7/+QIJBfX18/vz/wYA/wX9BQL88/wM9/r3BvT2+PwKAgz9BwwMDPnz"
    "+gX8Cf0EB/8MAvkG+wHzC/QF/Qf++gf4DPnz+fX0Af0MDAL6AwD8A/7z//MBCQcBCPoB"
    "/wMMCQEMBv/3/wPz8/YFBwcKDAz7DAkGAwcLBfMGCgL0AgMDCAT6AgYM8wn0CgP4BPkJ"
    "9Qz8+gEMAvgG9wf8AgMD/gYDCwAD/Qj4BwgJA/X7+vz2C/sK+/j9DPYF9wAI/wz6BPoG"
    "9fYM+AcE/gYH/gD+DPv4+wIH+goM9/P4+Pvz+/4I+Anz9/X3AAH4Af4H/AkB/gH//Av6"
    "DPX09/oEAwcHDAUFCggA/AII9wz78wAHAgz/AgEHBQsH9wMFBvjz/PgJ+wn9/fz5/fQG"
    "BQgA+Qb6DPMG+/4B9gMKBAEI/P7+AvMC9AwM/vMA+gQBCQP69v37/fP/AQcFDPUE/gX5"
    "8wn3+wcBCAYH+AcG+fz5AfgL+fjzBvT4AgQDCQr7DAP6+/oHCP0J+AL0Agj1/vYD9PP5"
    "9/UA9vsF/QsI/vP/DP/4AAnz9fT79v72C/0J/vMC/QMC9/P8APwG/fb8DP75+vX8CQb9"
    "BgvzC/sFCwsMBgf7DP7/DAAH/Pj9/vkB+gfz9Pjz+f76+PgF+vf7//wF8wf4CgEFBfMB"
    "AArzCQwK/wX4Cvf/CwHz9/36Av/2AQzzAfj2CPUK+gLzA/oH8wz39vb7+fb4+PME+ggF"
    "AwwI8/wC/f0F8wr0BPMF//cJ/AMAAwP39AH6AQMCBPj29vYJCPMMDPj0+vsCAgMHCgYL"
    "+AYICPT5CvoF/ff9Cf/z/wX9+f0E+P74AwQCDAwC+wMLBvcL8wP/BwwL/wwE/QD9BgT1"
    "BAwC/AIB9vr4AfMH9QHzDPXzBgAL8wD/AQTzA/f+9wj6/fP6+P4F9wgKAgcD9//6//8J"
    "BQv+C/0M+AMAAwX/BAAKA/oEBfMA9gUFCAwLCAkJ+gf8CPT2BPYJBwMMBAn5Cv4HAAz+"
    "//oA9Q=="
)


@functools.lru_cache(maxsize=8)
def brief_pattern(n_bits: int = 256, patch: int = 31,
                  seed: int = 7) -> np.ndarray:
    """(n_bits, 2, 2) point pairs.  256 bits = OpenCV's learned table
    (what cv::ORB uses, imagerepresentation.cpp:1077-1105); other widths
    fall back to a seeded Gaussian pair set (the original BRIEF
    construction), clipped to the patch."""
    if n_bits == 256 and patch == 31:
        import base64
        raw = np.frombuffer(
            base64.b64decode(_BIT_PATTERN_31_B64), np.int8)
        return raw.astype(np.float32).reshape(256, 2, 2)
    rng = np.random.default_rng(seed)
    half = patch // 2
    pts = rng.normal(0.0, patch / 5.0, (n_bits, 2, 2))
    return np.clip(pts, -half + 1, half - 1).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _ic_disc(patch: int = 31) -> np.ndarray:
    half = patch // 2
    ys, xs = np.mgrid[0:patch, 0:patch].astype(np.float32)
    d2 = (xs - half) ** 2 + (ys - half) ** 2
    return (d2 <= half * half).astype(np.float32)


def _resize(img: jax.Array, oh: int, ow: int) -> jax.Array:
    """Bilinear resize (H, W) -> (oh, ow) (area-position convention of
    cv::resize INTER_LINEAR)."""
    h, w = img.shape
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
    return bilinear_sample(img, xs[None, :], ys[:, None])


def detect_orb_level(img: jax.Array, valid_hw, threshold: float,
                     cap: int, border: int):
    """One pyramid level, one view: FAST -> 3x3 NMS on Harris -> top-cap.
    Returns (xy, response, mask) in level coords."""
    h, w = img.shape
    corners = fast_corners(img, threshold)
    harris = harris_response(img, 1.0)
    mx = jax.lax.reduce_window(
        harris, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inb = ((rows >= border) & (rows < valid_hw[0] - border)
           & (cols >= border) & (cols < valid_hw[1] - border))
    good = corners & (harris >= mx) & inb
    score = jnp.where(good, harris, -jnp.inf)
    vals, idx = jax.lax.top_k(score.reshape(-1), cap)
    yy = idx // w
    xx = idx % w
    xy = jnp.stack([xx, yy], -1).astype(jnp.float32)
    return xy, vals, vals > -jnp.inf


def orientation_ic(img: jax.Array, xy: jax.Array,
                   patch: int = 31) -> jax.Array:
    """Intensity-centroid angle per keypoint (ORB's IC operator)."""
    disc = jnp.asarray(_ic_disc(patch))
    half = patch // 2
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    A = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32),
                         (xy.shape[0], 2, 2))
    p = extract_patches(img, xy, A, patch)
    pw = p * disc[None]
    m10 = jnp.sum(pw * r[None, None, :], axis=(1, 2))
    m01 = jnp.sum(pw * r[None, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def detect_orb(imgs: jax.Array, valid_hw: jax.Array, caps: CapacityParams,
               n_features: int = 500, scale_factor: float = 1.2,
               n_levels: int = 8, edge_threshold: int = 31,
               fast_threshold: float = 20.0, mr_size: float = 5.1962,
               patch_size: int = 31) -> Regions:
    """(V, H, W) view batch -> Regions (V, caps.per_view) with
    A = R(theta), s = patch_size*level_scale/mr_size (the reference's
    conversion, imagerepresentation.cpp:1096-1106)."""
    V, H, W = imgs.shape
    inv_total = sum(scale_factor ** -(2 * l) for l in range(n_levels))
    level_out = []
    for lv in range(n_levels):
        sc = scale_factor ** lv
        oh, ow = max(int(H / sc), 32), max(int(W / sc), 32)
        budget = max(int(n_features * (scale_factor ** (-2 * lv))
                         / inv_total), 16)
        budget = min(budget, caps.per_view)

        def one_view(img, vhw):
            lvl_img = _resize(img, oh, ow) if lv else img
            vh = jnp.maximum((vhw.astype(jnp.float32) / sc)
                             .astype(jnp.int32), 1)
            xy, resp, m = detect_orb_level(
                lvl_img, vh, fast_threshold, budget, edge_threshold // 2)
            ang = orientation_ic(lvl_img, xy)
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            A = jnp.stack([jnp.stack([ca, sa], -1),
                           jnp.stack([-sa, ca], -1)], -2)
            return Regions(
                xy=xy * sc, A=A,
                s=jnp.full(xy.shape[0], patch_size * sc / mr_size),
                response=resp, sub_type=jnp.full(xy.shape[0], DET_ORB,
                                                 jnp.int32),
                mask=m)

        level_out.append(jax.vmap(one_view)(imgs, valid_hw))
    regs = concat_regions(level_out)
    return compact_topk(regs, caps.per_view, by="response")


def brief_descriptors(img: jax.Array, xy: jax.Array, A: jax.Array,
                      s: jax.Array, mr_size: float = 5.1962,
                      n_bits: int = 256) -> jax.Array:
    """rBRIEF bits as float 0/1 from rotated/scaled pattern points.

    A is the region's rotation frame; the pattern point p maps to
    xy + A @ p * (s * mr_size / 31 * ...) — i.e. pattern coords are in
    the 31px patch frame scaled to the region size.
    """
    patch = 31
    scale = (s * mr_size / patch)[:, None, None]
    p = extract_patches(img, xy, A * scale, patch)  # (K, 31, 31)
    return brief_from_patches(p, n_bits)


def brief_from_patches(p: jax.Array, n_bits: int = 256) -> jax.Array:
    """rBRIEF bits from already-sampled (K, 31, 31) patches (the
    cross-view-compacted pipeline samples the patches itself)."""
    from mods_tpu.ops.gaussian import blur_band_matrix
    pat = jnp.asarray(brief_pattern(n_bits))       # (B, 2, 2)
    patch = p.shape[-1]
    # cv::ORB prefilters with GaussianBlur(7,7,sigma=2) before sampling
    # single pixels at the pattern points
    M = jnp.asarray(blur_band_matrix(patch, 2.0))
    p = jnp.einsum("ij,kjc->kic", M, p)
    p = jnp.einsum("kic,jc->kij", p, M)
    half = patch // 2
    px = jnp.clip(pat[..., 0] + half, 0, patch - 1)   # (B, 2)
    py = jnp.clip(pat[..., 1] + half, 0, patch - 1)

    def sample_one(pp):
        return bilinear_sample(pp, px, py)            # (B, 2)

    vals = jax.vmap(sample_one)(p)                    # (K, B, 2)
    return (vals[..., 0] < vals[..., 1]).astype(jnp.float32)
