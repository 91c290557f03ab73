"""Patch-functor descriptors: SURF, LIOP, DAISY, SSIM.

The reference computes these on the normalized 41x41 patch through the
`DescribeRegions` template (synth-detection.hpp:169-255) with per-
descriptor functors: SURF (opensurf/surf.cpp via
descriptors/surfdescriptor.hpp), LIOP (vlfeat vl_liopdesc_process via
matching/liopdesc.hpp), DAISY single-point (libdaisy via
descriptors/daisydescriptor.hpp:33-50), SSIM self-similarity
(ssdesc-cpp-1.1.1/ssdesc.cc via descriptors/ssimdescriptor.hpp:80-110).

Here each is a batched (K, P, P) -> (K, D) tensor program: spatial
poolings are matmuls, neighbor samplings are fixed gathers, orderings are
vectorized sorts — no per-keypoint loops.
"""

from __future__ import annotations

import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu.ops.image import patch_gradient


# --------------------------------------------------------------------------
# SURF (64-d): 4x4 cells x (sum dx, sum |dx|, sum dy, sum |dy|)

@functools.lru_cache(maxsize=8)
def _cell_weights(P: int, cells: int) -> np.ndarray:
    """(P, cells) soft assignment of rows/cols to grid cells with a
    Gaussian window over the whole patch (sigma = 3.3s in SURF; here the
    patch *is* the measurement region so sigma = P/2 * 0.66)."""
    W = np.zeros((P, cells), np.float32)
    bounds = np.linspace(0, P, cells + 1)
    for i in range(P):
        c = np.searchsorted(bounds, i + 0.5) - 1
        W[i, min(max(c, 0), cells - 1)] = 1.0
    g = np.exp(-0.5 * ((np.arange(P) - P / 2.0) / (0.33 * P)) ** 2)
    return (W * g[:, None]).astype(np.float32)


def surf_descriptor(patches: jax.Array, cells: int = 4) -> jax.Array:
    """(K, P, P) -> (K, 64) M-SURF-style descriptor, L2-normalized."""
    P = patches.shape[-1]
    gx, gy = patch_gradient(patches)
    W = jnp.asarray(_cell_weights(P, cells))
    feats = []
    for f in (gx, jnp.abs(gx), gy, jnp.abs(gy)):
        feats.append(jnp.einsum("rb,krc,cd->kbd", W, f, W,
                                preferred_element_type=jnp.float32))
    v = jnp.stack(feats, -1).reshape(patches.shape[0], -1)
    n = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
    return v / jnp.maximum(n, 1e-10)


# --------------------------------------------------------------------------
# LIOP (144-d): local intensity order patterns (vlfeat vl/liop.c behavior)

_LIOP_NEIGHBORS = 4
_LIOP_BINS = 6
_PERMS = list(itertools.permutations(range(_LIOP_NEIGHBORS)))
_PERM_INDEX = {p: i for i, p in enumerate(_PERMS)}


@functools.lru_cache(maxsize=4)
def _liop_tables(P: int, n_neigh: int, radius: float):
    """Sampling offsets for the neighbor circle + support mask."""
    ang = 2.0 * np.pi * np.arange(n_neigh) / n_neigh
    offs = np.stack([radius * np.cos(ang), radius * np.sin(ang)],
                    -1).astype(np.float32)          # (n, 2) dx, dy
    yy, xx = np.mgrid[0:P, 0:P].astype(np.float32)
    c = (P - 1) / 2.0
    rr = np.hypot(xx - c, yy - c)
    support = rr <= (c - radius - 1.0)
    # per-pixel rotation: neighbors are sampled relative to the outward
    # radial direction so the pattern is rotation-covariant (liop.c)
    theta = np.arctan2(yy - c, xx - c)
    return offs, support.astype(np.float32), theta.astype(np.float32)


def _rank_index(vals: jax.Array) -> jax.Array:
    """(..., n) neighbor intensities -> permutation index (0..n!-1) via
    Lehmer code of the argsort permutation."""
    n = vals.shape[-1]
    # rank of each element = number of strictly-smaller elements (+ ties
    # broken by position, matching a stable sort)
    less = (vals[..., None, :] < vals[..., :, None])
    tie = (vals[..., None, :] == vals[..., :, None])
    pos = jnp.arange(n)
    tie_break = tie & (pos[None, :] < pos[:, None])
    rank = jnp.sum(less | tie_break, -1)             # (..., n) ranks
    # Lehmer code from ranks: L_i = #{j > i : rank_j < rank_i}
    later_smaller = (rank[..., None, :] < rank[..., :, None]) \
        & (pos[None, :] > pos[:, None])
    lehmer = jnp.sum(later_smaller, -1)              # (..., n)
    fact = jnp.asarray([math.factorial(n - 1 - i) for i in range(n)],
                       jnp.int32)
    return jnp.sum(lehmer * fact, -1)                # (...,)


def liop_descriptor(patches: jax.Array, radius: float = 6.0,
                    n_neigh: int = _LIOP_NEIGHBORS,
                    n_bins: int = _LIOP_BINS) -> jax.Array:
    """(K, P, P) -> (K, n_bins * n_neigh!) LIOP."""
    from mods_tpu.ops.warp import bilinear_sample
    K, P, _ = patches.shape
    offs, support, theta = _liop_tables(P, n_neigh, radius)
    offs = jnp.asarray(offs)
    support = jnp.asarray(support)
    theta = jnp.asarray(theta)
    c = (P - 1) / 2.0
    yy, xx = jnp.mgrid[0:P, 0:P]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)

    # rotated neighbor coordinates per pixel: (n, P, P)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    nx = xx[None] + offs[:, 0, None, None] * ct[None] \
        - offs[:, 1, None, None] * st[None]
    ny = yy[None] + offs[:, 0, None, None] * st[None] \
        + offs[:, 1, None, None] * ct[None]

    def sample_one(patch):
        return bilinear_sample(patch, nx, ny)        # (n, P, P)
    neigh = jax.vmap(sample_one)(patches)            # (K, n, P, P)
    neigh = jnp.moveaxis(neigh, 1, -1)               # (K, P, P, n)

    pidx = _rank_index(neigh)                        # (K, P, P)

    # intensity-order bins of the center pixels over the support region:
    # quantile thresholds from the sorted supported intensities (liop.c
    # partitions the region into equal-count groups)
    big = jnp.float32(1e30)
    sup = support > 0
    n_sup = jnp.sum(sup).astype(jnp.int32)
    flat = jnp.where(sup[None], patches, big).reshape(K, -1)
    svals = jnp.sort(flat, -1)
    qpos = (jnp.arange(1, n_bins) * n_sup) // n_bins
    ths = svals[:, qpos]                             # (K, n_bins-1)
    binid = jnp.sum(patches[..., None] >= ths[:, None, None, :],
                    -1)                              # (K, P, P) 0..n_bins-1

    n_perm = math.factorial(n_neigh)
    dim = n_bins * n_perm
    cell = binid * n_perm + pidx                     # (K, P, P)
    # weight: 1 within support (vlfeat default weighting threshold off)
    onehot = jax.nn.one_hot(cell, dim, dtype=jnp.float32)
    v = jnp.einsum("khwd,hw->kd", onehot, support)
    n = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
    return v / jnp.maximum(n, 1e-10)


# --------------------------------------------------------------------------
# DAISY single-point (200-d): center + 3 rings x 8 points, 8 orientations

@functools.lru_cache(maxsize=4)
def _daisy_grid(P: int, n_rings: int, n_segs: int):
    c = (P - 1) / 2.0
    pts = [(c, c, 0)]
    for ri in range(1, n_rings + 1):
        rad = ri * (c * 0.8) / n_rings
        for si in range(n_segs):
            a = 2 * np.pi * si / n_segs
            pts.append((c + rad * np.cos(a), c + rad * np.sin(a), ri))
    xy = np.asarray([(x, y) for x, y, _ in pts], np.float32)
    lvl = np.asarray([l for _, _, l in pts], np.int32)
    return xy, lvl


def daisy_descriptor(patches: jax.Array, n_rings: int = 3,
                     n_segs: int = 8, n_ori: int = 8) -> jax.Array:
    """(K, P, P) -> (K, (1 + n_rings*n_segs) * n_ori) DAISY at the patch
    center (libdaisy single-point mode)."""
    from mods_tpu.ops.gaussian import gaussian_blur
    from mods_tpu.ops.warp import bilinear_sample
    K, P, _ = patches.shape
    gx, gy = patch_gradient(patches)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    # 8 positive-clipped orientation maps (daisy layered gradients)
    angs = jnp.arange(n_ori) * (2 * jnp.pi / n_ori)
    cos_d = jnp.cos(ori[..., None] - angs)           # (K, P, P, n_ori)
    layers = mag[..., None] * jnp.maximum(cos_d, 0.0)
    layers = jnp.moveaxis(layers, -1, 1)             # (K, n_ori, P, P)

    # cumulative smoothing per ring level
    sig = [1.0, 2.5, 5.0, 7.5][:n_rings + 1]
    smoothed = [gaussian_blur(layers, sig[0])]
    for i in range(1, n_rings + 1):
        inc = math.sqrt(max(sig[i] ** 2 - sig[i - 1] ** 2, 0.25))
        smoothed.append(gaussian_blur(smoothed[-1], inc))
    vol = jnp.stack(smoothed, 1)          # (K, n_rings+1, n_ori, P, P)

    xy, lvl = _daisy_grid(P, n_rings, n_segs)
    xy = jnp.asarray(xy)
    lvl = jnp.asarray(lvl)

    def sample_one(v):                    # (n_rings+1, n_ori, P, P)
        vals = jax.vmap(lambda p, l: jax.vmap(
            lambda m: bilinear_sample(m, p[0], p[1]))(v[l]))(xy, lvl)
        return vals                        # (n_pts, n_ori)
    hist = jax.vmap(sample_one)(vol)       # (K, n_pts, n_ori)
    # per-point L2 normalization (daisy's partial normalization)
    n = jnp.sqrt(jnp.sum(hist * hist, -1, keepdims=True))
    hist = hist / jnp.maximum(n, 1e-10)
    return hist.reshape(K, -1)


# --------------------------------------------------------------------------
# SSIM self-similarity (ssdesc.cc calc_ssdescs_alt semantics)

@functools.lru_cache(maxsize=4)
def _ssim_bins(P: int, inner: int, n_rad: int, n_ang: int):
    """Log-polar bin assignment of window offsets -> (P', P') bin ids."""
    out = P - inner + 1                      # correlation surface size
    c = (out - 1) / 2.0
    yy, xx = np.mgrid[0:out, 0:out].astype(np.float32)
    dx, dy = xx - c, yy - c
    r = np.hypot(dx, dy)
    a = np.mod(np.arctan2(dy, dx), 2 * np.pi)
    rmax = c
    with np.errstate(divide="ignore"):
        rbin = np.floor(n_rad * np.log1p(r) / np.log1p(rmax)).astype(int)
    rbin = np.clip(rbin, 0, n_rad - 1)
    abin = np.minimum((a * n_ang / (2 * np.pi)).astype(int), n_ang - 1)
    binid = rbin * n_ang + abin
    binid[r > rmax] = -1
    binid[r < 1.0] = -1                      # exclude the trivial center
    return binid


def ssim_descriptor(patches: jax.Array, inner: int = 5, n_rad: int = 4,
                    n_ang: int = 10) -> jax.Array:
    """(K, P, P) -> (K, n_rad*n_ang) self-similarity descriptor: SSD
    correlation surface of the central inner x inner patch against the
    window, max-pooled into log-polar bins, normalized to [0, 1]."""
    K, P, _ = patches.shape
    out = P - inner + 1
    c0 = (P - inner) // 2
    center = jax.lax.dynamic_slice(
        patches, (0, c0, c0), (K, inner, inner))     # (K, in, in)

    # SSD via grouped correlation: ssd = sum(p^2) - 2*corr + sum(c^2)
    ones = jnp.ones((K, 1, inner, inner), jnp.float32)
    x = patches[None]                                 # (1, K, P, P)
    p2 = jax.lax.conv_general_dilated(
        x * x, ones, (1, 1), "VALID", feature_group_count=K,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    corr = jax.lax.conv_general_dilated(
        x, center[:, None], (1, 1), "VALID", feature_group_count=K,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    c2 = jnp.sum(center * center, (-1, -2))[:, None, None]
    ssd = p2 - 2.0 * corr + c2                        # (K, out, out)

    # correlation surface: exp(-ssd / varnoise), varnoise from the local
    # auto-variance (ssdesc.cc uses max(varnoise, local var))
    varn = jnp.maximum(
        jnp.mean(ssd, (-1, -2), keepdims=True) * 0.5, 1e-3)
    sim = jnp.exp(-ssd / varn)

    binid = jnp.asarray(_ssim_bins(P, inner, n_rad, n_ang))
    dim = n_rad * n_ang
    masks = jax.nn.one_hot(jnp.maximum(binid, 0), dim,
                           dtype=jnp.float32) * (binid >= 0)[..., None]
    # max over each bin (prune_normalise takes the max per bin)
    v = jnp.max(jnp.where(masks.transpose(2, 0, 1)[None] > 0,
                          sim[:, None], 0.0), (-1, -2))  # (K, dim)
    vmin = jnp.min(v, -1, keepdims=True)
    vmax = jnp.max(v, -1, keepdims=True)
    return (v - vmin) / jnp.maximum(vmax - vmin, 1e-10)


# --------------------------------------------------------------------------
# M-LDB (AKAZE binary descriptor, akaze/src/lib Get_MLDB_Full_Descriptor):
# block means of (intensity, dx, dy) on 2x2/3x3/4x4 grids, all pairwise
# comparisons -> 486 bits.

@functools.lru_cache(maxsize=4)
def _block_means_weights(P: int, grid: int) -> np.ndarray:
    W = np.zeros((P, grid), np.float32)
    bounds = np.linspace(0, P, grid + 1)
    for i in range(P):
        c = np.searchsorted(bounds, i + 0.5) - 1
        W[i, min(max(c, 0), grid - 1)] = 1.0
    return W / np.maximum(W.sum(0, keepdims=True), 1)


def mldb_descriptor(patches: jax.Array,
                    grids: tuple = (2, 3, 4)) -> jax.Array:
    """(K, P, P) -> (K, 486) 0/1 bits (Hamming distance = squared L2)."""
    P = patches.shape[-1]
    gx, gy = patch_gradient(patches)
    bits = []
    for g in grids:
        W = jnp.asarray(_block_means_weights(P, g))
        for ch in (patches, gx, gy):
            cells = jnp.einsum("rb,krc,cd->kbd", W, ch, W,
                               preferred_element_type=jnp.float32)
            v = cells.reshape(cells.shape[0], -1)        # (K, g*g)
            n = g * g
            iu, ju = np.triu_indices(n, 1)
            bits.append((v[:, iu] > v[:, ju]).astype(jnp.float32))
    return jnp.concatenate(bits, -1)


# --------------------------------------------------------------------------
# MROGH (mrogh/ in the reference, descriptors/mroghdesc.hpp): multi-
# support-region rotation-invariant order histograms.  Per support
# region: gradients projected onto the local radial/tangential frame
# (rotation-invariant), pixels partitioned into K groups by intensity
# order, 8-bin orientation histogram per group.  Support regions here
# are nested crops of the normalized patch (the reference samples
# multiple support radii around the keypoint).

def _mrogh_one_support(patch: jax.Array, n_groups: int,
                       n_ori: int) -> jax.Array:
    K, P, _ = patch.shape
    gx, gy = patch_gradient(patch)
    c = (P - 1) / 2.0
    yy, xx = jnp.mgrid[0:P, 0:P]
    dx = xx.astype(jnp.float32) - c
    dy = yy.astype(jnp.float32) - c
    rr = jnp.sqrt(dx * dx + dy * dy)
    inside = rr <= c
    ur_x = dx / jnp.maximum(rr, 1e-6)     # radial unit vector
    ur_y = dy / jnp.maximum(rr, 1e-6)
    # gradient in the local polar frame: (radial, tangential)
    gr = gx * ur_x[None] + gy * ur_y[None]
    gt = -gx * ur_y[None] + gy * ur_x[None]
    mag = jnp.sqrt(gr * gr + gt * gt)
    ang = jnp.arctan2(gt, gr)             # rotation-invariant angle
    o = (ang + jnp.pi) * n_ori / (2 * jnp.pi)
    ob = jnp.clip(o.astype(jnp.int32), 0, n_ori - 1)

    # intensity-order groups over the disc (equal-count quantiles)
    big = jnp.float32(1e30)
    flat = jnp.where(inside[None], patch, big).reshape(K, -1)
    svals = jnp.sort(flat, -1)
    n_in = jnp.sum(inside).astype(jnp.int32)
    qpos = (jnp.arange(1, n_groups) * n_in) // n_groups
    ths = svals[:, qpos]                                # (K, g-1)
    gid = jnp.sum(patch[..., None] >= ths[:, None, None, :], -1)

    cell = gid * n_ori + ob                             # (K, P, P)
    onehot = jax.nn.one_hot(cell, n_groups * n_ori, dtype=jnp.float32)
    w = (mag * inside[None])[..., None]
    return jnp.sum(onehot * w, axis=(1, 2))             # (K, g*n_ori)


def mrogh_descriptor(patches: jax.Array, n_groups: int = 6,
                     n_ori: int = 8,
                     supports: tuple = (41, 31, 21)) -> jax.Array:
    """(K, P, P) -> (K, len(supports)*n_groups*n_ori) MROGH."""
    K, P, _ = patches.shape
    outs = []
    for sup in supports:
        off = (P - sup) // 2
        sub = jax.lax.dynamic_slice(patches, (0, off, off), (K, sup, sup))
        outs.append(_mrogh_one_support(sub, n_groups, n_ori))
    v = jnp.concatenate(outs, -1)
    n = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
    return v / jnp.maximum(n, 1e-10)


# --------------------------------------------------------------------------
# FREAK / BRISK binary pattern descriptors.
#
# The reference wraps the OpenCV extractors on the normalized patch
# (descriptors/freakdescriptor.hpp, briskdescriptor.hpp).  Here the
# retinal / concentric sampling patterns are built deterministically and
# receptive-field means are Gaussian-weighted patch samples; the pair
# lists are deterministic (coarse-to-fine for FREAK, short-distance for
# BRISK) instead of OpenCV's learned tables — both images use the same
# pattern so matching behaves identically.

@functools.lru_cache(maxsize=2)
def _freak_pattern(P: int, scale: float = 1.0):
    """43 receptive fields: center + 6 rings of 7, radius and field size
    shrinking toward the center (retinal layout).  ``scale`` stretches
    the ring radii (the reference's patternScale/22, GetFREAKPars)."""
    pts = [(0.0, 0.0, 0.8)]
    n_rings = 6
    for ri in range(n_rings):
        rad = (P / 2.0 - 2.0) * (0.9 ** ri) * (ri + 2) / (n_rings + 1)
        rad = min(rad * scale, P / 2.0 - 1.0)
        sig = max(0.6, rad * 0.35)
        for k in range(7):
            a = 2 * np.pi * k / 7 + (np.pi / 7) * (ri % 2)
            pts.append((rad * np.cos(a), rad * np.sin(a), sig))
    arr = np.asarray(pts, np.float32)
    # pairs: all C(43,2) sorted by field distance descending, top 512
    n = len(arr)
    iu, ju = np.triu_indices(n, 1)
    d = np.hypot(arr[iu, 0] - arr[ju, 0], arr[iu, 1] - arr[ju, 1])
    order = np.argsort(-d)[:512]
    return arr, iu[order].astype(np.int32), ju[order].astype(np.int32)


@functools.lru_cache(maxsize=2)
def _brisk_pattern(P: int, scale: float = 1.0):
    """BRISK concentric pattern: center + rings of (10, 14, 15, 20)
    points; short-distance pairs -> 512 bits.  ``scale`` is the
    reference's patternScale (GetBRISKPars)."""
    pts = [(0.0, 0.0, 0.8)]
    ring_n = (10, 14, 15, 20)
    for ri, n_k in enumerate(ring_n):
        rad = (P / 2.0 - 2.0) * (ri + 1) / (len(ring_n) + 0.5)
        rad = min(rad * scale, P / 2.0 - 1.0)
        sig = max(0.6, rad * 0.25)
        for k in range(n_k):
            a = 2 * np.pi * k / n_k
            pts.append((rad * np.cos(a), rad * np.sin(a), sig))
    arr = np.asarray(pts, np.float32)
    n = len(arr)
    iu, ju = np.triu_indices(n, 1)
    d = np.hypot(arr[iu, 0] - arr[ju, 0], arr[iu, 1] - arr[ju, 1])
    order = np.argsort(d)[:512]              # short-distance pairs
    return arr, iu[order].astype(np.int32), ju[order].astype(np.int32)


def _pattern_bits(patches: jax.Array, pattern) -> jax.Array:
    """Sample receptive-field means and compare pairs -> 0/1 bits."""
    from mods_tpu.ops.warp import bilinear_sample
    arr, pi, pj = pattern
    P = patches.shape[-1]
    c = (P - 1) / 2.0
    # receptive field mean ~ average of 5 samples (center + 4 offsets at
    # sigma) — a separable approximation of the Gaussian field
    offs = np.asarray([(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)],
                      np.float32)
    xs = c + arr[None, :, 0] + offs[:, None, 0] * arr[None, :, 2]
    ys = c + arr[None, :, 1] + offs[:, None, 1] * arr[None, :, 2]
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)

    def one(patch):
        v = bilinear_sample(patch, xs, ys)    # (5, n_pts)
        return jnp.mean(v, 0)
    means = jax.vmap(one)(patches)            # (K, n_pts)
    return (means[:, jnp.asarray(pi)]
            < means[:, jnp.asarray(pj)]).astype(jnp.float32)


def freak_descriptor(patches: jax.Array,
                     pattern_scale: float = 22.0) -> jax.Array:
    return _pattern_bits(patches, _freak_pattern(
        patches.shape[-1], pattern_scale / 22.0))


def brisk_descriptor(patches: jax.Array,
                     pattern_scale: float = 1.0) -> jax.Array:
    return _pattern_bits(patches, _brisk_pattern(
        patches.shape[-1], pattern_scale))


PATCH_FNS = {
    "SURF": surf_descriptor,
    "LIOP": liop_descriptor,
    "DAISY": daisy_descriptor,
    "SSIM": ssim_descriptor,
    "KAZE": surf_descriptor,     # M-SURF on the normalized patch
    "MLDB": mldb_descriptor,
    "FREAK": freak_descriptor,
    "BRISK": brisk_descriptor,
    "MROGH": mrogh_descriptor,
}

PATCH_DIMS = {
    "SURF": 64,
    "LIOP": _LIOP_BINS * math.factorial(_LIOP_NEIGHBORS),
    "DAISY": (1 + 3 * 8) * 8,
    "SSIM": 4 * 10,
    "KAZE": 64,
    "MLDB": sum(3 * (g * g) * (g * g - 1) // 2 for g in (2, 3, 4)),
    "FREAK": 512,
    "BRISK": 512,
    "MROGH": 3 * 6 * 8,
}
