"""Dominant-orientation estimation, vectorized over region batches.

Reference: `DetectOrientation` + `EstimateDominantAnglesFunctor`
(synth-detection.cpp:722-919): 36-bin gradient-orientation histogram over
a circular-Gaussian-masked patch, 6 circular smoothing passes, parabolic
peak interpolation, all peaks >= th * max kept (plus optional half-SIFT
folding and upright duplication).

Here the histogram is a one-hot matmul over all patches at once and each
region emits up to ``max_angles`` static peak slots with a mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.ops.image import circular_gauss_mask
from mods_tpu.ops.warp import extract_patches, touches_border

BINS = 36


def orientation_histograms(patches: jax.Array) -> jax.Array:
    """(K, P, P) patches -> (K, 36) raw histograms.

    Gradient magnitude/orientation over the patch interior only
    (computeGradientMagnitudeAndOrientation, helpers.cpp:840-863 computes
    rows/cols 1..P-2), mask weight > 0 and magnitude > 1.0 gating as in
    the reference (synth-detection.cpp:781-792).
    """
    k, pS, _ = patches.shape
    mask = jnp.asarray(circular_gauss_mask(pS, pS / 3.0))
    gx = patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2]
    gy = patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1]
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    w = mask[1:-1, 1:-1][None]
    weight = jnp.where((w > 0) & (mag > 1.0), mag * w, 0.0)
    binf = BINS * (ori / jnp.pi + 1.0) / 2.0
    bini = jnp.clip(binf.astype(jnp.int32), 0, BINS)  # bin may equal 36
    bini = jnp.where(bini == BINS, 0, bini)  # ref adds hist[36] slot; fold
    onehot = jax.nn.one_hot(bini.reshape(k, -1), BINS, dtype=patches.dtype)
    return jnp.einsum("kp,kpb->kb", weight.reshape(k, -1), onehot)


def smooth_circular(hist: jax.Array, passes: int = 6) -> jax.Array:
    """[1 1 1] circular smoothing, 6 passes (synth-detection.cpp:724-735)."""
    for _ in range(passes):
        hist = (jnp.roll(hist, 1, axis=-1) + hist
                + jnp.roll(hist, -1, axis=-1))
    return hist


def find_peaks(hist: jax.Array, max_angles: int, th: float,
               half_sift: bool = False):
    """Local maxima above th*max with parabolic interpolation.

    Returns (angles (K, max_angles) radians, mask).  Peak order follows
    bin order (the reference appends in bin order and truncates to
    maxAngles, synth-detection.cpp:814-840).
    """
    mx = jnp.max(hist, axis=-1, keepdims=True)
    thresh = mx * th
    if half_sift:
        half = BINS // 2
        folded = hist[..., :half] + hist[..., half:]
        hist = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=-1)
    prev = jnp.roll(hist, 1, axis=-1)
    nxt = jnp.roll(hist, -1, axis=-1)
    is_peak = (hist >= thresh) & (hist > prev) & (hist > nxt)
    pp = (prev - nxt) / (prev - 2.0 * hist + nxt) / 2.0
    pp = jnp.where(jnp.isfinite(pp), pp, 0.0)
    bins = jnp.arange(BINS, dtype=hist.dtype)
    ang = (2.0 * jnp.pi * (bins[None] + 0.5 + pp) / BINS) - jnp.pi
    # static top-max_angles in bin order
    key = jnp.where(is_peak, -bins[None], -jnp.inf)
    _, idx = jax.lax.top_k(key, max_angles)
    angles = jnp.take_along_axis(ang, idx, axis=-1)
    pmask = jnp.take_along_axis(is_peak, idx, axis=-1)
    return angles, pmask


def rotate_shapes(A: jax.Array, angles: jax.Array) -> jax.Array:
    """A' = A @ R(-angle) as in DetectOrientation's new-region synthesis
    (synth-detection.cpp:897-906).  A: (K, 2, 2); angles: (K, M) ->
    (K, M, 2, 2)."""
    ci = jnp.cos(-angles)
    si = jnp.sin(-angles)
    a11 = A[:, None, 0, 0] * ci - A[:, None, 0, 1] * si
    a12 = A[:, None, 0, 0] * si + A[:, None, 0, 1] * ci
    a21 = A[:, None, 1, 0] * ci - A[:, None, 1, 1] * si
    a22 = A[:, None, 1, 0] * si + A[:, None, 1, 1] * ci
    return jnp.stack([jnp.stack([a11, a12], -1),
                      jnp.stack([a21, a22], -1)], -2)


def detect_orientations(img: jax.Array, xy: jax.Array, A: jax.Array,
                        s: jax.Array, valid: jax.Array, mr_size: float,
                        patch_size: int, max_angles: int, th: float,
                        half_sift: bool = False,
                        k_sigma: float = 6.0 * 1.7320508,
                        mip_src=None):
    """Per-region dominant angles from a view image.

    img: (H, W); regions (K,) in view coords.  Returns
    (angles (K, M), mask (K, M)).  Regions whose k_sigma*s window touches
    the image border are dropped entirely (synth-detection.cpp:873-886).
    The patch sampling step is patchImageSize/patchSize * s with
    patchImageSize = 2*int(mr_size)+1 (synth-detection.cpp:851-856).

    ``mip_src``: optional (mips, valid_hw) from sampler.mip_stack(img, n)
    — the fast windowed sampling path, shareable with descriptor patch
    extraction.  When absent the direct gather path is used.
    """
    h, w = img.shape
    patch_image_size = 2 * int(mr_size) + 1
    img_to_patch = patch_image_size / patch_size
    bad = touches_border(w, h, xy, A,
                         jnp.ceil(k_sigma * s / 2.0),
                         jnp.ceil(k_sigma * s / 2.0))
    ok = valid & ~bad
    curr = img_to_patch * s
    As = A * curr[:, None, None]
    if mip_src is not None:
        from mods_tpu.ops.sampler import sample_affine_patches, select_level
        mips, valid_hw = mip_src
        lvl, scale = select_level(As, patch_size, mips.shape[0])
        patches = sample_affine_patches(
            mips, lvl, xy / scale[:, None], As / scale[:, None, None],
            patch_size, valid_hw)
    else:
        patches = extract_patches(img, xy, As, patch_size)
    hist = smooth_circular(orientation_histograms(patches))
    angles, pmask = find_peaks(hist, max_angles, th, half_sift)
    return angles, pmask & ok[:, None]
