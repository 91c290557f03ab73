"""Geometric densification: match regions by ellipse overlap under a
known/estimated homography.

Reference: `DensificationByHomography` -> `MatchRegionsByOverlapFastFLANN`
(matching/matching.cpp:669-806).  NOTE: the overlap matcher's body is
fully commented out in the reference (matching.cpp:690-806) — the shipped
binary appends nothing.  This implements the *intended* capability,
batched: map list2 regions into image-1 frame via H^-1 (+ local
linearization `linH`, synth-detection.cpp:1172), compute an analytic
ellipse-overlap error against each list1 region's k nearest centers, and
accept the best candidate under ``max_error``.

Overlap error: 1 - Gaussian overlap ratio
    ovl = 4 sqrt(det C1 det C2) / det(C1 + C2) * exp(-dμᵀ(C1+C2)⁻¹dμ)
a smooth analytic proxy of the Mikolajczyk ellipse-intersection measure
(matching.hpp:177-260) that is exact for equal ellipses and monotone in
both shape and center disparity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.ransac.errors import inv_3x3


def _lin_h(Hinv: jax.Array, xy: jax.Array):
    """Project points + local 2x2 linearization of Hinv at each point."""
    x, y = xy[..., 0], xy[..., 1]
    den = Hinv[2, 0] * x + Hinv[2, 1] * y + Hinv[2, 2]
    u = (Hinv[0, 0] * x + Hinv[0, 1] * y + Hinv[0, 2]) / den
    v = (Hinv[1, 0] * x + Hinv[1, 1] * y + Hinv[1, 2]) / den
    uv = jnp.stack([u, v], -1)
    lin = (Hinv[None, :2, :2]
           - uv[..., None] * Hinv[None, 2:3, :2]) / den[..., None, None]
    return uv, lin


def overlap_error(xy1, C1, xy2, C2):
    """1 - Gaussian overlap of ellipses (..., 2), (..., 2, 2)."""
    Cs = C1 + C2
    det1 = C1[..., 0, 0] * C1[..., 1, 1] - C1[..., 0, 1] * C1[..., 1, 0]
    det2 = C2[..., 0, 0] * C2[..., 1, 1] - C2[..., 0, 1] * C2[..., 1, 0]
    dets = Cs[..., 0, 0] * Cs[..., 1, 1] - Cs[..., 0, 1] * Cs[..., 1, 0]
    dmu = xy1 - xy2
    # inverse of 2x2 Cs
    inv = jnp.stack([
        jnp.stack([Cs[..., 1, 1], -Cs[..., 0, 1]], -1),
        jnp.stack([-Cs[..., 1, 0], Cs[..., 0, 0]], -1)], -2) \
        / jnp.maximum(dets, 1e-12)[..., None, None]
    md = jnp.einsum("...i,...ij,...j->...", dmu, inv, dmu)
    ovl = (4.0 * jnp.sqrt(jnp.maximum(det1 * det2, 0.0))
           / jnp.maximum(dets, 1e-12)) * jnp.exp(-md)
    return 1.0 - jnp.clip(ovl, 0.0, 1.0)


def densify_by_homography(xy1, A1, s1, m1, xy2, A2, s2, m2, H,
                          max_error: float = 0.5, knn: int = 30,
                          k_sigma: float = 3.0):
    """Match regions of list1 to list2 purely geometrically under H
    (image1 -> image2).  Returns (idx2 (N1,), err (N1,), mask (N1,)).

    Covariances are (k_sigma * s * A)(...)^T; list2 frames are pulled
    into image-1 coordinates with the local linearization of H^-1.
    """
    Hinv = inv_3x3(jnp.asarray(H, jnp.float32))
    uv2, lin = _lin_h(Hinv, xy2)
    B2 = lin @ (A2 * (k_sigma * s2)[:, None, None])
    C2 = B2 @ jnp.swapaxes(B2, -1, -2)
    B1 = A1 * (k_sigma * s1)[:, None, None]
    C1 = B1 @ jnp.swapaxes(B1, -1, -2)

    d2 = jnp.sum((xy1[:, None] - uv2[None]) ** 2, -1)
    d2 = jnp.where(m2[None], d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, min(knn, xy2.shape[0]))  # (N1, <=knn)

    err = overlap_error(xy1[:, None], C1[:, None], uv2[idx], C2[idx])
    err = jnp.where(m2[idx], err, jnp.inf)
    best = jnp.argmin(err, -1)
    best_err = jnp.take_along_axis(err, best[:, None], -1)[:, 0]
    idx2 = jnp.take_along_axis(idx, best[:, None], -1)[:, 0]
    ok = m1 & (best_err < max_error)
    return idx2, best_err, ok
