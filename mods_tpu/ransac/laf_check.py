"""Local-affine-frame consistency checks of verified matches.

Reference: `H_LAF_check` / `F_LAF_check` (matching/matching.cpp:251-309,
193-250): each match contributes 3 point pairs — the center plus the two
affine-frame axis endpoints center + k_sigma*s*A[:,j] — whose model error
must stay below a coefficient times the RANSAC threshold.
"""

from __future__ import annotations

import jax.numpy as jnp

from mods_tpu.ransac import errors as E

K_SIGMA = 2.0 * 3.0 * (3.0 ** 0.5)  # synth-detection.cpp:28


def _laf_points(xy, A, s):
    """(N, 3, 2): center, center + ks*s*A[:,1], center + ks*s*A[:,0]."""
    ax0 = xy + K_SIGMA * s[:, None] * A[..., :, 0]
    ax1 = xy + K_SIGMA * s[:, None] * A[..., :, 1]
    return jnp.stack([xy, ax1, ax0], axis=1)


def h_laf_check(H, xy1, A1, s1, xy2, A2, s2, mask, threshold):
    """Keep matches whose 3 LAF point pairs satisfy
    sqrt(sum of symmetric-max H errors) <= threshold
    (H_LAF_check with HDsSymMax, matching.cpp:896-967 call site where
    threshold = 3 * HLAFCoef * err_threshold)."""
    if threshold <= 0:
        return mask
    p1 = _laf_points(xy1, A1, s1)  # (N, 3, 2)
    p2 = _laf_points(xy2, A2, s2)
    n = xy1.shape[0]
    e = E.h_error_symm(H, p1.reshape(-1, 2), p2.reshape(-1, 2),
                       mode="max").reshape(n, 3)
    err = jnp.sqrt(jnp.sum(e, axis=-1))
    return mask & (err <= threshold)


def f_laf_check(F, xy1, A1, s1, xy2, A2, s2, mask, threshold,
                sampson: bool = True):
    """F_LAF_check: sum of sqrt per-point epipolar errors <= threshold
    (threshold = LAFCoef * err_threshold)."""
    if threshold <= 0:
        return mask
    p1 = _laf_points(xy1, A1, s1)
    p2 = _laf_points(xy2, A2, s2)
    n = xy1.shape[0]
    fn = E.f_error_sampson if sampson else E.f_error_symepi
    e = fn(F, p1.reshape(-1, 2), p2.reshape(-1, 2)).reshape(n, 3)
    err = jnp.sum(jnp.sqrt(jnp.maximum(e, 0.0)), axis=-1)
    return mask & (err <= threshold)
