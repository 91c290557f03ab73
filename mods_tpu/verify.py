"""Ground-truth homography verification — the reference's accuracy oracle.

Reference: `HMatrixFiltering` (matching/matching.cpp:1074-1170) and the
GR_TRUTH verification mode (mods.cpp:312-335): given a known H, count
tentatives whose symmetric transfer error is below the threshold.  This
doubles as the framework's test oracle (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu.ransac.errors import h_error_symm


def load_h_file(path: str) -> np.ndarray:
    """Read a 3x3 homography text file (e.g. examples/cat.txt)."""
    return np.loadtxt(path).reshape(3, 3)


def gt_h_inliers(H: jax.Array, xy1: jax.Array, xy2: jax.Array,
                 mask: jax.Array, threshold: float = 3.0) -> jax.Array:
    """Inlier mask of correspondences under a known H (image1 -> image2),
    symmetric transfer error (the reference's default GT check)."""
    e = h_error_symm(jnp.asarray(H, jnp.float32), xy1, xy2)
    return mask & (e < threshold * threshold)
