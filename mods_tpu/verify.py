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

from mods_tpu.ransac.errors import h_error_sampson, h_error_symm


def load_h_file(path: str) -> np.ndarray:
    """Read a 3x3 homography text file (e.g. examples/cat.txt)."""
    return np.loadtxt(path).reshape(3, 3)


def gt_h_inliers(H: jax.Array, xy1: jax.Array, xy2: jax.Array,
                 mask: jax.Array, threshold: float = 3.0,
                 error_type: str = "sampson") -> jax.Array:
    """Inlier mask of correspondences under a known H (image1 -> image2).

    The metric follows the config's RANSAC ErrorType exactly as the
    reference's HMatrixFiltering does (matching.cpp:1080-1098): the CVIU
    configs select Sampson, which at 3 px admits ~2x the displacement of
    the symmetric-sum check."""
    if error_type == "symm_max":
        e = h_error_symm(jnp.asarray(H, jnp.float32), xy1, xy2,
                         mode="max")
    elif error_type == "symm_sum":
        e = h_error_symm(jnp.asarray(H, jnp.float32), xy1, xy2)
    else:
        e = h_error_sampson(jnp.asarray(H, jnp.float32), xy1, xy2)
    return mask & (e < threshold * threshold)
