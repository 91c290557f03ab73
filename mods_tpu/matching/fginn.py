"""FGINN 2NN matching as tiled distance matmuls + on-chip top-k.

Reference: `MatchFlannFGINN` (matching/matching.cpp:357-461).  The FLANN
kd-tree kNN (nn=50, checks=128 — approximate!) becomes an *exact* tiled
brute-force (N1 x N2) squared-L2 computed as one matmul per row tile
(|a|^2 + |b|^2 - 2ab, cf. the reference's own dot-product trick noted at
matching.hpp:386-390), followed by lax.top_k.

FGINN semantics (matching.cpp:431-458): scanning neighbors j=1..nn-1 in
distance order, accept at the first j with d0/dj <= ratio^2; stop at the
first neighbor farther than contradDist (in reprojected image-1 frame...
actually list2's reprojected coords) — since d0/dj is non-increasing in j,
this is equivalent to: accept iff d0/d_{j*} <= ratio^2 where j* is the
first geometrically-contradicting neighbor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Tentatives:
    """Fixed-capacity tentative correspondences, one slot per list1 row."""
    idx2: jax.Array    # (N1,) int32 — matched index into list2
    d1: jax.Array      # (N1,) — distance^2 to first NN
    d2: jax.Array      # (N1,) — distance^2 to FGINN second
    ratio: jax.Array   # (N1,) — sqrt(d1/d2)
    mask: jax.Array    # (N1,) bool

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


def knn_squared_l2(desc1: jax.Array, mask1: jax.Array, desc2: jax.Array,
                   mask2: jax.Array, k: int, row_tile: int = 1024):
    """Exact k smallest squared-L2 neighbors in list2 for each list1 row.

    Returns (dists (N1, k), idx (N1, k)).  Invalid list2 rows get +inf
    distance.  Tiled over rows so the full N1 x N2 matrix never
    materializes (HBM-friendly; SURVEY.md §5.7).
    """
    n1, d = desc1.shape
    sq2 = jnp.sum(desc2 * desc2, axis=-1)
    inf = jnp.float32(jnp.inf)
    bad2 = jnp.where(mask2, 0.0, inf)

    pad = (-n1) % row_tile
    desc1p = jnp.pad(desc1, ((0, pad), (0, 0)))
    n_tiles = desc1p.shape[0] // row_tile
    tiles = desc1p.reshape(n_tiles, row_tile, d)

    def one_tile(t):
        sq1 = jnp.sum(t * t, axis=-1)
        dist = (sq1[:, None] + sq2[None, :] + bad2[None, :]
                - 2.0 * jnp.dot(t, desc2.T,
                                preferred_element_type=jnp.float32))
        dist = jnp.maximum(dist, 0.0)
        if jax.default_backend() == "tpu" and dist.shape[-1] >= 4 * k:
            # TPU-native approximate top-k: the reference's FLANN kNN is
            # itself approximate (kd-tree, checks=128); exact lax.top_k
            # lowers to a full sort and dominates matching time
            nd, ni = jax.lax.approx_max_k(-dist, k, recall_target=0.98)
        else:
            nd, ni = jax.lax.top_k(-dist, k)
        return -nd, ni

    dists, idx = jax.lax.map(one_tile, tiles)
    dists = dists.reshape(-1, k)[:n1]
    idx = idx.reshape(-1, k)[:n1]
    return dists, idx


def match_fginn(desc1: jax.Array, mask1: jax.Array, desc2: jax.Array,
                mask2: jax.Array, reproj_xy2: jax.Array,
                ratio_threshold: float | jax.Array,
                contrad_dist: float | jax.Array = 10.0, knn: int = 50,
                row_tile: int = 1024, standard_2nd: bool = False,
                db: tuple | None = None) -> Tentatives:
    """FGINN matching of list1 against list2.

    reproj_xy2: (N2, 2) coordinates of list2 regions in the ORIGINAL image
    frame (reproj_kp in the reference) — the contradiction distance is
    measured there.

    standard_2nd: plain Lowe 2nd-closest ratio instead of FGINN (the
    reference parses `doStandard_2nd_closestToo` at io_mods.cpp:515-518
    into matching.hpp:106 but never consumes it; this implements the
    documented intent: the contradiction scan collapses to j=1).

    db: optional (desc_db (Ndb, D), mask_db (Ndb,)) external descriptor
    database — the FGINN+DB mode (MatchFlannFGINNPlusDB,
    matching.cpp:462-566): the effective ratio is
    max(FGINN ratio, d0 / d_nearest_in_DB), i.e. a match must also beat
    its nearest database impostor.
    """
    dists, idx = knn_squared_l2(desc1, mask1, desc2, mask2, knn, row_tile)
    xy = reproj_xy2[idx]                       # (N1, k, 2)
    dxy = xy - xy[:, 0:1]
    geo = jnp.sum(dxy * dxy, axis=-1)          # (N1, k)
    contra = geo > (contrad_dist * contrad_dist)
    contra = contra.at[:, 0].set(False)
    # reference scan (matching.cpp:431-458): the ratio check at index j
    # runs BEFORE the contradiction break at the same j, and when no
    # contradictor exists among the nn neighbors the scan falls through
    # to j = nn-1 — so the effective "second" is the first contradictor
    # if any, else the last retrieved neighbor.
    any_contra = jnp.any(contra, axis=-1)
    last_finite = jnp.maximum(
        jnp.sum(jnp.isfinite(dists), axis=-1) - 1, 1)
    jstar = jnp.where(any_contra, jnp.argmax(contra, axis=-1), last_finite)
    if standard_2nd:
        jstar = jnp.ones_like(jstar)
    d0 = dists[:, 0]
    dj = jnp.take_along_axis(dists, jstar[:, None], axis=-1)[:, 0]
    ratio_sq = d0 / jnp.where(dj > 0, dj, jnp.inf)
    if db is not None:
        db_desc, db_mask = db
        ddb, _ = knn_squared_l2(desc1, mask1, db_desc, db_mask, 1,
                                row_tile)
        # an identical DB impostor (d_db -> 0) must give ratio -> inf
        ratio_db = d0 / jnp.maximum(ddb[:, 0], jnp.float32(1e-12))
        ratio_sq = jnp.maximum(ratio_sq, ratio_db)
    thr = jnp.asarray(ratio_threshold, jnp.float32)
    ok = (mask1 & (ratio_sq <= thr * thr) & jnp.isfinite(d0)
          & jnp.isfinite(dj))
    return Tentatives(
        idx2=idx[:, 0], d1=d0, d2=dj,
        ratio=jnp.sqrt(jnp.where(ratio_sq > 0, ratio_sq, 0.0)),
        mask=ok)


def match_distance(desc1, mask1, desc2, mask2, threshold,
                   row_tile: int = 1024,
                   squared_threshold: bool = False) -> Tentatives:
    """Absolute-distance matching (`MatchFLANNDistance`,
    matching.cpp:607-666): nearest neighbor with distance <= threshold.

    For binary (0/1 float) descriptors the squared L2 IS the Hamming
    distance, so pass ``squared_threshold=True`` with the Hamming budget
    (e.g. the ladder's DistanceThreshold=60 for ORB).
    """
    dists, idx = knn_squared_l2(desc1, mask1, desc2, mask2, 2, row_tile)
    d0 = dists[:, 0]
    thr = jnp.asarray(threshold, jnp.float32)
    thr2 = thr if squared_threshold else thr * thr
    ok = mask1 & (d0 <= thr2) & jnp.isfinite(d0)
    return Tentatives(idx2=idx[:, 0], d1=d0, d2=dists[:, 1],
                      ratio=jnp.sqrt(d0 / jnp.maximum(dists[:, 1], 1e-12)),
                      mask=ok)


def duplicate_filter(xy1: jax.Array, xy2: jax.Array, mask: jax.Array,
                     radius: float, iters: int = 8,
                     priority: jax.Array | None = None) -> jax.Array:
    """Duplicate tentative suppression (`DuplicateFiltering`,
    matching.cpp:2983-3047): a tentative j is dropped when a
    higher-priority kept tentative i has both endpoints within
    ``radius``.

    ``priority``: lower value wins (e.g. FGINN ratio for MODE_FGINN,
    match index for MODE_RANDOM).  The reference's greedy sequential scan
    is computed by fixed-point iteration of "j is killed by any kept
    higher-priority i"; it converges to the exact greedy solution when
    duplicate chains are shorter than ``iters`` links (overwhelmingly the
    case at radius 2-3 px).
    """
    if radius <= 0:
        return mask
    n = xy1.shape[0]
    r2 = radius * radius
    if priority is None:
        priority = jnp.arange(n, dtype=jnp.float32)

    def close(a):
        d = a[:, None, :] - a[None, :, :]
        return jnp.sum(d * d, axis=-1) <= r2

    dup = close(xy1) & close(xy2)
    # i kills j iff priority[i] < priority[j] (ties: lower index wins)
    pr = priority + jnp.arange(n, dtype=priority.dtype) * 1e-9
    higher = pr[None, :] < pr[:, None]     # [j, i]: i beats j
    pair_bad = dup & higher & mask[:, None] & mask[None, :]

    keep = mask

    def body(_, keep):
        killed_by_kept = jnp.any(pair_bad & keep[None, :], axis=-1)
        return mask & ~killed_by_kept

    keep = jax.lax.fori_loop(0, iters, body, keep)
    return keep
