"""Matching and RANSAC tests with synthetic correspondences."""

import numpy as np
import jax
import jax.numpy as jnp

from mods_tpu.config import RansacParams
from mods_tpu.matching.fginn import (duplicate_filter, knn_squared_l2,
                                     match_fginn)
from mods_tpu.ransac.errors import h_error_symm, inv_3x3
from mods_tpu.ransac.homography import ransac_h


def test_knn_exact(rng):
    d1 = rng.normal(size=(37, 16)).astype(np.float32)
    d2 = rng.normal(size=(53, 16)).astype(np.float32)
    m1 = np.ones(37, bool)
    m2 = np.ones(53, bool)
    dists, idx = knn_squared_l2(jnp.asarray(d1), jnp.asarray(m1),
                                jnp.asarray(d2), jnp.asarray(m2), 5,
                                row_tile=16)
    full = ((d1**2).sum(1)[:, None] + (d2**2).sum(1)[None]
            - 2 * d1 @ d2.T)
    order = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_allclose(np.asarray(dists),
                               np.take_along_axis(full, order, 1),
                               rtol=1e-4, atol=1e-4)


def test_knn_masked(rng):
    d1 = rng.normal(size=(8, 4)).astype(np.float32)
    d2 = np.concatenate([d1, d1 + 100.0]).astype(np.float32)
    m2 = np.ones(16, bool)
    m2[:8] = False  # mask out the exact duplicates
    dists, idx = knn_squared_l2(jnp.asarray(d1), jnp.ones(8, bool),
                                jnp.asarray(d2), jnp.asarray(m2), 2)
    assert (np.asarray(idx)[:, 0] >= 8).all()


def test_fginn_accepts_despite_duplicates(rng):
    # list2 contains near-duplicate descriptors at the SAME location
    # (synthetic-view duplicates): plain 2NN ratio would reject, FGINN
    # must accept because the second NN is geometrically consistent.
    base = rng.normal(size=(10, 8)).astype(np.float32)
    d1 = base.copy()
    dup = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
    far = rng.normal(size=(10, 8)).astype(np.float32) * 5 + 10
    d2 = np.concatenate([base, dup, far]).astype(np.float32)
    xy2 = np.zeros((30, 2), np.float32)
    xy2[:10] = rng.uniform(100, 200, (10, 2))
    xy2[10:20] = xy2[:10] + 1.0   # duplicates within contradDist
    xy2[20:] = rng.uniform(400, 500, (10, 2))
    t = match_fginn(jnp.asarray(d1), jnp.ones(10, bool),
                    jnp.asarray(d2), jnp.ones(30, bool),
                    jnp.asarray(xy2), ratio_threshold=0.8,
                    contrad_dist=10.0, knn=20)
    m = np.asarray(t.mask)
    assert m.all(), m
    np.testing.assert_array_equal(np.asarray(t.idx2)[m] % 10,
                                  np.arange(10))


def test_fginn_rejects_ambiguous(rng):
    # two geometrically distant points with near-identical descriptors
    d = rng.normal(size=(1, 8)).astype(np.float32)
    d2 = np.concatenate([d + 0.01, d - 0.01]).astype(np.float32)
    xy2 = np.array([[0.0, 0.0], [500.0, 500.0]], np.float32)
    t = match_fginn(jnp.asarray(d), jnp.ones(1, bool),
                    jnp.asarray(d2), jnp.ones(2, bool),
                    jnp.asarray(xy2), 0.8, 10.0, knn=2)
    assert not np.asarray(t.mask)[0]


def test_duplicate_filter_chain():
    # chain 0-1-2: greedy keeps 0 and 2
    xy = np.array([[0, 0], [2, 0], [4, 0], [100, 100]], np.float32)
    keep = duplicate_filter(jnp.asarray(xy), jnp.asarray(xy),
                            jnp.ones(4, bool), radius=3.0)
    np.testing.assert_array_equal(np.asarray(keep),
                                  [True, False, True, True])


def _random_h(rng):
    H = np.eye(3) + 0.001 * rng.normal(size=(3, 3))
    H[0, 2] += 30.0
    H[1, 2] -= 12.0
    H[0, 0] *= 1.1
    return H / H[2, 2]


def test_h_error_symm_zero_on_exact(rng):
    H = _random_h(rng)
    xy1 = rng.uniform(0, 400, (50, 2)).astype(np.float32)
    ones = np.ones((50, 1), np.float32)
    p = np.concatenate([xy1, ones], 1) @ H.T
    xy2 = (p[:, :2] / p[:, 2:]).astype(np.float32)
    e = np.asarray(h_error_symm(jnp.asarray(H.astype(np.float32)),
                                jnp.asarray(xy1), jnp.asarray(xy2)))
    assert e.max() < 1e-2, e.max()


def test_inv3x3(rng):
    M = rng.normal(size=(5, 3, 3)).astype(np.float32)
    Minv = np.asarray(inv_3x3(jnp.asarray(M)))
    for i in range(5):
        np.testing.assert_allclose(M[i] @ Minv[i], np.eye(3), atol=1e-4)


def test_ransac_h_recovers(rng):
    H = _random_h(rng)
    n_in, n_out, cap = 60, 80, 256
    xy1 = rng.uniform(0, 500, (cap, 2)).astype(np.float32)
    ones = np.ones((cap, 1), np.float32)
    p = np.concatenate([xy1, ones], 1) @ H.T
    xy2 = (p[:, :2] / p[:, 2:]).astype(np.float32)
    xy2[:n_in] += rng.normal(size=(n_in, 2)).astype(np.float32) * 0.5
    xy2[n_in:n_in + n_out] = rng.uniform(
        0, 500, (n_out, 2)).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n_in + n_out] = True

    pars = RansacParams(err_threshold=3.0, batch_hypotheses=512,
                        max_rounds=4)
    Hest, inl, cnt = ransac_h(jnp.asarray(xy1), jnp.asarray(xy2),
                              jnp.asarray(mask), pars,
                              jax.random.PRNGKey(0))
    inl = np.asarray(inl)
    assert int(cnt) >= n_in * 0.9, int(cnt)
    # inliers should be (mostly) the true inliers
    assert inl[:n_in].sum() >= n_in * 0.9
    assert inl[n_in:n_in + n_out].sum() <= 3
    # H accuracy: transfer error of true inliers under Hest small
    e = np.asarray(h_error_symm(Hest, jnp.asarray(xy1[:n_in]),
                                jnp.asarray(xy2[:n_in])))
    assert np.median(e) < 9.0


def test_ransac_h_no_structure(rng):
    cap = 128
    xy1 = rng.uniform(0, 500, (cap, 2)).astype(np.float32)
    xy2 = rng.uniform(0, 500, (cap, 2)).astype(np.float32)
    mask = np.ones(cap, bool)
    pars = RansacParams(err_threshold=2.0, batch_hypotheses=256,
                        max_rounds=2)
    Hest, inl, cnt = ransac_h(jnp.asarray(xy1), jnp.asarray(xy2),
                              jnp.asarray(mask), pars,
                              jax.random.PRNGKey(1))
    assert int(cnt) < 30  # no consistent model on random data
