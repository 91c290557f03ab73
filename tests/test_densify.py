"""Densification-by-homography tests (matching.cpp:669 intent)."""

import numpy as np
import jax
import jax.numpy as jnp

from mods_tpu.matching.densify import densify_by_homography, overlap_error


def test_overlap_error_identity():
    xy = jnp.asarray([[10.0, 10.0]])
    C = jnp.asarray([[[9.0, 0.0], [0.0, 4.0]]])
    e = np.asarray(overlap_error(xy, C, xy, C))
    assert e[0] < 1e-5
    # displaced -> larger error
    e2 = np.asarray(overlap_error(xy, C, xy + 5.0, C))
    assert e2[0] > 0.5


def test_densify_recovers_pairs():
    rng = np.random.default_rng(0)
    n = 40
    xy1 = rng.uniform(50, 450, (n, 2)).astype(np.float32)
    ang = rng.uniform(0, np.pi, n)
    sq = rng.uniform(0.7, 1.4, n)
    A1 = np.zeros((n, 2, 2), np.float32)
    A1[:, 0, 0] = np.cos(ang) * sq
    A1[:, 0, 1] = -np.sin(ang) / sq
    A1[:, 1, 0] = np.sin(ang) * sq
    A1[:, 1, 1] = np.cos(ang) / sq
    s1 = rng.uniform(3, 8, n).astype(np.float32)

    H = np.array([[0.9, 0.1, 30.0], [-0.05, 1.1, -12.0],
                  [1e-5, -2e-5, 1.0]])
    ones = np.ones((n, 1))
    p = np.concatenate([xy1, ones], 1) @ H.T
    xy2 = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    lin = (H[None, :2, :2] - xy2[:, :, None] * H[None, 2:3, :2]) \
        / p[:, 2:3, None]
    A2s = np.einsum("nij,njk->nik", lin, A1 * s1[:, None, None])
    # renormalize to (A, s) with det(A)=1
    det = np.abs(np.linalg.det(A2s))
    s2 = np.sqrt(det).astype(np.float32)
    A2 = (A2s / s2[:, None, None]).astype(np.float32)

    perm = rng.permutation(n)
    m = np.ones(n, bool)
    idx2, err, ok = jax.jit(
        lambda *a: densify_by_homography(*a, jnp.asarray(H)))(
        jnp.asarray(xy1), jnp.asarray(A1), jnp.asarray(s1),
        jnp.asarray(m),
        jnp.asarray(xy2[perm]), jnp.asarray(A2[perm]),
        jnp.asarray(s2[perm]), jnp.asarray(m))
    idx2 = np.asarray(idx2)
    ok = np.asarray(ok)
    assert ok.mean() > 0.9
    # recovered the permutation
    correct = (perm[idx2[ok]] == np.arange(n)[ok]).mean()
    assert correct > 0.95


def test_densify_rejects_wrong_h():
    rng = np.random.default_rng(1)
    n = 20
    xy1 = rng.uniform(50, 450, (n, 2)).astype(np.float32)
    A = np.tile(np.eye(2, dtype=np.float32), (n, 1, 1))
    s = np.full(n, 5.0, np.float32)
    m = np.ones(n, bool)
    xy2 = rng.uniform(50, 450, (n, 2)).astype(np.float32)
    H = np.eye(3)
    idx2, err, ok = densify_by_homography(
        jnp.asarray(xy1), jnp.asarray(A), jnp.asarray(s), jnp.asarray(m),
        jnp.asarray(xy2), jnp.asarray(A), jnp.asarray(s), jnp.asarray(m),
        jnp.asarray(H), max_error=0.3)
    assert np.asarray(ok).mean() < 0.3
