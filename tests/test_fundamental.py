"""Fundamental-matrix RANSAC tests with synthetic two-view geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.config import RansacParams
from mods_tpu.ransac.errors import f_error_sampson, f_error_symepi
from mods_tpu.ransac.fundamental import (_cubic_roots, _solve_7pt,
                                         ransac_f)


def synth_two_view(rng, n, noise=0.0):
    """Random 3D points seen by two cameras; returns xy1, xy2, F."""
    X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 4.0])
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    R = np.eye(3)
    t1 = np.zeros(3)
    # second camera: small rotation + translation
    ang = 0.15
    R2 = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]])
    t2 = np.array([0.5, 0.05, 0.0])

    def project(Rm, t, X):
        Xc = X @ Rm.T + t
        x = Xc @ K.T
        return x[:, :2] / x[:, 2:]

    xy1 = project(R, t1, X)
    xy2 = project(R2, t2, X)
    if noise:
        xy1 += rng.normal(size=xy1.shape) * noise
        xy2 += rng.normal(size=xy2.shape) * noise
    # F = K^-T [t]x R K^-1 with relative pose (R2, t2)
    tx = np.array([[0, -t2[2], t2[1]], [t2[2], 0, -t2[0]],
                   [-t2[1], t2[0], 0]])
    E = tx @ R2
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    F = F / np.linalg.norm(F)
    return xy1.astype(np.float32), xy2.astype(np.float32), F


def test_cubic_roots():
    # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6
    r, v = _cubic_roots(jnp.asarray([1.0]), jnp.asarray([-6.0]),
                        jnp.asarray([11.0]), jnp.asarray([-6.0]))
    r = np.sort(np.asarray(r)[0])
    np.testing.assert_allclose(r, [1, 2, 3], atol=1e-3)
    # single real root: x^3 + x + 1
    r, v = _cubic_roots(jnp.asarray([1.0]), jnp.asarray([0.0]),
                        jnp.asarray([1.0]), jnp.asarray([1.0]))
    real = np.asarray(r)[0][np.asarray(v)[0]]
    np.testing.assert_allclose(real**3 + real + 1, 0, atol=1e-3)


def test_7pt_exact(rng):
    # the solver is used on Hartley-normalized coords (as in ransac_f)
    xy1, xy2, F = synth_two_view(rng, 7)
    c1, c2 = xy1.mean(0), xy2.mean(0)
    s1 = np.sqrt(2) / np.linalg.norm(xy1 - c1, axis=1).mean()
    s2 = np.sqrt(2) / np.linalg.norm(xy2 - c2, axis=1).mean()
    p1 = (xy1 - c1) * s1
    p2 = (xy2 - c2) * s2
    T1 = np.array([[s1, 0, -s1 * c1[0]], [0, s1, -s1 * c1[1]], [0, 0, 1]])
    T2 = np.array([[s2, 0, -s2 * c2[0]], [0, s2, -s2 * c2[1]], [0, 0, 1]])
    Fs, valid = _solve_7pt(jnp.asarray(p1)[None], jnp.asarray(p2)[None])
    Fs = np.asarray(Fs)[0]
    valid = np.asarray(valid)[0]
    errs = []
    for i in range(3):
        if not valid[i]:
            continue
        Fd = (T2.T @ Fs[i] @ T1).astype(np.float32)
        e = np.asarray(f_error_sampson(jnp.asarray(Fd),
                                       jnp.asarray(xy1),
                                       jnp.asarray(xy2)))
        errs.append(e.max())
    assert min(errs) < 1e-2, errs


def test_f_error_zero_on_exact(rng):
    xy1, xy2, F = synth_two_view(rng, 40)
    e = np.asarray(f_error_sampson(jnp.asarray(F.astype(np.float32)),
                                   jnp.asarray(xy1), jnp.asarray(xy2)))
    assert e.max() < 1e-2
    e2 = np.asarray(f_error_symepi(jnp.asarray(F.astype(np.float32)),
                                   jnp.asarray(xy1), jnp.asarray(xy2)))
    assert e2.max() < 1e-2


def test_ransac_f_recovers(rng):
    cap = 256
    n_in, n_out = 80, 60
    xy1, xy2, F = synth_two_view(rng, cap, noise=0.3)
    xy2[n_in:n_in + n_out] = rng.uniform(
        0, 600, (n_out, 2)).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n_in + n_out] = True
    pars = RansacParams(use_f=True, err_threshold=2.0,
                        batch_hypotheses=512, max_rounds=4)
    Fe, inl, cnt, degen = ransac_f(
        jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(mask), pars,
        jax.random.PRNGKey(0))
    inl = np.asarray(inl)
    assert inl[:n_in].sum() >= 0.85 * n_in, inl[:n_in].sum()
    assert inl[n_in:n_in + n_out].sum() <= 6


def test_ransac_f_random_rejects(rng):
    cap = 128
    xy1 = rng.uniform(0, 600, (cap, 2)).astype(np.float32)
    xy2 = rng.uniform(0, 600, (cap, 2)).astype(np.float32)
    pars = RansacParams(use_f=True, err_threshold=1.0,
                        batch_hypotheses=256, max_rounds=2)
    Fe, inl, cnt, degen = ransac_f(
        jnp.asarray(xy1), jnp.asarray(xy2),
        jnp.ones(cap, dtype=bool), pars, jax.random.PRNGKey(1))
    # F has 7 dof; random data can fit ~20-30 of 128 by chance but not most
    assert int(cnt) < cap // 2
