"""ORSA a-contrario F tests (reference orsa.cpp via matching.cpp:982)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mods_tpu.config import OrsaParams
from mods_tpu.ransac.orsa import orsa_f


def two_view_scene(n_in, n_out, seed=0, w=640, h=480, noise=0.3):
    """Random 3D points seen by two cameras + uniform outliers."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 4], [2, 2, 8], (n_in, 3))
    K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]])
    # camera 2: small rotation + translation
    ang = 0.15
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([1.0, 0.1, 0.2])

    def proj(P, R, t):
        Xc = X @ R.T + t
        uv = Xc @ K.T
        return uv[:, :2] / uv[:, 2:3]

    xy1 = proj(X, np.eye(3), np.zeros(3))
    xy2 = proj(X, R, t) + rng.normal(0, noise, (n_in, 2))
    o1 = rng.uniform([0, 0], [w, h], (n_out, 2))
    o2 = rng.uniform([0, 0], [w, h], (n_out, 2))
    xy1 = np.concatenate([xy1, o1]).astype(np.float32)
    xy2 = np.concatenate([xy2, o2]).astype(np.float32)
    true_inl = np.arange(len(xy1)) < n_in
    return xy1, xy2, true_inl, w, h


def run_orsa(xy1, xy2, w, h, cap=256, seed=0):
    n = len(xy1)
    p1 = np.zeros((cap, 2), np.float32)
    p2 = np.zeros((cap, 2), np.float32)
    m = np.zeros(cap, bool)
    p1[:n], p2[:n], m[:n] = xy1, xy2, True
    pars = OrsaParams()
    fn = jax.jit(lambda a, b, mk, k: orsa_f(a, b, mk, w, h, pars, k))
    return fn(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(m),
              jax.random.PRNGKey(seed)), m


def test_orsa_recovers_inliers():
    xy1, xy2, true_inl, w, h = two_view_scene(80, 40)
    (F, inl, n_inl, nfa), _ = run_orsa(xy1, xy2, w, h)
    inl = np.asarray(inl)[:len(xy1)]
    assert float(nfa) < -2.0          # meaningful model found
    # most true inliers recovered, few outliers admitted
    assert inl[true_inl].mean() > 0.8
    assert inl[~true_inl].mean() < 0.15
    # epipolar constraint holds on recovered inliers
    F = np.asarray(F)
    ones = np.ones((len(xy1), 1), np.float32)
    x1 = np.concatenate([xy1, ones], 1)
    x2 = np.concatenate([xy2, ones], 1)
    res = np.abs(np.einsum("ni,ij,nj->n", x2, F, x1))
    lines = (F @ x1.T).T
    d = res / np.maximum(np.hypot(lines[:, 0], lines[:, 1]), 1e-9)
    assert np.median(d[inl]) < 2.0


def test_orsa_rejects_random():
    """A-contrario property: pure noise -> NFA not meaningful
    (matching.cpp:1035-1040 acceptance rule)."""
    rng = np.random.default_rng(3)
    w = h = 512
    xy1 = rng.uniform(0, w, (60, 2)).astype(np.float32)
    xy2 = rng.uniform(0, w, (60, 2)).astype(np.float32)
    (F, inl, n_inl, nfa), _ = run_orsa(xy1, xy2, w, h, seed=1)
    # either rejected outright or only a tiny spurious consensus
    assert float(nfa) > -2.0 or int(n_inl) < 14
    if float(nfa) > -2.0:
        assert int(n_inl) == 0        # rejection clears the inlier mask


def test_orsa_in_pipeline_program():
    """ver_type=ORSA dispatch through the fused bank-verify program."""
    from mods_tpu.pipeline import EngineConfig, _verify_bank_program
    from mods_tpu.config import replace

    xy1, xy2, true_inl, w, h = two_view_scene(60, 20, seed=5)
    cap = 128
    n = len(xy1)
    z2 = np.zeros((cap, 2), np.float32)
    zA = np.tile(np.eye(2, dtype=np.float32), (cap, 1, 1))
    zs = np.full(cap, 2.0, np.float32)
    p1, p2 = z2.copy(), z2.copy()
    p1[:n], p2[:n] = xy1, xy2
    m = np.zeros(cap, bool)
    m[:n] = True
    cfg = replace(EngineConfig(), ver_type="ORSA")
    part = dict(xy1=jnp.asarray(p1), A1=jnp.asarray(zA),
                s1=jnp.asarray(zs), xy2=jnp.asarray(p2),
                A2=jnp.asarray(zA), s2=jnp.asarray(zs),
                prio=jnp.zeros(cap), mask=jnp.asarray(m))
    vp = _verify_bank_program((cap,), cap, cfg, w, h, False, False)
    out = vp((part,), jax.random.PRNGKey(0))
    assert int(out["n_inl"]) >= 8
