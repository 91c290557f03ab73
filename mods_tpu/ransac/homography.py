"""Hypothesis-parallel LO-RANSAC for homographies.

Reference: `exp_ransacHcustom` (degensac/exp_ranH.c:223-380) + local
optimization `exp_inHranicustom`/`exp_iterHcustom` (exp_ranH.c:40-180).
The serial hypothesize-and-verify loop becomes batches of thousands of
vmapped 4-point DLT fits scored at once; LO becomes a batch of inner
resamples each refined by threshold-annealed iterated least squares
(ILSQ_ITERS=4, rtools.h) over the full inlier set.  The adaptive
termination formula (nsamples, exp_ranH.c:366) drives a device-side
while_loop over hypothesis rounds.

Semantics preserved: MSAC-free inlier-count scoring with the same
err_threshold meaning (squared px), symmetric/sampson error selection,
minimum sample distinctness, final least-squares model refit on inliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.config import RansacParams, RansacErrorType
from mods_tpu.ransac import errors as E


def _normalization(xy: jax.Array, mask: jax.Array) -> jax.Array:
    """Hartley normalization T (3x3): zero-centroid, mean distance
    sqrt(2) (reference normu, degensac/utools.c)."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.sqrt(jnp.sum((xy - mean) ** 2, axis=-1))
    scale = jnp.sum(d * w) / n
    s = jnp.sqrt(2.0) / jnp.maximum(scale, 1e-8)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return T


def _apply_T(T: jax.Array, xy: jax.Array) -> jax.Array:
    return xy * T[0, 0] + T[:2, 2][None, :]


def _dlt_rows(p: jax.Array, q: jax.Array):
    """Two DLT rows per correspondence p->q.  p, q: (..., 2).
    Returns (..., 2, 9)."""
    x, y = p[..., 0], p[..., 1]
    u, v = q[..., 0], q[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], -1)
    return jnp.stack([r1, r2], -2)


def _h_from_rows(rows: jax.Array) -> jax.Array:
    """Least-squares h from (..., R, 9) DLT rows: eigenvector of the 9x9
    normal matrix with smallest eigenvalue (the reference uses LAPACK SVD
    in u2h, degensac/utools.c; same nullspace)."""
    ata = jnp.einsum("...ri,...rj->...ij", rows, rows)
    wvals, vecs = jnp.linalg.eigh(ata)
    h = vecs[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def _fit_h(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Minimal/LSQ fit in normalized coords; p1, p2: (..., S, 2)."""
    rows = _dlt_rows(p1, p2).reshape(p1.shape[:-2] + (-1, 9))
    return _h_from_rows(rows)


def _weighted_fit_h(p1, p2, w):
    """w: (..., N) weights (0 for outliers)."""
    rows = _dlt_rows(p1, p2)  # (..., N, 2, 9)
    rows = rows * w[..., None, None]
    rows = rows.reshape(rows.shape[:-3] + (-1, 9))
    return _h_from_rows(rows)


def _error_fn(pars: RansacParams):
    if pars.error_type == RansacErrorType.SYMM_MAX:
        return lambda H, a, b: E.h_error_symm(H, a, b, mode="max")
    if pars.error_type == RansacErrorType.SAMPSON:
        # the reference's HDs — measurably looser than symmetric-sum at
        # the same threshold (symm/sampson ~ 4x on pixel noise), and the
        # CVIU config selects it; using symm here cost ~half the
        # reference's accepted matches on the cat pair
        return E.h_error_sampson
    return lambda H, a, b: E.h_error_symm(H, a, b, mode="sum")


def ransac_h(xy1: jax.Array, xy2: jax.Array, mask: jax.Array,
             pars: RansacParams, key: jax.Array):
    """Robust H (image1 -> image2) from fixed-capacity correspondences.

    Returns (H (3,3), inliers (N,) bool, n_inl).  With fewer than
    MIN_POINTS=8 valid tentatives the result is all-outliers
    (matching.cpp:850,973-978 behaviour is applied by the caller via
    the returned count).
    """
    n = xy1.shape[0]
    err_fn = _error_fn(pars)
    th = pars.err_threshold ** 2
    B = pars.batch_hypotheses

    T1 = _normalization(xy1, mask)
    T2 = _normalization(xy2, mask)
    p1 = _apply_T(T1, xy1)
    p2 = _apply_T(T2, xy2)

    # sampling over valid indices only
    nvalid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    valid_idx = jnp.nonzero(mask, size=n, fill_value=0)[0]

    # hypotheses are FIT in normalized coords but SCORED in raw pixels so
    # err_threshold keeps its exact meaning
    p1u, p2u = xy1, xy2
    th_n = th

    def hyp_round(key):
        k1, = jax.random.split(key, 1)
        ridx = jax.random.randint(k1, (B, 4), 0, nvalid)
        idx = valid_idx[ridx]                      # (B, 4)
        q1 = p1[idx]
        q2 = p2[idx]                               # (B, 4, 2)
        # distinctness: a sample with a repeated point is degenerate; mark
        distinct = jnp.all(
            (idx[:, :, None] != idx[:, None, :])
            | jnp.eye(4, dtype=bool)[None], axis=(1, 2))
        Hn = _fit_h(q1, q2)                        # (B, 3, 3)
        H = jnp.einsum("ij,bjk,kl->bil", E.inv_3x3(T2), Hn, T1)
        H = H / jnp.where(
            jnp.abs(H[:, 2:3, 2:3]) > 1e-12, H[:, 2:3, 2:3], 1.0)
        e = err_fn(H, p1u, p2u)                    # (B, N)
        cnt = jnp.sum((e < th_n) & mask[None, :], axis=-1)
        cnt = jnp.where(distinct, cnt, -1)
        best = jnp.argmax(cnt)
        return H[best], cnt[best]

    def lo_refine(H, key):
        """Local optimization: inner resamples of the inlier set + ILSQ
        annealing, batched (exp_ranH.c:40-180 semantics)."""
        e = err_fn(H, p1u, p2u)
        inl0 = (e < th_n) & mask
        w0 = inl0.astype(jnp.float32)
        R = pars.lo_inner_samples

        keys = jax.random.split(key, R)
        n_inl = jnp.maximum(jnp.sum(inl0.astype(jnp.int32)), 1)
        iidx = jnp.nonzero(inl0, size=n, fill_value=0)[0]

        def one_inner(k):
            # sample lo_sample_size inliers (with replacement — close
            # enough to rsample for sets much larger than the sample)
            ridx = iidx[jax.random.randint(
                k, (pars.lo_sample_size,), 0, n_inl)]
            Hs = _fit_h(p1[ridx][None], p2[ridx][None])[0]
            Hs = jnp.einsum("ij,jk,kl->il", E.inv_3x3(T2), Hs, T1)
            # ILSQ: anneal threshold from 4x down to 1x over lo_iters
            def anneal(i, Hc):
                m = 4.0 * (0.5 ** i.astype(jnp.float32))
                mth = jnp.maximum(m, 1.0) * th_n
                ei = err_fn(Hc, p1u, p2u)
                w = ((ei < mth) & mask).astype(jnp.float32)
                Hn2 = _weighted_fit_h(p1, p2, w)
                Hn2 = jnp.einsum("ij,jk,kl->il", E.inv_3x3(T2), Hn2, T1)
                ok = jnp.all(jnp.isfinite(Hn2))
                return jnp.where(ok, Hn2, Hc)
            Hs = jax.lax.fori_loop(0, pars.lo_iters, anneal, Hs)
            es = err_fn(Hs, p1u, p2u)
            cs = jnp.sum((es < th_n) & mask)
            return Hs, cs

        Hcands, counts = jax.lax.map(one_inner, keys)
        e0 = err_fn(H, p1u, p2u)
        c0 = jnp.sum((e0 < th_n) & mask)
        Hall = jnp.concatenate([Hcands, H[None]], axis=0)
        call = jnp.concatenate([counts, c0[None]], axis=0)
        b = jnp.argmax(call)
        return Hall[b], call[b]

    # adaptive round loop
    conf = pars.confidence
    max_rounds = pars.max_rounds

    def cond(state):
        rounds, done_samples, bestH, bestc, key = state
        nf = jnp.maximum(nvalid.astype(jnp.float32), 4.0)
        ratio = jnp.clip(bestc.astype(jnp.float32) / nf, 1e-6, 1 - 1e-6)
        needed = jnp.log1p(-conf) / jnp.log1p(-(ratio ** 4))
        needed = jnp.minimum(needed, float(pars.max_samples))
        return (rounds < max_rounds) & (
            done_samples.astype(jnp.float32) < needed)

    def round_body(state):
        rounds, done_samples, bestH, bestc, key = state
        key, k1 = jax.random.split(key)
        H, c = hyp_round(k1)
        better = c > bestc
        bestH = jnp.where(better, H, bestH)
        bestc = jnp.maximum(bestc, c)
        return (rounds + 1, done_samples + B, bestH, bestc, key)

    state0 = (jnp.int32(0), jnp.int32(0), jnp.eye(3), jnp.int32(-1), key)
    _, _, bestH, bestc, key = jax.lax.while_loop(cond, round_body, state0)

    if pars.local_optimization:
        key, k2 = jax.random.split(key)
        bestH, bestc = lo_refine(bestH, k2)

    e = err_fn(bestH, p1u, p2u)
    inl = (e < th_n) & mask
    return bestH, inl, jnp.sum(inl.astype(jnp.int32))
