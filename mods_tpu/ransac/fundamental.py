"""Hypothesis-parallel DEGENSAC-F: batched 7-point fundamental matrices
with oriented constraints and H-degeneracy recovery.

Reference: `exp_ransacFcustom` (degensac/exp_ranF.c:795-1130).  The serial
loop becomes: per round, B vmapped 7-point solves (9x9 normal-matrix
eigendecomposition for the 2-D nullspace + closed-form cubic roots, up to
3 F's each — `rroots3`/`slcm` Ftools semantics), oriented epipolar
constraint over the sample (all_ori_valid, Ftools.c:429), batched
residual scoring.  DEGENSAC's plane degeneracy (checksample/innerH/rFtH,
exp_ranF.c:952-1006, DegUtils.h) is applied to the best model: if >=5 of
its 7 sample points fit one homography, an H is fit on the consensus and
F is re-derived by plane-and-parallax from off-plane correspondences.
Local optimization mirrors exp_inFranicustom: inner resamples + annealed
iterated least squares over the inlier set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.config import RansacParams, RansacErrorType
from mods_tpu.ransac import errors as E
from mods_tpu.ransac.homography import (_apply_T, _dlt_rows, _fit_h,
                                        _normalization, _weighted_fit_h)


def _f_rows(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Epipolar constraint rows: x2^T F x1 = 0 -> row (..., 9) in F's
    row-major layout (lin_fm, degensac/Ftools.c)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    return jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                      x1, y1, o], axis=-1)


def _nullspace2(rows: jax.Array):
    """Two smallest right-singular vectors of (..., 7, 9) via eigh of the
    normal matrix — the 2-D nullspace basis (reference uses LU nullspace,
    utools.h:26)."""
    ata = jnp.einsum("...ri,...rj->...ij", rows, rows)
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[..., :, 0], vecs[..., :, 1]


def _cubic_roots(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d, (..., 3) with validity mask
    (trigonometric method; reference rroots3, Ftools.h:67)."""
    a = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    p = b / a
    q = c / a
    r = d / a
    # depressed cubic t^3 + pt2 t + qt2, x = t - p/3
    pt = q - p * p / 3.0
    qt = 2.0 * p ** 3 / 27.0 - p * q / 3.0 + r
    disc = (qt / 2.0) ** 2 + (pt / 3.0) ** 3

    # three-real-root branch (disc <= 0)
    m = jnp.sqrt(jnp.maximum(-pt / 3.0, 1e-20))
    arg = jnp.clip(3.0 * qt / (2.0 * pt * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    k = jnp.arange(3.0)
    t3 = 2.0 * m[..., None] * jnp.cos(
        theta[..., None] - 2.0 * jnp.pi * k / 3.0)

    # one-real-root branch (disc > 0), Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-qt / 2.0 + sq)
    v = jnp.cbrt(-qt / 2.0 - sq)
    t1 = u + v
    roots = jnp.where((disc <= 0)[..., None], t3,
                      jnp.stack([t1, t1, t1], -1))
    valid = jnp.where((disc <= 0)[..., None],
                      jnp.ones_like(roots, bool),
                      jnp.arange(3) == 0)
    return roots - p[..., None] / 3.0, valid


def _det_coeffs(F1, F2):
    """det(F1 + x F2) = a x^3 + b x^2 + c x + d for (..., 3, 3)."""
    def det3(M):
        return jnp.linalg.det(M)
    d = det3(F1)
    a = det3(F2)
    # b, c via polarization: det(F1 + xF2) at x=1,-1:
    # f(1) = a+b+c+d ; f(-1) = -a+b-c+d
    f1 = det3(F1 + F2)
    fm1 = det3(F1 - F2)
    b = (f1 + fm1) / 2.0 - d
    c = (f1 - fm1) / 2.0 - a
    return a, b, c, d


def _solve_7pt(p1: jax.Array, p2: jax.Array):
    """(..., 7, 2) x2 -> up to 3 F's: (..., 3, 3, 3), valid (..., 3)."""
    rows = _f_rows(p1, p2)
    n1, n2 = _nullspace2(rows)
    F1 = n1.reshape(n1.shape[:-1] + (3, 3))
    F2 = n2.reshape(n2.shape[:-1] + (3, 3))
    # det(F1 + x F2) = 0
    a, b, c, d = _det_coeffs(F1, F2)
    roots, rvalid = _cubic_roots(a, b, c, d)
    F = F1[..., None, :, :] + roots[..., :, None, None] * F2[..., None, :, :]
    norm = jnp.sqrt(jnp.sum(F * F, axis=(-1, -2), keepdims=True))
    F = F / jnp.maximum(norm, 1e-12)
    return F, rvalid


def _epipole2(F):
    """Left epipole e2 (e2^T F = 0): cross product of two rows of F^T =
    columns of F; falls back to the other pair when near-parallel
    (reference epipole, Ftools.c)."""
    c0 = F[..., :, 0]
    c1 = F[..., :, 1]
    c2 = F[..., :, 2]
    e = jnp.cross(c0, c2)
    alt = jnp.cross(c1, c2)
    use_alt = jnp.sum(e * e, axis=-1, keepdims=True) < 1e-18
    return jnp.where(use_alt, alt, e)


def _oriented_ok(F, p1s, p2s):
    """Oriented epipolar constraint over the sample points
    (all_ori_valid, Ftools.c:429-443): sign of
    (F x1)_x-component * (e2 x x2)_x must agree for all sample points."""
    o = jnp.ones_like(p1s[..., :1])
    x1 = jnp.concatenate([p1s, o], axis=-1)     # (..., S, 3)
    x2 = jnp.concatenate([p2s, o], axis=-1)
    e2 = _epipole2(F)                            # (..., 3)
    Fx1 = jnp.einsum("...ij,...sj->...si", F, x1)
    # s = <l2, component> consistency: use lambda = cross(e2, x2) ~ l2
    l2 = jnp.cross(e2[..., None, :], x2)
    sig = jnp.sum(Fx1 * l2, axis=-1)             # (..., S)
    pos = jnp.all(sig > 0, axis=-1)
    neg = jnp.all(sig < 0, axis=-1)
    return pos | neg


def _f_error_fn(pars: RansacParams):
    if pars.error_type == RansacErrorType.SAMPSON:
        return E.f_error_sampson
    return E.f_error_symepi


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)


def ransac_f(xy1: jax.Array, xy2: jax.Array, mask: jax.Array,
             pars: RansacParams, key: jax.Array):
    """Robust F (x2^T F x1 = 0) from fixed-capacity correspondences.
    Returns (F, inliers, n_inl, H_degen_count)."""
    n = xy1.shape[0]
    err_fn = _f_error_fn(pars)
    th = pars.err_threshold ** 2
    B = pars.batch_hypotheses

    T1 = _normalization(xy1, mask)
    T2 = _normalization(xy2, mask)
    p1 = _apply_T(T1, xy1)
    p2 = _apply_T(T2, xy2)

    nvalid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    valid_idx = jnp.nonzero(mask, size=n, fill_value=0)[0]

    def denorm(Fn):
        # x2n^T Fn x1n = 0 with xin = Ti xi  ->  F = T2^T Fn T1
        return jnp.einsum("ji,...jk,kl->...il", T2, Fn, T1)

    def hyp_round(key):
        ridx = jax.random.randint(key, (B, 7), 0, nvalid)
        idx = valid_idx[ridx]
        q1 = p1[idx]
        q2 = p2[idx]
        distinct = jnp.all(
            (idx[:, :, None] != idx[:, None, :])
            | jnp.eye(7, dtype=bool)[None], axis=(1, 2))
        Fn, rvalid = _solve_7pt(q1, q2)            # (B, 3, 3, 3)
        F = denorm(Fn)
        u1s = xy1[idx]
        u2s = xy2[idx]
        ori = _oriented_ok(F, u1s[:, None], u2s[:, None])  # (B, 3)
        e = err_fn(F.reshape(-1, 3, 3), xy1, xy2).reshape(B, 3, n)
        cnt = jnp.sum((e < th) & mask[None, None, :], axis=-1)
        ok = rvalid & ori & distinct[:, None]
        if pars.do_symm_check:
            # symmetric-distance cross-check (exp_ranF.c:926-938): a
            # candidate is bad when its symmetric-epipolar inliers at
            # CHECK_COEF*th don't reach SYMM_COEF of its Sampson count
            es = E.f_error_symepi(
                F.reshape(-1, 3, 3), xy1, xy2).reshape(B, 3, n)
            scnt = jnp.sum((es < 4.0 * th) & mask[None, None, :],
                           axis=-1)
            ok = ok & (scnt.astype(jnp.float32)
                       > jnp.floor(0.6 * cnt.astype(jnp.float32)))
        cnt = jnp.where(ok, cnt, -1)
        flat = jnp.argmax(cnt)
        bi, ri = flat // 3, flat % 3
        return F[bi, ri], cnt[bi, ri], idx[bi]

    def fit_f_weighted(w):
        """LSQ F from weighted rows + rank-2 projection via normalized
        8-point on the weight set (u2f semantics)."""
        rows = _f_rows(p1, p2) * w[:, None]
        ata = rows.T @ rows
        _, vecs = jnp.linalg.eigh(ata)
        Fn = vecs[:, 0].reshape(3, 3)
        # rank-2: project by zeroing smallest singular value
        U, S, Vt = jnp.linalg.svd(Fn)
        Fn = (U * S.at[2].set(0.0)[None, :]) @ Vt
        return denorm(Fn)

    def lo_refine(F, key):
        e = err_fn(F, xy1, xy2)
        inl0 = (e < th) & mask
        n_inl = jnp.maximum(jnp.sum(inl0.astype(jnp.int32)), 1)
        iidx = jnp.nonzero(inl0, size=n, fill_value=0)[0]
        keys = jax.random.split(key, pars.lo_inner_samples)

        def one_inner(k):
            ridx = iidx[jax.random.randint(
                k, (max(pars.lo_sample_size, 9),), 0, n_inl)]
            w = jnp.zeros((n,)).at[ridx].set(1.0)
            Fs = fit_f_weighted(w)

            def anneal(i, Fc):
                m = jnp.maximum(4.0 * (0.5 ** i.astype(jnp.float32)), 1.0)
                ei = err_fn(Fc, xy1, xy2)
                wi = ((ei < m * th) & mask).astype(jnp.float32)
                Fn2 = fit_f_weighted(wi)
                ok = jnp.all(jnp.isfinite(Fn2))
                return jnp.where(ok, Fn2, Fc)

            Fs = jax.lax.fori_loop(0, pars.lo_iters, anneal, Fs)
            cs = jnp.sum((err_fn(Fs, xy1, xy2) < th) & mask)
            return Fs, cs

        Fc, cc = jax.lax.map(one_inner, keys)
        c0 = jnp.sum((err_fn(F, xy1, xy2) < th) & mask)
        Fall = jnp.concatenate([Fc, F[None]], 0)
        call = jnp.concatenate([cc, c0[None]], 0)
        b = jnp.argmax(call)
        return Fall[b], call[b]

    def degensac_check(F, sample_idx, key):
        """checksample + innerH + rFtH (exp_ranF.c:952-1006): if >=5 of
        the 7 sample points lie on one H, re-derive F by
        plane-and-parallax from the H-consensus."""
        s1 = xy1[sample_idx]                      # (7, 2)
        s2 = xy2[sample_idx]
        # fit H on every triple-of-sample + count sample consensus; use
        # all C(7,3)=35 triples' worth? The reference tests specific
        # 5-subsets; we fit H on all 7x choose-4 subsets cheaply by
        # RANSAC-style: try the 35 distinct 4-subsets.
        import itertools
        quads = jnp.asarray(
            list(itertools.combinations(range(7), 4)), jnp.int32)
        q1 = s1[quads]                            # (35, 4, 2)
        q2 = s2[quads]
        Hn = _fit_h(q1, q2)                       # in RAW coords
        e = E.h_error_symm(Hn, s1, s2)            # (35, 7)
        cons = jnp.sum(e < 9.0 * th, axis=-1)
        best = jnp.argmax(cons)
        degenerate = cons[best] >= 5
        Hd = Hn[best]

        # H-consensus over all points, then plane-and-parallax F
        eh = E.h_error_symm(Hd, xy1, xy2)
        hin = (eh < 16.0 * th) & mask
        o = jnp.ones((n, 1))
        x1h = jnp.concatenate([xy1, o], -1)
        x2h = jnp.concatenate([xy2, o], -1)
        Hx1 = (Hd @ x1h.T).T
        lines = jnp.cross(Hx1, x2h)               # epipolar pencil lines
        woff = (~hin & mask).astype(jnp.float32)

        def pp_f(k):
            # epipole = intersection of two off-plane lines
            noff = jnp.maximum(jnp.sum(woff).astype(jnp.int32), 1)
            oidx = jnp.nonzero(woff > 0, size=n, fill_value=0)[0]
            pick = oidx[jax.random.randint(k, (2,), 0, noff)]
            ep = jnp.cross(lines[pick[0]], lines[pick[1]])
            Fpp = _skew(ep) @ Hd
            nf = jnp.sqrt(jnp.sum(Fpp * Fpp))
            return Fpp / jnp.maximum(nf, 1e-12)

        keys = jax.random.split(key, 8)
        Fs = jax.vmap(pp_f)(keys)
        es = err_fn(Fs, xy1, xy2)
        cs = jnp.sum((es < th) & mask[None, :], axis=-1)
        bi = jnp.argmax(cs)
        return degenerate, Fs[bi], cs[bi]

    def cond(state):
        rounds, done, bF, bc, bsample, key = state
        nf = jnp.maximum(nvalid.astype(jnp.float32), 7.0)
        ratio = jnp.clip(bc.astype(jnp.float32) / nf, 1e-6, 1 - 1e-6)
        needed = jnp.log1p(-pars.confidence) / jnp.log1p(-(ratio ** 7))
        needed = jnp.minimum(needed, float(pars.max_samples))
        return (rounds < pars.max_rounds) & (
            done.astype(jnp.float32) < needed)

    def round_body(state):
        rounds, done, bF, bc, bsample, key = state
        key, k1 = jax.random.split(key)
        F, c, sample = hyp_round(k1)
        better = c > bc
        bF = jnp.where(better, F, bF)
        bsample = jnp.where(better, sample, bsample)
        bc = jnp.maximum(bc, c)
        return (rounds + 1, done + B, bF, bc, bsample, key)

    state0 = (jnp.int32(0), jnp.int32(0), jnp.eye(3), jnp.int32(-1),
              jnp.zeros((7,), jnp.int32), key)
    _, _, bF, bc, bsample, key = jax.lax.while_loop(
        cond, round_body, state0)

    key, kd, kl = jax.random.split(key, 3)
    degen, Fd, cd = degensac_check(bF, bsample, kd)
    use_d = degen & (cd > bc)
    bF = jnp.where(use_d, Fd, bF)
    bc = jnp.where(use_d, cd, bc)

    if pars.local_optimization:
        bF, bc = lo_refine(bF, kl)

    e = err_fn(bF, xy1, xy2)
    inl = (e < th) & mask
    return bF, inl, jnp.sum(inl.astype(jnp.int32)), degen
