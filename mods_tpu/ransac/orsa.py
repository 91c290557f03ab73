"""ORSA — a-contrario fundamental-matrix estimation, hypothesis-parallel.

Reference: `orsa()` (orsa.cpp:371) dispatched by `ORSAFiltering`
(matching/matching.cpp:982-1072).  ORSA (Moisan-Stival) replaces a fixed
inlier threshold with Number-of-False-Alarms minimization: a model with k
inliers at precision d is "meaningful" when

    NFA(k) = (n-7) * C(n,k) * C(k,7) * alpha_k^(k-7)

is small, where alpha_k = 2 * d_k * D / A is the probability that a random
point in an image of area A falls within the k-th residual distance d_k of
an epipolar line (D = image diagonal).  The reference accepts a model iff
log10(NFA) < -2 (matching.cpp:1035-1040).

TPU design: the serial sample loop becomes rounds of B vmapped 7-point
solves (shared with DEGENSAC-F, `_solve_7pt`), each scored by sorting its
residual vector once and scanning all k in one vectorized pass —
log-binomials via lgamma so the valid count n can stay a traced value
under padding.  The reference's late "optimization" phase (resampling
inside the best consensus, orsa.cpp ~:470) maps to extra rounds whose
samples are drawn from the current best inlier set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.config import OrsaParams
from mods_tpu.ransac.fundamental import _solve_7pt
from mods_tpu.ransac.homography import _apply_T, _normalization


def _log10_comb(n, k):
    """log10 C(n, k) with float n (valid-count under padding)."""
    return (jax.lax.lgamma(n + 1.0) - jax.lax.lgamma(k + 1.0)
            - jax.lax.lgamma(jnp.maximum(n - k, 0.0) + 1.0)) / jnp.log(10.0)


def _epiline_dist2(F, xy1, xy2):
    """Squared point-to-epipolar-line distances, both directions:
    (d(x2, F x1)^2, d(x1, F^T x2)^2), each (..., N)."""
    ones = jnp.ones_like(xy1[..., :1])
    x1 = jnp.concatenate([xy1, ones], axis=-1)
    x2 = jnp.concatenate([xy2, ones], axis=-1)
    Fx1 = jnp.einsum("...ij,nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,nj->...ni", F, x2)
    num = jnp.einsum("ni,...ni->...n", x2, Fx1)
    d2 = num * num / jnp.maximum(Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2, 1e-20)
    d1 = num * num / jnp.maximum(
        Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2, 1e-20)
    return d2, d1


def _best_nfa(err2, mask, log_alpha0, nvalid):
    """Vectorized NFA scan of one residual vector.

    err2: (N,) squared max-direction epipolar distances.  Returns
    (log10 NFA at the best k, k*, squared distance threshold d_{k*}^2).
    Mirrors orsa.cpp's best-k search over sorted residuals.
    """
    n = err2.shape[0]
    big = jnp.float32(1e30)
    e = jnp.where(mask, err2, big)
    e_sorted = jnp.sort(e)
    ks = jnp.arange(1, n + 1, dtype=jnp.float32)       # rank of each residual
    nf = nvalid.astype(jnp.float32)
    # alpha_k from the k-th smallest distance (not squared)
    log_alpha = log_alpha0 + 0.5 * jnp.log10(jnp.maximum(e_sorted, 1e-20))
    log_nfa = (jnp.log10(jnp.maximum(nf - 7.0, 1.0))
               + _log10_comb(nf, ks) + _log10_comb(ks, jnp.float32(7.0))
               + (ks - 7.0) * log_alpha)
    valid_k = (ks >= 8.0) & (ks <= nf)
    log_nfa = jnp.where(valid_k, log_nfa, big)
    i = jnp.argmin(log_nfa)
    return log_nfa[i], (i + 1).astype(jnp.int32), e_sorted[i]


def orsa_f(xy1: jax.Array, xy2: jax.Array, mask: jax.Array,
           w: int, h: int, pars: OrsaParams, key: jax.Array):
    """A-contrario F from fixed-capacity correspondences.

    Returns (F, inlier_mask, n_inliers, log10_nfa).  The model is accepted
    iff log10_nfa < pars.max_log_nfa (reference: -2, matching.cpp:1040);
    on rejection the inlier mask is all-false, matching ORSAFiltering's
    empty-list return.
    """
    n = xy1.shape[0]
    B = pars.batch_hypotheses
    # alpha0 = 2 * D / A per unit distance (orsa.cpp precision norm.)
    import math
    diag = math.sqrt(w * w + h * h)
    log_alpha0 = jnp.float32(math.log10(2.0 * diag / (w * h)))

    T1 = _normalization(xy1, mask)
    T2 = _normalization(xy2, mask)
    p1 = _apply_T(T1, xy1)
    p2 = _apply_T(T2, xy2)
    nvalid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    valid_idx = jnp.nonzero(mask, size=n, fill_value=0)[0]

    def denorm(Fn):
        return jnp.einsum("ji,...jk,kl->...il", T2, Fn, T1)

    def score(F):
        d2a, d2b = _epiline_dist2(F, xy1, xy2)
        err2 = jnp.maximum(d2a, d2b)
        nfa, k, th2 = _best_nfa(err2, mask, log_alpha0, nvalid)
        return nfa, k, th2, err2

    def hyp_round(key, pool_idx, pool_n):
        """One round of B 7-point hypotheses sampled from pool_idx."""
        ridx = jax.random.randint(key, (B, 7), 0, pool_n)
        idx = pool_idx[ridx]
        distinct = jnp.all(
            (idx[:, :, None] != idx[:, None, :])
            | jnp.eye(7, dtype=bool)[None], axis=(1, 2))
        Fn, rvalid = _solve_7pt(p1[idx], p2[idx])      # (B, 3, 3, 3)
        F = denorm(Fn).reshape(-1, 3, 3)
        nfa, k, th2, _ = jax.vmap(score)(F)
        ok = (rvalid & distinct[:, None]).reshape(-1)
        nfa = jnp.where(ok, nfa, 1e30)
        i = jnp.argmin(nfa)
        return F[i], nfa[i], th2[i]

    def round_body(carry, key):
        bF, bnfa, bth2, stall = carry

        def do_round(_):
            # sample from the whole set in the first rounds, from the
            # current best consensus afterwards (ORSA's optimization
            # phase)
            d2a, d2b = _epiline_dist2(bF, xy1, xy2)
            err2 = jnp.maximum(d2a, d2b)
            inl = mask & (err2 <= bth2) & (bnfa < 1e29)
            n_inl = jnp.sum(inl.astype(jnp.int32))
            refine = n_inl >= 14
            pool_idx = jnp.where(
                refine, jnp.nonzero(inl, size=n, fill_value=0)[0],
                valid_idx)
            pool_n = jnp.where(refine, jnp.maximum(n_inl, 1), nvalid)
            return hyp_round(key, pool_idx, pool_n)

        def skip(_):
            return bF, bnfa, bth2

        # adaptive termination (the reference's `nsamples` update,
        # orsa.cpp:371+): once log-NFA has not meaningfully improved for
        # stall_rounds consecutive rounds, later rounds are skipped —
        # the scan stays bounded for jit, but converged problems stop
        # paying for hypothesis batches
        run = stall < pars.stall_rounds
        F, nfa, th2 = jax.lax.cond(run, do_round, skip, None)
        improved = nfa < bnfa - pars.min_improvement
        stall = jnp.where(improved, 0, stall + 1)
        better = nfa < bnfa
        return (jnp.where(better, F, bF), jnp.minimum(nfa, bnfa),
                jnp.where(better, th2, bth2), stall), None

    keys = jax.random.split(key, pars.rounds)
    state0 = (jnp.eye(3), jnp.float32(1e30), jnp.float32(0.0),
              jnp.int32(0))
    (bF, bnfa, bth2, _), _ = jax.lax.scan(round_body, state0, keys)

    d2a, d2b = _epiline_dist2(bF, xy1, xy2)
    err2 = jnp.maximum(d2a, d2b)
    accepted = bnfa < pars.max_log_nfa
    inl = mask & (err2 <= bth2) & accepted
    return bF, inl, jnp.sum(inl.astype(jnp.int32)), bnfa
