"""Vectorized Baumberg affine-shape adaptation.

The reference's `findAffineShape` (detectors/affinedetectors/affine.cpp:
26-169, SMM method) runs up to 16 iterations per keypoint, each warping a
19x19 patch and accumulating the second-moment matrix.  Here all keypoints
iterate together in a masked fori_loop: one batched bilinear gather per
iteration (K x 19 x 19 samples from the per-octave blur stack), gradient,
masked SMM reduction, closed-form inverse square root.

Keypoints whose iteration diverges (anisotropy > 6, complex eigenvalues,
NaN) or fails to converge within max_iterations are invalidated — the
same acceptance rule as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.config import AffineShapeParams
from mods_tpu.ops.image import gauss_mask, patch_gradient
from mods_tpu.ops.warp import patch_grid


def inv_sqrt_2x2(a, b, c):
    """Closed-form inverse square root of SPD [[a,b],[b,c]], normalized to
    unit determinant; returns (a', b', c', l1, l2) with l1 >= l2 the
    unit-det eigenvalue pair (reference invSqrt, helpers.cpp:463-501)."""
    r = jnp.where(b != 0, (c - a) / (2 * jnp.where(b != 0, b, 1.0)), 1.0)
    t = jnp.where(
        b != 0,
        jnp.where(r >= 0, 1.0 / (r + jnp.sqrt(1 + r * r)),
                  -1.0 / (-r + jnp.sqrt(1 + r * r))),
        0.0)
    cs = jnp.where(b != 0, 1.0 / jnp.sqrt(1 + t * t), 1.0)
    sn = t * cs
    x = 1.0 / jnp.sqrt(cs * cs * a - 2 * cs * sn * b + sn * sn * c)
    z = 1.0 / jnp.sqrt(sn * sn * a + 2 * cs * sn * b + cs * cs * c)
    d = jnp.sqrt(x * z)
    x = x / d
    z = z / d
    l1 = jnp.maximum(x, z)
    l2 = jnp.minimum(x, z)
    na = cs * cs * x + sn * sn * z
    nb = -cs * sn * x + sn * cs * z
    nc = sn * sn * x + cs * cs * z
    return na, nb, nc, l1, l2


def eigenvalues_2x2(a, b, c, d):
    """(l1, l2, real) of a general 2x2 (reference getEigenvalues)."""
    tr = a + d
    # algebraically tr^2 - 4 det, written in the cancellation-free form so
    # equal eigenvalues don't go complex from fp roundoff
    disc = (a - d) * (a - d) + 4.0 * b * c
    real = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return (tr + sq) / 2.0, (tr - sq) / 2.0, real


def _sample_patches_level(blurs: jax.Array, lvl: jax.Array, xy: jax.Array,
                          A: jax.Array, window: int) -> jax.Array:
    """Bilinear-sample (K, W, W) patches from a (L+2, H, W) level stack,
    each keypoint from its own level.  A is the full sampling matrix."""
    from mods_tpu.ops.warp import _bilinear_combine4, gather_4plane_level
    g = patch_grid(window)                                   # (P, P, 2)
    coords = jnp.einsum("kab,ijb->kija", A, g) + xy[:, None, None, :]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    planes = gather_4plane_level(blurs, lvl[:, None, None],
                                 y0.astype(jnp.int32), x0.astype(jnp.int32))
    return _bilinear_combine4(*planes, wx, wy)


def _prepare_smm_windows(blurs: jax.Array, lvl: jax.Array, xy: jax.Array,
                         max_norm: jax.Array, half_w: int):
    """Prefetch the per-keypoint sampling windows ONCE for all Baumberg
    iterations (the reference warps from the level image every iteration,
    affine.cpp:92-116; the window is iteration-invariant because only the
    shape matrix changes, never the center or the level).

    ``max_norm``: conservative per-keypoint bound on ||A|| over all
    iterations (sqrt(aniso_cutoff) * scale ratio).  Keypoints whose
    sampling reach exceeds the window half-extent read from a
    2x-decimated copy of the stack instead (the blur levels are already
    sigma >= 1.6, so decimation loses nothing).  Returns
    (window_source, xy_eff, inv_scale) — sample with A * inv_scale.
    """
    from mods_tpu.ops.sampler import (MAX_HALF_EXTENT, pad_canvas,
                                      prepare_windows)
    stack = pad_canvas(blurs)
    l2, hc, wc = stack.shape
    dec = stack[:, ::2, ::2]
    dec = jnp.pad(dec, ((0, 0), (0, hc - dec.shape[1]),
                        (0, wc - dec.shape[2])), mode="edge")
    big = jnp.concatenate([stack, dec], axis=0)
    use_half = (max_norm * half_w * 1.4143) > (MAX_HALF_EXTENT - 2.0)
    inv_scale = jnp.where(use_half, 0.5, 1.0)
    lvl_eff = lvl + l2 * use_half.astype(jnp.int32)
    xy_eff = xy * inv_scale[:, None]
    # no validity masking: out-of-image samples clamp to the replicated
    # edge, matching the clipped-gather semantics of the direct path
    vhw = jnp.broadcast_to(jnp.asarray([[hc, wc]], jnp.int32), (2 * l2, 2))
    # 96-row small windows cover the +-42 extent bound; every SMM
    # iteration then resamples at 2.8x fewer MACs than the legacy
    # (136, 256) windows (both the einsum and the Pallas kernel)
    return (prepare_windows(big, lvl_eff, xy_eff, vhw, rows=96),
            xy_eff, inv_scale)


def baumberg_adapt(blurs: jax.Array, lvl: jax.Array, xy_oct: jax.Array,
                   s_oct: jax.Array, valid: jax.Array,
                   p: AffineShapeParams):
    """Estimate unit-det affine shapes for a batch of keypoints.

    blurs: (L+2, H, W) octave blur stack; ``lvl`` indexes the level the
    reference samples (the level *below* detection, pyramid.cpp:521 — the
    callback receives prevBlur).  xy_oct: (K, 2) octave-local coords;
    s_oct: (K,) octave-local scale.  Returns (A (K,2,2), ok (K,)).
    """
    K = lvl.shape[0]
    W = p.smm_window_size
    mask = jnp.asarray(gauss_mask(W))            # (W, W)
    npix = float(W * W)
    ratio = s_oct / p.initial_sigma              # affine.cpp:33
    if p.do_baumberg:
        from mods_tpu.ops.sampler import sample_from_windows
        ws, xy_eff, inv_scale = _prepare_smm_windows(
            blurs, lvl, xy_oct, jnp.sqrt(6.0) * ratio, W // 2)

    def body(it, state):
        u, act, bef, done, conv = state
        A = (u * ratio[:, None, None]) * inv_scale[:, None, None]
        patch = sample_from_windows(ws, xy_eff, A, W, chunk=512)
        fx, fy = patch_gradient(patch)
        a = jnp.sum(fx * fx * mask, axis=(1, 2)) / npix
        b = jnp.sum(fx * fy * mask, axis=(1, 2)) / npix
        c = jnp.sum(fy * fy * mask, axis=(1, 2)) / npix
        na, nb, nc, l1s, l2s = inv_sqrt_2x2(a, b, c)
        nan_bad = ~(jnp.isfinite(na) & jnp.isfinite(nb) & jnp.isfinite(nc))
        new_bef = act
        new_act = 1.0 - l2s / l1s
        # u <- S @ u
        nu = jnp.stack([
            jnp.stack([na * u[:, 0, 0] + nb * u[:, 1, 0],
                       na * u[:, 0, 1] + nb * u[:, 1, 1]], -1),
            jnp.stack([nb * u[:, 0, 0] + nc * u[:, 1, 0],
                       nb * u[:, 0, 1] + nc * u[:, 1, 1]], -1)], -2)
        e1, e2, real = eigenvalues_2x2(
            nu[:, 0, 0], nu[:, 0, 1], nu[:, 1, 0], nu[:, 1, 1])
        aniso_bad = (e1 / e2 > 6.0) | (e2 / e1 > 6.0)
        fail = nan_bad | ~real | aniso_bad
        step_ok = ~done & ~fail
        u = jnp.where(step_ok[:, None, None], nu, u)
        act = jnp.where(step_ok, new_act, act)
        bef = jnp.where(step_ok, new_bef, bef)
        converged_now = step_ok & (new_act < p.convergence_threshold) \
            & (new_bef < p.convergence_threshold)
        conv = conv | converged_now
        done = done | fail | converged_now
        return (u, act, bef, done, conv)

    u0 = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (K, 2, 2))
    zeros = jnp.zeros((K,), jnp.float32)
    if not p.do_baumberg:
        return u0, valid

    # early-exit while_loop: stop as soon as every keypoint converged or
    # failed (the reference breaks per keypoint; batched we stop when the
    # whole batch is done — usually well before max_iterations)
    def cond(state):
        it = state[0]
        done = state[1][3]
        return (it < p.max_iterations) & jnp.any(~done)

    def wbody(state):
        it, inner = state
        return (it + 1, body(it, inner))

    state0 = (jnp.int32(0), (u0, zeros, zeros, ~valid,
                             jnp.zeros((K,), bool)))
    _, (u, _, _, _, conv) = jax.lax.while_loop(cond, wbody, state0)
    return u, valid & conv
