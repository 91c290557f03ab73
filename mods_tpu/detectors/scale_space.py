"""Batched scale-space detector: Hessian / DoG / Harris responses,
3-D non-max suppression, subpixel localization.

TPU-native re-design of the reference scale-space detector
(detectors/affinedetectors/pyramid.cpp).  The per-pixel 3x3 shift-register
loops become stencil arithmetic over whole response volumes; the
candidate scan becomes NMS-mask + static-size index extraction; the
iterative `localizeKeypoint` (pyramid.cpp:308-430) becomes a vectorized
5-step fori_loop over all candidates at once.  The synthetic-view axis is
a leading batch dimension.

Shapes: images are (V, H, W) float32, responses per octave are
(V, L+2, H, W) where L = n_scales.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mods_tpu.config import DetectorType, PyramidParams
from mods_tpu.ops.gaussian import gaussian_blur
from mods_tpu.ops.image import gradient, half_image

MAX_SUBPIXEL_SHIFT = 0.6   # pyramid.cpp:27
POINT_SAFETY_BORDER = 3    # pyramid.cpp:30

# point types (pyramid.cpp getPointType / pyramid.h enum)
HESSIAN_DARK, HESSIAN_BRIGHT, HESSIAN_SADDLE = 0, 1, 2
DOG_DARK, DOG_BRIGHT = 10, 11
HARRIS_DARK, HARRIS_BRIGHT = 30, 31


def hessian_response(img: jax.Array, sigma: float) -> jax.Array:
    """norm^2-scaled det-of-Hessian, 3x3 stencils
    (reference pyramid.cpp:223-280). img: (..., H, W)."""
    z = jnp.zeros_like(img)
    c = img[..., 1:-1, 1:-1]
    lxx = img[..., 1:-1, :-2] - 2 * c + img[..., 1:-1, 2:]
    lyy = img[..., :-2, 1:-1] - 2 * c + img[..., 2:, 1:-1]
    lxy = (img[..., :-2, 2:] - img[..., :-2, :-2]
           + img[..., 2:, :-2] - img[..., 2:, 2:]) / 4.0
    norm2 = (sigma * sigma) ** 2
    return z.at[..., 1:-1, 1:-1].set((lxx * lyy - lxy * lxy) * norm2)


def dog_response(img: jax.Array, sigma: float) -> jax.Array:
    """The reference's per-level DoG: img - blur(img, sigma^2)
    (pyramid.cpp:176-181 — note it blurs by `norm` = sigma squared)."""
    return img - gaussian_blur(img, sigma * sigma)


def iidog_response(img: jax.Array, sigma: float) -> jax.Array:
    """Intensity-independent DoG (iidogResponse, pyramid.cpp:198-220):
    the DoG divided by the local mean intensity, out = DoG * 255/(I+B)
    where I+B < 255 (contrast normalization for dark regions)."""
    blur = gaussian_blur(img, sigma * sigma)
    dog = img - blur
    s = img + blur
    return jnp.where(s < 255.0, dog * (255.0 / jnp.maximum(s, 1e-6)), dog)


@functools.lru_cache(maxsize=4)
def _tilde_ss_filters(path: str):
    from mods_tpu.detectors.tilde import (load_tilde_filters,
                                          procedural_filters)
    return (load_tilde_filters(path)[:2] if path
            else procedural_filters())


def tilde_ss_response(img: jax.Array, sigma: float,
                      filters_path: str = "") -> jax.Array:
    """TILDE filter bank as a scale-space response (TILDEResponse,
    pyramid.cpp:182-197 — `norm` is ignored by the reference too)."""
    from mods_tpu.detectors.tilde import tilde_response
    W, b = _tilde_ss_filters(filters_path)
    if img.ndim == 2:
        return tilde_response(img, W, b)
    lead = img.shape[:-2]
    flat = img.reshape((-1,) + img.shape[-2:])
    out = jax.vmap(lambda im: tilde_response(im, W, b))(flat)
    return out.reshape(lead + out.shape[-2:])


def wld_coef(intensity: jax.Array, a: float, b: float,
             g: float) -> jax.Array:
    """WLD intensity normalization coefficient (intensityNormCoef,
    pyramid.cpp:35-38): a / (I/g + b + eps); responses are scaled by its
    square (pyramid.cpp:492-505)."""
    return a / (intensity / g + b + 1e-10)


def harris_response(img: jax.Array, sigma: float) -> jax.Array:
    """reference pyramid.cpp:283-305 (norm = sigma^2)."""
    norm = sigma * sigma
    sigmasq = 0.6 * norm
    s = math.sqrt(sigmasq)
    lx, ly = gradient(img)
    dx2 = sigmasq * gaussian_blur(lx * lx, s)
    dy2 = sigmasq * gaussian_blur(ly * ly, s)
    dxdy = sigmasq * gaussian_blur(lx * ly, s)
    tr = dx2 + dy2
    return dx2 * dy2 - dxdy * dxdy - 0.04 * tr * tr


_RESPONSE_FNS = {
    DetectorType.HESSIAN: hessian_response,
    DetectorType.DOG: dog_response,
    DetectorType.HARRIS: harris_response,
}


@dataclass
class Octave:
    """Static-shape per-octave data."""
    blurs: jax.Array      # (V, L+2, H, W) images, sigma = init*step^i
    resps: jax.Array      # (V, L+2, H, W) responses
    sigmas: tuple         # L+2 floats, octave-relative
    pixel_distance: float


def num_octaves(h: int, w: int, border: int = 5) -> int:
    n = 0
    min_size = 2 * border + 2
    while h > min_size and w > min_size:
        n += 1
        h //= 2
        w //= 2
    return n


def build_pyramid(imgs: jax.Array, p: PyramidParams,
                  n_octaves: int | None = None) -> list[Octave]:
    """Gaussian pyramid of L+2 blur levels + responses per octave
    (reference detectOctaveKeypoints pyramid.cpp:455-538,
    detectPyramidKeypoints :540-573).  imgs: (V, H, W), assumed to carry
    sigma=0.5 of pre-smoothing (camera blur)."""
    if p.detector_type == "TILDE":
        resp_fn = functools.partial(tilde_ss_response,
                                    filters_path=p.tilde_filters)
    elif p.detector_type == DetectorType.DOG and p.ii_dog:
        resp_fn = iidog_response
    else:
        resp_fn = _RESPONSE_FNS[p.detector_type]
    L = p.n_scales
    step = 2.0 ** (1.0 / L)
    cur_sigma = 0.5
    first = imgs
    if p.initial_sigma > cur_sigma:
        first = gaussian_blur(
            first, math.sqrt(p.initial_sigma ** 2 - cur_sigma ** 2))
    if n_octaves is None:
        n_octaves = num_octaves(imgs.shape[-2], imgs.shape[-1], p.border)

    octaves = []
    pd = 1.0
    for _ in range(n_octaves):
        sigmas = [p.initial_sigma * step ** i for i in range(L + 2)]
        blurs = [first]
        for i in range(1, L + 2):
            inc = sigmas[i - 1] * math.sqrt(step * step - 1.0)
            blurs.append(gaussian_blur(blurs[-1], inc))
        resps = [resp_fn(b, s) for b, s in zip(blurs, sigmas)]
        if p.do_on_wld:
            # WLD intensity normalization (pyramid.cpp:492-505): levels
            # past the octave's first are scaled by coef(I)^2; the
            # reference leaves level 0 unnormalized — mirrored here
            resps = [resps[0]] + [
                rr * wld_coef(bb, p.wld_a, p.wld_b, p.wld_g) ** 2
                for rr, bb in zip(resps[1:], blurs[1:])]
        octaves.append(Octave(
            blurs=jnp.stack(blurs, axis=1),
            resps=jnp.stack(resps, axis=1),
            sigmas=tuple(sigmas), pixel_distance=pd))
        first = half_image(blurs[L])
        pd *= 2.0
    return octaves


def _nms_mask(resps: jax.Array, pos_th: float, neg_th: float) -> jax.Array:
    """3x3x3 strict non-max/min mask for detection levels 1..L
    (reference findLevelKeypoints pyramid.cpp:432-452).

    resps: (V, L+2, H, W) -> bool (V, L, H, W); border cols/rows False
    (caller applies the image border separately)."""
    mx = jax.lax.reduce_window(
        resps, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 3), window_strides=(1, 1, 1, 1),
        padding="SAME")
    mn = jax.lax.reduce_window(
        resps, jnp.inf, jax.lax.min,
        window_dimensions=(1, 3, 3, 3), window_strides=(1, 1, 1, 1),
        padding="SAME")
    c = resps[:, 1:-1]
    # center equals the window max/min (ties accepted, as in the reference
    # where the strict > comparison over neighbours admits equal plateaus)
    is_max = (c > pos_th) & (c >= mx[:, 1:-1])
    is_min = (c < neg_th) & (c <= mn[:, 1:-1])
    return is_max | is_min


def _gather3x3x3(vol: jax.Array, lvl: jax.Array, r: jax.Array,
                 c: jax.Array) -> jax.Array:
    """Gather (K, 3, 3, 3) windows centered at (lvl, r, c) from
    (L+2, H, W).  Indices must be in-range (caller clamps).

    27 flat takes, combined along the LEADING axes: a (K, 3, 3, 3)
    advanced-index gather materializes with a (3, 3) trailing tile that
    pads to (8, 128) on TPU — a 113x memory blowup; flat (K,) takes pad
    only to the lane boundary."""
    L2, H, W = vol.shape
    flat = vol.reshape(-1)
    base = (lvl * H + r) * W + c
    taps = []
    for dl in (-1, 0, 1):
        rows = []
        for dr in (-1, 0, 1):
            cols = [jnp.take(flat, base + (dl * H + dr) * W + dc,
                             mode="clip")
                    for dc in (-1, 0, 1)]
            rows.append(jnp.stack(cols, axis=0))      # (3, K)
        taps.append(jnp.stack(rows, axis=0))           # (3, 3, K)
    return jnp.stack(taps, axis=0).transpose(3, 0, 1, 2)  # (K, 3, 3, 3)


def _dense_local_fields(resps: jax.Array, edge_th: float):
    """Dense per-voxel localization fields over the detection levels.

    The iterative localizeKeypoint stencil (pyramid.cpp:308-430) reads a
    3x3x3 window per candidate per iteration — 27 gathers each.  All of
    its per-voxel quantities are cheap elementwise stencils, so compute
    them ONCE for the whole (L+2, H, W) volume and let each iteration
    gather just FOUR precomputed values (solx, soly, sols, newval) plus
    one first-iteration edge flag — dense VPU work is ~free next to
    per-candidate gathers on TPU.

    Returns (solx, soly, sols, newval, edge_bad) each (L+2, H, W),
    arbitrary values on the boundary shells (candidates never index them
    — NMS levels are 1..L and borders are rejected upstream).
    """
    v = resps
    L2, H, W = v.shape
    z = jnp.zeros_like(v)
    c = v[1:-1, 1:-1, 1:-1]
    lo = v[:-2, 1:-1, 1:-1]
    hi = v[2:, 1:-1, 1:-1]
    dxx = v[1:-1, 1:-1, :-2] - 2 * c + v[1:-1, 1:-1, 2:]
    dyy = v[1:-1, :-2, 1:-1] - 2 * c + v[1:-1, 2:, 1:-1]
    dss = lo - 2 * c + hi
    dxy = 0.25 * (v[1:-1, 2:, 2:] - v[1:-1, 2:, :-2]
                  - v[1:-1, :-2, 2:] + v[1:-1, :-2, :-2])
    dxs = 0.25 * (v[2:, 1:-1, 2:] - v[2:, 1:-1, :-2]
                  - v[:-2, 1:-1, 2:] + v[:-2, 1:-1, :-2])
    dys = 0.25 * (v[2:, 2:, 1:-1] - v[2:, :-2, 1:-1]
                  - v[:-2, 2:, 1:-1] + v[:-2, :-2, 1:-1])
    dx = 0.5 * (v[1:-1, 1:-1, 2:] - v[1:-1, 1:-1, :-2])
    dy = 0.5 * (v[1:-1, 2:, 1:-1] - v[1:-1, :-2, 1:-1])
    ds = 0.5 * (hi - lo)
    # Cramer's rule for -H^-1 g (same arithmetic as solve3x3 below)
    det = (dxx * (dyy * dss - dys * dys)
           - dxy * (dxy * dss - dys * dxs)
           + dxs * (dxy * dys - dyy * dxs))
    b0, b1, b2 = -dx, -dy, -ds
    d0 = (b0 * (dyy * dss - dys * dys)
          - dxy * (b1 * dss - dys * b2)
          + dxs * (b1 * dys - dyy * b2))
    d1 = (dxx * (b1 * dss - b2 * dys)
          - b0 * (dxy * dss - dys * dxs)
          + dxs * (dxy * b2 - b1 * dxs))
    d2 = (dxx * (dyy * b2 - dys * b1)
          - dxy * (dxy * b2 - b1 * dxs)
          + b0 * (dxy * dys - dyy * dxs))
    solx = d0 / det
    soly = d1 / det
    sols = d2 / det
    newval = c + 0.5 * (dx * solx + dy * soly + ds * sols)
    edge_score = (dxx + dyy) * (dxx + dyy) / (dxx * dyy - dxy * dxy)
    edge_bad = (edge_score >= edge_th) | (edge_score < 0)

    def pad(a, fill=0.0):
        return z.at[1:-1, 1:-1, 1:-1].set(a) if a.dtype == v.dtype else \
            jnp.zeros(v.shape, a.dtype).at[1:-1, 1:-1, 1:-1].set(a)

    return (pad(solx), pad(soly), pad(sols), pad(newval), pad(edge_bad))


def localize_keypoints(resps: jax.Array, blurs: jax.Array, lvl: jax.Array,
                       r0: jax.Array, c0: jax.Array, valid: jax.Array,
                       p: PyramidParams, final_threshold: float,
                       detector_type: str):
    """Vectorized subpixel/subscale localization
    (reference localizeKeypoint pyramid.cpp:308-430).

    resps/blurs: (L+2, H, W) for ONE view and octave; lvl/r0/c0: (K,)
    candidate coordinates (level in 1..L).  Returns dict of per-candidate
    arrays incl. updated validity.  Coordinates stay octave-local.
    """
    L2, H, W = resps.shape
    edge_th = ((p.edge_eigen_value_ratio + 1.0) ** 2
               / p.edge_eigen_value_ratio)
    f_solx, f_soly, f_sols, f_newval, f_edge = _dense_local_fields(
        resps, edge_th)
    flat_fields = (f_solx.reshape(-1), f_soly.reshape(-1),
                   f_sols.reshape(-1), f_newval.reshape(-1))
    flat_edge = f_edge.reshape(-1)

    def body(it, state):
        r, c, b, val, alive, edge_ok = state
        base = (lvl * H + r) * W + c
        solx, soly, sols, new_val = (
            jnp.take(f, base, mode="clip") for f in flat_fields)
        sol = jnp.stack([solx, soly, sols], -1)
        if_first = (it == 0)
        edge_bad = jnp.take(flat_edge, base, mode="clip")
        edge_ok = jnp.where(if_first, ~edge_bad, edge_ok)
        nan_bad = jnp.any(~jnp.isfinite(sol), axis=-1)
        # shift by one pixel where off by more than MAX_SUBPIXEL_SHIFT
        stepc = (jnp.where(sol[:, 0] > MAX_SUBPIXEL_SHIFT, 1, 0)
                 + jnp.where(sol[:, 0] < -MAX_SUBPIXEL_SHIFT, -1, 0))
        stepr = (jnp.where(sol[:, 1] > MAX_SUBPIXEL_SHIFT, 1, 0)
                 + jnp.where(sol[:, 1] < -MAX_SUBPIXEL_SHIFT, -1, 0))
        # border guard: the reference bails out instead of moving past the
        # safety border (pyramid.cpp:384-406)
        can_right = c < W - POINT_SAFETY_BORDER
        can_left = c > POINT_SAFETY_BORDER
        can_down = r < H - POINT_SAFETY_BORDER
        can_up = r > POINT_SAFETY_BORDER
        border_bad = ((stepc > 0) & ~can_right) | ((stepc < 0) & ~can_left) \
            | ((stepr > 0) & ~can_down) | ((stepr < 0) & ~can_up)
        moved = (stepc != 0) | (stepr != 0)
        update = alive & ~nan_bad & ~border_bad
        # once converged (not moved), stop updating (reference breaks)
        still = alive & moved & ~nan_bad & ~border_bad
        r = jnp.where(still, r + stepr, r)
        c = jnp.where(still, c + stepc, c)
        b = jnp.where(update[:, None], sol, b)
        val = jnp.where(update, new_val, val)
        alive = alive & ~nan_bad & ~border_bad
        return (r, c, b, val, alive, edge_ok)

    K = lvl.shape[0]
    b0 = jnp.zeros((K, 3), jnp.float32)
    val0 = jnp.zeros((K,), jnp.float32)
    state = (r0, c0, b0, val0, valid, jnp.ones((K,), bool))
    r, c, b, val, alive, edge_ok = jax.lax.fori_loop(0, 5, body, state)

    ok = (alive & edge_ok
          & (jnp.abs(b[:, 0]) <= 1.5) & (jnp.abs(b[:, 1]) <= 1.5)
          & (jnp.abs(b[:, 2]) <= 1.5) & (jnp.abs(val) >= final_threshold))

    # point type from the blur image at the final location
    # (getPointType, pyramid.cpp:66-130)
    rr = jnp.clip(r, 1, H - 2)
    cc = jnp.clip(c, 1, W - 2)
    lxx = (blurs[lvl, rr, cc - 1] - 2 * blurs[lvl, rr, cc]
           + blurs[lvl, rr, cc + 1])
    if detector_type == DetectorType.HESSIAN:
        sub_type = jnp.where(
            val < 0, HESSIAN_SADDLE,
            jnp.where(lxx < 0, HESSIAN_DARK, HESSIAN_BRIGHT))
    elif detector_type == DetectorType.DOG:
        sub_type = jnp.where(val < 0, DOG_BRIGHT, DOG_DARK)
    else:
        sub_type = jnp.where(val < 0, HARRIS_BRIGHT, HARRIS_DARK)

    # octaveMap dedup: first candidate (scan order) claiming a final (r, c)
    # wins (pyramid.cpp:416-421).  Stable sort by flat position id keeps
    # candidate order among equals.
    flat = jnp.where(ok, r * W + c, jnp.int32(H * W) + jnp.arange(K))
    order = jnp.argsort(flat, stable=True)
    sorted_flat = flat[order]
    first_of_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_flat[1:] != sorted_flat[:-1]])
    keep_sorted = jnp.zeros((K,), bool).at[order].set(first_of_run)
    ok = ok & keep_sorted

    return dict(r=r, c=c, b=b, val=val, ok=ok, sub_type=sub_type)


def candidate_indices(nms: jax.Array, border: int, valid_w, valid_h,
                      cap: int):
    """Static-size extraction of NMS candidates for ONE view.

    nms: (L, H, W) bool.  Returns (lvl, r, c, valid) arrays of length
    ``cap`` in scan order (level, row, col) — the reference's loop order.
    valid_w/valid_h: traced scalars bounding the un-padded view extent.
    """
    L, H, W = nms.shape
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    inb = ((rows >= border) & (rows < valid_h - border)
           & (cols >= border) & (cols < valid_w - border))
    m = nms & inb
    lvl, r, c = jnp.nonzero(
        m, size=cap, fill_value=(jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    # fill entries are (0,0,0) which never pass NMS+border; mark them
    valid = m[lvl, r, c]
    return (lvl.astype(jnp.int32) + 1, r.astype(jnp.int32),
            c.astype(jnp.int32), valid)
