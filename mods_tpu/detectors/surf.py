"""SURF detector — FastHessian via integral-image box filters.

Reference: OpenSURF vendored in the reference (`opensurf/fasthessian.cpp`
`buildResponseLayer`/`isExtremum`/`interpolateExtremum`, dispatched at
imagerepresentation.cpp:1046-1076).  TPU design: the integral image is a
2-D cumsum; every box sum over the whole image is four shifted slices of
it, so each response layer is a handful of elementwise ops — no gathers,
no loops.  Scale-space NMS runs on stride-subsampled response volumes
(the reference's sampling step), and the subpixel/subscale refinement is
a batched one-shot 3x3x3 quadratic fit.

Filter layout per OpenSURF: octave o uses filter sizes with growing
strides; responses are always computed at full resolution and sampled
with step 2^o.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams
from mods_tpu.regions import Regions

# filter sizes per octave (OpenSURF fasthessian.cpp filter_map)
OCTAVE_FILTERS = ((9, 15, 21, 27), (15, 27, 39, 51), (27, 51, 75, 99),
                  (51, 99, 147, 195))


def integral_image(img: jax.Array) -> jax.Array:
    """(H, W) -> (H+1, W+1) with ii[i, j] = sum(img[:i, :j])."""
    ii = jnp.cumsum(jnp.cumsum(img, axis=-2), axis=-1)
    ii = jnp.pad(ii, ((1, 0), (1, 0)))
    return ii


def _box(ii: jax.Array, h: int, w: int, dr: int, dc: int,
         H: int, W: int) -> jax.Array:
    """Box sums over [r+dr, r+dr+h) x [c+dc, c+dc+w) for every (r, c).

    Equivalent to OpenSURF BoxIntegral with clamped indices: ii is padded
    with edge values so out-of-range boxes clip to the image (the
    reference clamps row/col into [0, H]x[0, W])."""
    r0, c0 = dr, dc
    r1, c1 = dr + h, dc + w
    pad_top = max(0, -min(r0, r1))
    pad_left = max(0, -min(c0, c1))
    pad_bot = max(0, max(r0, r1) + H - (H + 1) + 1)
    pad_right = max(0, max(c0, c1) + W - (W + 1) + 1)
    iip = jnp.pad(ii, ((pad_top, pad_bot), (pad_left, pad_right)),
                  mode="edge")

    def sl(r, c):
        return jax.lax.dynamic_slice(
            iip, (r + pad_top, c + pad_left), (H, W))

    return sl(r1, c1) - sl(r0, c1) - sl(r1, c0) + sl(r0, c0)


def response_layer(ii: jax.Array, filt: int, H: int, W: int):
    """det-of-Hessian response + laplacian sign for one filter size
    (buildResponseLayer, opensurf/fasthessian.cpp)."""
    b = (filt - 1) // 2
    l = filt // 3
    inv_area = 1.0 / (filt * filt)
    dxx = (_box(ii, 2 * l - 1, filt, -l + 1, -b, H, W)
           - 3.0 * _box(ii, 2 * l - 1, l, -l + 1, -(l // 2), H, W))
    dyy = (_box(ii, filt, 2 * l - 1, -b, -l + 1, H, W)
           - 3.0 * _box(ii, l, 2 * l - 1, -(l // 2), -l + 1, H, W))
    dxy = (_box(ii, l, l, -l, 1, H, W) + _box(ii, l, l, 1, -l, H, W)
           - _box(ii, l, l, -l, -l, H, W) - _box(ii, l, l, 1, 1, H, W))
    dxx = dxx * inv_area
    dyy = dyy * inv_area
    dxy = dxy * inv_area
    resp = dxx * dyy - 0.81 * dxy * dxy
    lap = (dxx + dyy) >= 0
    return resp, lap


def _quad_interp(win: jax.Array):
    """One-shot 3D quadratic refinement of (K, 3, 3, 3) windows
    [scale, row, col] (interpolateExtremum).  Returns offsets (K, 3)
    (ds, dr, dc) and validity."""
    c = win[:, 1, 1, 1]
    dx = 0.5 * (win[:, 1, 1, 2] - win[:, 1, 1, 0])
    dy = 0.5 * (win[:, 1, 2, 1] - win[:, 1, 0, 1])
    ds = 0.5 * (win[:, 2, 1, 1] - win[:, 0, 1, 1])
    dxx = win[:, 1, 1, 2] - 2 * c + win[:, 1, 1, 0]
    dyy = win[:, 1, 2, 1] - 2 * c + win[:, 1, 0, 1]
    dss = win[:, 2, 1, 1] - 2 * c + win[:, 0, 1, 1]
    dxy = 0.25 * (win[:, 1, 2, 2] - win[:, 1, 2, 0]
                  - win[:, 1, 0, 2] + win[:, 1, 0, 0])
    dxs = 0.25 * (win[:, 2, 1, 2] - win[:, 2, 1, 0]
                  - win[:, 0, 1, 2] + win[:, 0, 1, 0])
    dys = 0.25 * (win[:, 2, 2, 1] - win[:, 2, 0, 1]
                  - win[:, 0, 2, 1] + win[:, 0, 0, 1])
    A = jnp.stack([
        jnp.stack([dxx, dxy, dxs], -1),
        jnp.stack([dxy, dyy, dys], -1),
        jnp.stack([dxs, dys, dss], -1)], -2)
    rhs = -jnp.stack([dx, dy, ds], -1)
    det = jnp.linalg.det(A)
    sol = []
    for i in range(3):
        Ai = A.at[:, :, i].set(rhs)
        sol.append(jnp.linalg.det(Ai) / det)
    off = jnp.stack([sol[2], sol[1], sol[0]], -1)     # (ds, dr, dc)
    okf = jnp.all(jnp.isfinite(off), -1) \
        & jnp.all(jnp.abs(off) < 1.0, -1)
    return off, okf


@functools.partial(jax.jit, static_argnames=("n_octaves", "threshold",
                                             "cap_per_view"))
def _detect_one(img: jax.Array, valid_h, valid_w, n_octaves: int,
                threshold: float, cap_per_view: int):
    H, W = img.shape
    ii = integral_image(img / 255.0)
    sizes = sorted({f for o in OCTAVE_FILTERS[:n_octaves] for f in o})
    resp = {}
    lap = {}
    for f in sizes:
        resp[f], lap[f] = response_layer(ii, f, H, W)

    all_xy, all_s, all_r, all_m, all_t = [], [], [], [], []
    per_oct = max(cap_per_view // n_octaves, 16)
    for o in range(n_octaves):
        filters = OCTAVE_FILTERS[o]
        step = 2 ** o
        vol = jnp.stack([resp[f][::step, ::step] for f in filters])
        Ls, Hs, Ws = vol.shape
        mx = jax.lax.reduce_window(
            vol, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        # candidate levels 1..Ls-2; border from the largest filter
        b = (filters[-1] + 1) // (2 * step) + 1
        rows = jnp.arange(Hs)[None, :, None]
        cols = jnp.arange(Ws)[None, None, :]
        inb = ((rows >= b) & (rows < valid_h // step - b)
               & (cols >= b) & (cols < valid_w // step - b))
        is_ext = (vol > threshold) & (vol >= mx) & inb
        is_ext = is_ext.at[0].set(False).at[Ls - 1].set(False)
        lvl, r, c = jnp.nonzero(is_ext, size=per_oct,
                                fill_value=(0, 0, 0))
        valid = is_ext[lvl, r, c]
        dl = jnp.arange(-1, 2)
        win = vol[jnp.clip(lvl[:, None, None, None]
                           + dl[None, :, None, None], 0, Ls - 1),
                  jnp.clip(r[:, None, None, None]
                           + dl[None, None, :, None], 0, Hs - 1),
                  jnp.clip(c[:, None, None, None]
                           + dl[None, None, None, :], 0, Ws - 1)]
        off, okf = _quad_interp(win)
        valid = valid & okf
        f_arr = jnp.asarray(filters, jnp.float32)
        filt_c = f_arr[lvl]
        filt_step = f_arr[jnp.minimum(lvl + 1, Ls - 1)] - f_arr[lvl]
        filt_i = filt_c + off[:, 0] * filt_step
        scale = 1.2 * filt_i / 9.0                     # SURF scale law
        x = (c.astype(jnp.float32) + off[:, 2]) * step
        y = (r.astype(jnp.float32) + off[:, 1]) * step
        rsp = vol[lvl, r, c]
        lap_o = jnp.stack([lap[f][::step, ::step] for f in filters])
        tp = lap_o[lvl, r, c].astype(jnp.int64)
        all_xy.append(jnp.stack([x, y], -1))
        all_s.append(scale)
        all_r.append(rsp)
        all_m.append(valid)
        all_t.append(tp)

    xy = jnp.concatenate(all_xy)
    n = xy.shape[0]
    return Regions(
        xy=xy,
        A=jnp.tile(jnp.eye(2, dtype=jnp.float32), (n, 1, 1)),
        s=jnp.concatenate(all_s),
        response=jnp.concatenate(all_r),
        sub_type=jnp.concatenate(all_t),
        mask=jnp.concatenate(all_m))


def detect_surf(views: jax.Array, valid_hw: jax.Array,
                caps: CapacityParams, threshold: float = 0.0004,
                n_octaves: int = 4) -> Regions:
    """views: (V, H, W) -> Regions (V, cap).  Threshold is OpenSURF's
    `thresh` on the normalized det-of-Hessian (default 0.0004)."""
    from mods_tpu.regions import compact_topk

    H, W = views.shape[-2:]
    n_oct = min(n_octaves,
                max(1, int(math.log2(min(H, W) / 32)) + 1))

    def one(img, vhw):
        return _detect_one(img, vhw[0], vhw[1], n_oct, threshold,
                           caps.per_octave)
    regs = jax.vmap(one)(views, valid_hw)
    return compact_topk(regs, caps.per_view, by="response")
