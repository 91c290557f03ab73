"""KAZE/AKAZE detector — nonlinear diffusion scale space.

Reference: the vendored AKAZE library (`akaze/src/lib`,
`Create_Nonlinear_Scale_Space` / `Feature_Detection`, dispatched at
imagerepresentation.cpp:1132-1152).  TPU design: the AOS/FED solvers
become Fast-Explicit-Diffusion cycles of 4-neighbor stencil updates —
each step is a handful of elementwise ops and shifts, fully fused by XLA;
the contrast factor is a quantile reduction; detection reuses the batched
det-of-Hessian NMS + one-shot quadratic refinement of the SURF module.

Evolution layout per AKAZE defaults: 4 octaves x 4 sublevels,
sigma_i = 1.6 * 2^(o + s/4), evolution time t_i = sigma_i^2 / 2,
Perona-Malik g2 conductivity with k = 70th percentile of |grad|.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams
from mods_tpu.ops.gaussian import gaussian_blur
from mods_tpu.ops.image import half_image
from mods_tpu.regions import Regions, compact_topk


def _fed_tau_steps(T: float, tau_max: float = 0.25):
    """FED cycle step sizes covering total time T (Weickert/Grewenig FED:
    tau_j = tau_max / (2 cos^2(pi (2j+1) / (4n+2))), scaled to sum T)."""
    n = max(1, int(math.ceil(math.sqrt(3.0 * T / tau_max + 0.25) - 0.5)))
    taus = [tau_max / (2.0 * math.cos(
        math.pi * (2 * j + 1) / (4 * n + 2)) ** 2) for j in range(n)]
    scale = T / sum(taus)
    return [t * scale for t in taus]


def _diffusion_step(L: jax.Array, g: jax.Array, tau: float) -> jax.Array:
    """One explicit diffusion step with conductivity g (nld_step_scalar
    semantics, akaze nldiffusion_functions): flux between 4-neighbors
    with averaged conductivity."""
    gr = jnp.pad(g, ((0, 0), (0, 1)), mode="edge")[:, 1:]
    gd = jnp.pad(g, ((0, 1), (0, 0)), mode="edge")[1:, :]
    Lr = jnp.pad(L, ((0, 0), (0, 1)), mode="edge")[:, 1:]
    Ld = jnp.pad(L, ((0, 1), (0, 0)), mode="edge")[1:, :]
    fx = 0.5 * (g + gr) * (Lr - L)           # flux to the right
    fy = 0.5 * (g + gd) * (Ld - L)           # flux downward
    fxl = jnp.pad(fx, ((0, 0), (1, 0)))[:, :-1]
    fyu = jnp.pad(fy, ((1, 0), (0, 0)))[:-1, :]
    return L + tau * (fx - fxl + fy - fyu)


def _grad(L: jax.Array):
    lx = 0.5 * (jnp.pad(L, ((0, 0), (0, 1)), mode="edge")[:, 1:]
                - jnp.pad(L, ((0, 0), (1, 0)), mode="edge")[:, :-1])
    ly = 0.5 * (jnp.pad(L, ((0, 1), (0, 0)), mode="edge")[1:, :]
                - jnp.pad(L, ((1, 0), (0, 0)), mode="edge")[:-1, :])
    return lx, ly


def _hessian_det(L: jax.Array, sigma: float) -> jax.Array:
    """Scale-normalized det-of-Hessian with sigma-dilated stencils —
    AKAZE computes multiscale derivatives with step round(sigma)
    (Compute_Multiscale_Derivatives), which is what makes responses peak
    at the blob's own scale instead of growing monotonically."""
    d = max(1, int(round(sigma)))
    Lp = jnp.pad(L, d, mode="edge")
    H, W = L.shape

    def sh(dy, dx):
        return jax.lax.dynamic_slice(Lp, (d + dy, d + dx), (H, W))

    lxx = sh(0, -d) - 2 * L + sh(0, d)
    lyy = sh(-d, 0) - 2 * L + sh(d, 0)
    lxy = 0.25 * (sh(-d, d) - sh(-d, -d) + sh(d, -d) - sh(d, d))
    norm = (sigma / d) ** 2
    return (lxx * lyy - lxy * lxy) * (norm * norm)


@functools.partial(jax.jit,
                   static_argnames=("n_oct", "n_sub", "threshold", "cap"))
def _detect_one(img: jax.Array, valid_h, valid_w, n_oct: int, n_sub: int,
                threshold: float, cap: int):
    base_sigma = 1.6
    L = gaussian_blur(img / 255.0, base_sigma)

    # contrast factor (KPM percentile of gradients on the smoothed image)
    gx, gy = _grad(gaussian_blur(img / 255.0, 1.0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    k = jnp.nanpercentile(jnp.where(mag > 1e-5, mag, jnp.nan), 70.0,
                          method="nearest")
    k = jnp.where(jnp.isfinite(k), jnp.maximum(k, 1e-3),
                  jnp.float32(0.03))
    k2 = k * k

    all_out = []
    per_oct = max(cap // n_oct, 16)
    pd = 1.0
    vh, vw = valid_h, valid_w
    t_prev = 0.5 * base_sigma ** 2
    for o in range(n_oct):
        H, W = L.shape
        resps = []
        sigmas = []
        Ls = []
        for s in range(n_sub + 2):
            sigma = base_sigma * (2.0 ** ((s - 1) / n_sub + o))
            sig_local = sigma / pd
            t = 0.5 * sig_local ** 2
            if t > t_prev:
                for tau in _fed_tau_steps(t - t_prev):
                    gx, gy = _grad(L)
                    g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
                    L = _diffusion_step(L, g, tau)
                t_prev = t
            Ls.append(L)
            sigmas.append(sig_local)
            resps.append(_hessian_det(L, sig_local))
        vol = jnp.stack(resps)                       # (n_sub+2, H, W)
        # AKAZE's Find_Scale_Space_Extrema is per-level spatial NMS with
        # cross-level proximity dedup, NOT a strict 3D NMS: the
        # scale-dilated stencils make responses discontinuous across d
        # changes, so scale-axis comparisons are meaningless.  Spatial
        # 3x3 NMS per level; the strongest-response rule of the
        # downstream compact_topk + duplicate filter handles colocated
        # multi-level detections.
        mx = jax.lax.reduce_window(
            vol, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
        rows = jnp.arange(H)[None, :, None]
        cols = jnp.arange(W)[None, None, :]
        b = 6
        inb = ((rows >= b) & (rows < vh - b)
               & (cols >= b) & (cols < vw - b))
        ext = (vol > threshold) & (vol >= mx) & inb
        ext = ext.at[0].set(False).at[n_sub + 1].set(False)
        # cross-level dedup at identical pixels: keep the level whose
        # response beats both neighbors' (same-pixel) responses
        stronger_lo = vol >= jnp.roll(vol, 1, axis=0).at[0].set(-jnp.inf)
        stronger_hi = vol > jnp.roll(vol, -1, axis=0
                                     ).at[n_sub + 1].set(-jnp.inf)
        ext = ext & stronger_lo & stronger_hi
        lvl, r, c = jnp.nonzero(ext, size=per_oct, fill_value=(0, 0, 0))
        valid = ext[lvl, r, c]
        # 2D subpixel refinement at the detection level
        dl = jnp.arange(-1, 2)
        win2 = vol[lvl[:, None, None],
                   jnp.clip(r[:, None, None] + dl[None, :, None],
                            0, H - 1),
                   jnp.clip(c[:, None, None] + dl[None, None, :],
                            0, W - 1)]
        cc0 = win2[:, 1, 1]
        dx = 0.5 * (win2[:, 1, 2] - win2[:, 1, 0])
        dy = 0.5 * (win2[:, 2, 1] - win2[:, 0, 1])
        dxx = win2[:, 1, 2] - 2 * cc0 + win2[:, 1, 0]
        dyy = win2[:, 2, 1] - 2 * cc0 + win2[:, 0, 1]
        dxy = 0.25 * (win2[:, 2, 2] - win2[:, 2, 0]
                      - win2[:, 0, 2] + win2[:, 0, 0])
        det2 = dxx * dyy - dxy * dxy
        ox = -(dyy * dx - dxy * dy) / jnp.where(det2 != 0, det2, 1e-12)
        oy = -(dxx * dy - dxy * dx) / jnp.where(det2 != 0, det2, 1e-12)
        okf = jnp.isfinite(ox) & jnp.isfinite(oy) \
            & (jnp.abs(ox) < 1.0) & (jnp.abs(oy) < 1.0)
        ox = jnp.where(okf, ox, 0.0)
        oy = jnp.where(okf, oy, 0.0)
        sig_arr = jnp.asarray(sigmas, jnp.float32)
        scale = sig_arr[lvl] * pd
        x = (c.astype(jnp.float32) + ox) * pd
        y = (r.astype(jnp.float32) + oy) * pd
        all_out.append(dict(
            xy=jnp.stack([x, y], -1), s=scale,
            response=vol[lvl, r, c], mask=valid,
            sub_type=jnp.zeros_like(lvl)))
        # next octave: downsample the last evolution image
        L = half_image(L[None])[0]
        t_prev = t_prev / 4.0     # time rescales with pixel distance^2
        pd *= 2.0
        vh = vh // 2
        vw = vw // 2

    xy = jnp.concatenate([o["xy"] for o in all_out])
    n = xy.shape[0]
    return Regions(
        xy=xy,
        A=jnp.tile(jnp.eye(2, dtype=jnp.float32), (n, 1, 1)),
        s=jnp.concatenate([o["s"] for o in all_out]),
        response=jnp.concatenate([o["response"] for o in all_out]),
        sub_type=jnp.concatenate([o["sub_type"] for o in all_out]),
        mask=jnp.concatenate([o["mask"] for o in all_out]))


def detect_kaze(views: jax.Array, valid_hw: jax.Array,
                caps: CapacityParams, threshold: float = 0.001,
                n_octaves: int = 4, n_sublevels: int = 4) -> Regions:
    """views: (V, H, W) -> Regions (V, cap).  Threshold is AKAZE's
    `dthreshold` on the normalized det-of-Hessian (default 1e-3)."""
    H, W = views.shape[-2:]
    n_oct = min(n_octaves, max(1, int(math.log2(min(H, W) / 48)) + 1))

    def one(img, vhw):
        return _detect_one(img, vhw[0], vhw[1], n_oct, n_sublevels,
                           threshold, caps.per_octave)
    regs = jax.vmap(one)(views, valid_hw)
    return compact_topk(regs, caps.per_view, by="response")
