"""TILDE — learned filter-bank keypoint detector.

Reference: `TILDE/c++/src/libTILDE.cpp` (`getTILDEKeyPoints`,
`applyNonApproxFilters` :745-840, loader `getTILDENonApproxFilters`
:642-730), dispatched at imagerepresentation.cpp:1109-1131 and as a
scale-space response (pyramid.cpp:182-197).

Structure (TILDE paper, Verdie et al.):
    score = sum_s (-1)^(s+1) * max_m (sum_ch conv(ch_c, w[s,m,c]) + b)
over nbSum cascades of nbMax filters each, on 6 feature channels
(3 gradients + 3 color; grayscale here: gradient triplet + luminance
triplet), followed by a sigma=2 Gaussian smoothing and 2-D NMS.

TPU design: the whole filter bank is ONE grouped convolution
(nbSum*nbMax*nbChannels kernels), the cascade max/sum are reductions —
XLA fuses the rest.  Filter weights are LOADED from the reference's
text format at runtime (they are per-scene learned data, not code);
`procedural_filters` provides a self-contained Gabor-like default bank
so the detector works without external files.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu.config import CapacityParams
from mods_tpu.ops.gaussian import gaussian_blur
from mods_tpu.regions import Regions, compact_topk


def load_tilde_filters(path: str):
    """Parse the reference's non-approximated filter text format
    (getTILDENonApproxFilters, libTILDE.cpp:642-730).

    Layout: line 1 = parameters (resizeRatio ...); line 2 =
    "nbFilters nbChannels sizeFilters"; then per filter-of-cascade:
    nbChannels blocks of sizeFilters rows x sizeFilters floats followed
    by one bias line; nbFilters filters form one cascade, cascades repeat
    (separated by a repeated header line) until EOF.

    Returns (weights (S, M, C, K, K) float32, biases (S, M), resize).
    """
    with open(path) as f:
        lines = [ln for ln in (l.strip() for l in f) if ln]
    resize = float(lines[0].split()[0])
    hdr = lines[1].split()
    nb_filters = int(float(hdr[0]))
    nb_channels = int(float(hdr[1]))
    size = int(float(hdr[2]))

    pos = 2
    cascades = []
    while pos < len(lines):
        cascade_w = []
        cascade_b = []
        for _ in range(nb_filters):
            chans = []
            for _ in range(nb_channels):
                rows = []
                for _ in range(size):
                    rows.append([float(x) for x in lines[pos].split()
                                 [:size]])
                    pos += 1
                chans.append(rows)
            cascade_b.append(float(lines[pos].split()[0]))
            pos += 1
            cascade_w.append(chans)
        cascades.append((cascade_w, cascade_b))
        # skip a repeated header line between cascades if present
        if pos < len(lines) and len(lines[pos].split()) == 3:
            pos += 1
    W = np.asarray([c[0] for c in cascades], np.float32)
    b = np.asarray([c[1] for c in cascades], np.float32)
    return W, b, resize


@functools.lru_cache(maxsize=2)
def procedural_filters(n_sum: int = 4, n_max: int = 4, n_ch: int = 6,
                       size: int = 21, seed: int = 11):
    """Self-contained default bank: oriented Gabor-like filters across
    channels — NOT the learned TILDE weights (those are per-scene data
    files the user can load with ``load_tilde_filters``)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    c = (size - 1) / 2.0
    W = np.zeros((n_sum, n_max, n_ch, size, size), np.float32)
    for s in range(n_sum):
        for m in range(n_max):
            th = math.pi * (s * n_max + m) / (n_sum * n_max)
            fx = math.cos(th) / 6.0
            fy = math.sin(th) / 6.0
            env = np.exp(-((xx - c) ** 2 + (yy - c) ** 2) / (2 * 25.0))
            carrier = np.cos(2 * np.pi * (fx * (xx - c) + fy * (yy - c)))
            g = env * carrier
            g -= g.mean()
            for ch in range(n_ch):
                W[s, m, ch] = g * rng.uniform(0.5, 1.0) / (size * size)
    b = np.zeros((n_sum, n_max), np.float32)
    return W, b


def _channels(img: jax.Array) -> jax.Array:
    """6 feature maps from grayscale: (gx, gy, |grad|, L, L, L) — the
    grayscale analogue of the reference's grad(3)+LUV(3) stack
    (prepareData, libTILDE.cpp:297-325)."""
    g = img / 255.0
    gx = 0.5 * (jnp.pad(g, ((0, 0), (0, 1)), mode="edge")[:, 1:]
                - jnp.pad(g, ((0, 0), (1, 0)), mode="edge")[:, :-1])
    gy = 0.5 * (jnp.pad(g, ((0, 1), (0, 0)), mode="edge")[1:, :]
                - jnp.pad(g, ((1, 0), (0, 0)), mode="edge")[:-1, :])
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.stack([gx, gy, mag, g, g, g])


def tilde_response(img: jax.Array, W: jax.Array, b: jax.Array
                   ) -> jax.Array:
    """(H, W) image -> TILDE score map (applyNonApproxFilters
    semantics: per-cascade channel-summed convs + bias, max over the
    cascade, alternating-sign sum over cascades, sigma=2 smoothing)."""
    S, M, C, K, _ = W.shape
    ch = _channels(img)                             # (C, H, W)
    kern = W.reshape(S * M, C, K, K)
    resp = jax.lax.conv_general_dilated(
        ch[None], kern, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]   # (S*M, H, W)
    resp = resp * (K * K) + b.reshape(S * M)[:, None, None]
    resp = resp.reshape(S, M, *img.shape)
    casc = jnp.max(resp, axis=1)                    # (S, H, W)
    sign = jnp.asarray([(-1.0) ** s for s in range(S)],
                       jnp.float32)[:, None, None]
    # reference: even-indexed cascades are negated (libTILDE.cpp:1321+)
    score = jnp.sum(-sign * casc, axis=0)
    return gaussian_blur(score, 2.0)


@functools.partial(jax.jit, static_argnames=("cap", "threshold"))
def _detect_one(img, valid_h, valid_w, W, b, cap: int, threshold: float):
    score = tilde_response(img, W, b)
    H, Wd = img.shape
    mx = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (5, 5),
                               (1, 1), "SAME")
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(Wd)[None, :]
    bd = 11
    inb = ((rows >= bd) & (rows < valid_h - bd)
           & (cols >= bd) & (cols < valid_w - bd))
    ext = (score > threshold) & (score >= mx) & inb
    r, c = jnp.nonzero(ext, size=cap, fill_value=(0, 0))
    valid = ext[r, c]
    n = r.shape[0]
    return Regions(
        xy=jnp.stack([c, r], -1).astype(jnp.float32),
        A=jnp.tile(jnp.eye(2, dtype=jnp.float32), (n, 1, 1)),
        s=jnp.full(n, 10.0 / 5.1962, jnp.float32),  # scaleKeypoint=10
        response=score[r, c],
        sub_type=jnp.zeros(n, jnp.int32),
        mask=valid)


def detect_tilde(views: jax.Array, valid_hw: jax.Array,
                 caps: CapacityParams, filters=None,
                 threshold: float = 0.0) -> Regions:
    """(V, H, W) -> Regions.  ``filters``: (W, b) from
    load_tilde_filters / procedural_filters."""
    if filters is None:
        filters = procedural_filters()
    W = jnp.asarray(filters[0])
    b = jnp.asarray(filters[1])

    def one(img, vhw):
        return _detect_one(img, vhw[0], vhw[1], W, b, caps.per_view,
                           threshold)
    regs = jax.vmap(one)(views, valid_hw)
    return compact_topk(regs, caps.per_view, by="response")
