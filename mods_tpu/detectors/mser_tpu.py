"""Device MSER: maximally-stable extremal regions as a batched
level-sweep, entirely on the TPU.

The reference's CMP MSER (extrema/extrema.cpp:92-282) and our native
host twin (native/mser.cpp) walk a union-find component tree over
gray-sorted pixels — inherently sequential.  This module is the
TPU-native reformulation (SURVEY.md §7.3 hard part #1): the gray-level
sweep becomes a `lax.scan` over L quantized thresholds, and per level
the connected components of the threshold mask are labeled by
**min-index label propagation** built from segmented min-scans
(`lax.associative_scan` along rows and columns) plus pointer-jumping —
all dense fixed-shape VPU work that batches over views and polarities.

Per level, component area and raw moments come from label-keyed
scatter-adds.  Stability mirrors the native twin's ``best_rate``
criterion (native/mser.cpp:175-179): the backward relative growth
q_l = (area_l - area_{l-1}) / area_l, evaluated per pixel through its
containing component, with a candidate emitted at (component root,
level) whenever q strictly improves on the component's previous rate
and the margin estimate step/q (gray-range per unit relative growth —
the analog of lifespan margin) clears ``min_margin``.  MSER+ (dark) and
MSER- (bright) run as one batch on (img, 255-img).

Deliberate differences from the sequential reference: gray levels are
quantized to L levels (default 32), stability uses quantized growth
rates rather than exact lifespans, and nested regions may be emitted at
several stability dips (the CMP code also emits per stable threshold);
the per-view top-K budget and the matcher's duplicate filter absorb the
extras.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mods_tpu.config import CapacityParams
from mods_tpu.regions import Regions

MSER_PLUS = 21   # dark regions (reference sub_type)
MSER_MIN = 20


def _seg_min(values, boundary, axis, reverse=False):
    """Segmented running min along `axis`; `boundary` True starts a new
    segment (scan-direction aware)."""
    def op(a, b):
        va, ba = a
        vb, bb = b
        return jnp.where(bb, vb, jnp.minimum(va, vb)), ba | bb
    axis = axis % values.ndim
    v, _ = lax.associative_scan(op, (values, boundary), axis=axis,
                                reverse=reverse)
    return v


def _line_pass(lab, m, axis):
    """Full segmented min along `axis` (forward + backward prefix mins):
    every pixel of a mask run gets the run's min label."""
    prev = jnp.roll(m, 1, axis=axis)
    nxt = jnp.roll(m, -1, axis=axis)
    idx = jnp.arange(m.shape[axis])
    shape = [1] * m.ndim
    shape[axis] = m.shape[axis]
    first = (idx == 0).reshape(shape)
    last = (idx == m.shape[axis] - 1).reshape(shape)
    bf = first | ~m | ~prev
    bb = last | ~m | ~nxt
    fwd = _seg_min(lab, bf, axis)
    bwd = _seg_min(lab, bb, axis, reverse=True)
    return jnp.minimum(fwd, bwd)


def _label_components(m, passes: int):
    """Min-index connected-component labels of mask m (B, H, W).
    Returns flat labels (B, H*W) int32; non-mask pixels get H*W."""
    B, H, W = m.shape
    HW = H * W
    idx = jnp.arange(HW, dtype=jnp.int32).reshape(1, H, W)
    big = jnp.int32(HW)
    lab = jnp.where(m, idx, big)
    for _ in range(passes):
        lab = _line_pass(lab, m, axis=-1)
        lab = _line_pass(lab, m, axis=-2)
        # pointer jump: label of label — contracts label chains
        flat = lab.reshape(B, HW)
        jump = jnp.take_along_axis(
            flat, jnp.minimum(flat, HW - 1), axis=-1)
        lab = jnp.where(m, jnp.minimum(lab, jump.reshape(B, H, W)), big)
    return jnp.where(m, lab, big).reshape(B, HW)


@functools.partial(jax.jit, static_argnames=(
    "levels", "passes", "r_step", "min_size", "min_margin"))
def _mser_sweep(gray2, valid, levels: int, passes: int, r_step: int,
                min_size: int, max_size, min_margin: int):
    """gray2: (B, H, W) with B = 2V (dark polarity first, inverted
    second); valid: (B, H, W) bool; max_size: (B, 1) float.  Returns
    per-level candidate records stacked to (levels, r_step, ...)."""
    B, H, W = gray2.shape
    HW = H * W
    step = 256.0 / levels
    ys, xs = np.mgrid[0:H, 0:W]
    xsf = jnp.asarray(xs.reshape(HW), jnp.float32)[None]
    ysf = jnp.asarray(ys.reshape(HW), jnp.float32)[None]
    iota = jnp.arange(HW, dtype=jnp.int32)[None]

    def scatter_sums(labc, mf):
        """Six label-keyed sums as separate 1-D scatters (a (N, 6)
        layout would pad its minor dim to the 128-lane tile)."""
        def one(lab1, w1):
            return jnp.zeros((HW + 1,), jnp.float32).at[lab1].add(w1)
        f = jax.vmap(one)
        return (f(labc, mf), f(labc, xsf * mf), f(labc, ysf * mf),
                f(labc, xsf * xsf * mf), f(labc, xsf * ysf * mf),
                f(labc, ysf * ysf * mf))

    def level_step(carry, t):
        a_m1, q_m1 = carry
        m = (gray2 <= t) & valid
        lab = _label_components(m, passes)           # (B, HW)
        mf = m.reshape(B, HW)
        labc = jnp.where(mf, lab, HW)
        sums = scatter_sums(labc, mf.astype(jnp.float32))
        area = sums[0]                               # (B, HW+1)
        a_map = jnp.take_along_axis(area, jnp.minimum(labc, HW), axis=-1)
        a_map = jnp.where(mf, a_map, 0.0)
        root = mf & (lab == iota)

        # backward growth rate of the containing component
        # (native/mser.cpp:175 — rate = (n - size_prev)/n)
        q = jnp.where(a_map > 0,
                      (a_map - a_m1) / jnp.maximum(a_map, 1.0), jnp.inf)
        margin = step / jnp.maximum(q, 1e-6)
        ok = (root & (q < q_m1) & (a_map >= min_size)
              & (a_map <= max_size) & (margin > min_margin))

        okf = ok.reshape(-1)
        cand = jnp.nonzero(okf, size=r_step, fill_value=B * HW)[0]
        cvalid = cand < B * HW
        candc = jnp.minimum(cand, B * HW - 1)
        bidx = candc // HW
        pidx = candc % HW
        clab = jnp.minimum(lab.reshape(-1)[candc], HW)
        mom = jnp.stack([s[bidx, clab] for s in sums], axis=-1)
        recs = dict(
            b=jnp.where(cvalid, bidx, -1).astype(jnp.int32),
            margin=jnp.where(cvalid, margin.reshape(-1)[candc], 0.0),
            mom=jnp.where(cvalid[:, None], mom, 0.0),
        )
        # carry q through mask growth: pixels new to the mask inherit
        # their component's current rate only once computed
        return (a_map, jnp.where(mf, q, jnp.inf)), recs

    init = (jnp.zeros((B, HW), jnp.float32),
            jnp.full((B, HW), jnp.inf, jnp.float32))
    ts = (jnp.arange(levels, dtype=jnp.float32) + 1.0) * step - 1.0
    _, recs = lax.scan(level_step, init, ts)
    return recs


def _sym_sqrt_jnp(cxx, cxy, cyy):
    """Vectorized 2x2 symmetric sqrt (native/mser.cpp sym_sqrt,
    mirroring the reference's schur_sym ellipse fit)."""
    tr = cxx + cyy
    det = jnp.maximum(cxx * cyy - cxy * cxy, 1e-12)
    disc = jnp.maximum(tr * tr / 4.0 - det, 0.0)
    l1 = tr / 2.0 + jnp.sqrt(disc)
    l2 = jnp.maximum(tr / 2.0 - jnp.sqrt(disc), 1e-12)
    use = jnp.abs(cxy) > 1e-12
    vx = jnp.where(use, l1 - cyy, 1.0)
    vy = jnp.where(use, cxy, 0.0)
    nv = jnp.sqrt(vx * vx + vy * vy)
    vx, vy = vx / nv, vy / nv
    s1, s2 = jnp.sqrt(l1), jnp.sqrt(l2)
    a11 = s1 * vx * vx + s2 * vy * vy
    a12 = (s1 - s2) * vx * vy
    a22 = s1 * vy * vy + s2 * vx * vx
    return a11, a12, a12, a22


@functools.partial(jax.jit, static_argnames=("V", "K"))
def _select_regions(recs, V: int, K: int):
    """(levels, r_step) records -> per-view top-K region arrays.
    Batch index b in [0, 2V): b % V = view, b // V = polarity
    (0 dark = MSER+, 1 bright = MSER-)."""
    b = recs["b"].reshape(-1)
    margin = recs["margin"].reshape(-1)
    mom = recs["mom"].reshape(-1, 6)
    n = jnp.maximum(mom[:, 0], 1.0)
    mx = mom[:, 1] / n
    my = mom[:, 2] / n
    cxx = jnp.maximum(mom[:, 3] / n - mx * mx, 1e-9)
    cxy = mom[:, 4] / n - mx * my
    cyy = jnp.maximum(mom[:, 5] / n - my * my, 1e-9)
    a11, a12, a21, a22 = _sym_sqrt_jnp(cxx, cxy, cyy)

    view = jnp.where(b >= 0, b % V, -1)
    pol = jnp.where(b >= 0, b // V, 0)

    def per_view(v):
        mask = view == v
        score = jnp.where(mask, margin, -1.0)
        val, idx = lax.top_k(score, K)
        ok = val > 0

        def take(a):
            return jnp.where(ok, a[idx], 0.0)
        xy = jnp.stack([take(mx), take(my)], axis=-1)
        A = jnp.stack([take(a11), take(a12), take(a21), take(a22)],
                      axis=-1).reshape(K, 2, 2)
        A = jnp.where(ok[:, None, None], A,
                      jnp.eye(2, dtype=jnp.float32)[None])
        sub = jnp.where(pol[idx] == 0, MSER_PLUS, MSER_MIN)
        return (xy, A, jnp.where(ok, 1.0, 0.0), take(margin),
                jnp.where(ok, sub, 0), ok)

    outs = [per_view(v) for v in range(V)]

    def stack(i):
        return jnp.stack([o[i] for o in outs])
    return (stack(0), stack(1), stack(2), stack(3),
            stack(4).astype(jnp.int32), stack(5))


def detect_mser_tpu(views, valid_hw, caps: CapacityParams,
                    min_size: int = 30, max_area: float = 0.05,
                    min_margin: int = 8, levels: int = 32,
                    passes: int = 3, r_step: int = 1024) -> Regions:
    """views: (V, H, W) float 0..255; valid_hw: (V, 2) int32.
    Fully traced — usable inside fused per-group programs."""
    V, H, W = views.shape
    ys, xs = np.mgrid[0:H, 0:W]
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    hv = valid_hw[:, 0][:, None, None]
    wv = valid_hw[:, 1][:, None, None]
    valid = (ys[None] < hv) & (xs[None] < wv)
    npx = (valid_hw[:, 0] * valid_hw[:, 1]).astype(jnp.float32)
    # polarity batch: dark on the image, bright on the inversion
    g2 = jnp.concatenate([views, 255.0 - views], axis=0)
    v2 = jnp.concatenate([valid, valid], axis=0)
    max_size = jnp.concatenate([npx, npx])[:, None] * max_area
    recs = _mser_sweep(g2, v2, levels, passes, r_step, min_size,
                       max_size, min_margin)
    xy, A, s, resp, sub, mask = _select_regions(recs, V, caps.per_view)
    return Regions(xy=xy, A=A, s=jnp.where(mask, 1.0, 0.0),
                   response=resp, sub_type=sub, mask=mask)
