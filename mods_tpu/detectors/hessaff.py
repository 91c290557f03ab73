"""Affine-covariant scale-space detection, assembled.

The TPU equivalent of the reference's `DetectAffineKeypoints`
(detectors/affinedetectors/scale-space-detector.cpp:43-85) +
`AffineDetector` callback chain (scale-space-detector.hpp:29-100):
pyramid → per-octave NMS → vectorized localization → vectorized Baumberg →
fixed-capacity Regions in image coordinates → detection-mode budget filter
(prepareKeysForExport, scale-space-detector.hpp:127-198).

Views are processed as a leading batch axis; all per-view work is vmapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mods_tpu.config import (AffineShapeParams, CapacityParams,
                             DetectionMode, DetectorType, PyramidParams)
from mods_tpu.detectors import scale_space as ss
from mods_tpu.detectors.baumberg import baumberg_adapt
from mods_tpu.regions import Regions, compact_topk, concat_regions


def _thresholds(p: PyramidParams) -> tuple[float, float]:
    """(positive_threshold, final_threshold) — pyramid.h:47-66.
    positive is computed from the raw threshold; final is squared for
    Hessian. Non-FixedTh modes zero both."""
    pos = 0.8 * p.threshold
    fin = p.threshold
    if p.detector_type == DetectorType.HESSIAN:
        fin = p.threshold * p.threshold
    if p.detector_mode != DetectionMode.FIXED_TH:
        return 0.0, 0.0
    return pos, fin


def _detect_one_octave(oct_blurs, oct_resps, valid_hw, p: PyramidParams,
                       aff: AffineShapeParams, cap: int, baum_cap: int,
                       pos_th, fin_th, pixel_distance: float, sigmas):
    """Detect+adapt for ONE view and ONE octave (vmapped over views).

    oct_blurs/oct_resps: (L+2, H, W); valid_hw: (2,) int32 (h, w) of the
    un-padded extent at this octave's resolution.  Localized survivors
    are compacted to ``baum_cap`` before the (expensive) Baumberg stage —
    the reference runs Baumberg only on localized points too.  Returns
    Regions (baum_cap,) in IMAGE coordinates.
    """
    L = p.n_scales
    nms = ss._nms_mask(oct_resps[None], pos_th, -pos_th)[0]   # (L, H, W)
    lvl, r, c, valid = ss.candidate_indices(
        nms, p.border, valid_hw[1], valid_hw[0], cap)
    loc = ss.localize_keypoints(
        oct_resps, oct_blurs, lvl, r, c, valid, p, fin_th, p.detector_type)
    ok = loc["ok"]
    x_oct = loc["c"].astype(jnp.float32) + loc["b"][:, 0]
    y_oct = loc["r"].astype(jnp.float32) + loc["b"][:, 1]
    sig = jnp.asarray(sigmas, jnp.float32)[lvl]
    s_oct = sig * jnp.exp2(loc["b"][:, 2] / L)

    # compact survivors, strongest responses first: the Baumberg slab is
    # deliberately narrower than the candidate slab (its windowed SMM
    # sampling is the costliest stage of detection), so when localized
    # survivors exceed it, keep the strongest
    key = jnp.where(ok, jnp.abs(loc["val"]), -jnp.inf)
    _, idx = jax.lax.top_k(key, baum_cap)
    ok = ok[idx] & (jnp.take(key, idx) > -jnp.inf)
    xy_oct = jnp.stack([x_oct[idx], y_oct[idx]], axis=-1)
    s_c = s_oct[idx]
    lvl_c = lvl[idx]
    # Baumberg runs OUTSIDE the per-view vmap (detect_affine_keypoints
    # flattens views into the level axis): one while_loop adapts the
    # whole view batch, and the Pallas window sampler never sits under a
    # vmap (vmapped pallas_call faulted the TPU worker, r5)
    return (xy_oct, s_c, lvl_c, ok, loc["val"][idx],
            loc["sub_type"][idx])


def apply_detection_mode(regs: Regions, p: PyramidParams, out_cap: int,
                         reg_number: jax.Array | None = None) -> Regions:
    """Budget filter (scale-space-detector.hpp prepareKeysForExport).

    regs: (V, K).  ``reg_number``: traced (V,) int32 — the per-view region
    budget already scaled by zoom/tilt (scale-space-detector.cpp:50-51);
    defaults to the static config value.  Output (V, out_cap) ordered by
    |response| desc (any mode other than FixedTh sorts in the reference;
    we sort always, which only changes ordering, not membership)."""
    out = compact_topk(regs, out_cap, by="response")
    mode = p.detector_mode
    if mode == DetectionMode.FIXED_TH:
        return out
    n = out.count()[..., None].astype(jnp.float32)
    rank = jnp.broadcast_to(
        jnp.arange(out.capacity, dtype=jnp.float32), out.mask.shape)
    absresp = jnp.abs(out.response)
    if reg_number is None:
        reg_number = jnp.full(regs.mask.shape[:-1], p.reg_number, jnp.int32)
    regn = reg_number[..., None].astype(jnp.float32)
    if mode == DetectionMode.RELATIVE_TH:
        mx = jnp.max(jnp.where(out.mask, absresp, 0.0), -1, keepdims=True)
        keep = absresp >= mx * p.rel_threshold
    elif mode == DetectionMode.FIXED_REG_NUMBER:
        keep = rank < regn
    elif mode == DetectionMode.RELATIVE_REG_NUMBER:
        keep = rank < jnp.floor(p.rel_reg_number * n)
    elif mode == DetectionMode.NOT_LESS_THAN_REGIONS:
        n_th = jnp.sum(
            jnp.where(out.mask, (absresp >= p.threshold).astype(jnp.float32),
                      0.0), -1, keepdims=True)
        keep = rank < jnp.maximum(regn, n_th)
    else:
        raise ValueError(mode)
    return out.masked_where(keep)


def detect_affine_keypoints(imgs: jax.Array, valid_hw: jax.Array,
                            p: PyramidParams, aff: AffineShapeParams,
                            caps: CapacityParams,
                            reg_number: jax.Array | None = None) -> Regions:
    """Full detector over a view batch.

    imgs: (V, H, W) float32 canvas batch (0..255); valid_hw: (V, 2) int32
    actual (h, w) per view.  Returns Regions (V, caps.per_view) in view
    image coordinates, |response|-ordered.
    """
    pos_th, fin_th = _thresholds(p)
    octaves = ss.build_pyramid(imgs, p)
    per_oct = []
    for octv in octaves:
        pd = octv.pixel_distance
        vh = (valid_hw.astype(jnp.float32) / pd).astype(jnp.int32)
        # candidate capacity scales with octave area: extrema density on
        # real images is well under 1 per 64 px after NMS (localization
        # gathers scale with this cap — it was a top-3 cost, op_bench r4)
        oh, ow = octv.blurs.shape[-2:]
        cap = min(caps.per_octave, max(256, (oh * ow) // 64))
        baum_cap = min(cap, caps.per_view, caps.per_octave_baum)
        f = jax.vmap(
            lambda b, r, hw: _detect_one_octave(
                b, r, hw, p, aff, cap, baum_cap, pos_th, fin_th, pd,
                octv.sigmas))
        xy_o, s_o, lvl_o, ok_o, val_o, sub_o = f(octv.blurs, octv.resps,
                                                 vh)
        # Baumberg over ALL views at once: views fold into the level
        # axis of one (V*(L+2), H, W) stack, per-keypoint levels index it
        V, L2, Ho, Wo = octv.blurs.shape
        stack = octv.blurs.reshape(V * L2, Ho, Wo)
        lvl_flat = (jnp.arange(V, dtype=jnp.int32)[:, None] * L2
                    + lvl_o - 1).reshape(-1)
        A_f, ok_f = baumberg_adapt(
            stack, lvl_flat, xy_o.reshape(-1, 2), s_o.reshape(-1),
            ok_o.reshape(-1), aff)
        per_oct.append(Regions(
            xy=xy_o * pd,
            A=A_f.reshape(V, baum_cap, 2, 2),
            s=s_o * pd,
            response=val_o,
            sub_type=sub_o,
            mask=ok_f.reshape(V, baum_cap),
        ))
    regs = concat_regions(per_oct)
    return apply_detection_mode(regs, p, caps.per_view, reg_number)
