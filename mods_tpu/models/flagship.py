"""The flagship compiled model: a fully-jittable two-view matching step.

One XLA program: detect (both images batched) -> orient -> describe ->
FGINN match -> LO-RANSAC.  This is the unit that scales over the device
mesh: the leading pair axis shards over ``pair``, descriptor tiles over
``kp`` (mods_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams
from mods_tpu.descriptors.describe import extract_descriptor_patches
from mods_tpu.descriptors.orientation import detect_orientations, \
    rotate_shapes
from mods_tpu.descriptors.sift import compute_sift
from mods_tpu.detectors.hessaff import detect_affine_keypoints
from mods_tpu.matching.fginn import duplicate_filter, match_fginn
from mods_tpu.pipeline import MIN_POINTS, EngineConfig
from mods_tpu.ransac.homography import ransac_h


def _features_one(img, cfg: EngineConfig):
    """(H, W) identity-view features, fully traced."""
    from mods_tpu.descriptors.describe import (DESC_MIP_LEVELS,
                                               extract_descriptor_patches_mip)
    from mods_tpu.ops.sampler import mip_stack
    h, w = img.shape
    caps = cfg.caps
    valid_hw = jnp.asarray([[h, w]], jnp.int32)
    regs = detect_affine_keypoints(
        img[None], valid_hw, cfg.pyramid, cfg.affine, caps)
    do = cfg.dom_ori
    M = caps.max_angles
    mips, mip_hw = mip_stack(img, DESC_MIP_LEVELS)
    angles, amask = detect_orientations(
        img, regs.xy[0], regs.A[0], regs.s[0], regs.mask[0],
        do.patch_extraction.mr_size, do.patch_extraction.patch_size,
        M, do.threshold, mip_src=(mips, mip_hw))
    Arot = rotate_shapes(regs.A[0], angles)        # (K, M, 2, 2)
    K = regs.capacity
    xy = jnp.repeat(regs.xy[0][:, None], M, 1).reshape(K * M, 2)
    A = Arot.reshape(K * M, 2, 2)
    s = jnp.repeat(regs.s[0][:, None], M, 1).reshape(K * M)
    m = amask.reshape(K * M)
    pe = cfg.sift.patch_extraction
    patches = extract_descriptor_patches_mip(
        mips, mip_hw, xy, A, s, pe.mr_size, pe.patch_size,
        photo_norm=pe.photo_norm)
    desc = compute_sift(patches, cfg.sift)
    return xy, A, s, desc, m


def two_view_step(img1: jax.Array, img2: jax.Array, key: jax.Array,
                  cfg: EngineConfig):
    """Single-rung (identity view) two-view match, one compiled program."""
    xy1, A1, s1, d1, m1 = _features_one(img1, cfg)
    xy2, A2, s2, d2, m2 = _features_one(img2, cfg)
    t = match_fginn(d1, m1, d2, m2, xy2, cfg.match.ratio_threshold,
                    cfg.match.contrad_dist, cfg.match.knn)
    txy2 = xy2[t.idx2]
    keep = duplicate_filter(xy1, txy2, t.mask, cfg.match.duplicate_dist)
    tmask = t.mask & keep
    H, inl, n_inl = ransac_h(xy1, txy2, tmask, cfg.ransac, key)
    ok = jnp.sum(tmask.astype(jnp.int32)) >= MIN_POINTS
    n_inl = jnp.where(ok, n_inl, 0)
    return dict(H=H, n_tentatives=jnp.sum(tmask.astype(jnp.int32)),
                n_inliers=n_inl)


def make_two_view_step(cfg: EngineConfig | None = None):
    if cfg is None:
        cfg = EngineConfig(
            caps=CapacityParams(per_octave=512, per_view=512,
                                per_image=1024, max_angles=2))
    return functools.partial(two_view_step, cfg=cfg)


def batched_pair_step(imgs1: jax.Array, imgs2: jax.Array, keys: jax.Array,
                      cfg: EngineConfig):
    """(P, H, W) x2 pair batch -> per-pair inlier counts; the mods_multi
    axis, vmapped so the ``pair`` mesh axis shards it."""
    return jax.vmap(lambda a, b, k: two_view_step(a, b, k, cfg))(
        imgs1, imgs2, keys)
