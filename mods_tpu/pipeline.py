"""The two-view matching engine: escalation ladder driver.

Reference call stack (SURVEY.md §3.1, mods.cpp:229-415): per iteration,
SynthDetectDescribeKeypoints on both images (imagerepresentation.cpp:603),
MatchImgReps, DuplicateFiltering, geometric verification; stop when
verified matches >= minMatches.

TPU design: each (tilt, zoom) view group compiles to ONE fused program
(render -> detect -> orient -> describe -> reproject) batched over its
rotations; the host loop only concatenates fixed-shape outputs and makes
the escalation decision.  Matching + RANSAC run as a second compiled
program over fixed-capacity feature stores.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu import synthesis
from mods_tpu.config import (AffineShapeParams, CapacityParams,
                             DominantOrientationParams, IterationParams,
                             MatchParams, PyramidParams, RansacParams,
                             SIFTDescriptorParams)
from mods_tpu.descriptors.describe import extract_descriptor_patches
from mods_tpu.descriptors.orientation import detect_orientations, \
    rotate_shapes
from mods_tpu.descriptors.sift import compute_sift
from mods_tpu.detectors.hessaff import detect_affine_keypoints
from mods_tpu.matching.fginn import duplicate_filter, match_fginn
from mods_tpu.ops.image import round_up, to_gray
from mods_tpu.ops.warp import touches_border
from mods_tpu.ransac.homography import ransac_h
from mods_tpu.ransac.laf_check import K_SIGMA, h_laf_check
from mods_tpu.ransac import errors as E
from mods_tpu.timing import TimeLog

MIN_POINTS = 8  # matching.hpp MIN_POINTS


@dataclass(frozen=True)
class EngineConfig:
    pyramid: PyramidParams = PyramidParams()
    affine: AffineShapeParams = AffineShapeParams()
    dom_ori: DominantOrientationParams = DominantOrientationParams()
    sift: SIFTDescriptorParams = SIFTDescriptorParams(root_sift=True)
    match: MatchParams = MatchParams()
    ransac: RansacParams = RansacParams()
    caps: CapacityParams = CapacityParams()
    min_matches: int = 10
    max_steps: int = 7


@dataclass
class FeatureStore:
    """Host-side accumulated features of one image (original frame)."""
    xy: np.ndarray = None
    A: np.ndarray = None
    s: np.ndarray = None
    response: np.ndarray = None
    desc: np.ndarray = None

    def add(self, xy, A, s, response, desc, mask):
        m = np.asarray(mask)
        parts = [np.asarray(x)[m] for x in (xy, A, s, response, desc)]
        if self.xy is None:
            self.xy, self.A, self.s, self.response, self.desc = parts
        else:
            self.xy = np.concatenate([self.xy, parts[0]])
            self.A = np.concatenate([self.A, parts[1]])
            self.s = np.concatenate([self.s, parts[2]])
            self.response = np.concatenate([self.response, parts[3]])
            self.desc = np.concatenate([self.desc, parts[4]])

    @property
    def count(self) -> int:
        return 0 if self.xy is None else self.xy.shape[0]

    def padded(self, cap: int):
        """Fixed-capacity arrays + mask for the matcher."""
        n = min(self.count, cap)
        D = self.desc.shape[1] if self.count else 128
        xy = np.zeros((cap, 2), np.float32)
        A = np.zeros((cap, 2, 2), np.float32)
        s = np.zeros((cap,), np.float32)
        desc = np.zeros((cap, D), np.float32)
        mask = np.zeros((cap,), bool)
        if n:
            sel = slice(0, n)
            if self.count > cap:
                order = np.argsort(-np.abs(self.response))[:cap]
            else:
                order = np.arange(n)
            xy[sel] = self.xy[order]
            A[sel] = self.A[order]
            s[sel] = self.s[order]
            desc[sel] = self.desc[order]
            mask[sel] = True
        return xy, A, s, desc, mask


@functools.lru_cache(maxsize=64)
def _group_program(V: int, h0: int, w0: int, hr: int, wr: int, hc: int,
                   wc: int, sigma_x: float, sigma_y: float, sx: float,
                   sy: float, do_blur: bool, identity: bool,
                   cfg: EngineConfig):
    """Compile the fused per-group program.  Static: canvas geometry,
    blur sigmas, squash scales, config."""
    from mods_tpu.ops.gaussian import gaussian_blur
    from mods_tpu.ops.warp import affine_warp

    caps = cfg.caps
    P = cfg.sift.patch_extraction.patch_size
    M = caps.max_angles

    def program(img, rot_inv, valid_hw, hinv):
        # img: (h0, w0); rot_inv: (V, 2, 3); valid_hw: (V, 2) int32;
        # hinv: (V, 2, 3) affine synth->original maps
        if identity:
            views = jnp.full((V, hc, wc), 128.0, img.dtype)
            views = views.at[:, :h0, :w0].set(img[None])
        else:
            rots = jax.vmap(lambda m: affine_warp(
                img, m, hr, wr, fill=128.0))(rot_inv)
            if do_blur:
                rots = gaussian_blur(rots, sigma_x, sigma_y)
            squash_inv = jnp.asarray(
                [[1.0 / sx, 0.0, 0.0], [0.0, 1.0 / sy, 0.0]], jnp.float32)
            views = jax.vmap(lambda im: affine_warp(
                im, squash_inv, hc, wc, fill=128.0))(rots)

        regs = detect_affine_keypoints(
            views, valid_hw, cfg.pyramid, cfg.affine, caps)

        # orientation per view
        do = cfg.dom_ori
        def ori_one(view, r):
            return detect_orientations(
                view, r.xy, r.A, r.s, r.mask,
                do.patch_extraction.mr_size,
                do.patch_extraction.patch_size, M, do.threshold,
                half_sift=cfg.sift.half_sift)
        angles, amask = jax.vmap(ori_one)(views, regs)   # (V, K, M)
        if do.max_angles >= 0:
            keep_m = jnp.arange(M) < do.max_angles
            amask = amask & keep_m[None, None, :]
        Arot = jax.vmap(rotate_shapes)(regs.A, angles)   # (V, K, M, 2, 2)

        K = regs.capacity
        xy_f = jnp.repeat(regs.xy[:, :, None], M, 2).reshape(V, K * M, 2)
        A_f = Arot.reshape(V, K * M, 2, 2)
        s_f = jnp.repeat(regs.s[:, :, None], M, 2).reshape(V, K * M)
        r_f = jnp.repeat(regs.response[:, :, None], M, 2).reshape(V, K * M)
        m_f = amask.reshape(V, K * M)

        # reproject to original frame (ReprojectRegions,
        # synth-detection.cpp:543-616) and boundary-filter there
        lin = hinv[:, :, :2]                              # (V, 2, 2)
        xy_r = (jnp.einsum("vab,vkb->vka", lin, xy_f)
                + hinv[:, None, :, 2])
        A_r = jnp.einsum("vab,vkbc->vkac", lin, A_f)
        inside = ((xy_r[..., 0] > 0) & (xy_r[..., 0] < w0)
                  & (xy_r[..., 1] > 0) & (xy_r[..., 1] < h0))
        half = jnp.ceil(K_SIGMA * s_f / 2.0)
        tb = jax.vmap(lambda xyv, Av, hv: touches_border(
            w0, h0, xyv, Av, hv, hv))(xy_r, A_r, half)
        m_f = m_f & inside & ~tb

        # describe in the VIEW frame (DescribeRegions samples det_kp
        # coords from the synth image, imagerepresentation.cpp:1274-1985)
        pe = cfg.sift.patch_extraction
        def desc_one(view, xyv, Av, sv):
            patches = extract_descriptor_patches(
                view, xyv, Av, sv, pe.mr_size, pe.patch_size,
                photo_norm=pe.photo_norm)
            return compute_sift(patches, cfg.sift)
        desc = jax.lax.map(lambda t: desc_one(*t),
                           (views, xy_f, A_f, s_f))      # (V, K*M, D)

        D = desc.shape[-1]
        return (xy_r.reshape(-1, 2), A_r.reshape(-1, 2, 2),
                s_f.reshape(-1), r_f.reshape(-1),
                desc.reshape(-1, D), m_f.reshape(-1))

    return jax.jit(program)


@functools.lru_cache(maxsize=32)
def _match_program(cap: int, D: int, cfg: EngineConfig, use_f: bool):
    caps = cfg.caps

    def program(xy1, A1, s1, d1, m1, xy2, A2, s2, d2, m2,
                ratio_th, key):
        t = match_fginn(d1, m1, d2, m2, xy2, ratio_th,
                        cfg.match.contrad_dist, cfg.match.knn)
        txy1 = xy1
        txy2 = xy2[t.idx2]
        mode = cfg.match.duplicate_mode
        if mode == "fginn":
            prio = t.ratio
        elif mode == "distance":
            prio = t.d1
        elif mode == "bigger_region":
            prio = -s1
        else:
            prio = None
        keep = duplicate_filter(txy1, txy2, t.mask,
                                cfg.match.duplicate_dist, priority=prio)
        tmask = t.mask & keep
        n_tent = jnp.sum(tmask.astype(jnp.int32))
        H, inl, n_inl = ransac_h(txy1, txy2, tmask, cfg.ransac, key)
        # LAF check (matching.cpp:952-967)
        lafm = h_laf_check(
            H, txy1, A1, s1, txy2, A2[t.idx2], s2[t.idx2], inl,
            3.0 * cfg.ransac.h_laf_coef * cfg.ransac.err_threshold)
        n_laf = jnp.sum(lafm.astype(jnp.int32))
        enough = (n_tent >= MIN_POINTS) & (n_laf >= MIN_POINTS)
        final = jnp.where(enough, lafm, jnp.zeros_like(lafm))
        return dict(H=H, idx2=t.idx2, tent_mask=tmask, inlier_mask=final,
                    n_tent=n_tent, n_inl=jnp.sum(final.astype(jnp.int32)),
                    ratio=t.ratio)

    return jax.jit(program)


@dataclass
class MatchResult:
    H: np.ndarray
    xy1: np.ndarray
    xy2: np.ndarray
    n_matches: int
    n_tentatives: int
    steps_used: int
    log: TimeLog


class TwoViewMatcher:
    """The `mods` CLI equivalent: escalation-laddered two-view matching."""

    def __init__(self, ladder: list[IterationParams] | None = None,
                 cfg: EngineConfig = EngineConfig(), seed: int = 0):
        self.cfg = cfg
        self.ladder = ladder if ladder is not None else [IterationParams()]
        self.key = jax.random.PRNGKey(seed)

    def _process_image(self, img: np.ndarray, it: IterationParams,
                       prev_views: list, store: FeatureStore,
                       log: TimeLog):
        cfg = self.cfg
        h, w = img.shape
        views, prev_views = synthesis.expand_views(it, prev_views)
        plans = [synthesis.plan_view(v, w, h) for v in views]
        img_j = jnp.asarray(img)
        for group in synthesis.group_views(plans):
            p0 = group[0]
            V = len(group)
            if p0.identity:
                hr = wr = 0
                hc, wc = round_up(h, 128), round_up(w, 128)
                rot_inv = np.zeros((V, 2, 3), np.float32)
            else:
                hr = max(p.h_rot for p in group)
                wr = max(p.w_rot for p in group)
                hc = round_up(max(p.h_new for p in group), 128)
                wc = round_up(max(p.w_new for p in group), 128)
                rot_inv = []
                for p in group:
                    a, b, tx, c, d, ty = p.rot
                    det = a * d - b * c
                    ia, ib = d / det, -b / det
                    ic, id_ = -c / det, a / det
                    rot_inv.append([[ia, ib, -(ia * tx + ib * ty)],
                                    [ic, id_, -(ic * tx + id_ * ty)]])
                rot_inv = np.asarray(rot_inv, np.float32)
            valid_hw = np.asarray([[p.h_new, p.w_new] for p in group],
                                  np.int32)
            hinv = []
            for p in group:
                Hm = np.asarray(p.H, np.float64).reshape(3, 3)
                hinv.append(np.linalg.inv(Hm)[:2, :])
            hinv = np.asarray(hinv, np.float32)

            prog = _group_program(
                V, h, w, hr, wr, hc, wc, p0.sigma_x, p0.sigma_y,
                p0.tilt_scale[0], p0.tilt_scale[1], p0.view.do_blur,
                p0.identity, cfg)
            with log.phase("DetectTime"):
                out = prog(img_j, jnp.asarray(rot_inv),
                           jnp.asarray(valid_hw), jnp.asarray(hinv))
                out = jax.tree.map(
                    lambda x: x.block_until_ready(), out)
            store.add(*out)
        return prev_views

    def match(self, img1, img2) -> MatchResult:
        cfg = self.cfg
        log = TimeLog()
        g1 = np.asarray(to_gray(jnp.asarray(img1)))
        g2 = np.asarray(to_gray(jnp.asarray(img2)))
        store1, store2 = FeatureStore(), FeatureStore()
        prev1: list = []
        prev2: list = []
        best = None
        steps = 0
        for it in self.ladder[:cfg.max_steps]:
            steps += 1
            prev1 = self._process_image(g1, it, prev1, store1, log)
            prev2 = self._process_image(g2, it, prev2, store2, log)

            cap = cfg.caps.per_image
            xy1, A1, s1, d1, m1 = store1.padded(cap)
            xy2, A2, s2, d2, m2 = store2.padded(cap)
            D = d1.shape[1]
            prog = _match_program(cap, D, cfg, cfg.ransac.use_f)
            self.key, k = jax.random.split(self.key)
            ratio = it.fginn_threshold[0] if it.fginn_threshold else \
                cfg.match.ratio_threshold
            with log.phase("MatchingTime"):
                out = prog(*map(jnp.asarray,
                                (xy1, A1, s1, d1, m1,
                                 xy2, A2, s2, d2, m2)),
                           jnp.float32(ratio), k)
                out = jax.tree.map(lambda x: np.asarray(x), out)
            n_inl = int(out["n_inl"])
            if best is None or n_inl > best[0]:
                inl = out["inlier_mask"]
                best = (n_inl, MatchResult(
                    H=np.asarray(out["H"]),
                    xy1=xy1[inl], xy2=xy2[out["idx2"]][inl],
                    n_matches=n_inl, n_tentatives=int(out["n_tent"]),
                    steps_used=steps, log=log))
            if n_inl >= cfg.min_matches:
                break
        log.finalize()
        res = best[1]
        res.steps_used = steps
        return res
