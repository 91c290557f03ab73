"""The two-view matching engine: escalation ladder driver.

Reference call stack (SURVEY.md §3.1, mods.cpp:229-415): per iteration,
SynthDetectDescribeKeypoints on both images (imagerepresentation.cpp:603),
MatchImgReps (correspondencebank.cpp:237), DuplicateFiltering, geometric
verification; stop when verified matches >= minMatches.

TPU design: per (tilt, zoom) view group, three compiled programs —
render (batched warps), detect (scale-space family; MSER runs native on
host), describe (orientation families + shared patch extraction + all
SIFT-variant normalizations) — all batched over the group's rotations.
Matching + verification run as compiled programs over fixed-capacity
per-descriptor feature stores, with tentative lists concatenated across
descriptors like the reference's CorrespondenceBank.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu import synthesis
from mods_tpu.config import (AffineShapeParams, BriskDetParams,
                             CapacityParams, CnnParams, DaisyParams,
                             DominantOrientationParams, FastParams,
                             FreakParams, IterationParams, LiopParams,
                             MatchParams, MatchPlan, MroghParams,
                             OrbParams, OrsaParams, PixelsParams,
                             PyramidParams, RansacParams, Rung,
                             SIFTDescriptorParams, SsimParams,
                             StarParams, SurfDetParams, as_rungs, replace)
from mods_tpu.descriptors.describe import (extract_descriptor_patches,
                                           image_to_patch_scale)
from mods_tpu.descriptors.orientation import detect_orientations, \
    rotate_shapes
from mods_tpu.descriptors.registry import (DescriptorSpec, get_spec,
                                           spec_for)
from mods_tpu.descriptors.sift import sift_histograms, sift_norm
from mods_tpu.detectors.hessaff import detect_affine_keypoints
from mods_tpu.matching.fginn import duplicate_filter, match_fginn
from mods_tpu.ops.image import round_up, to_gray
from mods_tpu.ops.warp import touches_border
from mods_tpu.ransac.fundamental import ransac_f
from mods_tpu.ransac.homography import ransac_h
from mods_tpu.ransac.laf_check import K_SIGMA, f_laf_check, h_laf_check
from mods_tpu.timing import TimeLog

MIN_POINTS = 8  # matching.hpp MIN_POINTS

# Border-rejection band cap as a fraction of the original image extent:
# the reprojection filter (ReprojectRegions, synth-detection.cpp:567-580)
# stays bit-identical to the reference whenever region supports are below
# this fraction of the image (always true on benchmark-sized images) but
# degrades gracefully on tiny images instead of rejecting everything —
# our samplers replicate-clamp reads, so straddling regions are defined.
BORDER_CLAMP_FRAC = 0.2


@dataclass(frozen=True)
class MserParams:
    """reference [MSER] config section (io_mods.cpp).

    backend selects the implementation: "device" = the batched TPU
    level-sweep (detectors/mser_tpu.py — fuses into the group program,
    no host round trips), "host" = the native union-find component tree
    (native/mser.cpp over host-rendered views — the bit-faithful-margin
    twin)."""
    min_size: int = 30
    max_area: float = 0.05
    min_margin: int = 8
    # "host" (the default) is the reference-faithful native component
    # tree; "device" is an opt-in experimental level-sweep that trades
    # exactness for staying on the TPU (it quantizes levels and is NOT
    # at parity on real textures — see tests/test_mser.py).
    backend: str = "host"
    levels: int = 32
    passes: int = 3
    # padded host-slab rows per view: real MSER yields <= ~300 regions
    # per view on benchmark images; 512 keeps the per-pair host->device
    # slab upload and the describe-stage slab width 4x smaller than the
    # generic per_view cap
    host_cap: int = 512


@dataclass(frozen=True)
class ExternalCmdParams:
    """Generic external-process detector/descriptor — the TPU-native
    counterpart of the reference's external-binary branches
    (imagerepresentation.cpp:747-1026 detectors via system();
    descriptors/bicedescriptor.hpp + dispatch imagerepresentation.cpp:
    1610 for the BICE descriptor).  ``command`` is a shell template with
    {img} and {out} placeholders, run per synthesized view
    (host-rendered PNG in, keypoint file out), the output parsed as
    Oxford ellipses or x/y/scale KP rows, and the regions described on
    device like any host-stage detector.

    ``desc_command`` is the DESCRIPTOR counterpart (the BICE pattern:
    image + keypoint list in, descriptor rows out): a template with
    {img}, {pts} ("x y s" rows of this view's detections) and {out};
    it must write one whitespace-separated row per input point, in
    order: ``x y v0 .. v{desc_dim-1}`` (the reference instead re-matches
    rows to points by coordinates within 0.5 px,
    bicedescriptor.hpp:123-141 — an in-order contract is equivalent and
    simpler for a plugin).  Enabled by listing descriptor "External" in
    the rung; requires detector "External"."""
    command: str = ""
    format: str = "oxford"       # "oxford" | "kp"
    cap: int = 512               # padded keypoint rows per view
    desc_command: str = ""
    desc_dim: int = 128


@dataclass(frozen=True)
class EngineConfig:
    pyramid: PyramidParams = PyramidParams()           # HessianAffine
    pyramid_dog: PyramidParams = PyramidParams(
        detector_type="DoG", threshold=8.0)
    pyramid_harris: PyramidParams = PyramidParams(
        detector_type="Harris", threshold=15.0)
    mser: MserParams = MserParams()
    affine: AffineShapeParams = AffineShapeParams()
    dom_ori: DominantOrientationParams = DominantOrientationParams(
        max_angles=1)
    sift: SIFTDescriptorParams = SIFTDescriptorParams(root_sift=True)
    match: MatchParams = MatchParams()
    ransac: RansacParams = RansacParams()
    orsa: OrsaParams = OrsaParams()
    caps: CapacityParams = CapacityParams()
    min_matches: int = 10
    max_steps: int = 7
    surf_threshold: float = 0.0004   # OpenSURF `thresh` default
    kaze_threshold: float = 0.001    # AKAZE `dthreshold` default
    tilde_filters: str = ""          # path to a TILDE filter file
    # per-detector/per-descriptor INI sections (io_mods.cpp:104-652)
    orb: OrbParams = OrbParams()
    fast: FastParams = FastParams()
    star: StarParams = StarParams()
    surf_det: SurfDetParams = SurfDetParams()
    brisk: BriskDetParams = BriskDetParams()
    freak: FreakParams = FreakParams()
    daisy: DaisyParams = DaisyParams()
    liop: LiopParams = LiopParams()
    ssim: SsimParams = SsimParams()
    mrogh: MroghParams = MroghParams()
    pixels: PixelsParams = PixelsParams()
    cnn: CnnParams = CnnParams()
    external: ExternalCmdParams = ExternalCmdParams()
    # GR_TRUTH | LORANSACH | LORANSACF | ORSA (mods.cpp:310-371); empty
    # string defers to ransac.use_f for backward compatibility.
    ver_type: str = ""
    # photometric normalization before matching (mods.cpp:139-189)
    do_clahe: bool = False
    # GR_TRUTH dual mode: additionally run RANSAC and GT-check its
    # output (doBothRANSACgroundTruth, mods.cpp:320-334)
    do_both_ransac_gt: bool = False
    # tentative-bank drops at given steps — mods.cpp:288-289 hardcodes
    # ClearCorrespondences("ORB","ORB") at step 2 of the CVIU ladder.
    clear_tentatives: tuple = ((2, "ORB", "ORB"),)

    def pyramid_for(self, detector: str) -> PyramidParams:
        return {"HessianAffine": self.pyramid,
                "DoG": self.pyramid_dog,
                "HarrisAffine": self.pyramid_harris}[detector]


def autosize_caps(cfg: EngineConfig) -> EngineConfig:
    """Derive the static TPU capacities from the INI's region-number
    modes (scale-space-detector.hpp:127-198 semantics): a ladder running
    FixedRegNumber/NotLessThanRegions with N regions per view needs
    per-view/per-group/per-image slabs sized to N, not to the defaults
    measured on FixedTh workloads (VERDICT r4 item 8 — the WxBS configs
    use FixedRegNumber=3000 vs the 768-row default).  Ratios follow the
    measured WxBS-parity sizing (per_group ~1.05N, per_image ~2.75N)."""
    from mods_tpu.config import DetectionMode

    def want(p: PyramidParams) -> int:
        if p.detector_mode in (DetectionMode.FIXED_REG_NUMBER,
                               DetectionMode.NOT_LESS_THAN_REGIONS):
            return max(p.reg_number, 0)
        return 0

    n = max(want(cfg.pyramid), want(cfg.pyramid_dog),
            want(cfg.pyramid_harris))
    if n <= 0 or n <= cfg.caps.per_group:
        return cfg

    def rnd(x, m):
        return -(-int(x) // m) * m

    caps = replace(
        cfg.caps,
        per_view=max(cfg.caps.per_view, rnd(n, 256)),
        per_group=max(cfg.caps.per_group, rnd(1.05 * n, 256)),
        per_image=max(cfg.caps.per_image, rnd(2.75 * n, 1024)))
    return replace(cfg, caps=caps)


@dataclass
class FeatureStore:
    """Host-side accumulated features of one image for ONE descriptor
    (original/reprojected frame)."""
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

    def padded(self, cap: int, dim: int):
        n = min(self.count, cap)
        xy = np.zeros((cap, 2), np.float32)
        A = np.zeros((cap, 2, 2), np.float32)
        s = np.zeros((cap,), np.float32)
        desc = np.zeros((cap, dim), np.float32)
        mask = np.zeros((cap,), bool)
        if n:
            if self.count > cap:
                order = np.argsort(-np.abs(self.response))[:cap]
            else:
                order = np.arange(n)
            xy[:n] = self.xy[order]
            A[:n] = self.A[order]
            s[:n] = self.s[order]
            desc[:n] = self.desc[order]
            mask[:n] = True
        return xy, A, s, desc, mask


class DeviceStore:
    """Device-resident fixed-capacity feature store of one image for one
    (detector, descriptor) — the TPU redesign of the reference's
    ImageRepresentation slot (imagerepresentation.h:66).  Appends happen
    INSIDE the fused group programs (the store buffers ride along as
    donated inputs/outputs); nothing crosses to the host until a
    consumer explicitly asks (``.xy``/``.count`` properties)."""

    def __init__(self, cap: int, dim: int):
        self.cap = cap
        self.dim = dim
        self._xy = jnp.zeros((cap, 2), jnp.float32)
        self._A = jnp.zeros((cap, 2, 2), jnp.float32)
        self._s = jnp.zeros((cap,), jnp.float32)
        self._r = jnp.zeros((cap,), jnp.float32)
        self._d = jnp.zeros((cap, dim), jnp.float32)
        self._n = jnp.zeros((), jnp.int32)

    def buffers(self):
        """(xy, A, s, r, d, count) — the fold-in append layout."""
        return (self._xy, self._A, self._s, self._r, self._d, self._n)

    def set_buffers(self, bufs) -> None:
        (self._xy, self._A, self._s, self._r, self._d, self._n) = bufs

    def reset(self) -> None:
        """New pair: rewind the count.  Buffer contents past the count
        are never read (every consumer masks by the count prefix), so
        the slabs themselves are reused without reallocation."""
        self._n = jnp.zeros((), jnp.int32)

    def device_arrays(self):
        """(xy, A, s, desc, count) — all on device."""
        return self._xy, self._A, self._s, self._d, self._n

    # host views (CLI export paths and tests only — these synchronize)
    @property
    def count(self) -> int:
        # block ALL buffers before the scalar read: a partial read of a
        # program's outputs degrades the tunnel session permanently
        jax.block_until_ready(self.buffers())
        return int(self._n)

    @property
    def xy(self):
        return np.asarray(self._xy)[: self.count]

    @property
    def A(self):
        return np.asarray(self._A)[: self.count]

    @property
    def s(self):
        return np.asarray(self._s)[: self.count]

    @property
    def response(self):
        return np.asarray(self._r)[: self.count]

    @property
    def desc(self):
        return np.asarray(self._d)[: self.count]


# --------------------------------------------------------------------------
# compiled per-group programs

def _make_render_fn(V: int, h0: int, w0: int, hr: int, wr: int, hc: int,
                    wc: int, do_blur: bool, identity: bool):
    """Batched view-group renderer.  The per-group geometry (rotation
    maps, anti-alias sigmas, squash scales) arrives as RUNTIME inputs so
    one compiled program serves every group with the same bucketed
    (V, canvas) shape — the compiled-program count is what the remote
    TPU compile service cannot absorb, not the FLOPs."""
    from mods_tpu.ops.gaussian import gaussian_blur_rt
    from mods_tpu.ops.warp import separable_scale, shear_rotate

    def clamp_pad(view, vhw):
        # replicate the last valid row/col into the bucketed-canvas pad:
        # a constant-fill pad would manufacture a strong artificial edge
        # at the valid boundary and spawn hundreds of junk detections
        # per tilt view (the reference's canvas ends exactly at the view
        # extent, so its blur sees replicated true edges there)
        vh = jnp.maximum(vhw[0], 1)
        vw = jnp.maximum(vhw[1], 1)
        rows = jnp.minimum(jnp.arange(hc), vh - 1)
        cols = jnp.minimum(jnp.arange(wc), vw - 1)
        return view[rows][:, cols]

    def render(img, rot_inv, squash_inv, sig_x, sig_y, valid_hw):
        if identity:
            views = jnp.full((V, hc, wc), 128.0, img.dtype)
            views = views.at[:, :h0, :w0].set(img[None])
        else:
            # rotation as 3 shears (contiguous dynamic slices) and the
            # tilt squash as a separable axis-aligned resample — the
            # 4-plane bilinear gather warp ran at ~124M gathers/s and
            # was the single largest cost of the pipeline (op_bench r4)
            rots = jax.vmap(lambda m: shear_rotate(img, m, hr, wr))(
                rot_inv)
            if do_blur:
                rots = gaussian_blur_rt(rots, sig_x, sig_y)
            views = jax.vmap(lambda im: separable_scale(
                im, squash_inv[0, 0], squash_inv[1, 1], hc, wc))(rots)
        return jax.vmap(clamp_pad)(views, valid_hw)

    return render


@functools.lru_cache(maxsize=128)
def _render_program(V: int, h0: int, w0: int, hr: int, wr: int, hc: int,
                    wc: int, do_blur: bool, identity: bool):
    return jax.jit(_make_render_fn(V, h0, w0, hr, wr, hc, wc, do_blur,
                                   identity))


@functools.lru_cache(maxsize=128)
def _split_detect_program(V: int, hc: int, wc: int, det: str,
                          cfg: "EngineConfig"):
    """Standalone detection program for the split (sync_timing) path —
    jits the SAME traced dispatch as the fused path (_make_detect_fn),
    so both paths honor identical configured thresholds."""
    return jax.jit(_make_detect_fn(det, cfg))


def _make_desc_fn(V: int, hc: int, wc: int, h0: int, w0: int, K: int,
                  specs: tuple, dom_ori: DominantOrientationParams,
                  pe_mr: float, pe_patch: int, pe_photo: bool,
                  caps: CapacityParams):
    """views + Regions(V, K) + hinv -> per-descriptor COMPACTED regions
    ready for DeviceStore.append.

    TPU structure: detections are compacted ACROSS the whole view group
    to C=caps.per_group rows (with a per-row source-view index) BEFORE
    any patch work, so orientation + description each process C rows
    total instead of V*K padded rows — detections are sparse in the
    padded (V, K) slabs and patch extraction is the pipeline's dominant
    compute.  Orientation families (SIFT-like vs HalfSIFT-like,
    imagerepresentation.cpp:1253-1269) share one gradient histogram and
    differ only in peak folding; SIFT variants share patches and
    histograms and differ only in folding/normalization
    (siftdesc.cpp operator())."""
    specs = tuple(get_spec(s) for s in specs)
    M = caps.max_angles
    # self-limiting compaction rows: never wider than the input slabs
    C1 = min(caps.per_group, V * K)          # detection-stage rows
    C2 = min(caps.per_group, C1 * M)         # descriptor-stage rows

    def fam_key(sp):
        if sp.kind in ("binary", "external"):
            # detected frames used directly, no dominant orientation
            return "none"
        return "half" if sp.half_sift_like else "sift"

    families = sorted({fam_key(sp) for sp in specs})

    def program(views, valid_hw, regs_xy, regs_A, regs_s, regs_resp,
                regs_mask, hinv, stores, *extra):
        # extra = (ext_desc,) — host-computed external descriptor slab
        # (V, K, dim) — iff any spec has kind "external"
        from mods_tpu.descriptors.describe import (DESC_MIP_LEVELS,
                                                   aa_filter_patches)
        from mods_tpu.descriptors.orientation import (find_peaks,
                                                      orientation_histograms,
                                                      smooth_circular)
        from mods_tpu.descriptors.sift import sift_histograms, sift_norm
        from mods_tpu.ops.sampler import (mip_stack, sample_affine_patches,
                                          select_level)
        L = DESC_MIP_LEVELS
        mips_v, mip_hw = jax.vmap(lambda v: mip_stack(v, L))(views)
        Hp, Wp = mips_v.shape[-2:]
        src = mips_v.reshape(V * L, Hp, Wp)
        hw_flat = mip_hw.reshape(V * L, 2)

        # stage 1: compact detections across views (bucket-padded views
        # carry valid_hw == 0 and are dropped here)
        view_ok = valid_hw[:, 0] > 0
        mask0 = regs_mask.reshape(V, K) & view_ok[:, None]
        flat0 = mask0.reshape(-1)
        n1 = jnp.sum(flat0.astype(jnp.int32))
        idx1 = jnp.nonzero(flat0, size=C1, fill_value=flat0.shape[0])[0]
        ok1 = jnp.arange(C1) < jnp.minimum(n1, C1)
        vidx = jnp.minimum(idx1 // K, V - 1).astype(jnp.int32)

        def take1(a):
            flat = a.reshape((V * K,) + a.shape[2:])
            return jnp.take(flat, idx1, axis=0, mode="fill", fill_value=0)

        xy1 = take1(regs_xy)
        A1 = take1(regs_A)
        s1 = take1(regs_s)
        r1 = take1(regs_resp)
        hv = hinv[vidx]                             # (C, 2, 3)
        lin = hv[:, :, :2]
        xy_r1 = (jnp.einsum("cab,cb->ca", lin, xy1) + hv[:, :, 2])
        inside1 = ((xy_r1[:, 0] > 0) & (xy_r1[:, 0] < w0)
                   & (xy_r1[:, 1] > 0) & (xy_r1[:, 1] < h0))

        # shared orientation histogram (families differ only in folding)
        o_pe = dom_ori.patch_extraction
        P_o = o_pe.patch_size
        need_ori = any(f != "none" for f in families)
        if need_ori:
            patch_image_size = 2 * int(o_pe.mr_size) + 1
            img_to_patch = patch_image_size / P_o
            # The reference additionally drops regions whose orientation
            # support leaves the *view* (DetectOrientation's
            # interpolateCheckBorders, synth-detection.cpp:877-886) —
            # required there because `interpolate` reads raw memory.  Our
            # canvases are replicate-padded and the patch sampler clamps
            # reads, so sampling past the valid extent is well-defined;
            # the reprojection filter against the ORIGINAL image below
            # (the reference's ReprojectRegions, synth-detection.cpp:
            # 567-580) is the semantic gate and is nearly equivalent:
            # view support maps to original support through the same H.
            ok_o = ok1
            As_o = A1 * (img_to_patch * s1)[:, None, None]
            lvl_o, sc_o = select_level(As_o, P_o, L)
            patches_o = sample_affine_patches(
                src, vidx * L + lvl_o, xy1 / sc_o[:, None],
                As_o / sc_o[:, None, None], P_o, hw_flat)
            hist_o = smooth_circular(orientation_histograms(patches_o))

        def stage2(fam):
            """-> compacted descriptor-stage rows for one family."""
            if fam == "none":
                # non-SIFT-like path: detected regions used directly
                # (imagerepresentation.cpp:1299-1302); compact to the
                # front so DeviceStore.append's count-prefix holds
                A_r = jnp.einsum("cab,cbd->cad", lin, A1)
                half = jnp.ceil(K_SIGMA * s1 / 2.0)
                tb = touches_border(float(w0), float(h0), xy_r1, A_r,
                                    half, half,
                                    clamp_frac=BORDER_CLAMP_FRAC)
                m2 = ok1 & inside1 & ~tb
                n2 = jnp.minimum(jnp.sum(m2.astype(jnp.int32)), C1)
                idx2 = jnp.nonzero(m2, size=C1, fill_value=C1)[0]

                def takeN(a):
                    return jnp.take(a, idx2, axis=0, mode="fill",
                                    fill_value=0)
                ok2 = jnp.arange(C1) < n2
                return (takeN(xy1), takeN(A1), takeN(s1), takeN(r1),
                        jnp.minimum(takeN(vidx), V - 1), takeN(xy_r1),
                        takeN(A_r), ok2, n2,
                        jnp.minimum(idx2, C1 - 1))
            angles, pmask = find_peaks(
                hist_o, M, dom_ori.threshold,
                half_sift=(fam == "half" or dom_ori.half_sift_mode))
            amask = pmask & ok_o[:, None]
            if dom_ori.max_angles >= 0:
                amask = amask & (jnp.arange(M) < dom_ori.max_angles)[None]
            if dom_ori.add_up_right:
                # keep one un-rotated copy of every region in the last
                # angle slot (addUpRight, synth-detection.cpp:913-915)
                angles = angles.at[:, M - 1].set(0.0)
                amask = amask.at[:, M - 1].set(ok1)
            Arot = rotate_shapes(A1, angles)        # (C1, M, 2, 2)
            A_rf = jnp.einsum("cab,cmbd->cmad", lin, Arot)
            half = jnp.ceil(K_SIGMA * s1 / 2.0)
            tb = touches_border(
                float(w0), float(h0),
                jnp.broadcast_to(xy_r1[:, None], (C1, M, 2)), A_rf,
                half[:, None], half[:, None],
                clamp_frac=BORDER_CLAMP_FRAC)
            m_f = amask & inside1[:, None] & ~tb    # (C1, M)
            flat2 = m_f.reshape(-1)
            n2 = jnp.sum(flat2.astype(jnp.int32))
            idx2 = jnp.nonzero(flat2, size=C2,
                               fill_value=flat2.shape[0])[0]
            row = jnp.minimum(idx2 // M, C1 - 1)
            ok2 = jnp.arange(C2) < jnp.minimum(n2, C2)

            def takeA(a):   # (C1, M, ...) -> (C2, ...)
                flat = a.reshape((C1 * M,) + a.shape[2:])
                return jnp.take(flat, idx2, axis=0, mode="fill",
                                fill_value=0)

            return (xy1[row], takeA(Arot), s1[row], r1[row], vidx[row],
                    xy_r1[row], takeA(A_rf),
                    ok2, jnp.minimum(n2, C2), row)

        out = {}
        base = SIFTDescriptorParams()  # raw histogram params
        for fam in families:
            fam_specs = [sp for sp in specs if fam_key(sp) == fam]
            (xyv, Av, sv, rv, vi, xy_r, A_r, m2, n2,
             src_idx) = stage2(fam)

            need_hist = any(sp.kind == "sift" for sp in fam_specs)
            need_pix = any(sp.kind == "pixels" for sp in fam_specs)
            need_bin = any(sp.kind == "binary" for sp in fam_specs)
            need_patch = any(sp.kind == "patch" for sp in fam_specs)
            need_cnn = any(sp.kind == "cnn" for sp in fam_specs)
            need_ext = any(sp.kind == "external" for sp in fam_specs)

            def desc_patches(scale_coef=1.0):
                t = image_to_patch_scale(sv * scale_coef, pe_mr, pe_patch)
                As = Av * t[:, None, None]
                lvl, sc = select_level(As, pe_patch, L)
                raw = sample_affine_patches(
                    src, vi * L + lvl, xyv / sc[:, None],
                    As / sc[:, None, None], pe_patch, hw_flat)
                return aa_filter_patches(raw, lvl, t, photo_norm=pe_photo)

            res = {}
            if need_ext:
                # host-computed rows (BICE semantics: one descriptor per
                # detected region, no re-orientation) ride through the
                # same compaction chain as the region geometry
                ed1 = take1(extra[0])              # (C1, dim)
                for sp in fam_specs:
                    if sp.kind == "external":
                        res[sp.name] = jnp.take(ed1, src_idx, axis=0,
                                                mode="clip")
            if need_bin:
                from mods_tpu.detectors.orb import brief_from_patches
                bscale = (sv * 5.1962 / 31.0)[:, None, None]
                As_b = Av * bscale
                lvl_b, sc_b = select_level(As_b, 31, L)
                p31 = sample_affine_patches(
                    src, vi * L + lvl_b, xyv / sc_b[:, None],
                    As_b / sc_b[:, None, None], 31, hw_flat)
                bits = brief_from_patches(p31)
                for sp in fam_specs:
                    if sp.kind == "binary":
                        res[sp.name] = bits
            if need_cnn:
                # CNN slot: own patch geometry (CaffeDescParam.mrSize/
                # patchSize), batched conv forward on the MXU
                from mods_tpu.descriptors.cnn import (cnn_forward,
                                                      weights_for)
                for sp in fam_specs:
                    if sp.kind != "cnn":
                        continue
                    pp = dict(sp.params) or dict(
                        weights_file="", patch_size=32, mr_size=12.0,
                        normalization="L2")
                    Pc = int(pp["patch_size"])
                    tc = image_to_patch_scale(sv, float(pp["mr_size"]),
                                              Pc)
                    As_c = Av * tc[:, None, None]
                    lvl_c, sc_c = select_level(As_c, Pc, L)
                    pc = sample_affine_patches(
                        src, vi * L + lvl_c, xyv / sc_c[:, None],
                        As_c / sc_c[:, None, None], Pc, hw_flat)
                    res[sp.name] = cnn_forward(
                        pc, weights_for(pp["weights_file"], Pc, sp.dim),
                        pp["normalization"])
            if need_hist or need_pix or need_patch:
                patches = desc_patches()
                if need_patch:
                    from mods_tpu.descriptors.patch_descs import PATCH_FNS
                    for sp in fam_specs:
                        if sp.kind == "patch":
                            res[sp.name] = PATCH_FNS[sp.name](
                                patches, **dict(sp.params))
                if need_hist:
                    hist = sift_histograms(patches, base)
                    for sp in fam_specs:
                        if sp.kind != "sift":
                            continue
                        h = hist
                        if sp.dsp_levels > 0:
                            # DSP-SIFT: pool histograms over region
                            # scales (imagerepresentation.cpp:1547-1598)
                            coefs = np.linspace(0.5, 1.5, sp.dsp_levels)
                            for c in coefs:
                                if abs(c - 1.0) < 1e-6:
                                    continue
                                h = h + sift_histograms(
                                    desc_patches(float(c)), base)
                        p = sp.sift
                        if p.half_sift:
                            ob = p.orientation_bins
                            hh = h[..., :ob // 2] + h[..., ob // 2:]
                        else:
                            hh = h
                        v = hh.reshape(hh.shape[0], -1)
                        if p.do_norm:
                            v = sift_norm(v, p.max_bin_value, p.root_sift)
                        res[sp.name] = v
                if need_pix:
                    flat = patches.reshape(patches.shape[0], -1)
                    pix_sp = next(sp for sp in fam_specs
                                  if sp.kind == "pixels")
                    if dict(pix_sp.params).get("norm_type") == "L1":
                        nrm = jnp.sum(jnp.abs(flat), -1, keepdims=True)
                    else:
                        nrm = jnp.sqrt(jnp.sum(flat * flat, -1,
                                               keepdims=True))
                    res["Pixels"] = flat / jnp.maximum(nrm, 1e-6)

            for sp in fam_specs:
                out[sp.name] = (xy_r, A_r, sv, rv, res[sp.name], n2)

        # APPEND FOLDED IN: scatter each spec's compacted rows into its
        # (donated) fixed-capacity store buffers at offset count — the
        # standalone _append_program dispatch per (spec, group) was 30 ms
        # of pure tunnel overhead x 40 calls/pair (PROFILE_ladder.json).
        new_stores = []
        for i, sp in enumerate(specs):
            xyv, Av_, sv_, rv_, dv_, n2 = out[sp.name]
            bxy, bA, bs, br, bd, cnt = stores[i]
            C = xyv.shape[0]
            cap = bxy.shape[0]
            pos = cnt + jnp.arange(C, dtype=jnp.int32)
            pos = jnp.where((jnp.arange(C) < n2) & (pos < cap), pos, cap)
            new_stores.append((
                bxy.at[pos].set(xyv, mode="drop"),
                bA.at[pos].set(Av_, mode="drop"),
                bs.at[pos].set(sv_, mode="drop"),
                br.at[pos].set(rv_, mode="drop"),
                bd.at[pos].set(dv_, mode="drop"),
                jnp.minimum(cnt + n2, cap)))
        return tuple(new_stores)

    return program


@functools.lru_cache(maxsize=128)
def _desc_program(V: int, hc: int, wc: int, h0: int, w0: int, K: int,
                  specs: tuple, dom_ori: DominantOrientationParams,
                  pe_mr: float, pe_patch: int, pe_photo: bool,
                  caps: CapacityParams):
    return jax.jit(_make_desc_fn(V, hc, wc, h0, w0, K, specs, dom_ori,
                                 pe_mr, pe_patch, pe_photo, caps),
                   donate_argnums=(8,))


# detectors that run fully on device (the rest — MSER, ReadAffs — need a
# host stage and use the split render/detect/describe path)
DEVICE_DETECTORS = ("HessianAffine", "DoG", "HarrisAffine", "ORB", "SURF",
                    "KAZE", "TILDE", "FAST", "STAR", "BRISK")


def _make_detect_fn(det: str, cfg: EngineConfig):
    """Traced detection dispatch (the reference's 20-way if-else,
    imagerepresentation.cpp:717-1224) for device-resident detectors."""
    caps = cfg.caps
    if det in ("HessianAffine", "DoG", "HarrisAffine"):
        pyr = cfg.pyramid_for(det)
        aff = cfg.affine
        return lambda v, hw, rn: detect_affine_keypoints(v, hw, pyr, aff,
                                                         caps, rn)
    if det == "ORB":
        from mods_tpu.detectors.orb import detect_orb
        o = cfg.orb
        return lambda v, hw, rn: detect_orb(
            v, hw, caps, n_features=o.nfeatures,
            scale_factor=o.scale_factor, n_levels=o.nlevels,
            edge_threshold=o.edge_threshold,
            fast_threshold=o.fast_threshold)
    if det == "BRISK":
        # BRISK's AGAST pyramid as multi-scale FAST (cv::BRISK octaves)
        from mods_tpu.detectors.orb import detect_orb
        b = cfg.brisk
        return lambda v, hw, rn: detect_orb(
            v, hw, caps, n_levels=max(b.octaves, 1) * 2,
            scale_factor=1.4142135, fast_threshold=float(b.thresh))
    if det == "SURF":
        from mods_tpu.detectors.surf import detect_surf
        thr = cfg.surf_threshold
        oc = cfg.surf_det.octaves
        return lambda v, hw, rn: detect_surf(v, hw, caps, thr,
                                             n_octaves=oc)
    if det == "KAZE":
        from mods_tpu.detectors.kaze import detect_kaze
        thr = cfg.kaze_threshold
        return lambda v, hw, rn: detect_kaze(v, hw, caps, thr)
    if det == "TILDE":
        from mods_tpu.detectors.tilde import (detect_tilde,
                                              load_tilde_filters,
                                              procedural_filters)
        filters = (load_tilde_filters(cfg.tilde_filters)[:2]
                   if cfg.tilde_filters else procedural_filters())
        return lambda v, hw, rn: detect_tilde(v, hw, caps, filters)
    if det == "STAR":
        from mods_tpu.detectors.corners import detect_star
        # OpenCV responseThreshold (default 30) is on a ~7x-scaled
        # kernel sum; mean-difference units are ~responseThreshold/7.5
        thr = cfg.star.response_threshold / 7.5
        return lambda v, hw, rn: detect_star(v, hw, caps, thr)
    if det == "FAST":
        from mods_tpu.detectors.corners import detect_fast
        thr = cfg.fast.threshold
        return lambda v, hw, rn: detect_fast(v, hw, caps, thr)
    if det == "MSER":
        from mods_tpu.detectors.mser_tpu import detect_mser_tpu
        mp = cfg.mser
        return lambda v, hw, rn: detect_mser_tpu(
            v, hw, caps, min_size=mp.min_size, max_area=mp.max_area,
            min_margin=mp.min_margin, levels=mp.levels, passes=mp.passes)
    raise KeyError(det)


@functools.lru_cache(maxsize=256)
def _fused_group_program(V: int, h0: int, w0: int, hr: int, wr: int,
                         hc: int, wc: int, do_blur: bool,
                         identity: bool, det: str, specs: tuple,
                         cfg: EngineConfig):
    """render -> detect -> orient -> describe -> compact, ONE XLA program
    per view group: the whole hot path of a rung stays on device with a
    single dispatch (SURVEY.md §7.1 'each rung a jit-able program').
    Per-group geometry (rotations, sigmas, squash) is runtime input —
    the program is keyed only by the BUCKETED (V, canvas) shape."""
    render = _make_render_fn(V, h0, w0, hr, wr, hc, wc, do_blur, identity)
    detect = _make_detect_fn(det, cfg)
    pe = cfg.sift.patch_extraction
    desc = _make_desc_fn(V, hc, wc, h0, w0, cfg.caps.per_view, specs,
                         cfg.dom_ori, pe.mr_size, pe.patch_size,
                         pe.photo_norm, cfg.caps)

    def program(img, rot_inv, squash_inv, sig_x, sig_y, valid_hw, regn,
                hinv, stores):
        views = render(img, rot_inv, squash_inv, sig_x, sig_y, valid_hw)
        # materialization fence: the rendered views feed dozens of
        # consumers (pyramid levels, samplers); without it XLA may fuse
        # the shear-warp gathers into each consumer and recompute them
        views = jax.lax.optimization_barrier(views)
        regs = detect(views, valid_hw, regn)
        return desc(views, valid_hw, regs.xy, regs.A, regs.s,
                    regs.response, regs.mask, hinv, stores)

    # the store buffers are donated: each group's dispatch scatters its
    # regions in place and hands the buffers to the next group
    return jax.jit(program, donate_argnums=(8,))


@functools.lru_cache(maxsize=128)
def _fused_hostdet_program(V: int, h0: int, w0: int, hr: int, wr: int,
                           hc: int, wc: int, do_blur: bool,
                           identity: bool, K: int,
                           specs: tuple, cfg: EngineConfig):
    """render -> orient -> describe -> compact for HOST-stage detectors
    (MSER, ReadAffs): keypoints are found on the host (native MSER over
    host-rendered views, native/render.cpp), and only the compact
    keypoint arrays cross to the device; the device re-renders the views
    itself for patch description.  Full images/views never cross the
    host<->device link in either direction."""
    render = _make_render_fn(V, h0, w0, hr, wr, hc, wc, do_blur, identity)
    pe = cfg.sift.patch_extraction
    desc = _make_desc_fn(V, hc, wc, h0, w0, K, specs, cfg.dom_ori,
                         pe.mr_size, pe.patch_size, pe.photo_norm,
                         cfg.caps)

    def program(img, rot_inv, squash_inv, sig_x, sig_y, valid_hw,
                regs_xy, regs_A, regs_s, regs_resp, regs_mask, hinv,
                stores, *extra):
        views = render(img, rot_inv, squash_inv, sig_x, sig_y, valid_hw)
        views = jax.lax.optimization_barrier(views)
        return desc(views, valid_hw, regs_xy, regs_A, regs_s, regs_resp,
                    regs_mask, hinv, stores, *extra)

    return jax.jit(program, donate_argnums=(12,))


@functools.lru_cache(maxsize=64)
def _compact_matches_program(tcap: int, out_cap: int):
    """Compact verified matches to a small fixed buffer ON DEVICE before
    the final host read — the only per-pair bulk transfer is
    (out_cap, 2) x2 instead of the full tentative-capacity arrays."""
    def program(xy1, xy2, mask):
        idx = jnp.nonzero(mask, size=out_cap, fill_value=tcap)[0]

        def take(a):
            return jnp.take(a, idx, axis=0, mode="fill", fill_value=0)
        return take(xy1), take(xy2)
    return jax.jit(program)


@functools.lru_cache(maxsize=128)
def _match_pair_program(n1: int, n2: int, cap: int, D: int, knn: int,
                        contrad: float, dup_mode: str, run_fginn: bool,
                        run_dist: bool, binary: bool, standard_2nd: bool,
                        with_db: bool):
    """One compiled matching step over n1/n2 pooled store parts per side
    (grouped matching pools several detectors' stores,
    correspondencebank.cpp:248-288).  Emits fixed-shape tentative parts
    with the image-2 endpoints already gathered, so nothing returns to
    the host."""
    def program(parts1, parts2, ratio, dist_thr, *db):
        return _pool_match_parts(
            parts1, parts2, ratio, dist_thr,
            db if with_db else None, cap, knn, contrad, dup_mode,
            run_fginn, run_dist, binary, standard_2nd)

    return jax.jit(program)


def _pool_match_parts(parts1, parts2, ratio, dist_thr, db, cap, knn,
                      contrad, dup_mode, run_fginn, run_dist, binary,
                      standard_2nd):
    """Traced body of one matching step over pooled store parts (shared
    by the per-rung program and the monolith ladder program)."""
    from mods_tpu.matching.fginn import match_distance

    def pool(parts):
        xy = jnp.concatenate([p[0] for p in parts])
        A = jnp.concatenate([p[1] for p in parts])
        s = jnp.concatenate([p[2] for p in parts])
        d = jnp.concatenate([p[3] for p in parts])
        m = jnp.concatenate([jnp.arange(cap) < p[4] for p in parts])
        return xy, A, s, d, m

    xy1, A1, s1, d1, m1 = pool(parts1)
    xy2, A2, s2, d2, m2 = pool(parts2)

    def finish(t):
        if dup_mode == "fginn":
            prio = t.ratio
        elif dup_mode == "distance":
            prio = t.d1
        elif dup_mode == "bigger_region":
            prio = -s1
        else:
            prio = jnp.arange(xy1.shape[0], dtype=jnp.float32)
        return dict(xy1=xy1, A1=A1, s1=s1, xy2=xy2[t.idx2],
                    A2=A2[t.idx2], s2=s2[t.idx2], prio=prio,
                    mask=t.mask)

    outs = []
    if run_fginn:
        t = match_fginn(d1, m1, d2, m2, xy2, ratio, contrad, knn,
                        standard_2nd=standard_2nd, db=db)
        outs.append(finish(t))
    if run_dist:
        t = match_distance(d1, m1, d2, m2, dist_thr,
                           squared_threshold=binary)
        outs.append(finish(t))
    return outs


def _concat_compact_parts(parts, tcap: int):
    """Concatenate tentative parts and compact the masked rows to the
    tentative capacity (GetCorresponcesVector, mods.cpp:298)."""
    keys_ = ("xy1", "A1", "s1", "xy2", "A2", "s2", "prio")
    mask_all = jnp.concatenate([p["mask"] for p in parts])
    idx = jnp.nonzero(mask_all, size=tcap,
                      fill_value=mask_all.shape[0])[0]
    comb = {k: jnp.take(jnp.concatenate([p[k] for p in parts]), idx,
                        axis=0, mode="fill", fill_value=0)
            for k in keys_}
    n = jnp.minimum(jnp.sum(mask_all.astype(jnp.int32)), tcap)
    comb["mask"] = jnp.arange(tcap) < n
    return comb


def _verify_core(cfg: EngineConfig, w: int, h: int, xy1, A1, s1, xy2, A2,
                 s2, prio, mask, key):
    """duplicate filter -> RANSAC -> LAF check (traced body).
    Verification dispatch mirrors mods.cpp:310-371 (LORANSAC H/F, ORSA)."""
    ver = cfg.ver_type or ("LORANSACF" if cfg.ransac.use_f else "LORANSACH")
    keep = duplicate_filter(xy1, xy2, mask, cfg.match.duplicate_dist,
                            priority=prio)
    tmask = mask & keep
    n_tent = jnp.sum(tmask.astype(jnp.int32))
    if ver == "ORSA":
        from mods_tpu.ransac.orsa import orsa_f
        M, inl, n_inl, _nfa = orsa_f(xy1, xy2, tmask, max(w, 1),
                                     max(h, 1), cfg.orsa, key)
        lafm = f_laf_check(
            M, xy1, A1, s1, xy2, A2, s2, inl,
            cfg.ransac.laf_coef * cfg.ransac.err_threshold,
            sampson=cfg.ransac.error_type == "sampson")
    elif ver == "LORANSACF":
        M, inl, n_inl, _ = ransac_f(xy1, xy2, tmask, cfg.ransac, key)
        lafm = f_laf_check(
            M, xy1, A1, s1, xy2, A2, s2, inl,
            cfg.ransac.laf_coef * cfg.ransac.err_threshold,
            sampson=cfg.ransac.error_type == "sampson")
    else:
        M, inl, n_inl = ransac_h(xy1, xy2, tmask, cfg.ransac, key)
        lafm = h_laf_check(
            M, xy1, A1, s1, xy2, A2, s2, inl,
            3.0 * cfg.ransac.h_laf_coef * cfg.ransac.err_threshold)
    n_laf = jnp.sum(lafm.astype(jnp.int32))
    enough = (n_tent >= MIN_POINTS) & (n_laf >= MIN_POINTS)
    final = jnp.where(enough, lafm, jnp.zeros_like(lafm))
    return dict(model=M, inlier_mask=final, n_tent=n_tent,
                n_inl=jnp.sum(final.astype(jnp.int32)))


@functools.lru_cache(maxsize=64)
def _verify_bank_program(row_counts: tuple, tcap: int, cfg: EngineConfig,
                         w: int, h: int, gt_mode: bool, do_both: bool):
    """Fused bank concat (GetCorresponcesVector, mods.cpp:298) ->
    compaction to the tentative capacity -> duplicate filter ->
    verification — ONE program per rung, so the rung's only host sync is
    reading its match count."""
    def concat_compact(parts):
        return _concat_compact_parts(parts, tcap)

    if gt_mode:
        def program(parts, key, gt_h):
            from mods_tpu.verify import gt_h_inliers
            c = concat_compact(parts)
            keep = duplicate_filter(c["xy1"], c["xy2"], c["mask"],
                                    cfg.match.duplicate_dist,
                                    priority=c["prio"])
            tmask = c["mask"] & keep
            inl = gt_h_inliers(gt_h, c["xy1"], c["xy2"], tmask,
                               cfg.ransac.err_threshold,
                               cfg.ransac.error_type)
            out = dict(model=gt_h, inlier_mask=inl,
                       n_tent=jnp.sum(tmask.astype(jnp.int32)),
                       n_inl=jnp.sum(inl.astype(jnp.int32)),
                       xy1_all=c["xy1"], xy2_all=c["xy2"])
            if do_both:
                # dual mode (mods.cpp:320-334): LO-RANSAC on the same
                # tentatives, GT-checked — RANSAC quality vs the oracle
                r = _verify_core(replace(cfg, ver_type="LORANSACH"),
                                 w, h, c["xy1"], c["A1"], c["s1"],
                                 c["xy2"], c["A2"], c["s2"], c["prio"],
                                 c["mask"], key)
                rtrue = gt_h_inliers(gt_h, c["xy1"], c["xy2"],
                                     r["inlier_mask"],
                                     cfg.ransac.err_threshold,
                                     cfg.ransac.error_type)
                out["ransac_matches"] = jnp.sum(
                    r["inlier_mask"].astype(jnp.int32))
                out["ransac_true"] = jnp.sum(rtrue.astype(jnp.int32))
            return out
    else:
        def program(parts, key):
            c = concat_compact(parts)
            out = _verify_core(cfg, w, h, c["xy1"], c["A1"], c["s1"],
                               c["xy2"], c["A2"], c["s2"], c["prio"],
                               c["mask"], key)
            out["xy1_all"] = c["xy1"]
            out["xy2_all"] = c["xy2"]
            return out

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
    # dual GR_TRUTH+RANSAC mode counters (doBothRANSACgroundTruth,
    # mods.cpp:320-334): {"ransac_matches": N, "ransac_true": N}
    extras: dict = field(default_factory=dict)


class TwoViewMatcher:
    """The `mods` CLI equivalent: escalation-laddered two-view matching."""

    def __init__(self, ladder: list[IterationParams] | None = None,
                 cfg: EngineConfig = EngineConfig(), seed: int = 0,
                 sync_timing: bool = False, stop_mode: str = "sync",
                 monolith: bool = False, monolith_segments: int = 1):
        # monolith=True compiles the WHOLE ladder (both images, all
        # rungs, matching, verification, early stop) into ONE program
        # (mods_tpu/monolith.py) — the serving path for the tunneled
        # runtime, where every dispatch costs ~26-100 ms of fixed
        # overhead.  The per-group path remains for timing attribution,
        # incremental CLI flows, and as the flexible fallback.
        self.monolith = monolith
        # >1 splits the ladder into that many carried-state programs —
        # for runtimes that cannot execute the whole ladder as one
        self.monolith_segments = monolith_segments
        self._monolith_cache: dict = {}
        self.cfg = cfg
        self.ladder = ladder if ladder is not None else [IterationParams()]
        self._seed = seed
        self.key = jax.random.PRNGKey(seed)
        # per-(rung, image-size) geometry/program cache (see _prep_groups)
        self._prep_cache: dict = {}
        # keypoint files for the ReadAffs pseudo-detector, per image
        self.affs_paths: tuple = (None, None)
        # sync_timing=True blocks at phase boundaries so the TimeLog
        # attributes wall-clock to the right phase (reference time.log
        # parity); False lets XLA pipeline the whole rung with a single
        # host sync at the stop decision.
        self.sync_timing = sync_timing
        # stop_mode: "sync" reads each rung's match count before deciding
        # to escalate (the reference's control flow, mods.cpp:229-230);
        # "async" enqueues EVERY rung without any mid-ladder host sync
        # and reads all counts in one batched transfer at the end,
        # selecting the result of the first rung that crossed
        # min_matches — the same answer, bought with (bounded) extra
        # device work instead of per-rung host round trips.  On a
        # tunneled/remote device a single host sync costs hundreds of
        # milliseconds, so sync stalls the pipeline per rung.
        # "pipelined" enqueues rungs without ever blocking, but polls
        # completed rungs' counts with Array.is_ready() and stops
        # enqueuing as soon as a finished rung crossed min_matches.
        # MEASURED CAUTION (PROFILE_ladder.json, r4): on the tunneled
        # single-chip runtime, deep async queues collapse throughput
        # (216 s/pair free-running vs 9.6 s with per-rung syncs) — use
        # "sync" there; "pipelined"/"async" help only on runtimes whose
        # dispatch queue degrades gracefully.
        self.stop_mode = stop_mode

    def _sync(self, x):
        if self.sync_timing:
            jax.block_until_ready(x)
        return x

    def _specs(self, it: IterationParams) -> tuple:
        """Config-resolved DescriptorSpecs for a rung's descriptor list
        (hashable — part of the fused program cache key)."""
        return tuple(spec_for(n, self.cfg) for n in it.descriptors)

    def _device_det(self, det: str) -> bool:
        if det == "MSER":
            return self.cfg.mser.backend == "device"
        return det in DEVICE_DETECTORS

    # -- feature extraction ------------------------------------------------

    def _region_budgets(self, plans, det, vb: int | None = None):
        """Per-view region budget scaling
        (scale-space-detector.cpp:50-51).  Padded to ``vb`` rows for
        bucketed view batches."""
        cfg = self.cfg
        regn = []
        base_rn = cfg.pyramid_for(det).reg_number \
            if det in ("HessianAffine", "DoG", "HarrisAffine") else -1
        for p in plans:
            t, z = p.view.tilt, p.view.zoom
            rn = base_rn
            if base_rn > 0 and (t > 2.0 or z < 0.5):
                rn = int(np.floor(z * base_rn / t))
            regn.append(rn if rn > 0 else 10**9)
        if vb is not None:
            regn += [10**9] * (vb - len(regn))
        return jnp.asarray(regn, jnp.int32)

    def _detect_group(self, views, valid_hw, plans, it, log, img_idx=0):
        """Dispatch detection for one rendered view group (split/timing
        path) — shares _make_detect_fn with the fused path, so both
        detect with identical configured thresholds."""
        cfg = self.cfg
        V = int(views.shape[0])
        hc, wc = views.shape[-2:]
        det = it.detector
        regn = self._region_budgets(plans, det, vb=V)
        prog = _split_detect_program(V, hc, wc, det, cfg)
        with log.phase("DetectTime"):
            regs = prog(views, valid_hw, regn)
            self._sync(regs)
        return regs

    def _host_stage_regions(self, det: str, g_host: np.ndarray,
                            group, rot_inv: np.ndarray, hr: int, wr: int,
                            hc: int, wc: int, log: TimeLog,
                            img_idx: int) -> dict:
        """Host-stage detection (MSER, ReadAffs): views rendered by the
        native host renderer (never transferred from the device), regions
        returned as padded numpy (V, K, ...) arrays in view coords."""
        cfg = self.cfg
        V = len(group)
        p0 = group[0]
        cap = cfg.caps.per_view
        if det == "ReadAffs":
            # keypoints ingested from file as a "detector"
            # (imagerepresentation.cpp:721-746); identity view only
            path = (self.affs_paths[img_idx]
                    if img_idx < len(self.affs_paths) else None)
            if not path:
                raise ValueError("ReadAffs detector needs "
                                 "TwoViewMatcher.affs_paths set")
            from mods_tpu.io.oxford import read_kps, read_oxford
            with log.phase("DetectTime"):
                try:
                    xy, A, s, _ = read_oxford(path)
                except (ValueError, IndexError):
                    xy, A, s = read_kps(path)
            n = min(len(xy), cap)
            z = np.zeros
            out = dict(xy=z((V, cap, 2), np.float32),
                       A=np.tile(np.eye(2, dtype=np.float32),
                                 (V, cap, 1, 1)),
                       s=z((V, cap), np.float32),
                       response=z((V, cap), np.float32),
                       mask=z((V, cap), bool))
            iv = next((i for i, p in enumerate(group) if p.identity), 0)
            out["xy"][iv, :n] = xy[:n]
            out["A"][iv, :n] = A[:n]
            out["s"][iv, :n] = s[:n]
            out["response"][iv, :n] = 1.0
            out["mask"][iv, :n] = True
            return out
        if det == "External":
            # external-binary plugin (imagerepresentation.cpp:747-1026):
            # host-render each view, run the command, read keypoints
            import subprocess
            import tempfile
            from PIL import Image
            from mods_tpu.io.oxford import read_kps, read_oxford
            from mods_tpu.ops.host_render import render_group_np
            ext = cfg.external
            if not ext.command:
                raise ValueError("External detector needs "
                                 "[ExternalDetector] command set")
            cap = ext.cap
            valid_hw = np.asarray(
                [[p.h_new, p.w_new] for p in group], np.int32)
            with log.phase("SynthTime"):
                views_np = render_group_np(
                    g_host, rot_inv, hr, wr, p0.view.do_blur, p0.sigma_x,
                    p0.sigma_y, p0.tilt_scale[0], p0.tilt_scale[1],
                    valid_hw, hc, wc, p0.identity)
            z = np.zeros
            out = dict(xy=z((V, cap, 2), np.float32),
                       A=np.tile(np.eye(2, dtype=np.float32),
                                 (V, cap, 1, 1)),
                       s=z((V, cap), np.float32),
                       response=z((V, cap), np.float32),
                       mask=z((V, cap), bool))
            if ext.desc_command:
                out["ext_desc"] = z((V, cap, ext.desc_dim), np.float32)
            with log.phase("DetectTime"), tempfile.TemporaryDirectory() \
                    as td:
                for v in range(V):
                    h_v, w_v = int(valid_hw[v, 0]), int(valid_hw[v, 1])
                    ip = f"{td}/v{v}.png"
                    op = f"{td}/v{v}.keys"
                    Image.fromarray(np.clip(
                        views_np[v, :h_v, :w_v], 0, 255).astype(
                            np.uint8)).save(ip)
                    subprocess.run(ext.command.format(img=ip, out=op),
                                   shell=True, check=True, timeout=600,
                                   capture_output=True)
                    if ext.format == "kp":
                        xy, A, s = read_kps(op)
                    else:
                        xy, A, s, _ = read_oxford(op)
                    n = min(len(xy), cap)
                    out["xy"][v, :n] = xy[:n]
                    out["A"][v, :n] = A[:n]
                    out["s"][v, :n] = s[:n]
                    out["response"][v, :n] = 1.0
                    out["mask"][v, :n] = True
                    if ext.desc_command and n:
                        # BICE-style external descriptor
                        # (bicedescriptor.hpp): points in, rows out
                        pp = f"{td}/v{v}.pts"
                        dp = f"{td}/v{v}.descs"
                        with open(pp, "w") as f:
                            for i in range(n):
                                f.write(f"{xy[i, 0]} {xy[i, 1]} "
                                        f"{s[i]}\n")
                        subprocess.run(
                            ext.desc_command.format(img=ip, pts=pp,
                                                    out=dp),
                            shell=True, check=True, timeout=600,
                            capture_output=True)
                        rows = np.loadtxt(dp, dtype=np.float32,
                                          ndmin=2)
                        if rows.shape[1] != ext.desc_dim + 2:
                            raise ValueError(
                                f"external descriptor wrote "
                                f"{rows.shape[1] - 2} dims, config "
                                f"says {ext.desc_dim}")
                        m_rows = min(len(rows), n)
                        out["ext_desc"][v, :m_rows] = rows[:m_rows, 2:]
            return out
        if det == "MSER":
            from mods_tpu.detectors.mser import detect_msers_padded
            from mods_tpu.ops.host_render import render_group_np
            cap = cfg.mser.host_cap
            valid_hw = np.asarray(
                [[p.h_new, p.w_new] for p in group], np.int32)
            with log.phase("SynthTime"):
                views_np = render_group_np(
                    g_host, rot_inv, hr, wr, p0.view.do_blur, p0.sigma_x,
                    p0.sigma_y, p0.tilt_scale[0], p0.tilt_scale[1],
                    valid_hw, hc, wc, p0.identity)
            with log.phase("DetectTime"):
                # threaded across views: the native component tree
                # releases the GIL, so views overlap on host cores while
                # the device pipeline stays busy
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=min(V, 8)) as ex:
                    outs = list(ex.map(
                        lambda v: detect_msers_padded(
                            views_np[v], valid_hw[v],
                            replace(cfg.caps, per_view=cap),
                            min_size=cfg.mser.min_size,
                            max_area=cfg.mser.max_area,
                            min_margin=cfg.mser.min_margin), range(V)))
            stack = {k: np.stack([o[k] for o in outs]) for k in outs[0]}
            stack.pop("sub_type", None)
            return stack
        raise KeyError(f"unknown host-stage detector {det!r}")

    def _prep_groups(self, it: IterationParams, h: int, w: int,
                     prev_views: list):
        """Per-(rung, image-size) group preparation, cached across pairs:
        the view grid, bucketed canvas shapes, inverse-rotation maps,
        H inverses, budgets — all static geometry — are computed once,
        uploaded once, and the fused program handle resolved once.  A
        steady-state pair then does pure dispatches with device-resident
        arguments (the per-group np.linalg.inv / jnp.asarray / program
        cache-key hashing was a measurable per-pair host tax)."""
        key = (it, h, w, tuple(prev_views))
        hit = self._prep_cache.get(key)
        if hit is not None:
            return hit
        cfg = self.cfg
        views, new_prev = synthesis.expand_views(it, prev_views)
        plans = [synthesis.plan_view(v, w, h) for v in views]
        preps = []
        for group in synthesis.group_views(plans):
            p0 = group[0]
            V = len(group)
            # bucketed shapes: compiled programs are shared across groups
            # (and rungs) whose snapped (V, canvas) agree; padded view
            # slots carry valid_hw == 0 and produce nothing
            Vb = synthesis.snap_views(V)
            if p0.identity:
                hr = wr = 0
                hc = synthesis.snap_dim(h)
                wc = synthesis.snap_dim(w)
                rot_inv = np.zeros((Vb, 2, 3), np.float32)
            else:
                hr = synthesis.snap_dim(max(p.h_rot for p in group))
                wr = synthesis.snap_dim(max(p.w_rot for p in group))
                hc = synthesis.snap_dim(max(p.h_new for p in group))
                wc = synthesis.snap_dim(max(p.w_new for p in group))
                rot_inv = []
                for p in group:
                    a, b, tx, c, d, ty = p.rot
                    det = a * d - b * c
                    ia, ib = d / det, -b / det
                    ic, id_ = -c / det, a / det
                    rot_inv.append([[ia, ib, -(ia * tx + ib * ty)],
                                    [ic, id_, -(ic * tx + id_ * ty)]])
                rot_inv += [rot_inv[0]] * (Vb - V)
                rot_inv = np.asarray(rot_inv, np.float32)
            sx, sy = p0.tilt_scale
            squash_inv = np.asarray(
                [[1.0 / sx, 0.0, 0.0], [0.0, 1.0 / sy, 0.0]], np.float32)
            valid_np = np.zeros((Vb, 2), np.int32)
            valid_np[:V] = [[p.h_new, p.w_new] for p in group]
            hinv = np.asarray(
                [np.linalg.inv(np.asarray(p.H, np.float64).reshape(3, 3)
                               )[:2, :] for p in group], np.float32)
            hinv = np.concatenate(
                [hinv, np.repeat(hinv[:1], Vb - V, 0)]) if Vb > V else hinv
            device_det = self._device_det(it.detector)
            specs = self._specs(it)
            if device_det:
                program = _fused_group_program(
                    Vb, h, w, hr, wr, hc, wc, p0.view.do_blur,
                    p0.identity, it.detector, specs, cfg)
            else:
                host_k = {"MSER": cfg.mser.host_cap,
                          "External": cfg.external.cap}.get(
                    it.detector, cfg.caps.per_view)
                program = _fused_hostdet_program(
                    Vb, h, w, hr, wr, hc, wc, p0.view.do_blur,
                    p0.identity, host_k, specs, cfg)
            regn_np = np.asarray(
                self._region_budgets(group, it.detector, Vb))
            preps.append(dict(
                group=group, V=V, Vb=Vb, hr=hr, wr=wr, hc=hc, wc=wc,
                identity=p0.identity, do_blur=p0.view.do_blur,
                # host copies: the monolith ladder program embeds these
                # as closure constants (geometry is pair-invariant)
                rot_inv_np=rot_inv, squash_np=squash_inv,
                sig_np=(np.float32(p0.sigma_x), np.float32(p0.sigma_y)),
                valid_np=valid_np, hinv_np=hinv, regn_np=regn_np,
                rot_inv=jnp.asarray(rot_inv),
                squash_inv=jnp.asarray(squash_inv),
                sig_x=jnp.float32(p0.sigma_x),
                sig_y=jnp.float32(p0.sigma_y),
                valid_hw=jnp.asarray(valid_np),
                hinv=jnp.asarray(hinv),
                regn=jnp.asarray(regn_np),
                program=program))
        hit = (new_prev, preps)
        self._prep_cache[key] = hit
        return hit

    def _prefetch_host_stages(self, rungs, g1, g2) -> None:
        """Submit every host-stage (MSER) render+detect job of the whole
        ladder to a worker pool up front, so host slabs compute UNDER
        the earlier rungs' device work instead of stalling their own
        rung (the reference's nested image/synthesis OpenMP parallelism,
        imagerepresentation.cpp:612-622, is the analogous overlap).  The
        native renderer and the MSER component tree both release the
        GIL, so the pool runs concurrently with program dispatch."""
        from concurrent.futures import ThreadPoolExecutor
        for f in getattr(self, "_host_futures", {}).values():
            f.cancel()          # pair ended before consuming these
        self._host_futures = {}
        hostdets = [it.detector for rung in rungs for it in rung.dets
                    if not self._device_det(it.detector)
                    and it.detector == "MSER"]
        if not hostdets:
            return
        if not hasattr(self, "_host_pool"):
            self._host_pool = ThreadPoolExecutor(max_workers=2)
        prev_sim: dict = {}
        for step, rung in enumerate(rungs):
            for it in rung.dets:
                if self._device_det(it.detector) or it.detector != "MSER":
                    continue
                for img_idx, g in ((0, g1), (1, g2)):
                    h, w = g.shape
                    key = (it.detector, img_idx)
                    new_prev, preps = self._prep_groups(
                        it, h, w, prev_sim.get(key, []))
                    prev_sim[key] = new_prev
                    for gi, gp in enumerate(preps):
                        fkey = (step, it.detector, img_idx, gi)
                        V = gp["V"]
                        self._host_futures[fkey] = self._host_pool.submit(
                            self._host_stage_regions, it.detector, g,
                            gp["group"], gp["rot_inv_np"][:V], gp["hr"],
                            gp["wr"], gp["hc"], gp["wc"], TimeLog(),
                            img_idx)

    def _process_image(self, img: np.ndarray, it: IterationParams,
                       prev_views: list, stores: dict, log: TimeLog,
                       img_idx: int = 0, img_dev=None, step: int = -1):
        cfg = self.cfg
        h, w = img.shape
        new_prev, preps = self._prep_groups(it, h, w, prev_views)
        img_j = jnp.asarray(img) if img_dev is None else img_dev
        pe = cfg.sift.patch_extraction
        # stores ride through the group programs as donated buffers, in
        # spec order (append folded into the programs)
        specs = self._specs(it)
        sts = []
        for sp in specs:
            key = (it.detector, sp.name)
            st = stores.get(key)
            if st is None:
                stores[key] = st = DeviceStore(cfg.caps.per_image,
                                               sp.dim)
            sts.append(st)
        for gi, gp in enumerate(preps):
            # Host-stage detectors (host-backend MSER, ReadAffs):
            # keypoints computed on the host over host-rendered views;
            # the device program re-renders the views for description,
            # so full images never cross the host<->device link.
            if not self._device_det(it.detector):
                V, Vb = gp["V"], gp["Vb"]
                fut = getattr(self, "_host_futures", {}).pop(
                    (step, it.detector, img_idx, gi), None)
                if fut is not None:
                    # prefetched under earlier rungs' device work; only
                    # the residual wait lands in the ledger
                    with log.phase("DetectTime"):
                        regs = fut.result()
                else:
                    regs = self._host_stage_regions(
                        it.detector, img, gp["group"],
                        gp["rot_inv_np"][:V], gp["hr"], gp["wr"],
                        gp["hc"], gp["wc"], log, img_idx)
                if Vb > V:      # pad view slots with empty region rows
                    regs = {k: np.concatenate(
                        [a, np.zeros((Vb - V,) + a.shape[1:], a.dtype)])
                        for k, a in regs.items()}
                extra = ((jnp.asarray(regs["ext_desc"]),)
                         if "ext_desc" in regs else ())
                with log.phase("DescTime"):
                    out = gp["program"](
                        img_j, gp["rot_inv"], gp["squash_inv"],
                        gp["sig_x"], gp["sig_y"], gp["valid_hw"],
                        jnp.asarray(regs["xy"]),
                        jnp.asarray(regs["A"]),
                        jnp.asarray(regs["s"]),
                        jnp.asarray(regs["response"]),
                        jnp.asarray(regs["mask"]), gp["hinv"],
                        tuple(st.buffers() for st in sts), *extra)
                    self._sync(out)
            # fused single-dispatch path for device detectors; the split
            # path remains for sync_timing runs that want the
            # reference's per-phase wall-clock attribution
            elif not self.sync_timing:
                with log.phase("DetectTime"):
                    out = gp["program"](
                        img_j, gp["rot_inv"], gp["squash_inv"],
                        gp["sig_x"], gp["sig_y"], gp["valid_hw"],
                        gp["regn"], gp["hinv"],
                        tuple(st.buffers() for st in sts))
            else:
                render = _render_program(
                    gp["Vb"], h, w, gp["hr"], gp["wr"], gp["hc"],
                    gp["wc"], gp["do_blur"], gp["identity"])
                with log.phase("SynthTime"):
                    views_arr = render(img_j, gp["rot_inv"],
                                       gp["squash_inv"], gp["sig_x"],
                                       gp["sig_y"], gp["valid_hw"])
                    self._sync(views_arr)

                regs = self._detect_group(views_arr, gp["valid_hw"],
                                          gp["group"], it, log, img_idx)

                dp = _desc_program(
                    gp["Vb"], gp["hc"], gp["wc"], h, w, regs.capacity,
                    self._specs(it), cfg.dom_ori, pe.mr_size,
                    pe.patch_size, pe.photo_norm, cfg.caps)
                with log.phase("DescTime"):
                    out = dp(views_arr, gp["valid_hw"], regs.xy, regs.A,
                             regs.s, regs.response, regs.mask,
                             gp["hinv"],
                             tuple(st.buffers() for st in sts))
                    self._sync(out)
            for st, bufs in zip(sts, out):
                st.set_buffers(bufs)
        return new_prev

    # -- matching ----------------------------------------------------------

    def _fginn_db(self, spec) -> tuple | None:
        """External descriptor DB for FGINN+DB mode (RootSIFT only, as in
        correspondencebank.cpp:337-341; file = [Matching] SIFTDBfile).
        Rows are whitespace-separated descriptor vectors, padded here to a
        power-of-two row count for stable program shapes."""
        cfg = self.cfg
        if not (cfg.match.use_db_for_fginn and spec.name == "RootSIFT"
                and cfg.match.sift_db_file):
            return None
        import os
        mtime = os.path.getmtime(cfg.match.sift_db_file)
        cached = getattr(self, "_fginn_db_cache", None)
        if cached is not None and cached[0] == (cfg.match.sift_db_file,
                                                mtime):
            return cached[1]
        arr = np.loadtxt(cfg.match.sift_db_file, dtype=np.float32,
                         ndmin=2)
        if arr.shape[1] != spec.dim:
            raise ValueError(
                f"SIFT DB dim {arr.shape[1]} != descriptor {spec.dim}")
        n = arr.shape[0]
        cap = max(128, 1 << (n - 1).bit_length())
        desc = np.zeros((cap, spec.dim), np.float32)
        desc[:n] = arr
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        self._fginn_db_cache = ((cfg.match.sift_db_file, mtime),
                                (desc, mask))
        return desc, mask

    def _match_one(self, parts1: list, parts2: list, spec,
                   ratio: float, dist_thr: float, log: TimeLog) -> list:
        """FGINN and/or distance matching over pooled device stores.
        Both run when both thresholds are positive
        (correspondencebank.cpp:281-285)."""
        cfg = self.cfg
        run_f = ratio > 0
        run_d = dist_thr > 0
        if not (run_f or run_d):
            return []
        # FGINN+DB: the external SIFT database contributes an extra
        # impostor distance (correspondencebank.cpp:337-341 routes
        # RootSIFT through MatchFlannFGINNPlusDB)
        db = self._fginn_db(spec) if run_f else None
        prog = _match_pair_program(
            len(parts1), len(parts2), cfg.caps.per_image, spec.dim,
            cfg.match.knn, cfg.match.contrad_dist,
            cfg.match.duplicate_mode, run_f, run_d,
            spec.kind == "binary", cfg.match.standard_2nd_closest,
            db is not None)
        args = [tuple(p.device_arrays() for p in parts1),
                tuple(p.device_arrays() for p in parts2),
                jnp.float32(ratio), jnp.float32(dist_thr)]
        if db is not None:
            args += [jnp.asarray(db[0]), jnp.asarray(db[1])]
        with log.phase("MatchingTime"):
            outs = prog(*args)
            self._sync(outs)
        return outs

    def _execute_plan(self, stores1: dict, stores2: dict, rung: Rung,
                      log: TimeLog) -> None:
        """Run the rung's matching plan, replacing the recomputed keys in
        the persistent tentative bank (MatchImgReps,
        correspondencebank.cpp:237-351)."""
        cfg = self.cfg
        plan = rung.plan or rung.default_plan()

        # grouped: pool stores across group_detectors per descriptor,
        # thresholds from the global [Matching] maps
        for desc in plan.group_descriptors:
            spec = spec_for(desc, cfg)
            pooled1 = [stores1[(det, desc)] for det in plan.group_detectors
                       if (det, desc) in stores1]
            pooled2 = [stores2[(det, desc)] for det in plan.group_detectors
                       if (det, desc) in stores2]
            key = ("Group", desc)
            self._bank.pop(key, None)
            if not (pooled1 and pooled2):
                continue
            parts = self._match_one(pooled1, pooled2, spec,
                                    cfg.match.group_fginn(desc),
                                    cfg.match.group_distance(desc), log)
            if parts:
                self._bank[key] = parts

        # separate: per (detector, descriptor), detector must have run
        # this rung; thresholds from the rung's per-descriptor maps
        rung_dets = {d.detector: d for d in rung.dets}
        for det in plan.separate_detectors:
            it = rung_dets.get(det)
            if it is None:
                continue      # not synthesized this step -> keep stale key
            for desc in plan.separate_descriptors:
                key = (det, desc)
                self._bank.pop(key, None)
                if key not in stores1 or key not in stores2:
                    continue
                parts = self._match_one(
                    [stores1[key]], [stores2[key]], spec_for(desc, cfg),
                    it.fginn_for(desc), it.distance_for(desc), log)
                if parts:
                    self._bank[key] = parts

    def _verify_bank(self, log: TimeLog):
        """Concatenate the tentative bank (GetCorresponcesVector,
        mods.cpp:298) -> duplicate filter -> geometric verification —
        one fused program, all on device."""
        cfg = self.cfg
        tent_parts = [p for parts in self._bank.values() for p in parts]
        if not tent_parts:
            return None
        tcap = cfg.caps.tentatives
        rows = tuple(int(p["mask"].shape[0]) for p in tent_parts)
        w, h = getattr(self, "_wh", (0, 0))
        gt_mode = (cfg.ver_type == "GR_TRUTH"
                   and getattr(self, "_gt_h", None) is not None)
        vp = _verify_bank_program(rows, tcap, cfg, w, h, gt_mode,
                                  cfg.do_both_ransac_gt)
        self.key, k = jax.random.split(self.key)
        with log.phase("RANSACTime"):
            if gt_mode:
                out = vp(tuple(tent_parts), k,
                         jnp.asarray(self._gt_h, jnp.float32))
            else:
                out = vp(tuple(tent_parts), k)
            self._sync(out)
        return out

    # -- monolith serving path --------------------------------------------

    def _monolith_program(self, shape1, shape2):
        mkey = (shape1, shape2, self.monolith_segments)
        hit = self._monolith_cache.get(mkey)
        if hit is not None:
            return hit
        from mods_tpu.monolith import build_ladder_program
        fn, slab_spec = build_ladder_program(self, shape1, shape2)
        R = len(as_rungs(self.ladder)[:self.cfg.max_steps])
        segs = max(1, min(self.monolith_segments, R))
        bounds = [round(i * R / segs) for i in range(segs + 1)]
        progs = []
        for si in range(segs):
            lo, hi = bounds[si], bounds[si + 1]
            if si == 0:
                progs.append(jax.jit(
                    lambda i1, i2, s, k, g, lo=lo, hi=hi:
                    fn(i1, i2, s, k, g, None, (lo, hi))))
            else:
                progs.append(jax.jit(
                    lambda i1, i2, s, k, g, st, lo=lo, hi=hi:
                    fn(i1, i2, s, k, g, st, (lo, hi)),
                    donate_argnums=(5,)))
        hit = (progs, slab_spec)
        self._monolith_cache[mkey] = hit
        return hit

    def _compute_slabs(self, slab_spec, imgs_np, log: TimeLog):
        """Host-stage detections (MSER/ReadAffs) for every ladder slot,
        as the monolith program's runtime inputs — threaded across slots
        (the native render + MSER release the GIL)."""
        from concurrent.futures import ThreadPoolExecutor

        def one(spec):
            r, det, im, gi = spec
            it = self._slab_its[(r, det)]
            h, w = imgs_np[im].shape
            _, preps = self._prep_groups(
                it, h, w, self._slab_prev[(r, det, im)])
            gp = preps[gi]
            V, Vb = gp["V"], gp["Vb"]
            regs = self._host_stage_regions(
                det, imgs_np[im], gp["group"], gp["rot_inv_np"][:V],
                gp["hr"], gp["wr"], gp["hc"], gp["wc"], TimeLog(), im)
            if Vb > V:
                regs = {k: np.concatenate(
                    [a, np.zeros((Vb - V,) + a.shape[1:], a.dtype)])
                    for k, a in regs.items()}
            return regs

        # geometry prep first (mutates the prep cache; not thread-safe)
        for (r, det, im, gi) in slab_spec:
            it = self._slab_its[(r, det)]
            h, w = imgs_np[im].shape
            self._prep_groups(it, h, w, self._slab_prev[(r, det, im)])
        with ThreadPoolExecutor(max_workers=2) as ex:
            all_regs = list(ex.map(one, slab_spec))
        return tuple({k: jnp.asarray(v) for k, v in regs.items()}
                     for regs in all_regs)

    def _match_monolith(self, g1, g2, gt_h, log: TimeLog) -> MatchResult:
        cfg = self.cfg
        progs, slab_spec = self._monolith_program(g1.shape, g2.shape)
        with log.phase("DetectTime"):
            slabs = self._compute_slabs(slab_spec, (g1, g2), TimeLog())
        self.key, k = jax.random.split(self.key)
        gt = jnp.asarray(gt_h if gt_h is not None else np.eye(3),
                         jnp.float32)
        g1d, g2d = jnp.asarray(g1), jnp.asarray(g2)
        out, state = progs[0](g1d, g2d, slabs, k, gt)
        for prog in progs[1:]:
            out, state = prog(g1d, g2d, slabs, k, gt, state)
        jax.block_until_ready(out)
        log.finalize()
        n_inl = int(out["n_inl"])
        extras = {}
        if cfg.ver_type == "GR_TRUTH" and cfg.do_both_ransac_gt:
            extras = dict(ransac_matches=int(out["ransac_matches"]),
                          ransac_true=int(out["ransac_true"]))
        return MatchResult(
            H=np.asarray(out["model"]),
            xy1=np.asarray(out["xy1"])[:n_inl],
            xy2=np.asarray(out["xy2"])[:n_inl],
            n_matches=n_inl, n_tentatives=int(out["n_tent"]),
            steps_used=int(out["steps_used"]), log=log, extras=extras)

    def match(self, img1, img2, gt_h=None) -> MatchResult:
        cfg = self.cfg
        self._gt_h = gt_h
        # deterministic per pair: the same inputs always produce the
        # same result (the reference srand(time(NULL))s instead,
        # exp_ranF.c:822 — run-to-run wobble there is a bug, not a
        # feature; fixed seeding is a deliberate improvement)
        self.key = jax.random.PRNGKey(self._seed)
        log = TimeLog()
        from mods_tpu.ops.image import to_gray_np
        g1 = to_gray_np(img1)
        g2 = to_gray_np(img2)
        if cfg.do_clahe:
            # photometric normalization pass (mods.cpp:139-189, clip
            # limit 4 as set at mods.cpp:144); host-side so the image
            # only crosses to the device once, already normalized
            from mods_tpu.ops.clahe import clahe_np
            with log.phase("MiscTime"):
                g1 = clahe_np(g1, clip_limit=4.0)
                g2 = clahe_np(g2, clip_limit=4.0)
        self._wh = (max(g1.shape[1], g2.shape[1]),
                    max(g1.shape[0], g2.shape[0]))
        if self.monolith and not self.sync_timing:
            return self._match_monolith(g1, g2, gt_h, log)
        # one upload per image per pair; every rung reuses these
        g1_dev = jnp.asarray(g1)
        g2_dev = jnp.asarray(g2)
        self._bank = {}
        # store pooling: buffers persist across pairs (only the counts
        # rewind), so a steady-state pair allocates nothing
        if not hasattr(self, "_stores"):
            self._stores = ({}, {})
        for side in self._stores:
            for st in side.values():
                st.reset()
        stores1, stores2 = self._stores
        prev1: dict = {}      # per-detector accumulated synth views
        prev2: dict = {}
        steps = 0
        rungs = as_rungs(self.ladder)[:cfg.max_steps]
        self._prefetch_host_stages(rungs, g1, g2)
        outs: list = []               # (step_1based, out) per rung
        stop_counts: list = []        # host ints, sync mode only
        pending = 0                   # first unread rung, pipelined mode
        for step, rung in enumerate(rungs):
            steps += 1
            for it in rung.dets:
                prev1[it.detector] = self._process_image(
                    g1, it, prev1.get(it.detector, []), stores1, log, 0,
                    img_dev=g1_dev, step=step)
                prev2[it.detector] = self._process_image(
                    g2, it, prev2.get(it.detector, []), stores2, log, 1,
                    img_dev=g2_dev, step=step)
            # hardcoded tentative drops (mods.cpp:288-289)
            for cstep, cdet, cdesc in cfg.clear_tentatives:
                if step == cstep:
                    self._bank.pop((cdet, cdesc), None)
            self._execute_plan(stores1, stores2, rung, log)
            out = self._verify_bank(log)
            if out is None:
                continue
            outs.append((steps, out))
            if self.stop_mode == "sync":
                # the rung's only host sync: its (scalar) match count;
                # dual GR_TRUTH mode stops on the RANSAC match count
                # (mods.cpp:412-414).
                # TUNNEL CAUTION (measured, r4): reading ONE output of a
                # multi-output program while its siblings are pending
                # permanently degrades the session to ~26 ms/dispatch —
                # always block the WHOLE output before any host read.
                jax.block_until_ready(out)
                n_inl = int(out["n_inl"])
                n_stop = (int(out["ransac_matches"])
                          if "ransac_matches" in out else n_inl)
                stop_counts.append((n_inl, n_stop))
                if n_stop >= cfg.min_matches:
                    break
            elif self.stop_mode == "pipelined":
                # non-blocking early stop: consume whichever rung counts
                # the device has already delivered
                stop = False
                while pending < len(outs):
                    o = outs[pending][1]
                    cnt = o.get("ransac_matches", o["n_inl"])
                    if not cnt.is_ready():
                        break
                    if int(cnt) >= cfg.min_matches:
                        stop = True
                        break
                    pending += 1
                if stop:
                    break
        if not outs:
            log.finalize()
            return MatchResult(H=np.eye(3), xy1=np.zeros((0, 2)),
                               xy2=np.zeros((0, 2)), n_matches=0,
                               n_tentatives=0, steps_used=steps, log=log)
        if self.stop_mode == "sync":
            inls = [n for n, _ in stop_counts]
            nstops = [s for _, s in stop_counts]
        else:
            # one batched count read for the whole ladder (async mode):
            # every rung was enqueued without a host sync
            with log.phase("MiscTime"):
                packed = jnp.stack(
                    [jnp.stack([o["n_inl"],
                                o.get("ransac_matches", o["n_inl"])])
                     for _, o in outs])
                jax.block_until_ready([o for _, o in outs])
                counts = np.asarray(packed)
            inls = [int(c[0]) for c in counts]
            nstops = [int(c[1]) for c in counts]
        # first rung that crossed min_matches ends the ladder
        # (mods.cpp:229-230); the result is the best rung up to there
        stop_i = next((i for i, s in enumerate(nstops)
                       if s >= cfg.min_matches), len(outs) - 1)
        best_i = max(range(stop_i + 1), key=lambda i: inls[i])
        steps_used = (outs[stop_i][0]
                      if nstops[stop_i] >= cfg.min_matches else steps)
        n_inl, out = inls[best_i], outs[best_i][1]
        log.finalize()
        extras = {}
        if "ransac_matches" in out:
            extras = dict(ransac_matches=int(out["ransac_matches"]),
                          ransac_true=int(out["ransac_true"]))
        # bulk reads only happen once, after the ladder stops, and only
        # of device-compacted buffers
        # out_cap == tcap: n_inl can reach the tentative capacity, and
        # xy1/xy2 must always have n_matches rows
        tcap = int(out["inlier_mask"].shape[0])
        cprog = _compact_matches_program(tcap, tcap)
        cxy1, cxy2 = cprog(out["xy1_all"], out["xy2_all"],
                           out["inlier_mask"])
        # block everything before the np.asarray reads (see tunnel
        # caution above: partial reads poison the session)
        jax.block_until_ready((cxy1, cxy2, out))
        return MatchResult(
            H=np.asarray(out["model"]),
            xy1=np.asarray(cxy1)[:n_inl], xy2=np.asarray(cxy2)[:n_inl],
            n_matches=n_inl, n_tentatives=int(out["n_tent"]),
            steps_used=steps_used, log=log, extras=extras)
