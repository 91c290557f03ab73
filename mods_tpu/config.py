"""Typed configuration tree.

Mirrors the reference's three-layer configuration (SURVEY.md §5.6):
CLI args, per-stage INI (`config_iter_*.ini`, io_mods.cpp:104-652) and the
escalation-ladder INI (`iters_*.ini`, io_mods.cpp:653-688).  Here the tree
is plain frozen dataclasses — hashable, so a config can be a static jit
argument — and the INI importers live in `mods_tpu.io.ini`.

Defaults reproduce the reference's constructor defaults
(detectors/structures.hpp:127-167, affine.h:91-132,
descriptors_parameters.hpp:23-37, matching.hpp:97-171).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field


class DetectorType:
    HESSIAN = "Hessian"
    DOG = "DoG"
    HARRIS = "Harris"


class DetectionMode:
    FIXED_TH = "FixedTh"
    RELATIVE_TH = "RelativeTh"
    FIXED_REG_NUMBER = "FixedRegNumber"
    RELATIVE_REG_NUMBER = "RelativeRegNumber"
    NOT_LESS_THAN_REGIONS = "NotLessThanRegions"


@dataclass(frozen=True)
class PyramidParams:
    """reference detectors/structures.hpp:127-167."""
    upscale_input_image: int = 0
    n_scales: int = 3
    initial_sigma: float = 1.6
    threshold: float = 16.0 / 3.0
    rel_threshold: float = -1.0
    reg_number: int = -1
    rel_reg_number: float = -1.0
    edge_eigen_value_ratio: float = 10.0
    border: int = 5
    detector_mode: str = DetectionMode.FIXED_TH
    detector_type: str = DetectorType.HESSIAN
    # intensity-independent DoG (iiDoGMode, pyramid.cpp:145-152,198-220)
    ii_dog: bool = False
    # WLD intensity normalization of responses (doOnWLD,
    # pyramid.cpp:492-505; WLDParams structures.hpp:113-124)
    do_on_wld: bool = False
    wld_a: float = 3.0
    wld_b: float = 5.0
    wld_g: float = 5.0
    # TILDE filter file when detector_type == "TILDE"
    # (TILDEResponse, pyramid.cpp:182-197)
    tilde_filters: str = ""


@dataclass(frozen=True)
class AffineShapeParams:
    """Baumberg adaptation params (reference affine.h:91-132)."""
    max_iterations: int = 16
    convergence_threshold: float = 0.05
    smm_window_size: int = 19
    patch_size: int = 41
    initial_sigma: float = 1.6
    mr_size: float = 3.0 * math.sqrt(3.0)
    do_baumberg: bool = True


@dataclass(frozen=True)
class PatchExtractionParams:
    """reference detectors/structures.hpp:246-258."""
    patch_size: int = 41
    mr_size: float = 5.1962
    fast_extraction: bool = False
    photo_norm: bool = True


@dataclass(frozen=True)
class DominantOrientationParams:
    """reference descriptors_parameters.hpp:23-37."""
    max_angles: int = -1          # -1 = all peaks above threshold
    threshold: float = 0.8
    add_up_right: bool = False
    half_sift_mode: bool = False
    patch_extraction: PatchExtractionParams = field(
        default_factory=PatchExtractionParams)


@dataclass(frozen=True)
class SIFTDescriptorParams:
    """reference matching/siftdesc.h:24-70."""
    spatial_bins: int = 4
    orientation_bins: int = 8
    max_bin_value: float = 0.2
    root_sift: bool = False
    half_sift: bool = False
    magn_less: bool = False
    do_norm: bool = True
    patch_extraction: PatchExtractionParams = field(
        default_factory=PatchExtractionParams)

    @property
    def dim(self) -> int:
        ob = self.orientation_bins // 2 if self.half_sift \
            else self.orientation_bins
        return self.spatial_bins * self.spatial_bins * ob


@dataclass(frozen=True)
class OrbParams:
    """reference ORBParams (detectors_parameters.hpp:203-233, read by
    GetORBPars io_mods.cpp:325-335)."""
    nfeatures: int = 500
    scale_factor: float = 1.2
    nlevels: int = 8
    edge_threshold: int = 31
    first_level: int = 0
    wta_k: int = 2
    do_nms: int = 1
    fast_threshold: float = 20.0    # cv::ORB internal default


@dataclass(frozen=True)
class FastParams:
    """reference FASTParams (detectors_parameters.hpp:144-157)."""
    threshold: float = 10.0
    nonmax_suppression: bool = True
    type: int = 0


@dataclass(frozen=True)
class StarParams:
    """reference STARParams (detectors_parameters.hpp:158-175)."""
    max_size: int = 45
    response_threshold: int = 30
    line_threshold_projected: int = 10
    line_threshold_binarized: int = 8
    suppress_nonmax_size: int = 5


@dataclass(frozen=True)
class SurfDetParams:
    """reference SURFParams (detectors_parameters.hpp:120-142)."""
    octaves: int = 4
    intervals: int = 4
    init_sample: int = 2
    thresh: float = 0.0004


@dataclass(frozen=True)
class BriskDetParams:
    """reference BRISKParams (detectors_parameters.hpp:176-196)."""
    thresh: int = 30
    octaves: int = 3
    pattern_scale: float = 1.0


@dataclass(frozen=True)
class FreakParams:
    """reference FREAKParams (descriptors/freakdescriptor.hpp)."""
    orientation_normalized: bool = False
    scale_normalized: bool = False
    pattern_scale: float = 22.0
    n_octaves: int = 4


@dataclass(frozen=True)
class CnnParams:
    """reference CaffeDescriptorParams (descriptors_parameters.hpp:39-68)
    re-cut for the TPU conv-stack descriptor (descriptors/cnn.py):
    WeightsFile -> weights_file (.npz), LayerName/ProtoTxt are absorbed
    by the fixed head, Normalization and the patch geometry carry over.
    """
    weights_file: str = ""          # empty -> procedural default bank
    patch_size: int = 32
    mr_size: float = 12.0
    dim: int = 128
    normalization: str = "L2"       # L2 | L1 | RootL2 | none
    mean_gray: float = (104.0 + 117.0 + 123.0) / 3.0
    do_sift_like_orientation: bool = True


@dataclass(frozen=True)
class DaisyParams:
    """reference DAISYParams (descriptors/daisydescriptor.hpp):
    rad/radq/thq/histq in daisy's naming = radius / n rings / ring
    segments / orientation histogram bins."""
    rad: int = 15
    radq: int = 3
    thq: int = 8
    histq: int = 8
    nrm_type: str = "partial"

    @property
    def dim(self) -> int:
        return (1 + self.radq * self.thq) * self.histq


@dataclass(frozen=True)
class LiopParams:
    """reference LIOPDescriptorParams (matching/liopdesc.hpp:20-33)."""
    neighbours: int = 4
    bins: int = 6
    radius: float = 6.0
    threshold: float = 5.0

    @property
    def dim(self) -> int:
        return self.bins * math.factorial(self.neighbours)


@dataclass(frozen=True)
class SsimParams:
    """reference SSIMParams (descriptors/ssimdescriptor.hpp)."""
    window_size: int = 5
    desc_rad: int = 40
    nrad: int = 4
    nang: int = 10
    cor_size: int = 20
    var_noise: float = 300000.0
    saliency_thresh: float = 0.7
    homogeneity_thresh: float = 0.7
    snn_thresh: float = 0.85

    @property
    def dim(self) -> int:
        return self.nrad * self.nang


@dataclass(frozen=True)
class MroghParams:
    """reference MROGHParams (descriptors/mroghdesc.hpp)."""
    n_dir: int = 8
    n_order: int = 6
    n_multi_region: int = 3

    @property
    def dim(self) -> int:
        return self.n_dir * self.n_order * self.n_multi_region


@dataclass(frozen=True)
class PixelsParams:
    """reference PIXELSDescriptorParams (descriptors/pixelsdesc.hpp)."""
    norm_type: str = "L2"


@dataclass(frozen=True)
class DetectorParams:
    """One scale-space detector slot = pyramid + affine shape params."""
    pyramid: PyramidParams = field(default_factory=PyramidParams)
    affine: AffineShapeParams = field(default_factory=AffineShapeParams)
    do_baumberg: bool = True


@dataclass(frozen=True)
class MatchParams:
    """reference matching.hpp:97-146."""
    ratio_threshold: float = 0.8       # FGINN ratio (currMatchRatio)
    distance_threshold: float = 64.0   # absolute threshold path
    contrad_dist: float = 10.0         # FGINN contradiction distance, px
    knn: int = 50                      # neighbors scanned (mods.cpp:49)
    standard_2nd_closest: bool = False
    duplicate_dist: float = 3.0        # duplicate filter radius (io_mods)
    duplicate_mode: str = "random"     # random|fginn|distance|bigger_region
    # global per-descriptor thresholds for GROUPED matching — the
    # `matchRatio<Desc>` / `matchDistance<Desc>` keys of the config-file
    # [Matching] section (io_mods.cpp:509-513).  Tuples of (name, value)
    # so the dataclass stays hashable.
    fginn_per_desc: tuple = ()
    dist_per_desc: tuple = ()
    # FGINN+DB mode (MatchFlannFGINNPlusDB, matching.cpp:462;
    # correspondencebank.h:33-36): an external descriptor database
    # supplies an additional second-nearest distance.
    use_db_for_fginn: bool = False
    sift_db_file: str = ""

    def group_fginn(self, desc: str) -> float:
        return dict(self.fginn_per_desc).get(desc, 0.0)

    def group_distance(self, desc: str) -> float:
        return dict(self.dist_per_desc).get(desc, 0.0)


@dataclass(frozen=True)
class MatchPlan:
    """Per-rung matching plan — the reference `WhatToMatch` struct filled
    from `[Matching<step>]` sections (io_mods.cpp:487-501):

    * each descriptor in ``group_descriptors`` is matched once over the
      POOLED regions of all ``group_detectors`` with the global
      config-level thresholds (correspondencebank.cpp:245-289);
    * each (detector, descriptor) in ``separate_detectors`` x
      ``separate_descriptors`` is matched on its own with the rung's
      per-descriptor thresholds — and only when that detector actually
      ran this rung (correspondencebank.cpp:292-303 skips detectors
      absent from the step's synthesis params)."""
    group_descriptors: tuple = ()
    group_detectors: tuple = ()
    separate_detectors: tuple = ()
    separate_descriptors: tuple = ()


class RansacErrorType:
    SAMPSON = "sampson"
    SYMM_MAX = "symm_max"
    SYMM_SUM = "symm_sum"


@dataclass(frozen=True)
class RansacParams:
    """reference matching.hpp:147-171."""
    use_f: bool = False
    err_threshold: float = 2.0
    confidence: float = 0.99
    max_samples: int = 100000
    local_optimization: bool = True
    laf_coef: float = 3.0
    h_laf_coef: float = 10.0
    error_type: str = RansacErrorType.SYMM_SUM
    do_symm_check: bool = False
    # TPU batching knobs (no reference counterpart): hypotheses per
    # round.  max_rounds * batch_hypotheses should cover max_samples
    # (the reference draws up to 100k samples when the inlier ratio is
    # low, exp_ranF.c:1060); the confidence-based adaptive stop skips
    # the unneeded rounds on easy problems.
    batch_hypotheses: int = 2048
    max_rounds: int = 48
    lo_inner_samples: int = 10
    lo_sample_size: int = 14
    lo_iters: int = 4


@dataclass(frozen=True)
class OrsaParams:
    """A-contrario verification (reference orsa.cpp; acceptance rule
    matching.cpp:1035-1040).  ``rounds`` bounds the scan for jit;
    adaptive termination (the reference's nsamples update, orsa.cpp:371+)
    skips remaining rounds once log10-NFA has improved by less than
    ``min_improvement`` for ``stall_rounds`` consecutive rounds."""
    max_log_nfa: float = -2.0
    batch_hypotheses: int = 512
    rounds: int = 8
    stall_rounds: int = 2
    min_improvement: float = 0.5


@dataclass(frozen=True)
class ViewParams:
    """One synthetic view: (tilt, phi, zoom) — reference
    ViewSynthParameters (structures.hpp:219-231).  phi in radians;
    negative tilt in a TiltSet means vertical-tilt mode and is stored
    here with ``vertical=True`` and positive tilt."""
    tilt: float = 1.0
    phi: float = 0.0
    zoom: float = 1.0
    init_sigma: float = 0.5
    do_blur: bool = True
    vertical: bool = False


@dataclass(frozen=True)
class CapacityParams:
    """Static capacities for fixed-shape TPU programs (no reference
    counterpart — the reference grows std::vectors dynamically)."""
    per_octave: int = 8192     # candidate extrema per octave per view
    per_octave_baum: int = 256  # localized keypoints fed to Baumberg per
    #                             octave per view (strongest first) — its
    #                             windowed SMM resampling dominates
    #                             detection cost
    per_view: int = 2048       # detected regions per synthetic view
    per_group: int = 768       # compacted regions per view GROUP — the
    #                            orient/describe row count (pipeline
    #                            stage-1/2 compaction).  Sized from
    #                            measured CVIU-ladder cat-pair appends
    #                            (max 440 rows/group, diag r4) with 1.7x
    #                            headroom; patch sampling scales with it.
    #                            RAISE for FixedRegNumber workloads
    #                            (WxBS TILDE uses 3000 regions/view).
    per_image: int = 8192      # regions per image after view concat
    max_angles: int = 4        # orientation peaks kept per region
    tentatives: int = 2048     # tentative correspondences


@dataclass(frozen=True)
class IterationParams:
    """One rung of the escalation ladder: detector -> views -> descriptors
    with per-descriptor match thresholds (reference iters_*.ini sections,
    io_mods.cpp:653-688)."""
    detector: str = "HessianAffine"
    descriptors: tuple[str, ...] = ("RootSIFT",)
    tilt_set: tuple[float, ...] = (1.0,)
    scale_set: tuple[float, ...] = (1.0,)
    phi_base: float = 360.0
    init_sigma: float = 0.5
    do_blur: bool = True
    fginn_threshold: tuple[float, ...] = (0.8,)
    distance_threshold: tuple[float, ...] = (0.0,)

    def fginn_for(self, desc: str) -> float:
        m = dict(zip(self.descriptors, self.fginn_threshold))
        return m.get(desc, 0.0)

    def distance_for(self, desc: str) -> float:
        m = dict(zip(self.descriptors, self.distance_threshold))
        return m.get(desc, 0.0)


@dataclass(frozen=True)
class Rung:
    """One escalation-ladder step: the detector iterations that run (one
    per `[<Detector><step>]` section — the reference allows several per
    step, io_mods.cpp:663-688) plus the step's matching plan
    (`[Matching<step>]`)."""
    dets: tuple[IterationParams, ...] = (IterationParams(),)
    plan: MatchPlan | None = None

    @property
    def detectors(self) -> tuple[str, ...]:
        return tuple(d.detector for d in self.dets)

    def default_plan(self) -> MatchPlan:
        """When no [Matching<step>] section exists: match each of this
        rung's (detector, descriptor) pairs separately."""
        descs = []
        for d in self.dets:
            for name in d.descriptors:
                if name not in descs:
                    descs.append(name)
        return MatchPlan(separate_detectors=self.detectors,
                         separate_descriptors=tuple(descs))


def as_rungs(ladder) -> list:
    """Normalize a ladder given as IterationParams list / Rung list."""
    out = []
    for item in ladder:
        if isinstance(item, Rung):
            out.append(item)
        elif isinstance(item, IterationParams):
            out.append(Rung(dets=(item,)))
        else:
            out.append(Rung(dets=tuple(item)))
    return out


def replace(obj, **kw):
    return dataclasses.replace(obj, **kw)
