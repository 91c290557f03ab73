"""Reference-compatible INI configuration import.

Parses the reference's two config files (SURVEY.md §5.6):
  * `config_iter_*.ini` — per-stage parameters (io_mods.cpp:104-652)
  * `iters_*.ini` — the escalation ladder (io_mods.cpp:653-688):
    `[Iterations] Steps/minMatches` then per-step `[<Detector><step>]`
    sections with TiltSet/ScaleSet/Phi/initSigma/Descriptors/
    FGINNThreshold/DistanceThreshold and `[Matching<step>]` grouping.

The reference uses inih with `;` comments and values like
"1;,5,9;  comment" where everything after the first `;` is commentary.
"""

from __future__ import annotations

import configparser
import re

from mods_tpu.config import (DetectionMode, IterationParams, MatchParams,
                             PyramidParams, RansacParams, RansacErrorType,
                             replace)

KNOWN_DETECTORS = (
    "HessianAffine", "DoG", "HarrisAffine", "MSER", "ORB", "TILDE",
    "ReadAffs", "FOCI", "SURF", "FAST", "STAR", "BRISK", "Saddle",
    "WAVE", "WASH", "SFOP", "TOS-MSER", "MIK-MSER", "KAZE",
)


def _strip_value(v: str) -> str:
    """Drop inih-style `;` trailing comments."""
    return v.split(";", 1)[0].strip()


def load_ini(path: str) -> dict[str, dict[str, str]]:
    cp = configparser.ConfigParser(strict=False, interpolation=None,
                                   comment_prefixes=(";", "#"),
                                   inline_comment_prefixes=None)
    cp.optionxform = str  # keep case
    with open(path) as f:
        text = f.read()
    cp.read_string(text)
    out: dict[str, dict[str, str]] = {}
    for sec in cp.sections():
        out[sec] = {k: _strip_value(v) for k, v in cp[sec].items()}
    return out


def _floats(v: str) -> tuple[float, ...]:
    v = _strip_value(v)
    return tuple(float(x) for x in re.split(r"[,\s]+", v) if x)


def _strs(v: str) -> tuple[str, ...]:
    v = _strip_value(v)
    return tuple(x for x in re.split(r"[,\s]+", v) if x)


def parse_iters_file(path: str):
    """-> (steps, min_matches, ladder: list[IterationParams])."""
    ini = load_ini(path)
    its = ini.get("Iterations", {})
    steps = int(float(its.get("Steps", "1")))
    min_matches = int(float(its.get("minMatches", "15")))
    ladder: list[IterationParams] = []
    for step in range(steps):
        sec_name = None
        det = None
        for d in KNOWN_DETECTORS:
            cand = f"{d}{step}"
            if cand in ini:
                sec_name = cand
                det = d
                break
        if sec_name is None:
            break
        sec = ini[sec_name]
        descs = _strs(sec.get("Descriptors", "RootSIFT"))
        fginn = _floats(sec.get("FGINNThreshold", "0.8"))
        dist = _floats(sec.get("DistanceThreshold", "0"))
        ladder.append(IterationParams(
            detector=det,
            descriptors=descs,
            tilt_set=_floats(sec.get("TiltSet", "1")),
            scale_set=_floats(sec.get("ScaleSet", "1")),
            phi_base=_floats(sec.get("Phi", "360"))[0],
            init_sigma=_floats(sec.get("initSigma", "0.5"))[0],
            fginn_threshold=fginn,
            distance_threshold=dist,
        ))
    return steps, min_matches, ladder


def parse_detector_config(ini: dict, section: str = "HessianAffine"
                          ) -> PyramidParams:
    """[HessianAffine]/[DoG]/[HarrisAffine] sections
    (io_mods.cpp Get*Pars)."""
    sec = ini.get(section, {})
    g = lambda k, d: float(_strip_value(sec.get(k, str(d))))
    mode = sec.get("mode", "FixedTh")
    mode_map = {
        "FixedTh": DetectionMode.FIXED_TH,
        "RelativeTh": DetectionMode.RELATIVE_TH,
        "FixedRegNumber": DetectionMode.FIXED_REG_NUMBER,
        "RelativeRegNumber": DetectionMode.RELATIVE_REG_NUMBER,
        "NotLessThanRegions": DetectionMode.NOT_LESS_THAN_REGIONS,
    }
    det_type = {"HessianAffine": "Hessian", "DoG": "DoG",
                "HarrisAffine": "Harris"}.get(section, "Hessian")
    return PyramidParams(
        n_scales=int(g("numberOfScales", 3)),
        initial_sigma=g("initialSigma", 1.6),
        threshold=g("threshold", 16.0 / 3.0),
        rel_threshold=g("relativeThreshold", -1),
        reg_number=int(g("regionsNumber", -1)),
        rel_reg_number=g("relativeRegionsNumber", -1),
        edge_eigen_value_ratio=g("edgeEigenValueRatio", 10.0),
        border=int(g("border", 5)),
        detector_mode=mode_map.get(mode, DetectionMode.FIXED_TH),
        detector_type=det_type,
    )


def parse_ransac_config(ini: dict) -> RansacParams:
    sec = ini.get("RANSAC", {})
    g = lambda k, d: float(_strip_value(sec.get(k, str(d))))
    et = sec.get("ErrorType", "SymmSum").strip()
    emap = {"Sampson": RansacErrorType.SAMPSON,
            "SymmMax": RansacErrorType.SYMM_MAX,
            "SymmSum": RansacErrorType.SYMM_SUM}
    return RansacParams(
        err_threshold=g("err_threshold", 2.0),
        confidence=g("confidence", 0.99),
        max_samples=int(g("max_samples", 1e5)),
        local_optimization=bool(int(g("localOptimization", 1))),
        laf_coef=g("LAFcoef", 3.0),
        h_laf_coef=g("HLAFcoef", 10.0),
        error_type=emap.get(et, RansacErrorType.SYMM_SUM),
        do_symm_check=bool(int(g("doSymmCheck", 0))),
    )


def parse_matching_config(ini: dict) -> MatchParams:
    sec = ini.get("Matching", {})
    g = lambda k, d: float(_strip_value(sec.get(k, str(d))))
    dup = ini.get("DuplicateFiltering", {})
    gd = lambda k, d: float(_strip_value(dup.get(k, str(d))))
    mode = dup.get("whichCorrespondenceRemains", "random").strip()
    mode_map = {"random": "random", "bestFGINN": "fginn",
                "bestDistance": "distance", "biggerRegion": "bigger_region"}
    return MatchParams(
        contrad_dist=g("contradDist", 10.0),
        duplicate_dist=gd("duplicateDist", 3.0),
        duplicate_mode=mode_map.get(mode, "random"),
        knn=int(g("kNN", 50)),
    )
