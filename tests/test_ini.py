"""INI ladder/config import against the reference's bundled files."""

from mods_tpu.io.ini import (load_ini, parse_detector_config,
                             parse_iters_file, parse_matching_config,
                             parse_ransac_config)

CVIU_ITERS = "/root/reference/build/iters_mods_cviu.ini"
CVIU_CFG = "/root/reference/build/config_iter_mods_cviu.ini"


def test_parse_cviu_ladder():
    steps, min_matches, ladder = parse_iters_file(CVIU_ITERS)
    assert steps == 7
    assert min_matches == 10
    assert len(ladder) == 7
    dets = [r.dets[0] for r in ladder]
    assert dets[0].detector == "ORB"
    assert dets[0].tilt_set == (1.0,)
    assert dets[1].tilt_set == (1.0, 5.0, 9.0)
    assert dets[2].detector == "MSER"
    assert dets[2].scale_set == (1.0, 0.25, 0.125)
    assert dets[2].descriptors == ("RootSIFT",)
    assert dets[2].fginn_threshold == (0.85,)
    assert dets[4].detector == "HessianAffine"
    assert dets[4].phi_base == 360.0
    assert dets[5].phi_base == 120.0
    assert dets[6].phi_base == 60.0
    assert dets[4].tilt_set == (1.0, 2.0, 4.0, 6.0, 8.0)
    # per-rung matching plans ([MatchingN], io_mods.cpp:487-501)
    assert ladder[0].plan.separate_detectors == ("ORB",)
    assert ladder[1].plan.separate_descriptors == ("ORB",)
    assert ladder[2].plan.separate_detectors == ("MSER", "ORB")
    assert ladder[2].plan.separate_descriptors == ("RootSIFT", "ORB")
    assert ladder[4].plan.separate_detectors == ("MSER", "HessianAffine")
    assert ladder[4].plan.group_detectors == ()
    # ORB's distance threshold rides the iteration section
    assert dets[0].distance_for("ORB") == 60.0
    assert dets[0].fginn_for("ORB") == 0.0


def test_parse_detector_cfg():
    ini = load_ini(CVIU_CFG)
    p = parse_detector_config(ini, "HessianAffine")
    assert abs(p.threshold - 16.0 / 3.0) < 1e-3
    assert p.n_scales == 3
    assert p.detector_mode == "FixedTh"
    assert p.reg_number == 2000
    d = parse_detector_config(ini, "DoG")
    assert d.detector_type == "DoG"
    assert abs(d.threshold - 8.0) < 1e-6


def test_parse_ransac_cfg():
    ini = load_ini(CVIU_CFG)
    r = parse_ransac_config(ini)
    assert r.err_threshold == 3.0
    assert r.error_type == "sampson"
    assert r.max_samples == 100000
    assert r.local_optimization
    assert r.do_symm_check


def test_parse_matching_cfg():
    ini = load_ini(CVIU_CFG)
    m = parse_matching_config(ini)
    assert m.duplicate_dist == 2.0  # config_iter_mods_cviu.ini:158


def test_parse_descriptor_sections():
    """Per-detector/descriptor sections (io_mods.cpp:104-652) from the
    real CVIU config plus a synthetic INI exercising every key."""
    from mods_tpu.io.ini import parse_descriptor_sections
    ini = load_ini(CVIU_CFG)
    d = parse_descriptor_sections(ini)
    # values pinned in config_iter_mods_cviu.ini:76-101
    assert d["orb"].nfeatures == 500
    assert d["orb"].edge_threshold == 31
    assert abs(d["orb"].scale_factor - 1.2) < 1e-6
    assert d["fast"].threshold == 30.0
    assert d["fast"].type == 2
    assert d["brisk"].thresh == 50
    assert d["brisk"].octaves == 1
    assert d["freak"].orientation_normalized
    assert abs(d["freak"].pattern_scale - 22.0) < 1e-6
    assert d["surf_det"].octaves == 4
    # MROGHDescriptor section (io_mods.h names it MROGHDescriptor)
    assert d["mrogh"].n_multi_region == 4
    assert d["mrogh"].dim == 8 * 6 * 4

    # synthetic overrides for sections absent from the CVIU config
    import textwrap
    import tempfile, os
    txt = textwrap.dedent("""
        [LIOP]
        neighbours=3; comment
        bins=4
        radius=5.5
        [DAISY]
        rad=12
        radq=2
        thq=6
        histq=4
        [SSIM]
        nrad=3
        nang=12
        [PixelDescriptor]
        normType=L1
        [STAR]
        responseThreshold=45
        """)
    with tempfile.NamedTemporaryFile("w", suffix=".ini",
                                     delete=False) as f:
        f.write(txt)
        path = f.name
    try:
        d2 = parse_descriptor_sections(load_ini(path))
    finally:
        os.unlink(path)
    assert d2["liop"].neighbours == 3
    assert d2["liop"].dim == 4 * 6  # bins * 3!
    assert d2["daisy"].dim == (1 + 2 * 6) * 4
    assert d2["ssim"].dim == 36
    assert d2["pixels"].norm_type == "L1"
    assert d2["star"].response_threshold == 45


def test_spec_for_applies_config():
    """spec_for() threads the parsed sections into descriptor specs
    (dims + implementation kwargs)."""
    from mods_tpu.config import DaisyParams, LiopParams
    from mods_tpu.descriptors.registry import spec_for
    from mods_tpu.pipeline import EngineConfig
    cfg = EngineConfig(daisy=DaisyParams(radq=2, thq=4, histq=4),
                       liop=LiopParams(neighbours=3, bins=5))
    sd = spec_for("DAISY", cfg)
    assert sd.dim == (1 + 2 * 4) * 4
    assert dict(sd.params)["n_rings"] == 2
    sl = spec_for("LIOP", cfg)
    assert sl.dim == 5 * 6
    # default config keeps the registry dims
    assert spec_for("DAISY", EngineConfig()).dim == 200
    assert spec_for("RootSIFT", cfg).dim == 128
