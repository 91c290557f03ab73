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
