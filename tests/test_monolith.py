"""Monolith ladder program (mods_tpu/monolith.py): one-program
escalation must reproduce the per-group path's results."""

import numpy as np

from mods_tpu.config import CapacityParams, IterationParams, RansacParams
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from tests.test_pipeline import textured_image, warp_np

CAPS = CapacityParams(per_octave=512, per_view=256, per_image=512,
                      max_angles=2, tentatives=1024)


def _cfg(**kw):
    return EngineConfig(
        caps=CAPS,
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2), **kw)


def _pair(seed=21):
    img1 = textured_image(160, 192, seed=seed)
    H = np.array([[1.0, 0.0, 12.0], [0.0, 1.0, -9.0], [0, 0, 1.0]])
    return img1, warp_np(img1, H, 160, 192), H


def test_monolith_matches_per_group_path():
    img1, img2, _ = _pair()
    ladder = [IterationParams(descriptors=("RootSIFT",))]
    a = TwoViewMatcher(ladder, _cfg()).match(img1, img2)
    b = TwoViewMatcher(ladder, _cfg(), monolith=True).match(img1, img2)
    assert b.n_matches >= 10
    assert abs(a.n_tentatives - b.n_tentatives) <= 2, \
        (a.n_tentatives, b.n_tentatives)
    assert abs(a.n_matches - b.n_matches) <= max(3, a.n_matches // 5), \
        (a.n_matches, b.n_matches)
    assert b.steps_used == 1


def test_monolith_escalates_and_stops():
    """Rung 1 must only run when rung 0 is insufficient; an easy pair
    stops at step 1 even with more rungs configured."""
    img1, img2, _ = _pair(seed=5)
    ladder = [IterationParams(descriptors=("RootSIFT",)),
              IterationParams(detector="DoG",
                              descriptors=("RootSIFT",))]
    m = TwoViewMatcher(ladder, _cfg(), monolith=True)
    r = m.match(img1, img2)
    assert r.steps_used == 1 and r.n_matches >= 10
    # second pair through the same compiled program (cache hit path)
    r2 = m.match(img1 + 0.5, img2 + 0.5)
    assert r2.steps_used == 1 and r2.n_matches >= 10


def test_monolith_mser_host_slabs():
    """Host-stage MSER detections ride in as runtime slab inputs."""
    img1, img2, _ = _pair(seed=9)
    ladder = [IterationParams(detector="MSER",
                              descriptors=("RootSIFT",),
                              fginn_threshold=(0.85,))]
    m = TwoViewMatcher(ladder, _cfg(), monolith=True)
    r = m.match(img1, img2)
    assert r.n_matches >= 8, (r.n_matches, r.n_tentatives)


def test_monolith_gt_mode():
    img1, img2, H = _pair(seed=13)
    cfg = _cfg(ver_type="GR_TRUTH", do_both_ransac_gt=True)
    ladder = [IterationParams(descriptors=("RootSIFT",))]
    m = TwoViewMatcher(ladder, cfg, monolith=True)
    r = m.match(img1, img2, gt_h=H)
    assert r.n_matches >= 10
    assert r.extras["ransac_matches"] >= 8
    assert r.extras["ransac_true"] >= 8


def test_monolith_segments_agree():
    """Splitting the ladder into carried-state segment programs must
    reproduce the single-program result."""
    img1, img2, _ = _pair(seed=33)
    ladder = [IterationParams(descriptors=("RootSIFT",)),
              IterationParams(detector="DoG", descriptors=("RootSIFT",))]
    a = TwoViewMatcher(ladder, _cfg(), monolith=True,
                       monolith_segments=1, seed=3).match(img1, img2)
    b = TwoViewMatcher(ladder, _cfg(), monolith=True,
                       monolith_segments=2, seed=3).match(img1, img2)
    assert (a.n_matches, a.n_tentatives, a.steps_used) == \
        (b.n_matches, b.n_tentatives, b.steps_used)
