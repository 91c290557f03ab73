"""The reference's bundled smoke test: cat.png vs cat2.png with the
ground-truth homography cat.txt (README.md:60-67, build/examples/).

This is a HARD extreme-view pair — the reference needs several escalation
rungs.  Marked slow; run with `-m slow` or by node id.
"""

import numpy as np
import pytest
from PIL import Image

from mods_tpu.config import CapacityParams, IterationParams, RansacParams
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from mods_tpu.verify import load_h_file
from tests.conftest import cat_pair_paths


def load_cat():
    p1, p2, ph = cat_pair_paths()
    img1 = np.asarray(Image.open(p1))
    img2 = np.asarray(Image.open(p2))
    H = load_h_file(ph)
    return img1, img2, H / H[2, 2]


@pytest.mark.slow
def test_cat_pair_ladder():
    img1, img2, Hgt = load_cat()
    ladder = [
        IterationParams(tilt_set=(1.0,), scale_set=(1.0,)),
        IterationParams(tilt_set=(1.0, 2.0, 4.0, 8.0), scale_set=(1.0,),
                        phi_base=360.0),
    ]
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=2048, per_view=2048,
                            per_image=8192, max_angles=2),
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=1024,
                            max_rounds=4),
        min_matches=10)
    m = TwoViewMatcher(ladder, cfg).match(img1, img2)
    assert m.n_matches >= 10, (m.n_matches, m.n_tentatives)

    # verify against ground truth: the matches themselves must be GT
    # inliers (reference GR_TRUTH mode, mods.cpp:312-335)
    ones = np.ones((m.xy1.shape[0], 1), np.float32)
    p = np.concatenate([m.xy1, ones], 1) @ Hgt.T
    proj = p[:, :2] / p[:, 2:]
    err = np.linalg.norm(proj - m.xy2, axis=1)
    frac_true = float((err < 5.0).mean())
    assert frac_true > 0.7, (frac_true, m.n_matches)
