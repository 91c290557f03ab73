"""Committed accuracy regression: the reference's bundled smoke test
(cat pair, README.md:60-67) through the REAL CVIU INI configs in
GR_TRUTH dual mode (doBothRANSACgroundTruth, mods.cpp:312-335).

Writes ACCURACY_cat.json at the repo root with our measured
{true_matches, tentatives, inlier_ratio, ransac_matches, ransac_true}
next to the reference binary's measured numbers (BASELINE.md:
LORANSAC-H 20 true / 52 tentatives / 38.5%; GR_TRUTH dual 21/52/40.4%).

    python -u scripts/accuracy_cat.py            # TPU (or current backend)
    JAX_PLATFORMS=cpu python -u scripts/accuracy_cat.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF_DIR = "/root/reference/build"

REFERENCE = {  # measured from the reference binary (BASELINE.md)
    "true_matches": 20, "tentatives": 52, "inlier_ratio": 0.385,
    "gt_dual_true": 21, "gt_dual_inlier_ratio": 0.404,
}


def main():
    from mods_tpu.runtime import setup_cache
    setup_cache()
    import jax
    import numpy as np
    from PIL import Image
    from mods_tpu.cli import _build_engine
    from mods_tpu.config import replace
    from mods_tpu.pipeline import TwoViewMatcher
    from mods_tpu.verify import load_h_file

    img1 = np.asarray(Image.open(f"{REF_DIR}/examples/cat.png"),
                      dtype=np.float32)
    img2 = np.asarray(Image.open(f"{REF_DIR}/examples/cat2.png"),
                      dtype=np.float32)
    gt_h = load_h_file(f"{REF_DIR}/examples/cat.txt")

    cfg, ladder = _build_engine(f"{REF_DIR}/config_iter_mods_cviu.ini",
                                f"{REF_DIR}/iters_mods_cviu.ini",
                                ver_type="GR_TRUTH")
    cfg = replace(cfg, do_both_ransac_gt=True)
    matcher = TwoViewMatcher(ladder, cfg, stop_mode="sync")
    for attempt in range(6):
        try:
            t0 = time.perf_counter()
            res = matcher.match(img1, img2, gt_h=gt_h)
            break
        except jax.errors.JaxRuntimeError as e:
            print(f"retry {attempt}: {str(e)[:120]}", file=sys.stderr)
            if attempt == 5:
                raise
    dt = time.perf_counter() - t0
    # steady-state wall (programs warm), perturbed inputs
    t0 = time.perf_counter()
    matcher.match(img1 + 0.25, img2 + 0.25, gt_h=gt_h)
    steady_s = time.perf_counter() - t0

    nt = max(res.n_tentatives, 1)
    ours = {
        "true_matches": int(res.n_matches),
        "tentatives": int(res.n_tentatives),
        "inlier_ratio": round(res.n_matches / nt, 4),
        "ransac_matches": int(res.extras.get("ransac_matches", -1)),
        "ransac_true": int(res.extras.get("ransac_true", -1)),
        "steps_used": int(res.steps_used),
        "wall_s": round(dt, 2),
        "steady_wall_s": round(steady_s, 2),
        "backend": jax.default_backend(),
    }
    out = {"workload": "cat pair, full CVIU ladder, GR_TRUTH dual mode",
           "ours": ours, "reference_binary": REFERENCE}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ACCURACY_cat.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
