"""Full-res cat pair on TPU with a near-reference ladder and per-rung
GT diagnostics."""

import sys
import time

sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache

setup_cache()

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, IterationParams, RansacParams
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from mods_tpu.verify import load_h_file
from mods_tpu.ops.image import to_gray
from mods_tpu.timing import TimeLog

base = "/root/reference/build/examples"
img1 = np.asarray(Image.open(f"{base}/cat.png"))
img2 = np.asarray(Image.open(f"{base}/cat2.png"))
Hgt = load_h_file(f"{base}/cat.txt")
Hgt /= Hgt[2, 2]

ladder = [
    IterationParams(detector="HessianAffine", tilt_set=(1.0,),
                    scale_set=(1.0,)),
    IterationParams(detector="MSER", tilt_set=(1.0,),
                    scale_set=(1.0, 0.25, 0.125),
                    fginn_threshold=(0.85,)),
    IterationParams(detector="MSER", tilt_set=(1.0, 3.0, 6.0, 9.0),
                    scale_set=(1.0,), phi_base=360.0,
                    fginn_threshold=(0.8,)),
    IterationParams(detector="HessianAffine",
                    tilt_set=(1.0, 2.0, 4.0, 6.0, 8.0),
                    scale_set=(1.0,), phi_base=360.0, init_sigma=0.2),
    IterationParams(detector="HessianAffine",
                    tilt_set=(1.0, 2.0, 4.0, 6.0, 8.0),
                    scale_set=(1.0,), phi_base=120.0, init_sigma=0.2),
]

cfg = EngineConfig(
    caps=CapacityParams(per_octave=8192, per_view=2048, per_image=16384,
                        max_angles=2, tentatives=16384),
    ransac=RansacParams(err_threshold=3.0, batch_hypotheses=2048,
                        max_rounds=4),
    min_matches=10)

from mods_tpu.config import as_rungs

m = TwoViewMatcher(ladder, cfg)
m._bank = {}
g1 = np.asarray(to_gray(jnp.asarray(img1)))
g2 = np.asarray(to_gray(jnp.asarray(img2)))
m._wh = (max(g1.shape[1], g2.shape[1]), max(g1.shape[0], g2.shape[0]))
stores1, stores2 = {}, {}
prev1, prev2 = {}, {}
log = TimeLog()

for ri, rung in enumerate(as_rungs(ladder)):
    it = rung.dets[0]
    t0 = time.time()
    for it_ in rung.dets:
        prev1[it_.detector] = m._process_image(
            g1, it_, prev1.get(it_.detector, []), stores1, log)
        prev2[it_.detector] = m._process_image(
            g2, it_, prev2.get(it_.detector, []), stores2, log)
    t1 = time.time()
    m._execute_plan(stores1, stores2, rung, log)
    out = m._verify_bank(log)
    t2 = time.time()
    c1 = {k: v.count for k, v in stores1.items()}
    c2 = {k: v.count for k, v in stores2.items()}
    msg = (f"rung{ri} det={it.detector}: feats1={c1} feats2={c2} "
           f"({t1-t0:.1f}s + match {t2-t1:.1f}s)")
    if out is not None:
        # GT-correctness of tentatives
        tm = np.asarray(out["n_tent"])
        xy1 = out["xy1_all"]
        xy2 = out["xy2_all"]
        ones = np.ones((xy1.shape[0], 1))
        p = np.concatenate([xy1, ones], 1) @ Hgt.T
        proj = p[:, :2] / np.where(p[:, 2:] != 0, p[:, 2:], 1)
        err = np.linalg.norm(proj - xy2, axis=1)
        # only count within the combined mask region (first n_tent rows)
        n = int(out["n_tent"])
        good = (err[:n] < 5.0).sum() if n else 0
        msg += (f" tent={n} GTgood={good} inl={int(out['n_inl'])}")
    print(msg, flush=True)
    if out is not None and int(out["n_inl"]) >= cfg.min_matches:
        print("STOP: enough matches", flush=True)
        break
