"""Half-resolution cat pair on CPU: feature counts + ladder matching
with GT verification.  CPU-feasible sanity run for the real-image path."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, IterationParams, RansacParams
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from mods_tpu.verify import load_h_file

base = "/root/reference/build/examples"
im1 = Image.open(f"{base}/cat.png")
im2 = Image.open(f"{base}/cat2.png")
f = 0.5
im1 = im1.resize((int(im1.width * f), int(im1.height * f)),
                 Image.BILINEAR)
im2 = im2.resize((int(im2.width * f), int(im2.height * f)),
                 Image.BILINEAR)
img1 = np.asarray(im1)
img2 = np.asarray(im2)
Hgt = load_h_file(f"{base}/cat.txt")
S = np.diag([f, f, 1.0])
Hgt = S @ Hgt @ np.linalg.inv(S)
Hgt = Hgt / Hgt[2, 2]
print("sizes:", img1.shape, img2.shape)

ladder = [
    IterationParams(tilt_set=(1.0,), scale_set=(1.0,)),
    IterationParams(tilt_set=(1.0, 2.0, 4.0, 8.0), scale_set=(1.0,),
                    phi_base=360.0),
]
cfg = EngineConfig(
    caps=CapacityParams(per_octave=4096, per_view=2048, per_image=8192,
                        max_angles=2),
    ransac=RansacParams(err_threshold=3.0, batch_hypotheses=1024,
                        max_rounds=4),
    min_matches=10)

m = TwoViewMatcher(ladder, cfg)
t0 = time.time()
res = m.match(img1, img2)
print(f"match done in {time.time()-t0:.1f}s")
print("steps:", res.steps_used, "tentatives:", res.n_tentatives,
      "matches:", res.n_matches)
if res.n_matches:
    ones = np.ones((res.xy1.shape[0], 1), np.float32)
    p = np.concatenate([res.xy1, ones], 1) @ Hgt.T
    proj = p[:, :2] / p[:, 2:]
    err = np.linalg.norm(proj - res.xy2, axis=1)
    print("GT inlier fraction (<5px):", float((err < 5).mean()))
    print("median err:", float(np.median(err)))
print(res.log.finalize().summary())
