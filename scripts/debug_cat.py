"""Diagnose the cat pair on the real TPU chip."""

import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from mods_tpu.runtime import setup_cache
setup_cache()

from mods_tpu.config import (CapacityParams, IterationParams, RansacParams)
from mods_tpu.pipeline import (EngineConfig, FeatureStore, TwoViewMatcher,
                               _match_program)
from mods_tpu.timing import TimeLog
from mods_tpu.verify import load_h_file

base = "/root/reference/build/examples"
img1 = np.asarray(Image.open(f"{base}/cat.png"))
img2 = np.asarray(Image.open(f"{base}/cat2.png"))
Hgt = load_h_file(f"{base}/cat.txt")
Hgt = Hgt / Hgt[2, 2]

cfg = EngineConfig(
    caps=CapacityParams(per_octave=8192, per_view=4096, per_image=16384,
                        max_angles=2),
    ransac=RansacParams(err_threshold=3.0, batch_hypotheses=1024,
                        max_rounds=4),
    min_matches=10)

matcher = TwoViewMatcher([IterationParams()], cfg)
from mods_tpu.ops.image import to_gray
g1 = np.asarray(to_gray(jnp.asarray(img1)))
g2 = np.asarray(to_gray(jnp.asarray(img2)))
print("gray shapes", g1.shape, g2.shape)

store1, store2 = FeatureStore(), FeatureStore()
log = TimeLog()
it = IterationParams()
t0 = time.time()
matcher._process_image(g1, it, [], store1, log)
print(f"img1 features: {store1.count}  ({time.time()-t0:.1f}s)")
t0 = time.time()
matcher._process_image(g2, it, [], store2, log)
print(f"img2 features: {store2.count}  ({time.time()-t0:.1f}s)")

print("s stats img1:", np.percentile(store1.s, [0, 25, 50, 75, 100]))
print("response stats:", np.percentile(np.abs(store1.response),
                                       [0, 50, 100]))

# descriptor sanity
d = store1.desc
print("desc norm mean:", np.linalg.norm(d, axis=1).mean())
print("desc zero rows:", (np.abs(d).sum(1) < 1e-3).sum())

# GT-based: how many detections in img1 map into img2 with a detection
# nearby?
ones = np.ones((store1.count, 1), np.float32)
p = np.concatenate([store1.xy, ones], 1) @ Hgt.T
proj = p[:, :2] / p[:, 2:]
inb = ((proj[:, 0] > 0) & (proj[:, 0] < g2.shape[1])
       & (proj[:, 1] > 0) & (proj[:, 1] < g2.shape[0]))
print("img1 kps projecting into img2:", inb.sum())
from scipy.spatial import cKDTree  # noqa

try:
    tree = cKDTree(store2.xy)
    dd, _ = tree.query(proj[inb], k=1)
    print("proj kps with img2 kp within 3px:", (dd < 3).sum(),
          "within 6px:", (dd < 6).sum())
except Exception as e:
    print("kdtree skipped", e)

# matching
cap = cfg.caps.per_image
xy1, A1, s1, d1, m1 = store1.padded(cap)
xy2, A2, s2, d2, m2 = store2.padded(cap)
prog = _match_program(cap, d1.shape[1], cfg, False)
out = prog(*map(jnp.asarray, (xy1, A1, s1, d1, m1, xy2, A2, s2, d2, m2)),
           jnp.float32(0.8), jax.random.PRNGKey(0))
out = jax.tree.map(np.asarray, out)
print("tentatives:", out["n_tent"], "inliers:", out["n_inl"])

# GT check on tentatives
tm = out["tent_mask"]
t1 = xy1[tm]
t2 = xy2[out["idx2"]][tm]
ones = np.ones((t1.shape[0], 1), np.float32)
p = np.concatenate([t1, ones], 1) @ Hgt.T
proj = p[:, :2] / p[:, 2:]
err = np.linalg.norm(proj - t2, axis=1)
print("tentative GT inliers (<5px):", (err < 5).sum(), "of", len(err))
