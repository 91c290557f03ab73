"""GT-aware diagnosis: are corresponding features detected, and do their
descriptors rank first among neighbors?"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, IterationParams, RansacParams
from mods_tpu.pipeline import EngineConfig, FeatureStore, TwoViewMatcher
from mods_tpu.timing import TimeLog
from mods_tpu.verify import load_h_file

base = "/root/reference/build/examples"
f = 0.5
im1 = Image.open(f"{base}/cat.png")
im2 = Image.open(f"{base}/cat2.png")
im1 = im1.resize((int(im1.width * f), int(im1.height * f)), Image.BILINEAR)
im2 = im2.resize((int(im2.width * f), int(im2.height * f)), Image.BILINEAR)
img1 = np.asarray(im1)
img2 = np.asarray(im2)
Hgt = load_h_file(f"{base}/cat.txt")
S = np.diag([f, f, 1.0])
Hgt = S @ Hgt @ np.linalg.inv(S)
Hgt /= Hgt[2, 2]

cfg = EngineConfig(
    caps=CapacityParams(per_octave=4096, per_view=2048, per_image=8192,
                        max_angles=2),
    ransac=RansacParams(err_threshold=3.0, batch_hypotheses=512,
                        max_rounds=2))
m = TwoViewMatcher([], cfg)
from mods_tpu.ops.image import to_gray
g1 = np.asarray(to_gray(jnp.asarray(img1)))
g2 = np.asarray(to_gray(jnp.asarray(img2)))

ladder = [
    IterationParams(tilt_set=(1.0,), scale_set=(1.0,)),
    IterationParams(tilt_set=(1.0, 2.0, 4.0, 8.0), scale_set=(1.0,),
                    phi_base=360.0),
]
s1, s2 = FeatureStore(), FeatureStore()
log = TimeLog()
p1: list = []
p2: list = []
for it in ladder:
    p1 = m._process_image(g1, it, p1, s1, log)
    p2 = m._process_image(g2, it, p2, s2, log)
    print("counts:", s1.count, s2.count, flush=True)

ones = np.ones((s1.count, 1))
pr = np.concatenate([s1.xy, ones], 1) @ Hgt.T
proj = (pr[:, :2] / pr[:, 2:]).astype(np.float32)
inb = ((proj[:, 0] > 0) & (proj[:, 0] < g2.shape[1])
       & (proj[:, 1] > 0) & (proj[:, 1] < g2.shape[0]))
from scipy.spatial import cKDTree
tree = cKDTree(s2.xy)
dd, jj = tree.query(proj, k=1)
gt_pair = inb & (dd < 3.0)
print("features:", s1.count, s2.count)
print("GT pairs (proj within 3px):", gt_pair.sum())

# descriptor ranking for GT pairs
idx1 = np.where(gt_pair)[0]
if len(idx1) > 200:
    idx1 = idx1[np.linspace(0, len(idx1) - 1, 200).astype(int)]
d1 = s1.desc[idx1]
d2 = s2.desc
dist = ((d1**2).sum(1)[:, None] + (d2**2).sum(1)[None]
        - 2 * d1 @ d2.T)
order = np.argsort(dist, axis=1)
gt_j = jj[idx1]
ranks = []
for i in range(len(idx1)):
    r = np.where(order[i] == gt_j[i])[0]
    ranks.append(r[0] if len(r) else 9999)
ranks = np.asarray(ranks)
print("desc rank of GT partner: median", np.median(ranks),
      "| <=0:", (ranks == 0).mean(), "| <=4:", (ranks <= 4).mean())
# ratio of d(gt)/d(nearest non-duplicate)
d_gt = dist[np.arange(len(idx1)), gt_j]
d_min = dist[np.arange(len(idx1)), order[:, 0]]
print("median d_gt/d_min:", np.median(d_gt / np.maximum(d_min, 1e-9)))
