"""Descriptor invariance diagnosis: known-warp pairs, rank of the true
partner by descriptor distance."""

import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, RansacParams
from mods_tpu.models.flagship import _features_one
from mods_tpu.pipeline import EngineConfig

sys.path.insert(0, "/root/repo/tests")
from test_pipeline import textured_image, warp_np

cfg = EngineConfig(caps=CapacityParams(per_octave=2048, per_view=1024,
                                       per_image=2048, max_angles=2))

img = textured_image(256, 256, seed=11)


def feats(im):
    xy, A, s, d, m = jax.jit(
        lambda a: _features_one(a, cfg))(jnp.asarray(im))
    m = np.asarray(m)
    return (np.asarray(xy)[m], np.asarray(A)[m], np.asarray(s)[m],
            np.asarray(d)[m])


def rank_stats(name, H):
    i2 = warp_np(img, H, 256, 256)
    xy1, A1, s1, d1 = feats(img)
    xy2, A2, s2, d2 = feats(i2)
    ones = np.ones((len(xy1), 1))
    pr = np.concatenate([xy1, ones], 1) @ H.T
    proj = pr[:, :2] / pr[:, 2:]
    from scipy.spatial import cKDTree
    tree = cKDTree(xy2)
    dd, jj = tree.query(proj, k=1)
    gt = dd < 2.0
    if gt.sum() < 5:
        print(f"{name}: too few GT pairs ({gt.sum()})")
        return
    q = d1[gt]
    dist = ((q**2).sum(1)[:, None] + (d2**2).sum(1)[None]
            - 2 * q @ d2.T)
    order = np.argsort(dist, 1)
    # true partner set: ALL img2 features within 2px of the projection
    # (orientation duplicates share locations)
    proj_gt = proj[gt]
    ranks = []
    for i in range(len(q)):
        near = tree.query_ball_point(proj_gt[i], 2.0)
        r = min(np.where(order[i] == j)[0][0] for j in near)
        ranks.append(r)
    ranks = np.array(ranks)
    print(f"{name}: n1={len(xy1)} n2={len(xy2)} gt={gt.sum()} "
          f"rank0={float((ranks == 0).mean()):.2f} "
          f"rank<=4={float((ranks <= 4).mean()):.2f} "
          f"medrank={np.median(ranks):.0f}")


I = np.eye(3)
rank_stats("identity", I)

t = np.deg2rad(40)
c, s = np.cos(t), np.sin(t)
cx = cy = 128.0
Hrot = np.array([[c, -s, cx - c * cx + s * cy],
                 [s, c, cy - s * cx - c * cy], [0, 0, 1]])
rank_stats("rot40", Hrot)

Htilt = np.array([[0.55, 0.0, 40.0], [0.0, 1.0, 0.0], [0, 0, 1.0]])
rank_stats("tilt1.8x", Htilt)

Hscale = np.array([[0.6, 0, 40.0], [0, 0.6, 40.0], [0, 0, 1.0]])
rank_stats("scale0.6", Hscale)

Hshear = np.array([[1.0, 0.35, -20.0], [0.1, 1.0, 0.0], [0, 0, 1.0]])
rank_stats("shear", Hshear)
