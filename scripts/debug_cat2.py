import sys
import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mods_tpu.config import AffineShapeParams, PyramidParams
from mods_tpu.detectors import scale_space as ss
from mods_tpu.detectors.baumberg import baumberg_adapt
from mods_tpu.detectors.hessaff import _thresholds
from mods_tpu.ops.image import to_gray, pad_to, round_up

img = np.asarray(Image.open("/root/reference/build/examples/cat.png"))
g = np.asarray(to_gray(jnp.asarray(img)))
h, w = g.shape
gc = np.asarray(pad_to(jnp.asarray(g), round_up(h, 128), round_up(w, 128),
                       128.0))
print("canvas", gc.shape)

p = PyramidParams()
aff = AffineShapeParams()
pos_th, fin_th = _thresholds(p)
octs = ss.build_pyramid(jnp.asarray(gc)[None], p)
print("n_oct", len(octs))

tot_cand = tot_loc = tot_baum = 0
for oi, o in enumerate(octs[:5]):
    pd = o.pixel_distance
    nms = ss._nms_mask(o.resps, pos_th, -pos_th)[0]
    vh = int(h / pd)
    vw = int(w / pd)
    cap = 4096
    lvl, r, c, valid = ss.candidate_indices(nms, p.border, vw, vh, cap)
    nc = int(np.asarray(valid).sum())
    loc = ss.localize_keypoints(o.resps[0], o.blurs[0], lvl, r, c, valid,
                                p, fin_th, p.detector_type)
    nl = int(np.asarray(loc["ok"]).sum())
    xy = jnp.stack([loc["c"] + loc["b"][:, 0],
                    loc["r"] + loc["b"][:, 1]], -1)
    s_oct = jnp.asarray(o.sigmas)[lvl] * jnp.exp2(loc["b"][:, 2] / p.n_scales)
    A, ok = baumberg_adapt(o.blurs[0], lvl - 1, xy, s_oct, loc["ok"], aff)
    nb = int(np.asarray(ok).sum())
    print(f"oct{oi}: cands={nc} localized={nl} baumberg={nb}")
    tot_cand += nc
    tot_loc += nl
    tot_baum += nb
print("totals:", tot_cand, tot_loc, tot_baum)
