"""KAZE nonlinear-scale-space detector + M-LDB descriptor tests
(reference akaze/src/lib, dispatch imagerepresentation.cpp:1132-1152)."""

import numpy as np
import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams
from mods_tpu.descriptors.patch_descs import PATCH_DIMS, mldb_descriptor
from mods_tpu.detectors.kaze import _fed_tau_steps, detect_kaze


def test_fed_steps_cover_time():
    for T in (0.5, 3.0, 20.0):
        taus = _fed_tau_steps(T)
        assert abs(sum(taus) - T) < 1e-9
        assert all(t > 0 for t in taus)


def blob_image(h=192, w=192, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 15.0 * rng.uniform(0, 1, (h, w)).astype(np.float32)
    centers = []
    for _ in range(10):
        cx, cy = rng.uniform(40, w - 40), rng.uniform(40, h - 40)
        sig = rng.uniform(3, 7)
        img += 180.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                              / (2 * sig * sig))
        centers.append((cx, cy, sig))
    return np.clip(img, 0, 255), centers


def test_kaze_detects_blobs():
    img, centers = blob_image()
    caps = CapacityParams(per_octave=512, per_view=256)
    views = jnp.asarray(img)[None]
    vhw = jnp.asarray([[192, 192]], jnp.int32)
    regs = jax.jit(lambda v, w: detect_kaze(v, w, caps))(views, vhw)
    xy = np.asarray(regs.xy[0])
    m = np.asarray(regs.mask[0])
    assert m.sum() >= 8
    found = 0
    for cx, cy, sig in centers:
        d = np.hypot(xy[m, 0] - cx, xy[m, 1] - cy)
        if (d < max(3.0, sig / 2)).any():
            found += 1
    assert found >= 7


def test_kaze_edge_vs_blob_response():
    """Nonlinear diffusion preserves edges but smooths noise: responses
    should concentrate on blob structures rather than noise."""
    img, centers = blob_image(seed=3)
    caps = CapacityParams(per_octave=512, per_view=64)
    views = jnp.asarray(img)[None]
    vhw = jnp.asarray([[192, 192]], jnp.int32)
    regs = detect_kaze(views, vhw, caps)
    xy = np.asarray(regs.xy[0])
    m = np.asarray(regs.mask[0])
    r = np.abs(np.asarray(regs.response[0]))
    # the strongest response must be near a planted blob
    top = xy[m][np.argmax(r[m])]
    dmin = min(np.hypot(top[0] - cx, top[1] - cy)
               for cx, cy, _ in centers)
    assert dmin < 5.0


def test_mldb_descriptor():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(0, 255, (5, 41, 41)).astype(np.float32))
    d = np.asarray(jax.jit(mldb_descriptor)(p))
    assert d.shape == (5, PATCH_DIMS["MLDB"])
    assert set(np.unique(d)) <= {0.0, 1.0}
    # hamming distance between distinct patches is nonzero
    assert (d[0] != d[1]).sum() > 20


def test_kaze_rung_end_to_end():
    from mods_tpu.config import IterationParams, RansacParams
    from mods_tpu.pipeline import EngineConfig, TwoViewMatcher

    img1, _ = blob_image(160, 160, seed=9)
    rng = np.random.default_rng(9)
    img1 += 25 * rng.uniform(0, 1, img1.shape)
    img1 = np.clip(img1, 0, 255).astype(np.float32)
    img2 = np.roll(img1, (-6, 4), (0, 1))
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_image=512,
                            max_angles=2),
        ransac=RansacParams(batch_hypotheses=256, max_rounds=2),
        kaze_threshold=0.0002)   # small noisy test image
    it = IterationParams(detector="KAZE", descriptors=("KAZE",),
                         fginn_threshold=(0.9,),
                         distance_threshold=(0.0,))
    m = TwoViewMatcher([it], cfg)
    res = m.match(img1, img2)
    assert res.n_matches >= 8
    H = res.H / res.H[2, 2]
    assert abs(H[0, 2] - 4) < 2.0
    assert abs(H[1, 2] - (-6)) < 2.0
