"""SURF FastHessian detector + patch-functor descriptors
(reference opensurf/, descriptors/{surf,liop,daisy,ssim}descriptor.hpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.config import CapacityParams
from mods_tpu.descriptors.patch_descs import (PATCH_DIMS, daisy_descriptor,
                                              liop_descriptor,
                                              ssim_descriptor,
                                              surf_descriptor)
from mods_tpu.detectors.surf import detect_surf, integral_image


def blob_image(h=256, w=256, seed=0):
    """Gaussian blobs on a noisy background — ideal det-of-Hessian bait."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 10.0 * rng.uniform(0, 1, (h, w)).astype(np.float32)
    centers = []
    for _ in range(12):
        cx, cy = rng.uniform(56, w - 56), rng.uniform(56, h - 56)
        sig = rng.uniform(3, 8)
        img += 200.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                              / (2 * sig * sig))
        centers.append((cx, cy, sig))
    return np.clip(img, 0, 255), centers


def test_integral_image():
    img = jnp.arange(12.0).reshape(3, 4)
    ii = integral_image(img)
    assert ii.shape == (4, 5)
    assert float(ii[-1, -1]) == float(img.sum())
    assert float(ii[2, 2]) == float(img[:2, :2].sum())


def test_surf_detects_blobs():
    img, centers = blob_image()
    caps = CapacityParams(per_octave=512, per_view=256)
    views = jnp.asarray(img)[None]
    vhw = jnp.asarray([[256, 256]], jnp.int32)
    regs = jax.jit(lambda v, w: detect_surf(v, w, caps))(views, vhw)
    xy = np.asarray(regs.xy[0])
    m = np.asarray(regs.mask[0])
    s = np.asarray(regs.s[0])
    assert m.sum() >= 8
    # every planted blob center should have a detection nearby
    found = 0
    for cx, cy, sig in centers:
        d = np.hypot(xy[m, 0] - cx, xy[m, 1] - cy)
        if (d < max(3.0, sig / 2)).any():
            found += 1
    assert found >= 9
    assert (s[m] > 0.5).all()


def patches_fixture(K=6, P=41, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (K, P, P)).astype(np.float32)
    yy, xx = np.mgrid[0:P, 0:P].astype(np.float32)
    for k in range(K):
        base[k] += 100 * np.sin(xx / (2 + k)) * np.cos(yy / (3 + k))
    return jnp.asarray(np.clip(base, 0, 255))


@pytest.mark.parametrize("fn,name", [
    (surf_descriptor, "SURF"), (liop_descriptor, "LIOP"),
    (daisy_descriptor, "DAISY"), (ssim_descriptor, "SSIM")])
def test_patch_descriptor_shapes(fn, name):
    p = patches_fixture()
    d = np.asarray(jax.jit(fn)(p))
    assert d.shape == (6, PATCH_DIMS[name])
    assert np.isfinite(d).all()
    # distinct patches -> distinct descriptors
    assert np.linalg.norm(d[0] - d[1]) > 1e-3


def test_liop_rotation_invariance():
    """LIOP is rotation-invariant by construction (radial neighbor
    frames + intensity ordering, vl/liop.c)."""
    from scipy import ndimage
    p = np.asarray(patches_fixture(1, 41, 3))[0]
    p = ndimage.gaussian_filter(p, 2.0)
    pr = ndimage.rotate(p, 90)
    d0 = np.asarray(liop_descriptor(jnp.asarray(p)[None]))[0]
    d1 = np.asarray(liop_descriptor(jnp.asarray(pr)[None]))[0]
    cos = d0 @ d1 / (np.linalg.norm(d0) * np.linalg.norm(d1) + 1e-9)
    assert cos > 0.9


def test_surf_rung_end_to_end():
    """SURF detector rung + SURF/DAISY descriptors through the full
    two-view pipeline (imagerepresentation.cpp:1046-1076 dispatch)."""
    from mods_tpu.config import IterationParams, RansacParams
    from mods_tpu.pipeline import EngineConfig, TwoViewMatcher

    rng = np.random.default_rng(11)
    img1, _ = blob_image(192, 192, seed=11)
    img1 += 30 * rng.uniform(0, 1, img1.shape)
    img1 = np.clip(img1, 0, 255).astype(np.float32)
    img2 = np.roll(img1, (7, -5), (0, 1))
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_image=512,
                            max_angles=2),
        ransac=RansacParams(batch_hypotheses=256, max_rounds=2))
    it = IterationParams(detector="SURF",
                         descriptors=("SURF", "DAISY"),
                         fginn_threshold=(0.9, 0.9),
                         distance_threshold=(0.0, 0.0))
    m = TwoViewMatcher([it], cfg)
    res = m.match(img1, img2)
    assert res.n_matches >= 8
    # recovered model ~ translation by (-(-5), -7)? H maps 1 -> 2
    H = res.H / res.H[2, 2]
    assert abs(H[0, 2] - (-5)) < 2.0
    assert abs(H[1, 2] - 7) < 2.0


def test_descriptor_matching_quality():
    """Same-point patches under small warps should match (NN) better
    than random pairs for every patch descriptor."""
    from scipy import ndimage
    rng = np.random.default_rng(7)
    K, P = 16, 41
    base = rng.uniform(0, 255, (K, P, P)).astype(np.float32)
    base = np.stack([ndimage.gaussian_filter(b, 1.5) for b in base])
    warped = np.stack([
        ndimage.shift(ndimage.rotate(b, rng.uniform(-6, 6),
                                     reshape=False, mode="nearest"),
                      rng.uniform(-1, 1, 2), mode="nearest")
        for b in base])
    for fn in (surf_descriptor, daisy_descriptor, ssim_descriptor):
        d1 = np.asarray(fn(jnp.asarray(base)))
        d2 = np.asarray(fn(jnp.asarray(warped)))
        dist = ((d1[:, None] - d2[None]) ** 2).sum(-1)
        correct = (dist.argmin(1) == np.arange(K)).mean()
        assert correct >= 0.75, fn.__name__
