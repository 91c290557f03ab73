"""FAST/STAR detectors + FREAK/BRISK binary descriptors
(reference imagerepresentation.cpp:1077-1224 OpenCV wrappers)."""

import numpy as np
import jax
import jax.numpy as jnp

from mods_tpu.config import CapacityParams
from mods_tpu.descriptors.patch_descs import (brisk_descriptor,
                                              freak_descriptor)
from mods_tpu.detectors.corners import detect_fast, detect_star


def corner_image(h=160, w=160):
    """Isolated bright squares: L-corners fire FAST-9 (X-junctions of a
    checkerboard give only 8-runs and legitimately do not)."""
    img = np.full((h, w), 10.0, np.float32)
    corners = []
    for i in range(16, h - 24, 32):
        for j in range(16, w - 24, 32):
            img[i:i + 12, j:j + 12] = 200.0
            corners += [(j, i), (j + 11, i), (j, i + 11), (j + 11, i + 11)]
    return img, np.asarray(corners, np.float32)


def test_fast_finds_square_corners():
    img, corners = corner_image()
    caps = CapacityParams(per_view=512)
    regs = jax.jit(lambda v, w: detect_fast(v, w, caps))(
        jnp.asarray(img)[None], jnp.asarray([[160, 160]], jnp.int32))
    xy = np.asarray(regs.xy[0])
    m = np.asarray(regs.mask[0])
    assert m.sum() >= 20
    d = np.sqrt(((xy[m][:, None] - corners[None]) ** 2).sum(-1)).min(1)
    assert (d < 2.5).mean() > 0.8


def blob_image(h=192, w=192, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 5.0 * rng.uniform(0, 1, (h, w)).astype(np.float32)
    centers = []
    for _ in range(8):
        cx, cy = rng.uniform(50, w - 50), rng.uniform(50, h - 50)
        sig = rng.uniform(2.5, 6)
        img += 180.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                              / (2 * sig * sig))
        centers.append((cx, cy, sig))
    return np.clip(img, 0, 255), centers


def test_star_detects_blobs():
    img, centers = blob_image()
    caps = CapacityParams(per_view=256)
    regs = jax.jit(lambda v, w: detect_star(v, w, caps))(
        jnp.asarray(img)[None], jnp.asarray([[192, 192]], jnp.int32))
    xy = np.asarray(regs.xy[0])
    m = np.asarray(regs.mask[0])
    assert m.sum() >= 6
    found = sum(
        1 for cx, cy, sig in centers
        if (np.hypot(xy[m, 0] - cx, xy[m, 1] - cy) < max(3, sig)).any())
    assert found >= 6


def test_freak_brisk_bits():
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.uniform(0, 255, (4, 41, 41)).astype(np.float32))
    for fn in (freak_descriptor, brisk_descriptor):
        d = np.asarray(jax.jit(fn)(p))
        assert d.shape == (4, 512)
        assert set(np.unique(d)) <= {0.0, 1.0}
        assert (d[0] != d[1]).sum() > 50


def test_binary_patch_descs_match_under_shift():
    from scipy import ndimage
    rng = np.random.default_rng(5)
    K = 12
    base = np.stack([ndimage.gaussian_filter(
        rng.uniform(0, 255, (41, 41)), 1.5) for _ in range(K)]).astype(
        np.float32)
    warped = np.stack([ndimage.shift(b, rng.uniform(-0.8, 0.8, 2),
                                     mode="nearest") for b in base])
    for fn in (freak_descriptor, brisk_descriptor):
        d1 = np.asarray(fn(jnp.asarray(base)))
        d2 = np.asarray(fn(jnp.asarray(warped)))
        ham = (d1[:, None] != d2[None]).sum(-1)
        correct = (ham.argmin(1) == np.arange(K)).mean()
        assert correct >= 0.9, fn.__name__


def test_mrogh_descriptor():
    from scipy import ndimage
    from mods_tpu.descriptors.patch_descs import (PATCH_DIMS,
                                                  mrogh_descriptor)
    rng = np.random.default_rng(6)
    K = 10
    base = np.stack([ndimage.gaussian_filter(
        rng.uniform(0, 255, (41, 41)), 1.5) for _ in range(K)]).astype(
        np.float32)
    d = np.asarray(jax.jit(mrogh_descriptor)(jnp.asarray(base)))
    assert d.shape == (K, PATCH_DIMS["MROGH"])
    # rotation invariance (radial-frame gradients + intensity order)
    rot = np.stack([ndimage.rotate(b, 90) for b in base])
    d2 = np.asarray(mrogh_descriptor(jnp.asarray(rot)))
    cos = (d * d2).sum(1) / np.maximum(
        np.linalg.norm(d, axis=1) * np.linalg.norm(d2, axis=1), 1e-9)
    assert cos.mean() > 0.85
    # NN matching under rotation
    dist = ((d[:, None] - d2[None]) ** 2).sum(-1)
    assert (dist.argmin(1) == np.arange(K)).mean() >= 0.9


def test_learned_brief_pattern():
    """256-bit pattern is OpenCV's learned bit_pattern_31_ (the exact
    table cv::ORB samples, imagerepresentation.cpp:1077-1105): integer
    coords in [-13, 12], correct first rows, no degenerate pairs."""
    from mods_tpu.detectors.orb import brief_pattern
    pat = brief_pattern(256)
    assert pat.shape == (256, 2, 2)
    assert pat.min() >= -13 and pat.max() <= 12
    assert np.all(pat == np.round(pat))          # learned table is integer
    np.testing.assert_array_equal(pat[0], [[8, -3], [9, 5]])
    np.testing.assert_array_equal(pat[1], [[4, 2], [7, -12]])
    # every pair compares two distinct points
    assert np.all(np.any(pat[:, 0] != pat[:, 1], axis=-1))
    # non-256 widths keep the seeded fallback (float, clipped)
    pat2 = brief_pattern(128)
    assert pat2.shape == (128, 2, 2)
