"""SIFT descriptor and orientation tests."""

import numpy as np
import jax.numpy as jnp

from mods_tpu.config import SIFTDescriptorParams
from mods_tpu.descriptors.orientation import (find_peaks,
                                              orientation_histograms,
                                              smooth_circular)
from mods_tpu.descriptors.sift import (compute_sift, sift_norm,
                                       spatial_bin_weights)


def ramp_patch(angle_deg, size=41, slope=20.0):
    """Patch with constant gradient in direction angle (image coords)."""
    a = np.deg2rad(angle_deg)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    return slope * (np.cos(a) * xs + np.sin(a) * ys)


def test_spatial_bin_weights_partition():
    W = spatial_bin_weights(41, 4)
    # interior pixels' weights sum to 1 (border pixels lose clipped bins)
    s = W.sum(axis=1)
    assert (s <= 1.0 + 1e-5).all()
    assert (s[8:33] > 0.99).all()
    assert W.shape == (41, 4)


def test_orientation_peak_of_ramp():
    # gradient pointing at +x -> ori = 0 -> bin 18 of 36
    p = jnp.asarray(ramp_patch(0.0)[None])
    h = orientation_histograms(p)
    hs = smooth_circular(h)
    ang, m = find_peaks(hs, 3, 0.8)
    ang = np.asarray(ang)[np.asarray(m)]
    assert len(ang) >= 1
    # angle should be near 0
    assert min(abs(a) for a in ang) < np.deg2rad(8), ang


def test_orientation_peak_rotates():
    for deg in [45.0, 90.0, -120.0]:
        p = jnp.asarray(ramp_patch(deg)[None])
        hs = smooth_circular(orientation_histograms(p))
        ang, m = np.asarray(find_peaks(hs, 3, 0.8)[0]), np.asarray(
            find_peaks(hs, 3, 0.8)[1])
        got = ang[m]
        target = np.deg2rad(deg)
        diff = np.min(np.abs(np.angle(np.exp(1j * (got - target)))))
        assert diff < np.deg2rad(8), (deg, got)


def test_sift_shape_and_norm():
    rngp = np.random.default_rng(3)
    patches = rngp.uniform(0, 255, (4, 41, 41)).astype(np.float32)
    p = SIFTDescriptorParams()
    d = np.asarray(compute_sift(jnp.asarray(patches), p))
    assert d.shape == (4, 128)
    assert (d >= 0).all() and (d <= 255).all()
    # quantized 512-length convention: squared norm close to 512^2
    n = np.linalg.norm(d, axis=1)
    assert (np.abs(n - 512.0) < 30).all(), n


def test_root_sift_norm_props():
    v = jnp.asarray(np.random.default_rng(0).uniform(
        0, 10, (3, 128)).astype(np.float32))
    q = np.asarray(sift_norm(v, 0.2, root=True))
    assert (q >= 0).all() and (q <= 255).all()


def test_half_sift_dim():
    p = SIFTDescriptorParams(half_sift=True)
    patches = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (2, 41, 41)).astype(np.float32))
    d = np.asarray(compute_sift(patches, p))
    assert d.shape == (2, 64)


def test_sift_gradient_direction_selectivity():
    # ramp at 0 deg vs 90 deg must produce very different descriptors;
    # the same ramp twice must produce identical ones
    p = SIFTDescriptorParams()
    d0 = np.asarray(compute_sift(jnp.asarray(ramp_patch(0.0)[None]), p))[0]
    d0b = np.asarray(compute_sift(jnp.asarray(ramp_patch(0.0)[None]), p))[0]
    d90 = np.asarray(compute_sift(jnp.asarray(ramp_patch(90.0)[None]),
                                  p))[0]
    np.testing.assert_array_equal(d0, d0b)
    cos = d0 @ d90 / (np.linalg.norm(d0) * np.linalg.norm(d90))
    assert cos < 0.35, cos


def test_sift_rotation_covariance():
    # descriptor of a rotated patch == rotated descriptor (orientation
    # bins shift); use 90 deg rotation of the patch content
    p = SIFTDescriptorParams()
    rngp = np.random.default_rng(5)
    base = rngp.uniform(0, 255, (41, 41)).astype(np.float32)
    rot = np.rot90(base, k=-1).copy()  # 90 deg clockwise
    d1 = np.asarray(compute_sift(jnp.asarray(base[None]), p))[0]
    d2 = np.asarray(compute_sift(jnp.asarray(rot[None]), p))[0]
    h1 = d1.reshape(4, 4, 8)
    h2 = d2.reshape(4, 4, 8)
    # rotating image content 90deg cw maps spatial bins (r, c)->(c, R-1-r)
    # and shifts orientation bins by 2
    h1r = np.rot90(h1, k=-1, axes=(0, 1))
    h1r = np.roll(h1r, 2, axis=2)
    cos = (h1r.ravel() @ h2.ravel() /
           (np.linalg.norm(h1r) * np.linalg.norm(h2)))
    assert cos > 0.9, cos
