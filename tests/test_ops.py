"""Unit tests for core image ops against straightforward numpy oracles."""

import numpy as np
import jax.numpy as jnp

from mods_tpu.ops.gaussian import gauss_kernel_1d, gaussian_blur
from mods_tpu.ops.image import (circular_gauss_mask, gauss_mask, gradient,
                                half_image, patch_gradient, to_gray)
from mods_tpu.ops.warp import (affine_warp, bilinear_sample, extract_patches,
                               touches_border)


def np_blur_1d(img, taps, axis):
    half = len(taps) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (half, half)
    x = np.pad(img, pad, mode="edge")
    out = np.zeros_like(img)
    for i, t in enumerate(taps):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + img.shape[axis])
        out += t * x[tuple(sl)]
    return out


def test_gauss_kernel_props():
    k = gauss_kernel_1d(1.6)
    assert k.shape[0] % 2 == 1
    assert abs(k.sum() - 1.0) < 1e-6
    assert k.shape[0] == int(6 * 1.6 + 1) + (1 - int(6 * 1.6 + 1) % 2)


def test_gaussian_blur_matches_numpy(rng):
    img = rng.uniform(0, 255, (20, 31)).astype(np.float32)
    sigma = 1.3
    got = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
    taps = gauss_kernel_1d(sigma)
    want = np_blur_1d(np_blur_1d(img, taps, 0), taps, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_gaussian_blur_constant_invariant():
    img = jnp.full((16, 16), 77.0)
    out = gaussian_blur(img, 2.0)
    np.testing.assert_allclose(np.asarray(out), 77.0, rtol=1e-5)


def test_half_image():
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    out = np.asarray(half_image(img))
    want = np.array([[2.5, 4.5], [10.5, 12.5]], np.float32)
    np.testing.assert_allclose(out, want)


def test_gradient_central():
    img = jnp.asarray(np.arange(25, dtype=np.float32).reshape(5, 5))
    gx, gy = gradient(img)
    # interior: x-gradient of ramp with slope 1 -> central diff = 2
    np.testing.assert_allclose(np.asarray(gx)[1:-1, 1:-1], 2.0)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, 1:-1], 10.0)
    assert np.asarray(gx)[0].sum() == 0  # zero border


def test_patch_gradient_onesided():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    gx, gy = patch_gradient(img)
    np.testing.assert_allclose(np.asarray(gx)[:, 0], 1.0)
    np.testing.assert_allclose(np.asarray(gx)[:, 1], 2.0)
    np.testing.assert_allclose(np.asarray(gy)[0, :], 4.0)


def test_bilinear_sample_identity_and_interp():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    x = jnp.asarray([1.0, 1.5])
    y = jnp.asarray([1.0, 0.5])
    out = np.asarray(bilinear_sample(img, x, y))
    assert out[0] == 5.0
    assert out[1] == (1.0 + 2.0 + 5.0 + 6.0) / 4.0


def test_bilinear_sample_oob_fill():
    img = jnp.ones((4, 4))
    out = np.asarray(bilinear_sample(img, jnp.asarray([-1.0, 3.5]),
                                     jnp.asarray([0.0, 0.0]), fill=7.0))
    np.testing.assert_allclose(out, [7.0, 7.0])


def test_affine_warp_identity():
    img = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (8, 9)).astype(np.float32))
    m = jnp.asarray([[1.0, 0, 0], [0, 1, 0]])
    out = np.asarray(affine_warp(img, m, 8, 9, fill=0.0))
    np.testing.assert_allclose(out[:-1, :-1], np.asarray(img)[:-1, :-1])


def test_extract_patches_translation():
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    xy = jnp.asarray([[5.0, 5.0]])
    A = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    p = np.asarray(extract_patches(img, xy, A, 5))
    want = np.asarray(img)[3:8, 3:8]
    np.testing.assert_allclose(p[0], want)


def test_touches_border():
    xy = jnp.asarray([[20.0, 20.0], [2.0, 2.0]])
    A = jnp.broadcast_to(jnp.eye(2), (2, 2, 2))
    bad = np.asarray(touches_border(40, 40, xy, A, 5.0, 5.0))
    assert not bad[0]
    assert bad[1]


def test_to_gray_mean():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 30
    img[..., 1] = 60
    img[..., 2] = 90
    np.testing.assert_allclose(np.asarray(to_gray(jnp.asarray(img))), 60.0)


def test_masks():
    m = circular_gauss_mask(41, 41 / 3.0)
    assert m.shape == (41, 41)
    assert m[20, 20] == 1.0
    assert m[0, 0] == 0.0  # outside circle
    g = gauss_mask(19)
    assert g[9, 9] == 1.0
    assert g[0, 0] > 0


def test_shift_blur_matches_conv():
    """The TPU shift-and-add blur path must equal the CPU sliding conv
    (same reference taps) — it replaced the dense band-matrix matmul."""
    from mods_tpu.ops.gaussian import (_conv1d, _shift_blur, _taps_rt,
                                       gauss_kernel_1d)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (2, 37, 53)).astype(np.float32))
    for sigma in (0.8, 1.6, 3.2):
        k = jnp.asarray(gauss_kernel_1d(sigma))
        for ax in (-1, -2):
            a = _conv1d(img, k, axis=ax)
            b = _shift_blur(img, k, axis=ax)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)
    # runtime-sigma taps agree with the static kernel (padded window)
    for sigma in (0.9, 2.5):
        t = np.asarray(_taps_rt(jnp.float32(sigma), 15))
        k = gauss_kernel_1d(sigma)
        r = 15 - len(k) // 2
        np.testing.assert_allclose(t[r:r + len(k)], k, atol=1e-5)
        assert abs(t.sum() - 1.0) < 1e-5


def test_shear_rotate_matches_bilinear():
    """3-shear rotation vs direct bilinear warp: sub-1% interior values,
    and exact coordinate semantics (checked via a smooth ramp image)."""
    from scipy import ndimage
    from mods_tpu.ops.warp import affine_warp, shear_rotate
    rng = np.random.default_rng(5)
    # smooth content: on band-limited images the two interpolators agree
    # to <1%, which pins the COORDINATE semantics; on rough content the
    # three 1-D passes smooth slightly more than one 2-D bilinear (by
    # design - same tradeoff as classic shear-rotation)
    img = jnp.asarray(ndimage.gaussian_filter(
        rng.uniform(0, 255, (200, 160)), 2.5).astype(np.float32))
    for phi in (0.15, -0.6, 1.2, 2.6, -2.9):
        c, s = np.cos(phi), np.sin(phi)
        # inverse map: rotation about the image center into 220x220
        cx, cy = 80.0, 100.0
        ox, oy = 110.0, 110.0
        m = np.asarray([[c, s, cx - c * ox - s * oy],
                        [-s, c, cy + s * ox - c * oy]], np.float32)
        ref = np.asarray(affine_warp(img, jnp.asarray(m), 220, 220))
        got = np.asarray(shear_rotate(img, jnp.asarray(m), 220, 220))
        # compare only pixels whose source is well inside the image
        # (the fill-region boundary differs by design)
        ys, xs = np.mgrid[0:220, 0:220].astype(np.float32)
        sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
        sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
        ok = (sx > 3) & (sx < 160 - 4) & (sy > 3) & (sy < 200 - 4)
        assert ok.sum() > 5000
        r, g = ref[ok], got[ok]
        denom = np.abs(r).mean()
        assert np.abs(r - g).mean() / denom < 0.01, \
            (phi, np.abs(r - g).mean() / denom)


def test_separable_scale_matches_bilinear():
    from mods_tpu.ops.warp import affine_warp, separable_scale
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0, 255, (120, 150)).astype(np.float32))
    m = np.asarray([[2.0, 0, 0], [0, 3.0, 0]], np.float32)
    ref = np.asarray(affine_warp(img, jnp.asarray(m), 40, 70, fill=0.0))
    got = np.asarray(separable_scale(img, jnp.float32(2.0),
                                     jnp.float32(3.0), 40, 70))
    # interior identical (separable == 2-D bilinear for diagonal maps)
    np.testing.assert_allclose(ref[:39, :70], got[:39, :70], atol=1e-3)
