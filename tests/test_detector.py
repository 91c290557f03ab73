"""Detector tests: responses, NMS, localization, Baumberg on synthetic
images with known structure."""

import numpy as np
import jax.numpy as jnp

from mods_tpu.config import (AffineShapeParams, CapacityParams,
                             DetectorType, PyramidParams, replace)
from mods_tpu.detectors import scale_space as ss
from mods_tpu.detectors.hessaff import detect_affine_keypoints
from mods_tpu.ops.gaussian import gaussian_blur


def gauss_blob(h, w, cx, cy, sigma, amp=200.0, sx=1.0, sy=1.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    r2 = ((xs - cx) / sx) ** 2 + ((ys - cy) / sy) ** 2
    return amp * np.exp(-r2 / (2 * sigma**2))


def test_hessian_response_of_quadratic():
    # f = x^2 + 3 y^2 -> Lxx=2, Lyy=6, Lxy=0 -> det=12 * sigma^4
    h = w = 16
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = xs**2 + 3 * ys**2
    r = np.asarray(ss.hessian_response(jnp.asarray(img), 2.0))
    np.testing.assert_allclose(r[5, 5], 12 * 16.0, rtol=1e-4)


def test_detector_finds_blob_center():
    h, w = 128, 128
    img = gauss_blob(h, w, 64.0, 64.0, 4.0).astype(np.float32)
    p = PyramidParams(threshold=1.0)
    aff = AffineShapeParams()
    caps = CapacityParams(per_octave=256, per_view=128)
    regs = detect_affine_keypoints(
        jnp.asarray(img)[None], jnp.asarray([[h, w]], np.int32),
        p, aff, caps)
    m = np.asarray(regs.mask[0])
    assert m.sum() >= 1
    xy = np.asarray(regs.xy[0])[m]
    d = np.linalg.norm(xy - np.array([64.0, 64.0]), axis=1)
    assert d.min() < 1.0, (xy[:5], d.min())
    # blob of sigma 4 -> detected scale near 4 (within a scale step)
    s = np.asarray(regs.s[0])[m][np.argmin(d)]
    assert 2.5 < s < 7.0, s


def test_detector_anisotropic_blob_shape():
    h, w = 128, 128
    img = gauss_blob(h, w, 64.0, 64.0, 4.0, sx=2.0, sy=1.0).astype(
        np.float32)
    p = PyramidParams(threshold=1.0)
    regs = detect_affine_keypoints(
        jnp.asarray(img)[None], jnp.asarray([[h, w]], np.int32),
        p, AffineShapeParams(), CapacityParams(per_octave=256, per_view=128))
    m = np.asarray(regs.mask[0])
    assert m.sum() >= 1
    xy = np.asarray(regs.xy[0])[m]
    d = np.linalg.norm(xy - np.array([64.0, 64.0]), axis=1)
    i = np.argmin(d)
    assert d[i] < 1.5
    A = np.asarray(regs.A[0])[m][i]
    # unit determinant
    det = abs(A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0])
    np.testing.assert_allclose(det, 1.0, rtol=1e-2)
    # elongated along x: the shape ellipse x-radius > y-radius.
    # column norms of A give the image of the unit circle axes
    e = A @ A.T
    assert e[0, 0] > 1.5 * e[1, 1], e


def test_nms_mask_single_peak():
    r = np.zeros((1, 5, 16, 16), np.float32)
    r[0, 2, 8, 8] = 10.0
    m = np.asarray(ss._nms_mask(jnp.asarray(r), 1.0, -1.0))
    assert m.shape == (1, 3, 16, 16)
    assert m[0, 1, 8, 8]
    assert m.sum() == 1


def test_detection_is_translation_covariant():
    h, w = 160, 160
    img1 = gauss_blob(h, w, 60.0, 70.0, 3.0).astype(np.float32)
    img2 = gauss_blob(h, w, 90.0, 50.0, 3.0).astype(np.float32)
    p = PyramidParams(threshold=1.0)
    caps = CapacityParams(per_octave=256, per_view=64)
    imgs = jnp.stack([jnp.asarray(img1), jnp.asarray(img2)])
    regs = detect_affine_keypoints(
        imgs, jnp.asarray([[h, w], [h, w]], np.int32),
        p, AffineShapeParams(), caps)
    m = np.asarray(regs.mask)
    xy = np.asarray(regs.xy)
    a = xy[0][m[0]][np.argmin(np.linalg.norm(
        xy[0][m[0]] - [60, 70], axis=1))]
    b = xy[1][m[1]][np.argmin(np.linalg.norm(
        xy[1][m[1]] - [90, 50], axis=1))]
    np.testing.assert_allclose(a - [60, 70], b - [90, 50], atol=0.2)
