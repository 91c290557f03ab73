"""Native MSER detector tests."""

import numpy as np

from mods_tpu.detectors.mser import (MSER_MIN, MSER_PLUS, detect_msers_np)


def blob_image(h=128, w=128):
    """Bright background with two dark blobs and one bright blob."""
    img = np.full((h, w), 200, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[((xx - 40) ** 2 + (yy - 40) ** 2) < 12**2] = 30
    img[((xx - 90) ** 2 / 4 + (yy - 80) ** 2) < 10**2] = 50
    img[((xx - 40) ** 2 + (yy - 100) ** 2) < 8**2] = 250
    return img


def test_mser_finds_blobs():
    img = blob_image()
    d = detect_msers_np(img, min_size=30, max_area=0.25, min_margin=8)
    xy = d["xy"]
    assert len(xy) >= 3, len(xy)
    # dark blobs found as MSER+ (processed dark->bright)
    def has_near(cx, cy, st=None):
        m = np.ones(len(xy), bool) if st is None else d["sub_type"] == st
        if not m.any():
            return False
        dd = np.linalg.norm(xy[m] - [cx, cy], axis=1)
        return dd.min() < 3.0

    assert has_near(40, 40, MSER_PLUS)
    assert has_near(90, 80, MSER_PLUS)
    assert has_near(40, 100, MSER_MIN)


def test_mser_ellipse_shape():
    img = blob_image()
    d = detect_msers_np(img, min_size=30, max_area=0.25, min_margin=8)
    xy = d["xy"]
    A = d["A"]
    # the elliptic blob at (90, 80): x-halfaxis 2x the y-halfaxis
    i = np.argmin(np.linalg.norm(xy - [90, 80], axis=1))
    C = A[i] @ A[i].T
    assert C[0, 0] > 2.5 * C[1, 1], C
    # circular blob: nearly isotropic
    j = np.argmin(np.linalg.norm(xy - [40, 40], axis=1))
    Cj = A[j] @ A[j].T
    ratio = Cj[0, 0] / Cj[1, 1]
    assert 0.8 < ratio < 1.25, Cj
    # radius: circle r=12 -> second moment sqrt(r^2/4)=6
    assert 4.0 < np.sqrt(Cj[0, 0]) < 8.0, Cj


def test_mser_margin_budget():
    img = blob_image()
    lo = detect_msers_np(img, min_size=30, max_area=0.25, min_margin=5)
    hi = detect_msers_np(img, min_size=30, max_area=0.25, min_margin=60)
    assert len(hi["xy"]) <= len(lo["xy"])


def test_mser_translation_covariant():
    img = blob_image()
    d1 = detect_msers_np(img, min_size=30, max_area=0.25, min_margin=8)
    shifted = np.roll(np.roll(img, 5, axis=0), -7, axis=1)
    d2 = detect_msers_np(shifted, min_size=30, max_area=0.25,
                         min_margin=8)
    # every region of d1 should appear shifted by (-7, +5)
    for xy in d1["xy"]:
        t = xy + np.array([-7.0, 5.0])
        dd = np.linalg.norm(d2["xy"] - t, axis=1)
        assert dd.min() < 1.0, (xy, dd.min())
