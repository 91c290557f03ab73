"""Scale-space response variants: iiDoG (pyramid.cpp:198-220), WLD
intensity normalization (pyramid.cpp:492-505), TILDE as a pyramid
response (pyramid.cpp:182-197)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, PyramidParams
from mods_tpu.detectors.scale_space import (build_pyramid, dog_response,
                                            iidog_response, wld_coef)
from tests.test_pipeline import textured_image


def test_iidog_contrast_normalization():
    img = jnp.asarray(textured_image(96, 96, seed=1))
    dog = np.asarray(dog_response(img, 1.6))
    ii = np.asarray(iidog_response(img, 1.6))
    # dark regions are boosted by 255/(I + blur(I)); bright (>=255 sum)
    # regions keep the plain DoG
    from mods_tpu.ops.gaussian import gaussian_blur
    s = np.asarray(img + gaussian_blur(img, 1.6 * 1.6))
    expect = np.where(s < 255.0, dog * 255.0 / np.maximum(s, 1e-6), dog)
    np.testing.assert_allclose(ii, expect, rtol=1e-5, atol=1e-4)
    # intensity-scaling robustness: halving the image leaves iiDoG
    # roughly unchanged where the mean is below saturation
    ii_half = np.asarray(iidog_response(img * 0.5, 1.6))
    m = (s < 200) & (np.abs(ii) > 1.0)
    if m.any():
        ratio = ii_half[m] / ii[m]
        assert np.median(np.abs(ratio - 1.0)) < 0.15


def test_wld_scales_upper_levels():
    img = jnp.asarray(textured_image(96, 96, seed=2))[None]
    base = PyramidParams(detector_type="Hessian")
    wld = PyramidParams(detector_type="Hessian", do_on_wld=True)
    o_plain = build_pyramid(img, base, n_octaves=1)[0]
    o_wld = build_pyramid(img, wld, n_octaves=1)[0]
    # level 0 untouched (reference quirk mirrored)
    np.testing.assert_allclose(np.asarray(o_wld.resps[:, 0]),
                               np.asarray(o_plain.resps[:, 0]))
    # level 1 scaled by coef(I)^2 of the level's blur image
    coef = np.asarray(wld_coef(o_plain.blurs[:, 1], 3.0, 5.0, 5.0))
    np.testing.assert_allclose(np.asarray(o_wld.resps[:, 1]),
                               np.asarray(o_plain.resps[:, 1]) * coef ** 2,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_tilde_as_scale_space_response():
    from mods_tpu.detectors.hessaff import detect_affine_keypoints
    img = jnp.asarray(textured_image(128, 128, seed=3))[None]
    p = PyramidParams(detector_type="TILDE", threshold=1e-4)
    caps = CapacityParams(per_octave=256, per_view=256, per_image=512,
                          max_angles=1)
    from mods_tpu.config import AffineShapeParams
    regs = detect_affine_keypoints(img, jnp.asarray([[128, 128]]),
                                   p, AffineShapeParams(), caps)
    assert int(regs.mask.sum()) > 0
