"""Multi-descriptor / multi-detector rung tests."""

import numpy as np
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, IterationParams, RansacParams
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from tests.test_pipeline import textured_image, warp_np

CAPS = CapacityParams(per_octave=512, per_view=256, per_image=512,
                      max_angles=2, tentatives=1024)


def _cfg():
    return EngineConfig(
        caps=CAPS,
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2))


def test_rootsift_plus_halfrootsift():
    img1 = textured_image(160, 192, seed=21)
    H = np.array([[1.0, 0.0, 12.0], [0.0, 1.0, -9.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 192)
    ladder = [IterationParams(descriptors=("RootSIFT", "HalfRootSIFT"),
                              fginn_threshold=(0.8, 0.8))]
    m = TwoViewMatcher(ladder, _cfg()).match(img1, img2)
    assert m.n_matches >= 10, (m.n_matches, m.n_tentatives)


def test_mser_detector_rung():
    img1 = textured_image(160, 192, seed=5)
    H = np.array([[1.0, 0.0, 10.0], [0.0, 1.0, 6.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 192)
    ladder = [IterationParams(detector="MSER",
                              descriptors=("RootSIFT",),
                              fginn_threshold=(0.85,))]
    m = TwoViewMatcher(ladder, _cfg()).match(img1, img2)
    # blobby texture gives plenty of stable extremal regions
    assert m.n_tentatives >= 8, m.n_tentatives
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)


def test_dog_detector_rung():
    img1 = textured_image(160, 192, seed=9)
    H = np.array([[1.0, 0.0, -8.0], [0.0, 1.0, 14.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 192)
    ladder = [IterationParams(detector="DoG", descriptors=("RootSIFT",))]
    m = TwoViewMatcher(ladder, _cfg()).match(img1, img2)
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)


def test_pixels_descriptor():
    img1 = textured_image(128, 160, seed=31)
    H = np.array([[1.0, 0.0, 7.0], [0.0, 1.0, -5.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 128, 160)
    ladder = [IterationParams(descriptors=("Pixels",),
                              fginn_threshold=(0.9,))]
    m = TwoViewMatcher(ladder, _cfg()).match(img1, img2)
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)


def test_orb_detector_and_descriptor():
    img1 = textured_image(160, 192, seed=13)
    H = np.array([[1.0, 0.0, 9.0], [0.0, 1.0, -6.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 192)
    ladder = [IterationParams(detector="ORB", descriptors=("ORB",),
                              fginn_threshold=(0.0,),
                              distance_threshold=(60.0,))]
    m = TwoViewMatcher(ladder, _cfg()).match(img1, img2)
    assert m.n_tentatives >= 8, m.n_tentatives
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)
