"""Oxford/Mikolajczyk interchange + ReadAffs pseudo-detector tests
(reference synth-detection.cpp:1076-1170, imagerepresentation.cpp:721)."""

import numpy as np
import pytest

from mods_tpu.io.oxford import (ellipses_to_frames, frames_to_ellipses,
                                read_descriptors_benchmark, read_kps,
                                read_oxford, write_descriptors_benchmark,
                                write_kps, write_oxford)


def random_regions(n=17, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(10, 200, (n, 2))
    # well-conditioned det-1 frames
    ang = rng.uniform(0, np.pi, n)
    sq = rng.uniform(0.5, 2.0, n)
    A = np.zeros((n, 2, 2))
    c, s_ = np.cos(ang), np.sin(ang)
    A[:, 0, 0] = c * sq
    A[:, 0, 1] = -s_ / sq
    A[:, 1, 0] = s_ * sq
    A[:, 1, 1] = c / sq
    s = rng.uniform(2.0, 12.0, n)
    return xy, A, s


def test_ellipse_frame_roundtrip():
    xy, A, s = random_regions()
    abc = frames_to_ellipses(A, s)
    A2, s2 = ellipses_to_frames(abc)
    # the ellipse only determines A up to rotation; compare covariances
    cov1 = np.einsum("nij,nkj->nik", A, A) * (s ** 2)[:, None, None]
    cov2 = np.einsum("nij,nkj->nik", A2, A2) * (s2 ** 2)[:, None, None]
    np.testing.assert_allclose(cov1, cov2, rtol=1e-8)
    np.testing.assert_allclose(np.linalg.det(A2), 1.0, rtol=1e-8)


def test_oxford_roundtrip(tmp_path):
    xy, A, s = random_regions(11, 1)
    desc = np.random.default_rng(2).uniform(0, 1, (11, 16))
    p = tmp_path / "regions.oxf"
    write_oxford(str(p), xy, A, s, desc)
    xy2, A2, s2, d2 = read_oxford(str(p))
    np.testing.assert_allclose(xy2, xy, rtol=1e-6)
    np.testing.assert_allclose(d2, desc, rtol=1e-6)
    cov1 = np.einsum("nij,nkj->nik", A, A) * (s ** 2)[:, None, None]
    cov2 = np.einsum("nij,nkj->nik", A2, A2) * (s2 ** 2)[:, None, None]
    np.testing.assert_allclose(cov1, cov2, rtol=1e-5)


def test_kps_and_desc_roundtrip(tmp_path):
    xy, A, s = random_regions(7, 3)
    p = tmp_path / "kps.txt"
    write_kps(str(p), xy, A, s)
    xy2, A2, s2 = read_kps(str(p))
    np.testing.assert_allclose(xy2, xy, rtol=1e-6)
    np.testing.assert_allclose(A2, A, rtol=1e-6)
    np.testing.assert_allclose(s2, s, rtol=1e-6)

    desc = np.random.default_rng(4).normal(size=(5, 8))
    dp = tmp_path / "desc.txt"
    write_descriptors_benchmark(str(dp), desc)
    d2 = read_descriptors_benchmark(str(dp))
    np.testing.assert_allclose(d2, desc, rtol=1e-6)


@pytest.mark.slow
def test_readaffs_detector(tmp_path):
    """ReadAffs rung: keypoints from file flow through orientation +
    description and match against a detector rung."""
    import jax.numpy as jnp
    from mods_tpu.config import CapacityParams, IterationParams, \
        RansacParams
    from mods_tpu.io.oxford import write_kps
    from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
    from mods_tpu.ops.image import to_gray
    from mods_tpu.timing import TimeLog

    rng = np.random.default_rng(5)
    img = np.kron(rng.uniform(0, 255, (16, 16)).astype(np.float32),
                  np.ones((8, 8), np.float32))
    cfg = EngineConfig(caps=CapacityParams(per_octave=256, per_view=128,
                                           per_image=256, max_angles=2),
                       ransac=RansacParams(batch_hypotheses=128,
                                           max_rounds=1))
    m = TwoViewMatcher([IterationParams()], cfg)
    # detect normally to produce a keypoint file
    g = np.asarray(to_gray(jnp.asarray(img)))
    stores: dict = {}
    m._process_image(g, IterationParams(), [], stores, TimeLog())
    st = next(iter(stores.values()))
    assert st.count > 0
    kp_file = tmp_path / "kps.txt"
    write_kps(str(kp_file), st.xy, st.A, st.s)

    # now ingest via ReadAffs
    m2 = TwoViewMatcher([IterationParams(detector="ReadAffs")], cfg)
    m2.affs_paths = (str(kp_file), str(kp_file))
    stores2: dict = {}
    m2._process_image(g, IterationParams(detector="ReadAffs"), [],
                      stores2, TimeLog())
    st2 = next(iter(stores2.values()))
    assert st2.count > 0
    assert st2.count <= st.count  # border filtering may drop a few
