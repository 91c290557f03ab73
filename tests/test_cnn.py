"""CNN patch descriptor (the reference's Caffe slot,
imagerepresentation.cpp:1343-1534) — unit + rung e2e tests."""

import numpy as np
import jax.numpy as jnp

from mods_tpu.config import CapacityParams, CnnParams, IterationParams, \
    RansacParams
from mods_tpu.descriptors.cnn import (cnn_forward, procedural_weights,
                                      weights_for)
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from tests.test_pipeline import textured_image, warp_np

CAPS = CapacityParams(per_octave=512, per_view=256, per_image=512,
                      max_angles=2, tentatives=1024)


def test_forward_shapes_and_norms():
    rng = np.random.default_rng(0)
    patches = jnp.asarray(
        rng.uniform(0, 255, (7, 32, 32)).astype(np.float32))
    w = procedural_weights(32, 128)
    for norm, check in (
            ("L2", lambda v: np.linalg.norm(v, axis=1)),
            ("L1", lambda v: np.abs(v).sum(1)),
            ("RootL2", lambda v: (v * v).sum(1))):
        d = np.asarray(cnn_forward(patches, w, norm))
        assert d.shape == (7, 128)
        np.testing.assert_allclose(check(d), 1.0, atol=1e-3)
    d = np.asarray(cnn_forward(patches, w, "none"))
    assert np.abs(np.linalg.norm(d, axis=1) - 1.0).max() > 1e-3


def test_descriptor_is_discriminative():
    """Same patch shifted slightly stays closer than a different patch."""
    rng = np.random.default_rng(1)
    base = np.kron(rng.uniform(0, 255, (9, 9)).astype(np.float32),
                   np.ones((4, 4), np.float32))
    a = base[:32, :32]
    b = np.roll(base, 1, axis=1)[:32, :32]          # 1px shift
    c = np.kron(rng.uniform(0, 255, (8, 8)).astype(np.float32),
                np.ones((4, 4), np.float32))[:32, :32]
    w = weights_for("", 32, 128)
    d = np.asarray(cnn_forward(jnp.asarray(np.stack([a, b, c])), w))
    near = np.linalg.norm(d[0] - d[1])
    far = np.linalg.norm(d[0] - d[2])
    assert near < 0.7 * far, (near, far)


def test_cnn_rung_e2e():
    img1 = textured_image(160, 192, seed=13)
    H = np.array([[1.0, 0.0, 9.0], [0.0, 1.0, -7.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 192)
    cfg = EngineConfig(
        caps=CAPS,
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2))
    ladder = [IterationParams(descriptors=("CNN",),
                              fginn_threshold=(0.9,))]
    m = TwoViewMatcher(ladder, cfg).match(img1, img2)
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)


def test_cnn_ini_section(tmp_path):
    from mods_tpu.io.ini import load_ini, parse_descriptor_sections
    p = tmp_path / "c.ini"
    p.write_text("[CaffeDescriptor]\npatchSize = 48\nmrSize = 10\n"
                 "Normalization = RootL2\n")
    out = parse_descriptor_sections(load_ini(str(p)))
    c = out["cnn"]
    assert (c.patch_size, c.mr_size, c.normalization) == (48, 10.0,
                                                          "RootL2")
