"""TILDE learned filter-bank detector (reference TILDE/c++/src)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mods_tpu.config import CapacityParams
from mods_tpu.detectors.tilde import (detect_tilde, load_tilde_filters,
                                      procedural_filters, tilde_response)

REF_FILTER = "/root/reference/TILDE/c++/filters/Chamonix.txt"


def test_procedural_bank_detects():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 60, (160, 160)).astype(np.float32)
    # strong oriented structures
    yy, xx = np.mgrid[0:160, 0:160].astype(np.float32)
    img += 120 * (np.sin(xx / 6) > 0.9) * (np.sin(yy / 7) > 0.9)
    img = np.clip(img, 0, 255)
    caps = CapacityParams(per_view=128)
    regs = detect_tilde(jnp.asarray(img)[None],
                        jnp.asarray([[160, 160]], jnp.int32), caps)
    m = np.asarray(regs.mask[0])
    assert m.sum() >= 5
    assert np.isfinite(np.asarray(regs.response[0])[m]).all()


def test_response_shape_and_smoothness():
    W, b = procedural_filters()
    img = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (96, 128)).astype(np.float32))
    score = np.asarray(jax.jit(tilde_response)(img, jnp.asarray(W),
                                               jnp.asarray(b)))
    assert score.shape == (96, 128)
    assert np.isfinite(score).all()


@pytest.mark.skipif(not os.path.exists(REF_FILTER),
                    reason="reference filters not mounted")
def test_load_reference_filter_format():
    W, b, resize = load_tilde_filters(REF_FILTER)
    S, M, C, K, K2 = W.shape
    assert K == K2 == 21
    assert C == 6
    assert M >= 1 and S >= 1
    assert np.isfinite(W).all() and np.isfinite(b).all()
    # applying loaded filters produces a finite response map
    img = jnp.asarray(np.random.default_rng(2).uniform(
        0, 255, (100, 120)).astype(np.float32))
    score = np.asarray(tilde_response(img, jnp.asarray(W),
                                      jnp.asarray(b)))
    assert np.isfinite(score).all()
