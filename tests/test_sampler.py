"""Windowed sampler vs the direct gather path (they must agree exactly
up to float assoc order), plus mip-stack semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from mods_tpu.ops.sampler import (MAX_HALF_EXTENT, mip_stack, op_norm_2x2,
                                  pad_canvas, sample_affine_patches,
                                  select_level, window_origins)
from mods_tpu.ops.warp import extract_patches


def random_regions(rng, k, h, w, max_scale):
    xy = np.stack([rng.uniform(0, w, k), rng.uniform(0, h, k)],
                  -1).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, k)
    sc = rng.uniform(0.2, max_scale, k)
    shear = rng.uniform(0.7, 1.4, k)
    R = np.stack([np.stack([np.cos(th), -np.sin(th)], -1),
                  np.stack([np.sin(th), np.cos(th)], -1)], -2)
    S = np.zeros((k, 2, 2), np.float32)
    S[:, 0, 0] = sc * shear
    S[:, 1, 1] = sc / shear
    return jnp.asarray(xy), jnp.asarray((R @ S).astype(np.float32))


def test_windowed_matches_gather(rng):
    h, w = 160, 300
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    canvas = pad_canvas(img)
    k, P = 64, 21
    xy, A = random_regions(rng, k, h, w, max_scale=1.5)
    # extent bound: within the small-window coverage for this patch size
    # (callers guarantee it via select_level's 1.5 px/step bound)
    from mods_tpu.ops.sampler import rows_for_patch
    m = np.asarray(op_norm_2x2(A))
    assert (m * (P // 2) * np.sqrt(2) + 2
            <= rows_for_patch(P) // 2 - 1).all()

    ref = extract_patches(img, xy, A, P, fill=0.0)
    got = sample_affine_patches(
        canvas[None], jnp.zeros((k,), jnp.int32), xy, A, P,
        jnp.asarray([[h, w]], jnp.int32), fill=0.0, chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-5)


def test_windowed_border_fill(rng):
    h, w = 160, 300
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    canvas = pad_canvas(img)
    P = 15
    xy = jnp.asarray([[1.0, 1.0], [w - 2.0, h - 2.0], [-30.0, 50.0]],
                     jnp.float32)
    A = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 2.0, (3, 2, 2))
    ref = extract_patches(img, xy, A, P, fill=7.5)
    got = sample_affine_patches(
        canvas[None], jnp.zeros((3,), jnp.int32), xy, A, P,
        jnp.asarray([[h, w]], jnp.int32), fill=7.5, chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-5)


def test_levels_and_valid_dims(rng):
    h, w = 200, 320
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    stack, valid_hw = mip_stack(img, 3)
    assert stack.shape[0] == 3
    assert tuple(np.asarray(valid_hw[0])) == (h, w)
    assert tuple(np.asarray(valid_hw[1])) == (h // 2, w // 2)
    # a constant patch sampled at level 1 equals the level-1 content
    xy = jnp.asarray([[30.0, 30.0]], jnp.float32)
    A = jnp.eye(2, dtype=jnp.float32)[None]
    got = sample_affine_patches(
        stack, jnp.ones((1,), jnp.int32), xy, A, 9, valid_hw)
    lvl1 = np.asarray(stack[1])
    np.testing.assert_allclose(np.asarray(got)[0, 4, 4], lvl1[30, 30],
                               atol=1e-4)


def test_select_level_bounds():
    A = jnp.asarray([np.eye(2) * s for s in (0.5, 1.0, 3.0, 8.0, 30.0)],
                    jnp.float32)
    lvl, scale = select_level(A, 41, 6)
    m = np.asarray(op_norm_2x2(A)) / np.asarray(scale)
    assert (m * 20 * np.sqrt(2) <= MAX_HALF_EXTENT + 1e-3).all()
    assert (np.asarray(lvl) >= 0).all() and (np.asarray(lvl) <= 5).all()


def test_window_origins_alignment():
    xy = jnp.asarray([[0.0, 0.0], [300.0, 100.0], [639.0, 511.0],
                      [64.2, 70.9]], jnp.float32)
    y0, x0 = window_origins(xy, 512, 640)
    assert (np.asarray(y0) % 8 == 0).all()
    assert (np.asarray(x0) % 128 == 0).all()
    assert (np.asarray(y0) >= 0).all() and (np.asarray(y0) <= 512 - 136).all()
    assert (np.asarray(x0) >= 0).all() and (np.asarray(x0) <= 640 - 256).all()


def test_pallas_path_matches_xla(monkeypatch):
    """The Pallas fast path (interpret mode on CPU) reproduces the
    legacy windowed einsum sampler on valid samples."""
    import os
    import mods_tpu.ops.sampler as S
    rng = np.random.default_rng(5)
    L, H, W = 2, 136, 256
    src = jnp.asarray(rng.uniform(0, 255, (L, H, W)).astype(np.float32))
    valid_hw = jnp.asarray([[H, W]] * L, np.int32)
    K, P = 16, 19
    xy = jnp.asarray(np.stack([rng.uniform(40, W - 40, K),
                               rng.uniform(40, H - 40, K)], -1)
                     .astype(np.float32))
    th = rng.uniform(0, 2 * np.pi, K)
    sc = rng.uniform(0.5, 1.4, K)
    A = jnp.asarray((np.stack([
        np.stack([np.cos(th), -np.sin(th)], -1),
        np.stack([np.sin(th), np.cos(th)], -1)], -2)
        * sc[:, None, None]).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K).astype(np.int32))

    monkeypatch.setenv("MODS_SAMPLER", "xla")
    ref = np.asarray(S.sample_affine_patches(src, lvl, xy, A, P, valid_hw))
    monkeypatch.setenv("MODS_SAMPLER", "pallas")
    got = np.asarray(S.sample_affine_patches(src, lvl, xy, A, P, valid_hw))
    # tent-weight vs one-hot arithmetic differ only in fp rounding
    np.testing.assert_allclose(got, ref, atol=6e-3)
