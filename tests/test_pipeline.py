"""End-to-end pipeline tests on synthetic pairs with known homography."""

import numpy as np
import jax.numpy as jnp
import pytest

from mods_tpu.config import (CapacityParams, IterationParams, PyramidParams,
                             RansacParams, replace)
from mods_tpu.pipeline import EngineConfig, TwoViewMatcher
from mods_tpu.ransac.errors import h_error_symm
from mods_tpu import synthesis
from mods_tpu.config import ViewParams


def textured_image(h, w, seed=0):
    """Smooth random texture with blob-like structure at multiple scales."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for sigma, amp in [(2, 80), (4, 120), (8, 150)]:
        n = (h * w) // (sigma * sigma * 60)
        ys = rng.uniform(0, h, n)
        xs = rng.uniform(0, w, n)
        sign = rng.choice([-1, 1], n)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        for y0, x0, sg in zip(ys, xs, sign):
            r2 = (xx - x0) ** 2 + (yy - y0) ** 2
            img += sg * amp * np.exp(-r2 / (2 * sigma**2))
    img = img - img.min()
    img = 255 * img / max(img.max(), 1e-6)
    return img.astype(np.float32)


def warp_np(img, H, out_h, out_w):
    """Inverse-warp with bilinear sampling (numpy oracle)."""
    Hinv = np.linalg.inv(H)
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    w = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    sx = (Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]) / w
    sy = (Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]) / w
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    wx = sx - x0
    wy = sy - y0
    valid = (x0 >= 0) & (y0 >= 0) & (x0 < img.shape[1] - 1) & \
        (y0 < img.shape[0] - 1)
    x0c = np.clip(x0, 0, img.shape[1] - 2)
    y0c = np.clip(y0, 0, img.shape[0] - 2)
    out = ((1 - wy) * ((1 - wx) * img[y0c, x0c] + wx * img[y0c, x0c + 1])
           + wy * ((1 - wx) * img[y0c + 1, x0c]
                   + wx * img[y0c + 1, x0c + 1]))
    return np.where(valid, out, 128.0).astype(np.float32)


SMALL_CAPS = CapacityParams(per_octave=512, per_view=512, per_image=1024,
                            max_angles=2)


def small_cfg(**kw):
    return EngineConfig(
        caps=SMALL_CAPS,
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=3, error_type="sampson"),
        **kw)


def test_identity_ladder_on_translated_pair():
    img1 = textured_image(192, 256)
    H = np.array([[1.0, 0.0, 18.0], [0.0, 1.0, -7.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 192, 256)
    ladder = [IterationParams(tilt_set=(1.0,), scale_set=(1.0,))]
    m = TwoViewMatcher(ladder, small_cfg()).match(img1, img2)
    assert m.n_matches >= 10, (m.n_matches, m.n_tentatives)
    e = np.asarray(h_error_symm(jnp.asarray(m.H.astype(np.float32)),
                                jnp.asarray(m.xy1), jnp.asarray(m.xy2)))
    assert np.median(e) < 9.0
    # estimated H close to GT on the image corners
    corners = np.array([[0, 0], [255, 0], [0, 191], [255, 191]],
                       np.float32)
    ones = np.ones((4, 1), np.float32)
    gt = np.concatenate([corners, ones], 1) @ H.T
    gt = gt[:, :2] / gt[:, 2:]
    est = np.concatenate([corners, ones], 1) @ m.H.T
    est = est[:, :2] / est[:, 2:]
    assert np.abs(gt - est).max() < 3.0, (gt, est)


def test_rotation_pair_matches():
    img1 = textured_image(192, 192, seed=3)
    ang = np.deg2rad(30.0)
    c, s = np.cos(ang), np.sin(ang)
    # rotate about image center
    cx = cy = 96.0
    H = np.array([[c, -s, cx - c * cx + s * cy],
                  [s, c, cy - s * cx - c * cy],
                  [0, 0, 1.0]])
    img2 = warp_np(img1, H, 192, 192)
    ladder = [IterationParams()]
    m = TwoViewMatcher(ladder, small_cfg()).match(img1, img2)
    assert m.n_matches >= 10, (m.n_matches, m.n_tentatives)
    corners = np.array([[40, 40], [150, 40], [40, 150], [150, 150]],
                       np.float32)
    ones = np.ones((4, 1), np.float32)
    gt = np.concatenate([corners, ones], 1) @ H.T
    gt = gt[:, :2] / gt[:, 2:]
    est = np.concatenate([corners, ones], 1) @ m.H.T
    est = est[:, :2] / est[:, 2:]
    assert np.abs(gt - est).max() < 3.0


def test_view_synthesis_grid():
    it = IterationParams(tilt_set=(1.0, 5.0, 9.0), scale_set=(1.0,),
                         phi_base=360.0)
    views, prev = synthesis.expand_views(it, [])
    # tilt 1 -> 1 view; tilt 5 -> floor(180*5/360)=2 rots; tilt 9 -> 4
    assert len(views) == 1 + 2 + 4
    # re-expansion is fully deduped
    views2, prev = synthesis.expand_views(it, prev)
    assert len(views2) == 0
    # escalation adds only new views
    it2 = IterationParams(tilt_set=(1.0, 5.0), scale_set=(1.0, 0.25),
                          phi_base=360.0)
    views3, _ = synthesis.expand_views(it2, prev)
    assert all(abs(v.zoom - 0.25) < 1e-6 for v in views3)


def test_render_group_identity_h():
    img = textured_image(96, 128, seed=5)
    plan = synthesis.plan_view(ViewParams(tilt=2.0, phi=0.3, zoom=1.0,
                                          init_sigma=0.8), 128, 96)
    outs, valid, Hs = synthesis.render_group(jnp.asarray(img), [plan])
    # forward-map a few interior points of the original through H and
    # check pixel value consistency (loose, there are two resamplings)
    H = Hs[0]
    assert np.allclose(H[2], [0, 0, 1])
    h_new, w_new = int(valid[0, 0]), int(valid[0, 1])
    assert outs.shape[0] == 1 and outs.shape[1] >= h_new
    # the valid area should contain non-gray pixels
    area = np.asarray(outs[0, :h_new, :w_new])
    assert np.abs(area - 128.0).mean() > 3.0


def test_tilted_pair_with_synthesis():
    """An extreme-tilt pair that the identity rung fails on but the
    tilt-synthesis rung recovers — the MODS escalation behaviour."""
    img1 = textured_image(160, 224, seed=7)
    # strong horizontal squash = tilt 3.5 viewpoint change
    H = np.array([[1.0 / 3.0, 0.0, 30.0], [0.0, 1.0, 4.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 224)
    ladder = [
        IterationParams(tilt_set=(1.0,), scale_set=(1.0,)),
        IterationParams(tilt_set=(1.0, 4.0), scale_set=(1.0,),
                        phi_base=360.0),
    ]
    cfg = small_cfg()
    m = TwoViewMatcher(ladder, cfg).match(img1, img2)
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives, m.steps_used)


def test_async_stop_mode_matches_sync():
    """stop_mode="async" enqueues every rung and reads one batched count
    vector; it must select the same stopping rung and produce the same
    matches as the reference-style per-rung sync control flow."""
    img1 = textured_image(160, 224, seed=11)
    H = np.array([[1.0, 0.0, 18.0], [0.0, 1.0, -7.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 160, 224)
    ladder = [
        IterationParams(tilt_set=(1.0,), scale_set=(1.0,)),
        IterationParams(tilt_set=(1.0, 4.0), scale_set=(1.0,),
                        phi_base=360.0),
    ]
    cfg = small_cfg()
    ms = TwoViewMatcher(ladder, cfg, seed=3).match(img1, img2)
    ma = TwoViewMatcher(ladder, cfg, seed=3,
                        stop_mode="async").match(img1, img2)
    # identical PRNG seeds + identical programs => identical selection
    assert ms.steps_used == ma.steps_used
    assert ms.n_matches == ma.n_matches
    assert ms.n_tentatives == ma.n_tentatives
    np.testing.assert_allclose(ms.xy1, ma.xy1)
    np.testing.assert_allclose(ms.H, ma.H, rtol=1e-5, atol=1e-5)
