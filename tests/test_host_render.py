"""Host-side renderer (native/render.cpp) parity with the device render
program — host-stage detectors (MSER) must see the same synthetic views
the device programs render (pipeline.py _make_render_fn)."""

import numpy as np
import pytest

from mods_tpu import synthesis
from mods_tpu.config import IterationParams
from mods_tpu.ops.host_render import render_group_np
from mods_tpu.ops.image import round_up


def _rot_inv(group):
    out = []
    for p in group:
        a, b, tx, c, d, ty = p.rot
        det = a * d - b * c
        ia, ib = d / det, -b / det
        ic, id_ = -c / det, a / det
        out.append([[ia, ib, -(ia * tx + ib * ty)],
                    [ic, id_, -(ic * tx + id_ * ty)]])
    return np.asarray(out, np.float32)


def _device_render(img, group, hc, wc):
    import jax.numpy as jnp
    from mods_tpu.pipeline import _render_program
    p0 = group[0]
    h, w = img.shape
    if p0.identity:
        hr = wr = 0
    else:
        hr = max(p.h_rot for p in group)
        wr = max(p.w_rot for p in group)
    prog = _render_program(len(group), h, w, hr, wr, hc, wc,
                           p0.view.do_blur, p0.identity)
    sx, sy = p0.tilt_scale
    squash_inv = np.asarray([[1.0 / sx, 0.0, 0.0],
                             [0.0, 1.0 / sy, 0.0]], np.float32)
    valid_hw = jnp.asarray([[p.h_new, p.w_new] for p in group], np.int32)
    return np.asarray(prog(jnp.asarray(img), jnp.asarray(_rot_inv(group)),
                           jnp.asarray(squash_inv),
                           np.float32(p0.sigma_x),
                           np.float32(p0.sigma_y), valid_hw))


def _host_render(img, group, hc, wc):
    p0 = group[0]
    if p0.identity:
        hr = wr = 0
    else:
        hr = max(p.h_rot for p in group)
        wr = max(p.w_rot for p in group)
    valid_hw = np.asarray([[p.h_new, p.w_new] for p in group], np.int32)
    return render_group_np(img, _rot_inv(group), hr, wr, p0.view.do_blur,
                           p0.sigma_x, p0.sigma_y, p0.tilt_scale[0],
                           p0.tilt_scale[1], valid_hw, hc, wc,
                           p0.identity)


@pytest.mark.parametrize("tilt,zoom", [(1.0, 1.0), (4.0, 1.0),
                                       (1.0, 0.25), (3.0, 0.5)])
def test_host_render_matches_device(rng, tilt, zoom):
    img = rng.uniform(0, 255, (96, 120)).astype(np.float32)
    it = IterationParams(tilt_set=(tilt,), scale_set=(zoom,),
                        phi_base=360.0)
    views, _ = synthesis.expand_views(it, [])
    plans = [synthesis.plan_view(v, img.shape[1], img.shape[0])
             for v in views]
    for group in synthesis.group_views(plans):
        hc = round_up(max(p.h_new for p in group), 128)
        wc = round_up(max(p.w_new for p in group), 128)
        dev = _device_render(img, group, hc, wc)
        host = _host_render(img, group, hc, wc)
        assert host.shape == dev.shape
        for v, p in enumerate(group):
            a = host[v, :p.h_new, :p.w_new]
            b = dev[v, :p.h_new, :p.w_new]
            assert np.max(np.abs(a - b)) < 0.05, (tilt, zoom, v)
