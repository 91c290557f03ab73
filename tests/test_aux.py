"""Aux subsystems: drawing, CLAHE, run/time logs (SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp

from mods_tpu import viz
from mods_tpu.ops.clahe import clahe
from mods_tpu.timing import RunLog, TimeLog


def test_draw_matches_shapes():
    img1 = np.random.default_rng(0).uniform(0, 255, (120, 80)).astype(
        np.float32)
    img2 = np.random.default_rng(1).uniform(0, 255, (100, 90, 3)).astype(
        np.uint8)
    xy1 = np.array([[10, 10], [50, 60]], np.float32)
    xy2 = np.array([[20, 15], [40, 70]], np.float32)
    canvas = viz.draw_matches(img1, img2, xy1, xy2,
                              inlier_mask=np.array([True, False]))
    assert canvas.ndim == 3 and canvas.shape[2] == 3
    # portrait img1 -> horizontal side-by-side canvas
    assert canvas.shape[0] == 120 and canvas.shape[1] == 170
    # green and red both present
    assert (canvas == np.array([0, 255, 0])).all(-1).any()
    assert (canvas == np.array([255, 0, 0])).all(-1).any()


def test_draw_regions_and_epipolar():
    img = np.zeros((64, 64), np.float32)
    xy = np.array([[32.0, 32.0]], np.float32)
    A = np.array([[[2.0, 0.5], [0.0, 1.0]]], np.float32)
    s = np.array([3.0], np.float32)
    canvas = viz.draw_regions(img, xy, A, s)
    assert (canvas == np.array([0, 255, 0])).all(-1).any()
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    canvas2 = viz.draw_epipolar(img, img, xy, xy, F)
    assert canvas2.shape == (64, 128, 3)


def test_clahe_equalizes():
    rng = np.random.default_rng(2)
    # low-contrast image: narrow band around 100
    img = (100.0 + 8.0 * rng.standard_normal((96, 128))).astype(np.float32)
    out = np.asarray(clahe(jnp.asarray(np.clip(img, 0, 255))))
    assert out.shape == img.shape
    # contrast increased
    assert out.std() > 1.5 * img.std()
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_clahe_flat_is_stable():
    img = jnp.full((64, 64), 128.0)
    out = np.asarray(clahe(img))
    assert np.isfinite(out).all()
    assert out.std() < 60.0  # a flat image must not explode into noise


def test_run_and_time_logs(tmp_path):
    rl = RunLog(tentatives=100, true_matches=40, inlier_ratio=0.4,
                steps=2, total_time=1.5)
    p = tmp_path / "log.txt"
    rl.write(str(p))
    rl.write(str(p), append=True)
    lines = p.read_text().strip().splitlines()
    assert lines[0].startswith("Tentatives")
    assert len(lines) == 3 and lines[1] == lines[2]

    tl = TimeLog()
    with tl.phase("DetectTime"):
        pass
    tl.finalize()
    tp = tmp_path / "time.log"
    tl.write(str(tp))
    tlines = tp.read_text().strip().splitlines()
    assert tlines[0].split()[0] == "Synth"
    assert len(tlines[1].split()) == len(tlines[0].split())
