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


def test_run_manifest_resume(tmp_path):
    """Batch checkpoint/resume (SURVEY.md §5.3): a rerun with the same
    manifest only executes pending gallery images."""
    from mods_tpu.parallel.manifest import RunManifest

    mpath = str(tmp_path / "run.manifest.json")
    m = RunManifest.load(mpath, query="q.png")
    paths = ["a.png", "b.png", "c.png"]
    assert m.pending(paths) == paths
    m.record("a.png", 12, 40, 2)
    m.save()

    # fresh load resumes: a is done, b/c pending
    m2 = RunManifest.load(mpath, query="q.png")
    assert m2.pending(paths) == ["b.png", "c.png"]
    assert m2.result("a.png")["n_matches"] == 12
    # a manifest recorded for a DIFFERENT query must not suppress work
    m3 = RunManifest.load(mpath, query="other.png")
    assert m3.pending(paths) == paths


def test_match_multi_cli_resume(tmp_path):
    """End-to-end: kill-and-rerun semantics through the CLI — second run
    with the manifest skips the done image (mods_multi equivalent)."""
    from PIL import Image
    from mods_tpu.cli import cmd_match_multi
    from mods_tpu.parallel.manifest import RunManifest

    rng = np.random.default_rng(0)
    base = np.kron(rng.uniform(0, 255, (12, 16)).astype(np.float32),
                   np.ones((8, 8), np.float32)).astype(np.uint8)
    qp = str(tmp_path / "q.png")
    g1 = str(tmp_path / "g1.png")
    g2 = str(tmp_path / "g2.png")
    Image.fromarray(base).save(qp)
    Image.fromarray(np.roll(base, 5, axis=1)).save(g1)
    Image.fromarray(base[::-1].copy()).save(g2)
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write(f"{g1}\n{g2}\n")
    # pre-mark g1 done with a sentinel count: the run must keep it
    mpath = str(tmp_path / "m.json")
    m = RunManifest.load(mpath, query=qp)
    m.record(g1, 777, 999, 1)
    m.save()
    # iters file with an MSER rung forces the serial (host-stage) path
    iters = str(tmp_path / "iters.ini")
    with open(iters, "w") as f:
        f.write("[Iterations]\nSteps=1\nminMatches=5\n"
                "[MSER0]\nTiltSet=1\nScaleSet=1\n"
                "Descriptors=RootSIFT\nFGINNThreshold=0.85\n")
    rc = cmd_match_multi([qp, lst, "", iters, "0", "0", mpath])
    assert rc == 0
    m2 = RunManifest.load(mpath, query=qp)
    # g1's sentinel untouched (skipped); g2 freshly computed
    assert m2.result(g1)["n_matches"] == 777
    assert m2.result(g2) is not None
    assert m2.result(g2)["n_matches"] != 777


def test_external_command_detector(tmp_path):
    """Generic external-process detector plugin
    (imagerepresentation.cpp:747-1026): run a command per synthesized
    view, ingest its keypoint file, describe/match on device."""
    from mods_tpu.config import CapacityParams, IterationParams, \
        RansacParams
    from mods_tpu.pipeline import EngineConfig, ExternalCmdParams, \
        TwoViewMatcher, replace
    from tests.test_pipeline import textured_image, warp_np

    # the "external binary": a grid detector writing Oxford ellipses
    script = tmp_path / "grid_det.py"
    script.write_text(
        "import sys\nfrom PIL import Image\n"
        "im = Image.open(sys.argv[1]); w, h = im.size\n"
        "pts = [(x, y) for y in range(24, h - 24, 12)\n"
        "       for x in range(24, w - 24, 12)]\n"
        "with open(sys.argv[2], 'w') as f:\n"
        "    f.write('0.0\\n%d\\n' % len(pts))\n"
        "    inv = 1.0 / (3.0 * 3.0)\n"
        "    for x, y in pts:\n"
        "        f.write('%f %f %f 0 %f\\n' % (x, y, inv, inv))\n")
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_image=512,
                            max_angles=2, tentatives=1024),
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2),
        external=ExternalCmdParams(
            command=f"python {script} {{img}} {{out}}"))
    img1 = textured_image(156, 192, seed=17)
    H = np.array([[1.0, 0.0, 12.0], [0.0, 1.0, -12.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 156, 192)
    ladder = [IterationParams(detector="External",
                              descriptors=("RootSIFT",),
                              fginn_threshold=(0.9,))]
    m = TwoViewMatcher(ladder, cfg).match(np.asarray(img1, np.float32),
                                          np.asarray(img2, np.float32))
    # grid step == translation: corresponding keypoints exist exactly
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)


def test_external_descriptor_plugin(tmp_path):
    """External-binary DESCRIPTOR plugin (the BICE pattern,
    descriptors/bicedescriptor.hpp + imagerepresentation.cpp:1610):
    detector command emits keypoints, descriptor command consumes the
    image + point list and emits one row per point; rows are ingested
    into the store and matched like any descriptor."""
    from mods_tpu.config import CapacityParams, IterationParams, \
        RansacParams
    from mods_tpu.pipeline import EngineConfig, ExternalCmdParams, \
        TwoViewMatcher, replace
    from tests.test_pipeline import textured_image, warp_np

    det = tmp_path / "grid_det.py"
    det.write_text(
        "import sys\nfrom PIL import Image\n"
        "im = Image.open(sys.argv[1]); w, h = im.size\n"
        "pts = [(x, y) for y in range(24, h - 24, 12)\n"
        "       for x in range(24, w - 24, 12)]\n"
        "with open(sys.argv[2], 'w') as f:\n"
        "    f.write('0.0\\n%d\\n' % len(pts))\n"
        "    inv = 1.0 / (3.0 * 3.0)\n"
        "    for x, y in pts:\n"
        "        f.write('%f %f %f 0 %f\\n' % (x, y, inv, inv))\n")
    # descriptor = mean patch intensity around the point, 8-dim ring:
    # translation-covariant, so true correspondences match
    desc = tmp_path / "ring_desc.py"
    desc.write_text(
        "import sys\nimport numpy as np\nfrom PIL import Image\n"
        "im = np.asarray(Image.open(sys.argv[1]), np.float32)\n"
        "pts = np.loadtxt(sys.argv[2], ndmin=2)\n"
        "with open(sys.argv[3], 'w') as f:\n"
        "    for x, y, s in pts:\n"
        "        xi, yi = int(x), int(y)\n"
        "        v = [im[yi + dy, xi + dx]\n"
        "             for dy in (-6, 0, 6) for dx in (-6, 0, 6)]\n"
        "        v = np.asarray(v[:8]) / (np.linalg.norm(v[:8]) + 1e-6)\n"
        "        f.write(' '.join([str(x), str(y)]\n"
        "                + ['%.6f' % q for q in v]) + '\\n')\n")
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_image=512,
                            max_angles=2, tentatives=1024),
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2),
        external=ExternalCmdParams(
            command=f"python {det} {{img}} {{out}}",
            desc_command=f"python {desc} {{img}} {{pts}} {{out}}",
            desc_dim=8))
    img1 = textured_image(156, 192, seed=17)
    H = np.array([[1.0, 0.0, 12.0], [0.0, 1.0, -12.0], [0, 0, 1.0]])
    img2 = warp_np(img1, H, 156, 192)
    ladder = [IterationParams(detector="External",
                              descriptors=("External",),
                              fginn_threshold=(0.9,))]
    m = TwoViewMatcher(ladder, cfg).match(np.asarray(img1, np.float32),
                                          np.asarray(img2, np.float32))
    assert m.n_matches >= 8, (m.n_matches, m.n_tentatives)
