"""Parallel-layer tests on the forced 8-device CPU mesh: sharded kNN,
pair-sharded batched matching, and the global early-stop decision
(SURVEY.md §5.8; mods_multi.cpp:229-234)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mods_tpu.parallel.mesh import (global_stop_decision, make_mesh,
                                    sharded_knn)


def _require_devices(n):
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices")


def test_make_mesh_axes():
    _require_devices(8)
    mesh = make_mesh({"pair": 4, "kp": 2})
    assert mesh.shape == {"pair": 4, "kp": 2}


def test_sharded_knn_matches_dense():
    _require_devices(8)
    mesh = make_mesh({"kp": 8})
    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(96, 32)).astype(np.float32)
    d2 = rng.normal(size=(256, 32)).astype(np.float32)
    knn = sharded_knn(mesh, knn=8)
    dists, idx = jax.jit(knn)(jnp.asarray(d1), jnp.asarray(d2))
    # dense reference
    dd = ((d1 * d1).sum(-1)[:, None] + (d2 * d2).sum(-1)[None, :]
          - 2.0 * d1 @ d2.T)
    ref_idx = np.argsort(dd, axis=1)[:, :8]
    ref_d = np.take_along_axis(dd, ref_idx, axis=1)
    np.testing.assert_allclose(np.asarray(dists), ref_d, atol=1e-2)
    # indices agree where distances are distinct
    same = np.isclose(ref_d[:, :1], ref_d[:, 1:2])
    assert (np.asarray(idx[:, 0]) == ref_idx[:, 0])[~same[:, 0]].all()


def test_batched_pair_step_shards_over_pairs():
    _require_devices(8)
    from mods_tpu.config import CapacityParams, RansacParams
    from mods_tpu.models.flagship import batched_pair_step
    from mods_tpu.pipeline import EngineConfig

    mesh = make_mesh({"pair": 8})
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=128, per_view=128, per_image=256,
                            max_angles=1),
        ransac=RansacParams(batch_hypotheses=64, max_rounds=1))

    rng = np.random.default_rng(0)
    base = np.kron(rng.uniform(0, 255, (16, 16)).astype(np.float32),
                   np.ones((8, 8), np.float32))
    P_n = 8
    imgs1 = jnp.stack([jnp.asarray(base + i) for i in range(P_n)])
    imgs2 = imgs1 + 0.5
    keys = jax.random.split(jax.random.PRNGKey(0), P_n)

    spec = NamedSharding(mesh, P("pair"))
    imgs1 = jax.device_put(imgs1, spec)
    imgs2 = jax.device_put(imgs2, spec)
    keys = jax.device_put(keys, spec)

    out = jax.jit(lambda a, b, k: batched_pair_step(a, b, k, cfg))(
        imgs1, imgs2, keys)
    out = jax.tree.map(np.asarray, out)
    assert out["n_inliers"].shape == (P_n,)
    # identical-content pairs must match well on every shard
    assert (out["n_inliers"] >= 8).all(), out["n_inliers"]


def test_multi_matcher_pair_sharded():
    """One-vs-many over the pair axis: counts match the serial two-view
    engine's verdicts and the early stop triggers (mods_multi.cpp:229)."""
    _require_devices(8)
    from mods_tpu.config import CapacityParams, IterationParams, \
        RansacParams
    from mods_tpu.parallel.multi import MultiMatcher
    from mods_tpu.pipeline import EngineConfig
    from tests.test_pipeline import textured_image, warp_np

    q = textured_image(128, 160, seed=3)
    H = np.array([[1.0, 0.0, 8.0], [0.0, 1.0, -5.0], [0, 0, 1.0]])
    good = warp_np(q, H, 128, 160)
    rng = np.random.default_rng(9)
    bad = [np.asarray(textured_image(128, 160, seed=50 + i))
           for i in range(3)]
    gallery = [bad[0], good, bad[1], bad[2]]

    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_image=512,
                            max_angles=2, tentatives=1024),
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2))
    mesh = make_mesh({"pair": 4, "kp": 2})
    m = MultiMatcher([IterationParams()], cfg, mesh=mesh)
    res = m.match(q, gallery)
    assert res.counts.shape == (4,)
    assert res.counts[1] >= cfg.min_matches, res.counts
    # unrelated textures must not out-match the true pair
    assert res.counts[1] == res.counts.max(), res.counts
    assert len(res.xy1[1]) == res.counts[1]


def test_global_stop_decision():
    counts = jnp.asarray([12, 3, 40])
    assert not bool(global_stop_decision(counts, 10))
    assert bool(global_stop_decision(jnp.asarray([12, 11]), 10))
    # any-matched variant (GetAtLeastOneImageMatch semantics)
    assert bool(jnp.any(counts >= 10))


def test_multi_matcher_cviu_subset_with_mser():
    """CVIU-subset ladder INCLUDING an MSER rung through the pair-sharded
    MultiMatcher: host-stage MSER detects natively per gallery image
    (threaded), description/matching run batched over the mesh
    (mods_multi.cpp:229-260 re-cut along the pair axis)."""
    _require_devices(8)
    from mods_tpu.config import CapacityParams, IterationParams, \
        RansacParams
    from mods_tpu.parallel.multi import MultiMatcher
    from mods_tpu.pipeline import EngineConfig
    from tests.test_pipeline import textured_image, warp_np

    q = textured_image(128, 160, seed=3)
    H = np.array([[1.0, 0.0, 6.0], [0.0, 1.0, -4.0], [0, 0, 1.0]])
    good = warp_np(q, H, 128, 160)
    gallery = [np.asarray(textured_image(128, 160, seed=77)), good]

    # ORB rung then an MSER rung — the shape of the CVIU ladder's
    # first escalation (iters_mods_cviu.ini:4-55)
    ladder = [
        IterationParams(detector="ORB", descriptors=("ORB",),
                        fginn_threshold=(0.0,),
                        distance_threshold=(60.0,)),
        IterationParams(detector="MSER", descriptors=("RootSIFT",),
                        fginn_threshold=(0.85,)),
    ]
    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_group=512,
                            per_image=512, max_angles=2,
                            tentatives=1024),
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2),
        min_matches=1000)   # force both rungs to run
    mesh = make_mesh({"pair": 2, "kp": 4})
    m = MultiMatcher(ladder, cfg, mesh=mesh)
    res = m.match(q, gallery, stop_at_first=False)
    assert res.counts.shape == (2,)
    assert res.steps_used == 2
    # the true pair must dominate the unrelated texture
    assert res.counts[1] > res.counts[0], res.counts
    assert res.counts[1] >= 10, res.counts


def test_pair_batch_matcher():
    """Pair-batched two-view serving (PairBatchMatcher): P independent
    pairs advance the ladder together; per-pair results follow the
    serial selection semantics.  A true pair matches, an unrelated pair
    does not."""
    from mods_tpu.config import CapacityParams, IterationParams, \
        RansacParams
    from mods_tpu.parallel.multi import PairBatchMatcher
    from mods_tpu.pipeline import EngineConfig
    from tests.test_pipeline import textured_image, warp_np

    a = textured_image(128, 160, seed=3)
    H = np.array([[1.0, 0.0, 8.0], [0.0, 1.0, -5.0], [0, 0, 1.0]])
    b = warp_np(a, H, 128, 160)
    c = textured_image(128, 160, seed=77)
    d = textured_image(128, 160, seed=88)

    cfg = EngineConfig(
        caps=CapacityParams(per_octave=512, per_view=256, per_image=512,
                            max_angles=2, tentatives=1024),
        ransac=RansacParams(err_threshold=3.0, batch_hypotheses=256,
                            max_rounds=2))
    ladder = [IterationParams(),
              IterationParams(tilt_set=(2.0,), phi_base=120.0)]
    m = PairBatchMatcher(ladder, cfg)
    res = m.match_batch([(a, b), (c, d), (a, b)])
    assert res.counts.shape == (3,)
    assert res.counts[0] >= cfg.min_matches, res.counts
    assert res.counts[2] >= cfg.min_matches, res.counts
    assert res.counts[1] < res.counts[0], res.counts
    assert len(res.xy1[0]) == res.counts[0]
    # batched result agrees with the serial engine on the same pair
    from mods_tpu.pipeline import TwoViewMatcher
    sr = TwoViewMatcher(ladder, cfg).match(a, b)
    assert abs(int(sr.n_matches) - int(res.counts[0])) <= \
        max(6, int(0.4 * sr.n_matches)), (sr.n_matches, res.counts)
