"""One-vs-many matching over the ``pair`` mesh axis — the TPU redesign
of mods_multi.cpp.

The reference loops gallery images serially (mods_multi.cpp:232-260) and
escalates until at least one image matches (GetAtLeastOneImageMatch,
:229-234).  Here the gallery IS a batch axis: every per-group program of
the two-view engine is vmapped over a leading (P,) axis and the inputs
are placed with a NamedSharding over the mesh's ``pair`` axis, so XLA
splits gallery images across chips and the early-stop reduction is the
only cross-chip collective.  On one chip the same program simply runs
the batch densely — one dispatch for the whole gallery per view group.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu import synthesis
from mods_tpu.config import as_rungs
from mods_tpu.descriptors.registry import get_spec, spec_for
from mods_tpu.ops.image import round_up
from mods_tpu.pipeline import (DeviceStore, EngineConfig,
                               TwoViewMatcher, _fused_group_program,
                               _fused_hostdet_program,
                               _match_pair_program, _verify_bank_program)
from mods_tpu.timing import TimeLog


@functools.lru_cache(maxsize=256)
def _batched_group_program(P: int, V: int, h0: int, w0: int, hr: int,
                           wr: int, hc: int, wc: int,
                           do_blur: bool, identity: bool, det: str,
                           specs: tuple, cfg: EngineConfig):
    """The fused per-group program vmapped over the gallery axis."""
    base = _fused_group_program.__wrapped__(
        V, h0, w0, hr, wr, hc, wc, do_blur, identity, det, specs, cfg)
    # __wrapped__ gives the jitted program; vmap composes fine with it
    # axes: (img, rot_inv, squash_inv, sig_x, sig_y, valid_hw, regn,
    #        hinv, stores) — stores carry a leading gallery axis
    return jax.jit(jax.vmap(
        base, in_axes=(0, 0, None, None, None, 0, None, 0, 0)),
        donate_argnums=(8,))


@functools.lru_cache(maxsize=128)
def _batched_hostdet_program(P: int, V: int, h0: int, w0: int, hr: int,
                             wr: int, hc: int, wc: int, do_blur: bool,
                             identity: bool, K: int, specs: tuple,
                             cfg: EngineConfig):
    """The host-stage (MSER/ReadAffs) describe program vmapped over the
    gallery axis: per-image keypoints come from the native host
    detector; the device re-renders views and describes, batched."""
    base = _fused_hostdet_program.__wrapped__(
        V, h0, w0, hr, wr, hc, wc, do_blur, identity, K, specs, cfg)
    # axes: (img, rot_inv, squash_inv, sig_x, sig_y, valid_hw,
    #        regs_xy, regs_A, regs_s, regs_resp, regs_mask, hinv,
    #        stores)
    return jax.jit(jax.vmap(
        base, in_axes=(0, 0, None, None, None, 0, 0, 0, 0, 0, 0, 0, 0)),
        donate_argnums=(12,))


class BatchedDeviceStore:
    """DeviceStore with a leading gallery axis (P, cap, ...); appends
    are folded into the batched group programs (donated buffers)."""

    def __init__(self, P: int, cap: int, dim: int, shard=None):
        self.P, self.cap, self.dim = P, cap, dim
        shard = shard or (lambda x: x)
        self._xy = shard(jnp.zeros((P, cap, 2), jnp.float32))
        self._A = shard(jnp.zeros((P, cap, 2, 2), jnp.float32))
        self._s = shard(jnp.zeros((P, cap), jnp.float32))
        self._r = shard(jnp.zeros((P, cap), jnp.float32))
        self._d = shard(jnp.zeros((P, cap, dim), jnp.float32))
        self._n = shard(jnp.zeros((P,), jnp.int32))

    def buffers(self):
        return (self._xy, self._A, self._s, self._r, self._d, self._n)

    def set_buffers(self, bufs) -> None:
        (self._xy, self._A, self._s, self._r, self._d, self._n) = bufs

    def device_arrays(self):
        return self._xy, self._A, self._s, self._d, self._n


@dataclass
class MultiResult:
    """Per-gallery-image outcomes of a one-vs-many run."""
    counts: np.ndarray          # (P,) verified matches per gallery image
    n_tentatives: np.ndarray    # (P,)
    steps_used: int
    log: "TimeLog"
    xy1: list                   # per-gallery (Ni, 2) matched query points
    xy2: list
    H: np.ndarray               # (P, 3, 3) estimated models


def _pad_gallery(imgs: list[np.ndarray]):
    """Stack differently-sized gallery images onto one gray canvas."""
    hs = [im.shape[0] for im in imgs]
    ws = [im.shape[1] for im in imgs]
    H, W = max(hs), max(ws)
    out = np.full((len(imgs), H, W), 128.0, np.float32)
    for i, im in enumerate(imgs):
        out[i, : im.shape[0], : im.shape[1]] = im
    return out, list(zip(hs, ws))


class MultiMatcher:
    """Query vs gallery escalation matcher (mods_multi.cpp main loop)."""

    def __init__(self, ladder=None, cfg: EngineConfig = EngineConfig(),
                 seed: int = 0, mesh=None):
        self.cfg = cfg
        self.ladder = ladder
        self.mesh = mesh
        self.qmatcher = TwoViewMatcher(ladder, cfg, seed=seed)
        self.key = jax.random.PRNGKey(seed + 1)

    def _shard_pair(self, x):
        if self.mesh is None or "pair" not in self.mesh.axis_names:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(*(("pair",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _host_stage_batch(self, imgs, pgroups, rot_inv, hr, wr, hc, wc,
                          Vb, log, it):
        """Host-stage detection (native MSER over host-rendered views)
        for every gallery image, threaded — the ctypes calls release the
        GIL, so images run in parallel on host cores while the device
        pipeline stays busy.  Returns stacked (P, Vb, K, ...) arrays."""
        from concurrent.futures import ThreadPoolExecutor
        P_n = imgs.shape[0]
        V = len(pgroups[0])

        def one(i):
            return self.qmatcher._host_stage_regions(
                it.detector, imgs[i], pgroups[i], rot_inv[i, :V], hr, wr,
                hc, wc, TimeLog(), img_idx=i)

        with log.phase("DetectTime"):
            with ThreadPoolExecutor(max_workers=min(P_n, 8)) as ex:
                regs = list(ex.map(one, range(P_n)))
        out = {k: np.stack([r[k] for r in regs]) for k in regs[0]}
        if Vb > V:
            out = {k: np.concatenate(
                [a, np.zeros((P_n, Vb - V) + a.shape[2:], a.dtype)], 1)
                for k, a in out.items()}
        return out

    def _process_gallery(self, imgs, sizes, it, prev_views, stores, log,
                         side: str = "g", prefetch_only: bool = False,
                         step: int = -1):
        """Batched SynthDetectDescribe over the gallery axis.  Mirrors
        TwoViewMatcher._process_image with a leading (P,) dim.  Device
        detectors run fully fused; host-stage MSER detects natively on
        threaded host cores and describes batched on device
        (mods_multi.cpp:250's serial loop, re-cut along the pair axis).

        ``side`` keys the once-per-run device upload cache — the
        pair-batched two-view mode batches BOTH sides."""
        cfg = self.cfg
        if it.detector == "ReadAffs":
            raise NotImplementedError(
                "ReadAffs has no per-gallery keypoint files; use the "
                "serial path")
        host_stage = not self.qmatcher._device_det(it.detector)
        if prefetch_only and not host_stage:
            views, prev_views = synthesis.expand_views(it, prev_views)
            return prev_views          # nothing host-side to prefetch
        P_n = imgs.shape[0]
        specs = self.qmatcher._specs(it)
        sts = []
        for sp in specs:
            key = (it.detector, sp.name)
            st = stores.get(key)
            if st is None:
                stores[key] = st = BatchedDeviceStore(
                    P_n, cfg.caps.per_image, sp.dim,
                    shard=self._shard_pair)
            sts.append(st)
        views, prev_views = synthesis.expand_views(it, prev_views)
        # per-image plans (sizes differ); groups are size-independent
        plans_per_img = [[synthesis.plan_view(v, w, h) for v in views]
                         for (h, w) in sizes]
        if not hasattr(self, "_imgs_dev_cache"):
            self._imgs_dev_cache = {}
        if self._imgs_dev_cache.get(side) is None:
            self._imgs_dev_cache[side] = self._shard_pair(
                jnp.asarray(imgs))
        imgs_j = self._imgs_dev_cache[side]
        pe = cfg.sift.patch_extraction
        n_groups = len(synthesis.group_views(plans_per_img[0]))
        grouped = [synthesis.group_views(p) for p in plans_per_img]
        assert all(len(g) == n_groups for g in grouped)
        for gi in range(n_groups):
            pgroups = [g[gi] for g in grouped]      # per image, this group
            V = len(pgroups[0])
            Vb = synthesis.snap_views(V)
            p0 = pgroups[0][0]
            h0, w0 = imgs.shape[1], imgs.shape[2]
            if p0.identity:
                hr = wr = 0
                hc = synthesis.snap_dim(h0)
                wc = synthesis.snap_dim(w0)
                rot_inv = np.zeros((P_n, Vb, 2, 3), np.float32)
            else:
                hr = synthesis.snap_dim(
                    max(p.h_rot for g in pgroups for p in g))
                wr = synthesis.snap_dim(
                    max(p.w_rot for g in pgroups for p in g))
                hc = synthesis.snap_dim(
                    max(p.h_new for g in pgroups for p in g))
                wc = synthesis.snap_dim(
                    max(p.w_new for g in pgroups for p in g))
                rot_inv = np.zeros((P_n, Vb, 2, 3), np.float32)
                for i, g in enumerate(pgroups):
                    for v, p in enumerate(g):
                        a, b, tx, c, d, ty = p.rot
                        det_ = a * d - b * c
                        ia, ib = d / det_, -b / det_
                        ic, id_ = -c / det_, a / det_
                        rot_inv[i, v] = [
                            [ia, ib, -(ia * tx + ib * ty)],
                            [ic, id_, -(ic * tx + id_ * ty)]]
                    rot_inv[i, V:] = rot_inv[i, 0]
            sx, sy = p0.tilt_scale
            squash_inv = np.asarray(
                [[1.0 / sx, 0.0, 0.0], [0.0, 1.0 / sy, 0.0]], np.float32)
            valid_hw = np.zeros((P_n, Vb, 2), np.int32)
            valid_hw[:, :V] = np.asarray(
                [[[p.h_new, p.w_new] for p in g] for g in pgroups],
                np.int32)
            hinv = np.asarray(
                [[np.linalg.inv(np.asarray(p.H, np.float64).reshape(3, 3)
                                )[:2, :] for p in g] for g in pgroups],
                np.float32)
            if Vb > V:
                hinv = np.concatenate(
                    [hinv, np.repeat(hinv[:, :1], Vb - V, 1)], axis=1)
            if host_stage:
                fkey = (side, step, it.detector, gi)
                if prefetch_only:
                    # submit the host render+detect job now (under the
                    # earlier rungs' device work); consumed below on the
                    # real pass.  The pool serializes with itself, so
                    # worker count bounds CPU pressure.
                    if not hasattr(self, "_host_pool"):
                        from concurrent.futures import ThreadPoolExecutor
                        self._host_pool = ThreadPoolExecutor(
                            max_workers=2)
                    self._host_futures[fkey] = self._host_pool.submit(
                        self._host_stage_batch, imgs, pgroups, rot_inv,
                        hr, wr, hc, wc, Vb, TimeLog(), it)
                    continue
                fut = getattr(self, "_host_futures", {}).pop(fkey, None)
                if fut is not None:
                    with log.phase("DetectTime"):
                        regs = fut.result()
                else:
                    regs = self._host_stage_batch(
                        imgs, pgroups, rot_inv, hr, wr, hc, wc, Vb, log,
                        it)
                prog = _batched_hostdet_program(
                    P_n, Vb, h0, w0, hr, wr, hc, wc, p0.view.do_blur,
                    p0.identity,
                    (cfg.mser.host_cap if it.detector == "MSER"
                     else cfg.caps.per_view),
                    self.qmatcher._specs(it), cfg)
                with log.phase("DescTime"):
                    out = prog(
                        imgs_j, self._shard_pair(jnp.asarray(rot_inv)),
                        jnp.asarray(squash_inv),
                        np.float32(p0.sigma_x), np.float32(p0.sigma_y),
                        self._shard_pair(jnp.asarray(valid_hw)),
                        self._shard_pair(jnp.asarray(regs["xy"])),
                        self._shard_pair(jnp.asarray(regs["A"])),
                        self._shard_pair(jnp.asarray(regs["s"])),
                        self._shard_pair(jnp.asarray(regs["response"])),
                        self._shard_pair(jnp.asarray(regs["mask"])),
                        self._shard_pair(jnp.asarray(hinv)),
                        tuple(st.buffers() for st in sts))
            else:
                prog = _batched_group_program(
                    P_n, Vb, h0, w0, hr, wr, hc, wc, p0.view.do_blur,
                    p0.identity, it.detector,
                    self.qmatcher._specs(it), cfg)
                with log.phase("DetectTime"):
                    out = prog(
                        imgs_j, self._shard_pair(jnp.asarray(rot_inv)),
                        jnp.asarray(squash_inv),
                        np.float32(p0.sigma_x), np.float32(p0.sigma_y),
                        self._shard_pair(jnp.asarray(valid_hw)),
                        self.qmatcher._region_budgets(pgroups[0],
                                                      it.detector, Vb),
                        self._shard_pair(jnp.asarray(hinv)),
                        tuple(st.buffers() for st in sts))
            for st, bufs in zip(sts, out):
                st.set_buffers(bufs)
        return prev_views

    def match(self, query_img, gallery_imgs: list,
              stop_at_first: bool = True):
        """Returns a MultiResult.  Escalates until at least one gallery
        image reaches min_matches (GetAtLeastOneImageMatch,
        mods_multi.cpp:229-234), or all do when ``stop_at_first`` is
        False."""
        cfg = self.cfg
        log = TimeLog()
        from mods_tpu.ops.image import to_gray_np
        q = to_gray_np(query_img)
        gal = [to_gray_np(g) for g in gallery_imgs]
        imgs, sizes = _pad_gallery(gal)
        self._imgs_dev_cache = {}   # uploaded once, reused across rungs
        P_real = imgs.shape[0]
        # the pair axis shards the gallery: the global batch must be a
        # multiple of the mesh's pair size, so pad with blank images
        # (zero pixels -> no detections -> zero counts), sliced off the
        # results below
        if self.mesh is not None and "pair" in self.mesh.axis_names:
            pair = self.mesh.shape["pair"]
            pad = -P_real % pair
            if pad:
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
                sizes = list(sizes) + [sizes[-1]] * pad
        P_n = imgs.shape[0]
        self.qmatcher._wh = (max(q.shape[1], imgs.shape[2]),
                             max(q.shape[0], imgs.shape[1]))

        qstores: dict = {}
        gstores: dict = {}
        qprev: dict = {}
        gprev: dict = {}
        bank: dict = {}
        counts = np.zeros(P_real, np.int32)
        steps = 0
        from mods_tpu.config import IterationParams
        ladder = self.ladder if self.ladder else [IterationParams()]
        rungs = as_rungs(ladder)[:cfg.max_steps]
        last_out = None
        for step, rung in enumerate(rungs):
            steps += 1
            for it in rung.dets:
                qprev[it.detector] = self.qmatcher._process_image(
                    q, it, qprev.get(it.detector, []), qstores, log, 0)
                gprev[it.detector] = self._process_gallery(
                    imgs, sizes, it, gprev.get(it.detector, []),
                    gstores, log)
            for cstep, cdet, cdesc in cfg.clear_tentatives:
                if step == cstep:
                    bank.pop((cdet, cdesc), None)
            self._execute_plan(qstores, gstores, rung, bank, log)
            out = self._verify_bank(bank, log)
            if out is None:
                continue
            last_out = out
            # block the whole output before any host read (partial reads
            # degrade the tunnel session to ~26 ms/dispatch)
            jax.block_until_ready(out)
            counts = np.asarray(out["n_inl"])[:P_real]
            matched = counts >= cfg.min_matches
            if (stop_at_first and matched.any()) or matched.all():
                break
        log.finalize()
        xy1, xy2 = [], []
        H = np.tile(np.eye(3, dtype=np.float32), (P_real, 1, 1))
        n_tent = np.zeros(P_real, np.int32)
        if last_out is not None:
            inl = np.asarray(last_out["inlier_mask"])
            a1 = np.asarray(last_out["xy1_all"])
            a2 = np.asarray(last_out["xy2_all"])
            H = np.asarray(last_out["model"])[:P_real]
            n_tent = np.asarray(last_out["n_tent"])[:P_real]
            for i in range(P_real):
                xy1.append(a1[i][inl[i]])
                xy2.append(a2[i][inl[i]])
        else:
            xy1 = [np.zeros((0, 2))] * P_real
            xy2 = [np.zeros((0, 2))] * P_real
        return MultiResult(counts=counts, n_tentatives=n_tent,
                           steps_used=steps, log=log, xy1=xy1, xy2=xy2,
                           H=H)

    # -- batched matching over the gallery axis ---------------------------

    def _execute_plan(self, qstores, gstores, rung, bank, log,
                      q_axis=None):
        """q_axis=None: one query vs batched gallery (mods_multi).
        q_axis=0: both sides batched (pair-batched two-view serving)."""
        cfg = self.cfg
        plan = rung.plan or rung.default_plan()

        def run(key, qparts, gparts, ratio, dist_thr, spec):
            bank.pop(key, None)
            if not (qparts and gparts):
                return
            prog = _match_pair_program(
                len(qparts), len(gparts), cfg.caps.per_image, spec.dim,
                cfg.match.knn, cfg.match.contrad_dist,
                cfg.match.duplicate_mode, ratio > 0, dist_thr > 0,
                spec.kind == "binary", cfg.match.standard_2nd_closest,
                False)
            vprog = jax.vmap(
                prog, in_axes=(q_axis, 0, None, None))
            parts = vprog(tuple(p.device_arrays() for p in qparts),
                          tuple(p.device_arrays() for p in gparts),
                          jnp.float32(ratio), jnp.float32(dist_thr))
            if parts:
                bank[key] = parts

        for desc in plan.group_descriptors:
            spec = spec_for(desc, cfg)
            qp = [qstores[(d, desc)] for d in plan.group_detectors
                  if (d, desc) in qstores]
            gp = [gstores[(d, desc)] for d in plan.group_detectors
                  if (d, desc) in gstores]
            with log.phase("MatchingTime"):
                run(("Group", desc), qp, gp, cfg.match.group_fginn(desc),
                    cfg.match.group_distance(desc), spec)

        rung_dets = {d.detector: d for d in rung.dets}
        for det in plan.separate_detectors:
            it = rung_dets.get(det)
            if it is None:
                continue
            for desc in plan.separate_descriptors:
                key = (det, desc)
                if key not in qstores or key not in gstores:
                    bank.pop(key, None)
                    continue
                with log.phase("MatchingTime"):
                    run(key, [qstores[key]], [gstores[key]],
                        it.fginn_for(desc), it.distance_for(desc),
                        spec_for(desc, cfg))

    def _verify_bank(self, bank, log):
        cfg = self.cfg
        tent_parts = [p for parts in bank.values() for p in parts]
        if not tent_parts:
            return None
        tcap = cfg.caps.tentatives
        rows = tuple(int(p["mask"].shape[1]) for p in tent_parts)
        P_n = tent_parts[0]["mask"].shape[0]
        w, h = self.qmatcher._wh
        vp = _verify_bank_program(rows, tcap, cfg, w, h, False, False)
        vvp = jax.vmap(vp, in_axes=(0, 0))
        self.key, k = jax.random.split(self.key)
        keys = jax.random.split(k, P_n)
        with log.phase("RANSACTime"):
            out = vvp(tuple(tent_parts), keys)
        return out


@dataclass
class BatchResult:
    """Per-pair outcomes of a pair-batched run (serial MatchResult
    semantics per pair: first rung crossing min_matches stops that pair,
    best rung up to there is reported)."""
    counts: np.ndarray          # (P,) verified matches
    n_tentatives: np.ndarray    # (P,)
    steps_used: np.ndarray      # (P,)
    H: np.ndarray               # (P, 3, 3)
    xy1: list                   # per-pair (Ni, 2)
    xy2: list
    log: "TimeLog" = None


class PairBatchMatcher:
    """Pair-batched two-view serving on one chip (or a ``pair`` mesh):
    P independent (imgA, imgB) pairs advance the escalation ladder
    TOGETHER, one batched dispatch per view group / match / verify —
    production pairs/s instead of the serial protocol's
    one-pair-per-dispatch (the tunnel charges ~26 ms per dispatch, and a
    single cat-sized pair leaves most of the chip idle).

    Reference axis: mods_multi.cpp:232-260 batches the gallery side;
    here BOTH sides carry the pair axis.  The whole batch escalates
    until every pair crossed min_matches (or rungs run out); per-pair
    results then follow mods.cpp's serial selection (first crossing rung
    stops the pair, best rung up to there reported)."""

    def __init__(self, ladder=None, cfg: EngineConfig = EngineConfig(),
                 seed: int = 0, mesh=None):
        self.cfg = cfg
        self.ladder = ladder
        self.mm = MultiMatcher(ladder, cfg, seed=seed, mesh=mesh)

    def match_batch(self, pairs: list) -> BatchResult:
        cfg = self.cfg
        mm = self.mm
        log = TimeLog()
        from mods_tpu.ops.image import to_gray_np
        from mods_tpu.config import IterationParams
        g1 = [to_gray_np(a) for a, _ in pairs]
        g2 = [to_gray_np(b) for _, b in pairs]
        imgs1, sizes1 = _pad_gallery(g1)
        imgs2, sizes2 = _pad_gallery(g2)
        P_real = len(pairs)
        if mm.mesh is not None and "pair" in mm.mesh.axis_names:
            pair = mm.mesh.shape["pair"]
            pad = -P_real % pair
            if pad:
                z = np.zeros
                imgs1 = np.concatenate(
                    [imgs1, z((pad,) + imgs1.shape[1:], imgs1.dtype)])
                imgs2 = np.concatenate(
                    [imgs2, z((pad,) + imgs2.shape[1:], imgs2.dtype)])
                sizes1 = list(sizes1) + [sizes1[-1]] * pad
                sizes2 = list(sizes2) + [sizes2[-1]] * pad
        mm._imgs_dev_cache = {}
        mm.qmatcher._wh = (max(imgs1.shape[2], imgs2.shape[2]),
                           max(imgs1.shape[1], imgs2.shape[1]))
        stores1: dict = {}
        stores2: dict = {}
        prev1: dict = {}
        prev2: dict = {}
        bank: dict = {}
        ladder = self.ladder if self.ladder else [IterationParams()]
        rungs = as_rungs(ladder)[:cfg.max_steps]
        # prefetch every host-stage (MSER) job of the whole ladder up
        # front — the batch's host render+detect runs under the earlier
        # rungs' device work (same overlap as the serial engine's
        # _prefetch_host_stages)
        for f in getattr(mm, "_host_futures", {}).values():
            f.cancel()
        mm._host_futures = {}
        pf1: dict = {}
        pf2: dict = {}
        for step, rung in enumerate(rungs):
            for it in rung.dets:
                pf1[it.detector] = mm._process_gallery(
                    imgs1, sizes1, it, pf1.get(it.detector, []),
                    stores1, log, side="a", prefetch_only=True,
                    step=step)
                pf2[it.detector] = mm._process_gallery(
                    imgs2, sizes2, it, pf2.get(it.detector, []),
                    stores2, log, side="b", prefetch_only=True,
                    step=step)
        outs: list = []
        for step, rung in enumerate(rungs):
            for it in rung.dets:
                prev1[it.detector] = mm._process_gallery(
                    imgs1, sizes1, it, prev1.get(it.detector, []),
                    stores1, log, side="a", step=step)
                prev2[it.detector] = mm._process_gallery(
                    imgs2, sizes2, it, prev2.get(it.detector, []),
                    stores2, log, side="b", step=step)
            for cstep, cdet, cdesc in cfg.clear_tentatives:
                if step == cstep:
                    bank.pop((cdet, cdesc), None)
            mm._execute_plan(stores1, stores2, rung, bank, log, q_axis=0)
            out = mm._verify_bank(bank, log)
            if out is None:
                continue
            jax.block_until_ready(out)
            outs.append((step + 1, out))
            counts = np.asarray(out["n_inl"])[:P_real]
            if (counts >= cfg.min_matches).all():
                break
        log.finalize()
        if not outs:
            eye = np.tile(np.eye(3, dtype=np.float32), (P_real, 1, 1))
            zz = np.zeros(P_real, np.int32)
            return BatchResult(zz, zz, zz + len(rungs), eye,
                               [np.zeros((0, 2))] * P_real,
                               [np.zeros((0, 2))] * P_real, log)
        inls = np.stack([np.asarray(o["n_inl"])[:P_real]
                         for _, o in outs])              # (R, P)
        # per-pair serial semantics (mods.cpp:229-230 + best-rung pick)
        counts = np.zeros(P_real, np.int32)
        n_tent = np.zeros(P_real, np.int32)
        steps_used = np.zeros(P_real, np.int32)
        H = np.tile(np.eye(3, dtype=np.float32), (P_real, 1, 1))
        xy1, xy2 = [], []
        hosts = [{k: np.asarray(v) for k, v in o.items()}
                 for _, o in outs]
        for i in range(P_real):
            crossed = np.nonzero(inls[:, i] >= cfg.min_matches)[0]
            stop_r = int(crossed[0]) if crossed.size else len(outs) - 1
            best_r = int(np.argmax(inls[: stop_r + 1, i]))
            o = hosts[best_r]
            counts[i] = inls[best_r, i]
            n_tent[i] = o["n_tent"][i]
            steps_used[i] = (outs[stop_r][0] if crossed.size
                             else len(rungs))
            H[i] = o["model"][i]
            m = o["inlier_mask"][i]
            xy1.append(o["xy1_all"][i][m])
            xy2.append(o["xy2_all"][i][m])
        return BatchResult(counts=counts, n_tentatives=n_tent,
                           steps_used=steps_used, H=H, xy1=xy1, xy2=xy2,
                           log=log)
