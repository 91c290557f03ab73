"""The monolith ladder program: the ENTIRE escalation ladder — both
images, every view group, matching, duplicate filtering, geometric
verification, and the early-stop decision — as ONE compiled XLA program.

Why: the tunneled single-chip runtime charges ~26-100 ms of fixed
overhead per dispatch once any result has been read back (measured,
PROFILE_ladder.json r4), and buffer-dependency chains between dispatches
cost ~100 ms per hop.  The per-group program design paid that ~40x per
pair (9 s/pair); a single program pays it once — device compute for the
whole cat ladder is tens of milliseconds.

Design notes (vs the reference's control flow, mods.cpp:229-415):
  * Rung escalation happens ON DEVICE: each rung's body is wrapped in
    ``lax.cond(done, skip, run)`` — XLA executes only the taken branch,
    so easy pairs pay only their early rungs' compute.
  * Pair-invariant geometry (view grids, rotation maps, H inverses,
    budgets) is embedded as program constants from the prep cache.
  * Host-stage detections (MSER component tree, ReadAffs files) cannot
    run mid-program, so their padded region slabs for ALL rungs are
    computed up front (threaded on host cores) and passed as inputs.
  * The tentative bank stores ONE compacted part (tentative-capacity
    rows) per (det, desc) key instead of the reference's unbounded
    per-key lists (correspondencebank.h:43) — shapes must be static
    across rungs; the global tcap truncation already bounded the total.
  * Only compact results cross back to the host: counts, the model, and
    the compacted match coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mods_tpu.config import as_rungs, replace
from mods_tpu.descriptors.registry import spec_for
from mods_tpu.pipeline import (MIN_POINTS, _concat_compact_parts,
                               _make_desc_fn, _make_detect_fn,
                               _make_render_fn, _pool_match_parts,
                               _verify_core)

BANK_KEYS = ("xy1", "A1", "s1", "xy2", "A2", "s2", "prio", "mask")


def _zero_bank_entry(tcap: int):
    return dict(xy1=jnp.zeros((tcap, 2)), A1=jnp.zeros((tcap, 2, 2)),
                s1=jnp.zeros((tcap,)), xy2=jnp.zeros((tcap, 2)),
                A2=jnp.zeros((tcap, 2, 2)), s2=jnp.zeros((tcap,)),
                prio=jnp.zeros((tcap,)), mask=jnp.zeros((tcap,), bool))


def _zero_store(cap: int, dim: int):
    return (jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
            jnp.zeros((cap,)), jnp.zeros((cap,)), jnp.zeros((cap, dim)),
            jnp.zeros((), jnp.int32))


def build_ladder_program(matcher, shape1, shape2):
    """Returns (fn, slab_spec): ``fn(img1, img2, slabs, key[, gt_h])``
    jit-able over the whole ladder; ``slab_spec`` lists the host-stage
    detections the caller must supply, as (rung_i, det, img_idx,
    group_idx) in input order."""
    cfg = matcher.cfg
    rungs = as_rungs(matcher.ladder)[:cfg.max_steps]
    R = len(rungs)
    tcap = cfg.caps.tentatives
    cap = cfg.caps.per_image
    shapes = (shape1, shape2)
    w_all = max(shape1[1], shape2[1])
    h_all = max(shape1[0], shape2[0])
    gt_mode = cfg.ver_type == "GR_TRUTH"

    # ---- static structure: preps per (rung, det, image) --------------
    prep_tab = {}           # (r, det, img) -> list of gp dicts
    prev = [{}, {}]
    matcher._slab_its = getattr(matcher, "_slab_its", {})
    matcher._slab_prev = getattr(matcher, "_slab_prev", {})
    for r, rung in enumerate(rungs):
        for it in rung.dets:
            matcher._slab_its[(r, it.detector)] = it
            for im in (0, 1):
                h, w = shapes[im]
                p = prev[im].get(it.detector, [])
                matcher._slab_prev[(r, it.detector, im)] = tuple(p)
                new_prev, preps = matcher._prep_groups(it, h, w, p)
                prev[im][it.detector] = new_prev
                prep_tab[(r, it.detector, im)] = preps

    # static store key set + bank key set
    store_keys = []
    for rung in rungs:
        for it in rung.dets:
            for name in it.descriptors:
                k = (it.detector, name)
                if k not in store_keys:
                    store_keys.append(k)
    bank_keys = []
    for rung in rungs:
        plan = rung.plan or rung.default_plan()
        for desc in plan.group_descriptors:
            k = ("Group", desc)
            if k not in bank_keys:
                bank_keys.append(k)
        rdets = {d.detector for d in rung.dets}
        for det in plan.separate_detectors:
            if det not in rdets:
                continue
            for desc in plan.separate_descriptors:
                k = (det, desc)
                if k not in bank_keys:
                    bank_keys.append(k)

    # host-stage slabs needed, in deterministic order
    slab_spec = []
    for r, rung in enumerate(rungs):
        for it in rung.dets:
            if matcher._device_det(it.detector):
                continue
            for im in (0, 1):
                for gi in range(len(prep_tab[(r, it.detector, im)])):
                    slab_spec.append((r, it.detector, im, gi))

    pe = cfg.sift.patch_extraction

    def rung_stage(r, it, im, img, stores, slabs):
        """Synth+detect+describe for one (rung, detector, image):
        returns updated stores dict."""
        preps = prep_tab[(r, it.detector, im)]
        h, w = shapes[im]
        specs = matcher._specs(it)
        skeys = [(it.detector, sp.name) for sp in specs]
        sts = tuple(stores[(im,) + k] for k in skeys)
        device_det = matcher._device_det(it.detector)
        for gi, gp in enumerate(preps):
            const = lambda a: jnp.asarray(a)   # embedded constants
            if device_det:
                render = _make_render_fn(
                    gp["Vb"], h, w, gp["hr"], gp["wr"], gp["hc"],
                    gp["wc"], gp["do_blur"], gp["identity"])
                detect = _make_detect_fn(it.detector, cfg)
                desc = _make_desc_fn(
                    gp["Vb"], gp["hc"], gp["wc"], h, w,
                    cfg.caps.per_view, specs, cfg.dom_ori, pe.mr_size,
                    pe.patch_size, pe.photo_norm, cfg.caps)
                views = render(img, const(gp["rot_inv_np"]),
                               const(gp["squash_np"]),
                               const(gp["sig_np"][0]),
                               const(gp["sig_np"][1]),
                               const(gp["valid_np"]))
                views = jax.lax.optimization_barrier(views)
                regs = detect(views, const(gp["valid_np"]),
                              const(gp["regn_np"]))
                sts = desc(views, const(gp["valid_np"]), regs.xy,
                           regs.A, regs.s, regs.response, regs.mask,
                           const(gp["hinv_np"]), sts)
            else:
                slab = slabs[(r, it.detector, im, gi)]
                K = slab["xy"].shape[1]
                render = _make_render_fn(
                    gp["Vb"], h, w, gp["hr"], gp["wr"], gp["hc"],
                    gp["wc"], gp["do_blur"], gp["identity"])
                desc = _make_desc_fn(
                    gp["Vb"], gp["hc"], gp["wc"], h, w, K, specs,
                    cfg.dom_ori, pe.mr_size, pe.patch_size,
                    pe.photo_norm, cfg.caps)
                views = render(img, const(gp["rot_inv_np"]),
                               const(gp["squash_np"]),
                               const(gp["sig_np"][0]),
                               const(gp["sig_np"][1]),
                               const(gp["valid_np"]))
                views = jax.lax.optimization_barrier(views)
                sts = desc(views, const(gp["valid_np"]), slab["xy"],
                           slab["A"], slab["s"], slab["response"],
                           slab["mask"], const(gp["hinv_np"]), sts)
        out = dict(stores)
        for k, st in zip(skeys, sts):
            out[(im,) + k] = st
        return out

    def execute_plan_fixed(r, rung, stores, bank):
        plan = rung.plan or rung.default_plan()
        bank = dict(bank)
        m = cfg.match

        def run_match(key, parts1, parts2, ratio, dist_thr, spec):
            run_f = ratio > 0
            run_d = dist_thr > 0
            if not (run_f or run_d):
                bank[key] = _zero_bank_entry(tcap)
                return
            # store 6-tuple (xy, A, s, r, d, n) -> matcher part layout
            # (xy, A, s, d, n) == DeviceStore.device_arrays()
            parts1 = [(p[0], p[1], p[2], p[4], p[5]) for p in parts1]
            parts2 = [(p[0], p[1], p[2], p[4], p[5]) for p in parts2]
            parts = _pool_match_parts(
                parts1, parts2, jnp.float32(ratio),
                jnp.float32(dist_thr), None, cap, m.knn, m.contrad_dist,
                m.duplicate_mode, run_f, run_d, spec.kind == "binary",
                m.standard_2nd_closest)
            bank[key] = _concat_compact_parts(parts, tcap)

        for desc in plan.group_descriptors:
            spec = spec_for(desc, cfg)
            p1 = [stores[(0, det, desc)] for det in plan.group_detectors
                  if (0, det, desc) in stores]
            p2 = [stores[(1, det, desc)] for det in plan.group_detectors
                  if (1, det, desc) in stores]
            key = ("Group", desc)
            if not (p1 and p2):
                if key in bank_keys:
                    bank[key] = _zero_bank_entry(tcap)
                continue
            run_match(key, p1, p2, m.group_fginn(desc),
                      m.group_distance(desc), spec)

        rung_dets = {d.detector: d for d in rung.dets}
        for det in plan.separate_detectors:
            it = rung_dets.get(det)
            if it is None:
                continue
            for desc in plan.separate_descriptors:
                key = (det, desc)
                if (0, det, desc) not in stores or \
                        (1, det, desc) not in stores:
                    if key in bank_keys:
                        bank[key] = _zero_bank_entry(tcap)
                    continue
                run_match(key, [stores[(0, det, desc)]],
                          [stores[(1, det, desc)]],
                          it.fginn_for(desc), it.distance_for(desc),
                          spec_for(desc, cfg))
        return bank

    def verify(bank, key, gt_h):
        parts = [bank[k] for k in bank_keys]
        c = _concat_compact_parts(parts, tcap)
        if gt_mode:
            from mods_tpu.matching.fginn import duplicate_filter
            from mods_tpu.verify import gt_h_inliers
            keep = duplicate_filter(c["xy1"], c["xy2"], c["mask"],
                                    cfg.match.duplicate_dist,
                                    priority=c["prio"])
            tmask = c["mask"] & keep
            inl = gt_h_inliers(gt_h, c["xy1"], c["xy2"], tmask,
                               cfg.ransac.err_threshold,
                               cfg.ransac.error_type)
            out = dict(model=gt_h, inlier_mask=inl,
                       n_tent=jnp.sum(tmask.astype(jnp.int32)),
                       n_inl=jnp.sum(inl.astype(jnp.int32)),
                       xy1_all=c["xy1"], xy2_all=c["xy2"])
            if cfg.do_both_ransac_gt:
                r2 = _verify_core(replace(cfg, ver_type="LORANSACH"),
                                  w_all, h_all, c["xy1"], c["A1"],
                                  c["s1"], c["xy2"], c["A2"], c["s2"],
                                  c["prio"], c["mask"], key)
                rtrue = gt_h_inliers(gt_h, c["xy1"], c["xy2"],
                                     r2["inlier_mask"],
                                     cfg.ransac.err_threshold,
                                     cfg.ransac.error_type)
                out["ransac_matches"] = jnp.sum(
                    r2["inlier_mask"].astype(jnp.int32))
                out["ransac_true"] = jnp.sum(rtrue.astype(jnp.int32))
            else:
                out["ransac_matches"] = out["n_inl"]
                out["ransac_true"] = out["n_inl"]
            return out
        out = _verify_core(cfg, w_all, h_all, c["xy1"], c["A1"],
                           c["s1"], c["xy2"], c["A2"], c["s2"],
                           c["prio"], c["mask"], key)
        out["xy1_all"] = c["xy1"]
        out["xy2_all"] = c["xy2"]
        out["ransac_matches"] = out["n_inl"]
        out["ransac_true"] = out["n_inl"]
        return out

    def init_state(key):
        stores = {}
        for (det, name) in store_keys:
            dim = spec_for(name, cfg).dim
            stores[(0, det, name)] = _zero_store(cap, dim)
            stores[(1, det, name)] = _zero_store(cap, dim)
        bank = {k: _zero_bank_entry(tcap) for k in bank_keys}
        best = dict(model=jnp.eye(3), inlier_mask=jnp.zeros((tcap,),
                                                            bool),
                    n_tent=jnp.zeros((), jnp.int32),
                    n_inl=jnp.zeros((), jnp.int32),
                    xy1_all=jnp.zeros((tcap, 2)),
                    xy2_all=jnp.zeros((tcap, 2)),
                    ransac_matches=jnp.zeros((), jnp.int32),
                    ransac_true=jnp.zeros((), jnp.int32))
        done = jnp.zeros((), bool)
        steps_used = jnp.asarray(R, jnp.int32)
        counts = jnp.zeros((R,), jnp.int32)
        return (stores, bank, best, done, steps_used, counts, key)

    def ladder_fn(img1, img2, slabs_flat, key, gt_h=None, state=None,
                  rung_range=None):
        """Run rungs [rung_range) (default all) over carried `state`
        (default fresh) — segmentable for runtimes that cannot execute
        the whole ladder as one program."""
        imgs = (img1, img2)
        slabs = {spec: slab for spec, slab in
                 zip(slab_spec, slabs_flat)}
        if gt_h is None:
            gt_h = jnp.eye(3)
        if state is None:
            state = init_state(key)
        lo, hi = rung_range if rung_range is not None else (0, R)

        for r, rung in list(enumerate(rungs))[lo:hi]:
            def run(state, r=r, rung=rung):
                stores, bank, best, done, steps_used, counts, key = state
                for it in rung.dets:
                    for im in (0, 1):
                        stores = rung_stage(r, it, im, imgs[im], stores,
                                            slabs)
                # hardcoded tentative drops (mods.cpp:288-289)
                for cstep, cdet, cdesc in cfg.clear_tentatives:
                    if r == cstep and (cdet, cdesc) in bank:
                        bank = dict(bank)
                        bank[(cdet, cdesc)] = _zero_bank_entry(tcap)
                bank = execute_plan_fixed(r, rung, stores, bank)
                key, k = jax.random.split(key)
                out = verify(bank, k, gt_h)
                better = out["n_inl"] > best["n_inl"]
                best = jax.tree.map(
                    lambda new, old: jnp.where(
                        jnp.reshape(better, (1,) * new.ndim)
                        if new.ndim else better, new, old),
                    out, best)
                n_stop = out["ransac_matches"] if (
                    gt_mode and cfg.do_both_ransac_gt) else out["n_inl"]
                crossed = n_stop >= cfg.min_matches
                steps_used = jnp.where(crossed,
                                       jnp.asarray(r + 1, jnp.int32),
                                       steps_used)
                counts = counts.at[r].set(out["n_inl"])
                done = done | crossed
                return (stores, bank, best, done, steps_used, counts,
                        key)

            state = jax.lax.cond(state[3], lambda s: s, run, state)

        stores, bank, best, done, steps_used, counts, key = state
        # compact the verified matches on device (small host read)
        idx = jnp.nonzero(best["inlier_mask"], size=tcap,
                          fill_value=tcap)[0]
        cxy1 = jnp.take(best["xy1_all"], idx, axis=0, mode="fill",
                        fill_value=0)
        cxy2 = jnp.take(best["xy2_all"], idx, axis=0, mode="fill",
                        fill_value=0)
        out = dict(model=best["model"], n_inl=best["n_inl"],
                   n_tent=best["n_tent"], xy1=cxy1, xy2=cxy2,
                   steps_used=steps_used, counts=counts,
                   ransac_matches=best["ransac_matches"],
                   ransac_true=best["ransac_true"])
        return out, state

    return ladder_fn, slab_spec
