"""Command-line applications mirroring the reference's L6 layer
(SURVEY.md §1): `mods` two-view matcher (mods.cpp), `mods_multi`
one-vs-many (mods_multi.cpp), `extract_features` (extract_features.cpp).

Usage (positional args follow the reference's CLI, mods.cpp:62-79):
  python -m mods_tpu.cli match img1 img2 out1 out2 k1 k2 matchings log \
      [ver_type] [config.ini] [iters.ini] [gt_h_file]
  python -m mods_tpu.cli extract img out_keys [config.ini] [iters.ini]
"""

from __future__ import annotations

import sys

import numpy as np


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path))


def _build_engine(config_path: str | None, iters_path: str | None,
                  ver_type: str = "LORANSACH"):
    from mods_tpu.config import RansacParams, replace
    from mods_tpu.pipeline import EngineConfig
    from mods_tpu.io import ini as ini_mod

    cfg = EngineConfig()
    ladder = None
    min_matches = 10
    if config_path:
        ini = ini_mod.load_ini(config_path)
        flags = ini_mod.parse_flags_config(ini)
        cfg = replace(
            cfg,
            pyramid=ini_mod.parse_detector_config(ini, "HessianAffine"),
            pyramid_dog=ini_mod.parse_detector_config(ini, "DoG"),
            pyramid_harris=ini_mod.parse_detector_config(
                ini, "HarrisAffine"),
            affine=ini_mod.parse_affine_config(ini, "HessianAffine"),
            mser=ini_mod.parse_mser_config(ini),
            dom_ori=ini_mod.parse_dom_ori_config(ini),
            sift=ini_mod.parse_sift_desc_config(ini),
            ransac=ini_mod.parse_ransac_config(ini),
            match=ini_mod.parse_matching_config(ini),
            **ini_mod.parse_descriptor_sections(ini),
            **flags)
    if iters_path:
        steps, min_matches, ladder = ini_mod.parse_iters_file(iters_path)
    use_f = ver_type in ("LORANSACF", "ORSA")
    cfg = replace(cfg, ransac=replace(cfg.ransac, use_f=use_f),
                  min_matches=min_matches, ver_type=ver_type)
    from mods_tpu.pipeline import autosize_caps
    return autosize_caps(cfg), ladder


def cmd_match(argv: list[str]) -> int:
    from mods_tpu.pipeline import TwoViewMatcher
    from mods_tpu.io.regions_io import write_h, write_matches

    img1p, img2p = argv[0], argv[1]
    matchings = argv[6] if len(argv) > 6 else "matchings.txt"
    ver_type = argv[8] if len(argv) > 8 else "LORANSACH"
    config = argv[9] if len(argv) > 9 else None
    iters = argv[10] if len(argv) > 10 else None
    gt_h_path = argv[11] if len(argv) > 11 else None

    out1 = argv[2] if len(argv) > 2 else ""
    out2 = argv[3] if len(argv) > 3 else ""
    logf = argv[7] if len(argv) > 7 else ""

    cfg, ladder = _build_engine(config, iters, ver_type)
    gt_h = None
    if gt_h_path:
        from mods_tpu.verify import load_h_file
        gt_h = load_h_file(gt_h_path)
    # per-phase wall-clock attribution (reference time.log parity) needs
    # sync points at phase boundaries; skip them when no log is written
    matcher = TwoViewMatcher(ladder, cfg,
                             sync_timing=bool(logf and logf != "0"))
    img1, img2 = _load_image(img1p), _load_image(img2p)
    res = matcher.match(img1, img2, gt_h=gt_h)
    print(f"Matches: {res.n_matches} (tentatives {res.n_tentatives}, "
          f"steps {res.steps_used})")
    write_matches(matchings, res.xy1, res.xy2)
    write_h(matchings + ".H", res.H)
    # drawn outputs (mods.cpp:480-527) and machine-readable logs
    if out1 and out1 not in ("0", "none"):
        from mods_tpu import viz
        viz.save_image(out1, viz.draw_matches(img1, img2, res.xy1,
                                              res.xy2))
    if out2 and out2 not in ("0", "none"):
        from mods_tpu import viz
        canvas = (viz.draw_epipolar(img1, img2, res.xy1, res.xy2, res.H)
                  if ver_type in ("LORANSACF", "ORSA") else
                  viz.draw_matches_with_error(img1, img2, res.xy1,
                                              res.xy2, res.H))
        viz.save_image(out2, canvas)
    if logf and logf not in ("0", "none"):
        from mods_tpu.timing import RunLog
        nt = max(res.n_tentatives, 1)
        RunLog(tentatives=res.n_tentatives, true_matches=res.n_matches,
               inlier_ratio=res.n_matches / nt, steps=res.steps_used,
               total_time=res.log.times["TotalTime"],
               ver_type=ver_type).write(logf)
        res.log.write(logf + ".time")
    print(res.log.summary())
    return 0


def cmd_extract(argv: list[str]) -> int:
    """extract_features equivalent: single image -> keypoint file
    (extract_features.cpp:121-135).  A trailing ``michal`` /
    ``michal-text`` argument writes the Michal per-descriptor format
    instead (SaveRegionsMichal, imagerepresentation.cpp:2049-2146)."""
    from mods_tpu.io.regions_io import (RegionSet, save_regions,
                                        save_regions_michal)

    imgp, outp = argv[0], argv[1]
    config = argv[2] if len(argv) > 2 else None
    iters = argv[3] if len(argv) > 3 else None
    fmt = argv[4] if len(argv) > 4 else "mods"
    stores = _extract_stores(imgp, config, iters)
    out = {}
    flat = {}
    for (det, name), store in stores.items():
        n = store.count
        rs = RegionSet(
            det_xy=store.xy, det_A=store.A, det_s=store.s,
            reproj_xy=store.xy, reproj_A=store.A, reproj_s=store.s,
            sub_type=np.zeros(n, np.int64), desc=store.desc)
        out.setdefault(det, {})[name] = rs
        flat[(det, name)] = rs
    if fmt.startswith("michal"):
        from PIL import Image
        with Image.open(imgp) as im:
            w0, h0 = im.size
        files = save_regions_michal(outp, flat, w0, h0,
                                    binary=(fmt == "michal"))
        print(f"Saved Michal files: {files}")
    else:
        save_regions(outp, out)
    total = sum(s.count for s in stores.values())
    print(f"Saved {total} regions to {outp}")
    return 0


def _extract_stores(imgp: str, config, iters):
    """Shared single-image extraction for the exporter commands:
    iteration 0 only (extract_features.cpp:121), all of its detectors.
    Returns stores keyed (detector, descriptor)."""
    from mods_tpu.pipeline import TwoViewMatcher
    from mods_tpu.config import IterationParams, as_rungs
    from mods_tpu.ops.image import to_gray
    from mods_tpu.timing import TimeLog
    import jax.numpy as jnp

    cfg, ladder = _build_engine(config, iters)
    if ladder is None:
        ladder = [IterationParams()]
    matcher = TwoViewMatcher(ladder, cfg)
    g = np.asarray(to_gray(jnp.asarray(_load_image(imgp))))
    stores: dict = {}
    log = TimeLog()
    for it in as_rungs(ladder)[0].dets:
        matcher._process_image(g, it, [], stores, log)
    return stores


def cmd_export_descriptors(argv: list[str]) -> int:
    """export_descriptors equivalent: image -> per-descriptor dumps
    (export_descriptors.cpp; SaveDescriptorsBenchmark,
    imagerepresentation.cpp:2216)."""
    from mods_tpu.io.oxford import write_descriptors_benchmark

    imgp, outp = argv[0], argv[1]
    config = argv[2] if len(argv) > 2 else None
    iters = argv[3] if len(argv) > 3 else None
    stores = _extract_stores(imgp, config, iters)
    for (det, name), store in stores.items():
        path = outp if len(stores) == 1 else f"{outp}.{det}.{name}"
        write_descriptors_benchmark(path, store.desc)
        print(f"{det}/{name}: {store.count} descriptors -> {path}")
    return 0


def cmd_extract_benchmark(argv: list[str]) -> int:
    """extract_regions_for_benchmark equivalent: image [+ gt H] ->
    Oxford-format region file, optionally reprojected into the second
    image's frame (SynthDetectDescribeKeypointsBench,
    imagerepresentation.cpp:2306; SaveRegionsBenchmark :2257)."""
    from mods_tpu.io.oxford import write_oxford

    imgp, outp = argv[0], argv[1]
    h_path = argv[2] if len(argv) > 2 else None
    config = argv[3] if len(argv) > 3 else None
    iters = argv[4] if len(argv) > 4 else None
    stores = _extract_stores(imgp, config, iters)
    H = None
    if h_path and h_path not in ("0", "none", ""):
        from mods_tpu.verify import load_h_file
        H = load_h_file(h_path)
    for (det, name), store in stores.items():
        xy, A, s = store.xy, store.A, store.s
        if H is not None:
            ones = np.ones((len(xy), 1))
            p = np.concatenate([xy, ones], 1) @ H.T
            xy = p[:, :2] / p[:, 2:3]
            # local linearization of H scales the frames
            lin = (H[:2, :2][None]
                   - p[:, :2, None] / p[:, 2:3, None] * H[2, :2][None,
                                                                 None])
            A = np.einsum("nij,njk->nik", lin / p[:, 2:3, None], A)
        path = outp if len(stores) == 1 else f"{outp}.{det}.{name}"
        write_oxford(path, xy, A, s, store.desc)
        print(f"{det}/{name}: {store.count} regions -> {path}")
    return 0


def cmd_match_multi(argv: list[str]) -> int:
    """mods_multi equivalent: query vs image list, gallery batched over
    the ``pair`` mesh axis with the GetAtLeastOneImageMatch early stop
    (mods_multi.cpp:229-260).

    args: query list [config] [iters] [log_prefix] [out_prefix] [manifest]

    ``manifest``: optional JSON checkpoint path (SURVEY.md §5.3) — a
    rerun with the same manifest skips already-done gallery images;
    transient device errors retry, then mark the image failed without
    aborting the batch.
    """
    import os

    query = argv[0]
    list_file = argv[1]
    cfg, ladder = _build_engine(argv[2] if len(argv) > 2 else None,
                                argv[3] if len(argv) > 3 else None)
    log_prefix = argv[4] if len(argv) > 4 else ""
    out_prefix = argv[5] if len(argv) > 5 else ""
    manifest_path = argv[6] if len(argv) > 6 else ""
    with open(list_file) as f:
        paths = [ln.strip() for ln in f if ln.strip()]
    qimg = _load_image(query)

    from mods_tpu.config import as_rungs
    from mods_tpu.parallel.manifest import RunManifest, with_retries
    from mods_tpu.parallel.multi import MultiMatcher
    from mods_tpu.parallel.mesh import make_mesh
    from mods_tpu.pipeline import TwoViewMatcher
    import jax

    manifest = None
    todo = paths
    if manifest_path and manifest_path not in ("0", "none"):
        manifest = RunManifest.load(manifest_path, query)
        todo = manifest.pending(paths)
        if len(todo) < len(paths):
            print(f"manifest: {len(paths) - len(todo)}/{len(paths)} "
                  f"gallery images already done, resuming")
    imgs = {p: _load_image(p) for p in todo}

    results: dict = {}          # path -> (n, tents, steps, xy1, xy2)
    total_time = 0.0
    dets = {d.detector for r in as_rungs(ladder or []) for d in r.dets}
    # the pair-sharded MultiMatcher handles device detectors fully fused
    # AND host-stage MSER (threaded native detect + batched describe);
    # only ReadAffs (per-image keypoint files) needs the serial loop
    batched_ok = not ({"ReadAffs", "External"} & dets)
    if batched_ok and todo:
        mesh = make_mesh() if jax.device_count() > 1 else None
        m = MultiMatcher(ladder, cfg, mesh=mesh)
        res = with_retries(lambda: m.match(qimg, [imgs[p] for p in todo]))
        for i, p in enumerate(todo):
            results[p] = (int(res.counts[i]), int(res.n_tentatives[i]),
                          int(res.steps_used), res.xy1[i], res.xy2[i])
        total_time = res.log.times["TotalTime"]
    elif todo:
        # host-stage detectors (MSER/ReadAffs): serial gallery loop,
        # exactly the reference's structure (mods_multi.cpp:250+);
        # checkpoint after every image
        matcher = TwoViewMatcher(ladder, cfg)
        for p in todo:
            try:
                r = with_retries(lambda: matcher.match(qimg, imgs[p]))
            except Exception as e:          # mark failed, keep going
                if manifest is None:
                    raise
                manifest.record(p, 0, 0, 0, error=str(e)[:200])
                manifest.save()
                continue
            results[p] = (r.n_matches, r.n_tentatives, r.steps_used,
                          r.xy1, r.xy2)
            total_time += r.log.times["TotalTime"]
            if manifest is not None:
                manifest.record(p, r.n_matches, r.n_tentatives,
                                r.steps_used)
                manifest.save()
    if manifest is not None:
        for p in todo:
            if p in results:
                n, t, s, _, _ = results[p]
                manifest.record(p, n, t, s)
        manifest.save()

    counts, tents, steps, pairs = [], [], [], []
    z = __import__("numpy").zeros((0, 2))
    for p in paths:
        if p in results:
            n, t, s, xy1, xy2 = results[p]
        elif manifest is not None and manifest.result(p) is not None:
            d = manifest.result(p)
            n, t, s = d["n_matches"], d["n_tentatives"], d["steps"]
            xy1 = xy2 = z       # match points not persisted for resumes
        else:
            n, t, s, xy1, xy2 = 0, 0, 0, z, z
        counts.append(n)
        tents.append(t)
        steps.append(s)
        pairs.append((xy1, xy2))

    # per-gallery-image artifacts (mods_multi.cpp:386-433):
    # <log_prefix>-<img2 basename>.log + optional match drawings
    from mods_tpu.timing import RunLog
    for i, p in enumerate(paths):
        n, t = int(counts[i]), int(tents[i])
        print(f"{p}: {n} matches ({t} tentatives)")
        prefix = os.path.splitext(os.path.basename(p))[0]
        if log_prefix and log_prefix not in ("0", "none"):
            RunLog(tentatives=t, true_matches=n,
                   inlier_ratio=n / max(t, 1), steps=int(steps[i]),
                   total_time=total_time,
                   ver_type="LORANSACH").write(
                f"{log_prefix}-{prefix}.log")
        if out_prefix and out_prefix not in ("0", "none") and p in imgs:
            from mods_tpu import viz
            xy1, xy2 = pairs[i]
            viz.save_image(f"{out_prefix}{prefix}-1.png",
                           viz.draw_matches(qimg, imgs[p], xy1, xy2))
    matched = sum(1 for c in counts if int(c) >= cfg.min_matches)
    print(f"{matched}/{len(paths)} gallery images matched "
          f"(minMatches={cfg.min_matches})")
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd = sys.argv[1]
    argv = sys.argv[2:]
    if cmd == "match":
        return cmd_match(argv)
    if cmd == "extract":
        return cmd_extract(argv)
    if cmd == "match_multi":
        return cmd_match_multi(argv)
    if cmd == "export_descriptors":
        return cmd_export_descriptors(argv)
    if cmd == "extract_benchmark":
        return cmd_extract_benchmark(argv)
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
