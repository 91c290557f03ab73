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
        pyr = ini_mod.parse_detector_config(ini, "HessianAffine")
        ransac = ini_mod.parse_ransac_config(ini)
        match = ini_mod.parse_matching_config(ini)
        cfg = replace(cfg, pyramid=pyr, ransac=ransac, match=match)
    if iters_path:
        steps, min_matches, ladder = ini_mod.parse_iters_file(iters_path)
    use_f = ver_type in ("LORANSACF", "ORSA")
    cfg = replace(cfg, ransac=replace(cfg.ransac, use_f=use_f),
                  min_matches=min_matches)
    return cfg, ladder


def cmd_match(argv: list[str]) -> int:
    from mods_tpu.pipeline import TwoViewMatcher
    from mods_tpu.io.regions_io import write_h, write_matches

    img1p, img2p = argv[0], argv[1]
    matchings = argv[6] if len(argv) > 6 else "matchings.txt"
    ver_type = argv[8] if len(argv) > 8 else "LORANSACH"
    config = argv[9] if len(argv) > 9 else None
    iters = argv[10] if len(argv) > 10 else None

    cfg, ladder = _build_engine(config, iters, ver_type)
    matcher = TwoViewMatcher(ladder, cfg)
    res = matcher.match(_load_image(img1p), _load_image(img2p))
    print(f"Matches: {res.n_matches} (tentatives {res.n_tentatives}, "
          f"steps {res.steps_used})")
    write_matches(matchings, res.xy1, res.xy2)
    write_h(matchings + ".H", res.H)
    print(res.log.summary())
    return 0


def cmd_extract(argv: list[str]) -> int:
    """extract_features equivalent: single image -> keypoint file
    (extract_features.cpp:121-135)."""
    from mods_tpu.pipeline import FeatureStore, TwoViewMatcher
    from mods_tpu.config import IterationParams
    from mods_tpu.io.regions_io import RegionSet, save_regions
    from mods_tpu.ops.image import to_gray
    from mods_tpu.timing import TimeLog
    import jax.numpy as jnp

    imgp, outp = argv[0], argv[1]
    config = argv[2] if len(argv) > 2 else None
    iters = argv[3] if len(argv) > 3 else None
    cfg, ladder = _build_engine(config, iters)
    if ladder is None:
        ladder = [IterationParams()]
    matcher = TwoViewMatcher(ladder, cfg)
    g = np.asarray(to_gray(jnp.asarray(_load_image(imgp))))
    stores: dict = {}
    prev: list = []
    log = TimeLog()
    it0 = ladder[0]  # extract_features runs iteration 0 only
    prev = matcher._process_image(g, it0, prev, stores, log)
    out = {}
    for name, store in stores.items():
        n = store.count
        rs = RegionSet(
            det_xy=store.xy, det_A=store.A, det_s=store.s,
            reproj_xy=store.xy, reproj_A=store.A, reproj_s=store.s,
            sub_type=np.zeros(n, np.int64), desc=store.desc)
        out.setdefault(it0.detector, {})[name] = rs
    save_regions(outp, out)
    total = sum(s.count for s in stores.values())
    print(f"Saved {total} regions to {outp}")
    return 0


def cmd_match_multi(argv: list[str]) -> int:
    """mods_multi equivalent: query vs image list (mods_multi.cpp)."""
    from mods_tpu.pipeline import TwoViewMatcher

    query = argv[0]
    list_file = argv[1]
    cfg, ladder = _build_engine(argv[2] if len(argv) > 2 else None,
                                argv[3] if len(argv) > 3 else None)
    with open(list_file) as f:
        paths = [ln.strip() for ln in f if ln.strip()]
    qimg = _load_image(query)
    matcher = TwoViewMatcher(ladder, cfg)
    results = []
    for p in paths:
        res = matcher.match(qimg, _load_image(p))
        results.append((p, res.n_matches))
        print(f"{p}: {res.n_matches} matches")
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
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
