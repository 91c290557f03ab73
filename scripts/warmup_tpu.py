"""Warm the persistent compile cache for the CVIU ladder on the real
TPU, with per-rung progress and retry on transient remote-compile
errors.  Run before bench.py on a cold cache:

    python -u scripts/warmup_tpu.py [--sync]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF_DIR = "/root/reference/build"


def main():
    from mods_tpu.runtime import setup_cache
    setup_cache()
    import jax
    import numpy as np
    from PIL import Image
    from mods_tpu.cli import _build_engine
    from mods_tpu.pipeline import TwoViewMatcher

    print(f"devices: {jax.devices()}", flush=True)
    img1 = np.asarray(Image.open(f"{REF_DIR}/examples/cat.png"),
                      dtype=np.float32)
    img2 = np.asarray(Image.open(f"{REF_DIR}/examples/cat2.png"),
                      dtype=np.float32)
    cfg, ladder = _build_engine(f"{REF_DIR}/config_iter_mods_cviu.ini",
                                f"{REF_DIR}/iters_mods_cviu.ini",
                                ver_type="LORANSACH")
    matcher = TwoViewMatcher(ladder, cfg, stop_mode="sync",
                             sync_timing="--sync" in sys.argv)

    # warm one rung at a time so progress is visible and a transient
    # crash resumes from the compile cache
    from mods_tpu.config import replace
    for n_rungs in range(1, cfg.max_steps + 1):
        t0 = time.perf_counter()
        sub = TwoViewMatcher(ladder[:n_rungs],
                             replace(cfg, min_matches=10**9),
                             stop_mode="sync",
                             sync_timing=matcher.sync_timing)
        for attempt in range(6):
            try:
                res = sub.match(img1, img2)
                break
            except jax.errors.JaxRuntimeError as e:
                print(f"  rung {n_rungs} attempt {attempt}: "
                      f"{str(e)[:150]}", flush=True)
                if attempt == 5:
                    raise
        dt = time.perf_counter() - t0
        print(f"rungs 1..{n_rungs}: {dt:.1f}s  matches={res.n_matches} "
              f"tents={res.n_tentatives}", flush=True)

    # steady state: two timed full-ladder matches
    for i in range(2):
        t0 = time.perf_counter()
        res = matcher.match(img1 + i * 0.5, img2 + i * 0.5)
        print(f"steady {i}: {time.perf_counter() - t0:.2f}s "
              f"matches={res.n_matches} steps={res.steps_used}",
              flush=True)


if __name__ == "__main__":
    main()
