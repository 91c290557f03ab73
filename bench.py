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

    # quality protocol: the CLEAN cat pair (the reference's own smoke
    # test), deterministic seeding — one stable number.  The timed runs
    # below perturb inputs to defeat tunnel replay caching; their
    # per-run GT-true counts are reported alongside for transparency.
    clean = matcher.match(img1, img2)

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

    # PROTOCOL NOTE: the baseline's "20 true matches" is the reference
    # log's TrueMatch1st, which in LORANSAC mode is the RANSAC-verified
    # count (mods.cpp:343-347 assigns LORANSACFiltering's return;
    # BASELINE.md quality row comes from that log) — so the
    # apples-to-apples "true_matches" here is the verified count.  The
    # STRICTER GT-reprojection check (<=3 px under the known H) is
    # reported alongside as gt_checked_matches; the reference's own
    # GT-checked figure is the GR_TRUTH dual-mode 21 (ours: 22,
    # ACCURACY_cat.json).
    trues = [gt_true(r) for r in results]
    n_true = int(clean.n_matches)
    res = clean

    # ---- second metric: pair-BATCHED production throughput ----------
    # The serial protocol above matches the reference binary's one-pair
    # run for an apples-to-apples wall-clock; production serving batches
    # P independent pairs per dispatch (PairBatchMatcher — the
    # mods_multi.cpp axis applied to both sides), amortizing the ~26 ms
    # tunnel dispatch tax and filling the chip.  Quality is checked on
    # every pair of the batch.
    batched = {}
    try:
        from mods_tpu.parallel.multi import PairBatchMatcher
        P = 8
        bm = PairBatchMatcher(ladder, cfg)
        rng2 = np.random.default_rng(7)
        def mk_pairs():
            return [(img1 + rng2.uniform(0, 0.5, img1.shape
                                         ).astype(np.float32),
                     img2 + rng2.uniform(0, 0.5, img2.shape
                                         ).astype(np.float32))
                    for _ in range(P)]
        for attempt in range(4):
            try:
                bres = bm.match_batch(mk_pairs())   # warmup/compile
                break
            except jax.errors.JaxRuntimeError as e:
                transient = any(t in str(e) for t in
                                ("INTERNAL", "UNAVAILABLE", "ABORTED"))
                if not transient or attempt == 3:
                    raise
                print(f"batched warmup retry: {str(e)[:100]}",
                      file=sys.stderr)
                time.sleep(10)
        t0 = time.perf_counter()
        iters_b = 2
        btrues = []
        for _ in range(iters_b):
            bres = bm.match_batch(mk_pairs())
            btrues.append([int(gt_h_inliers(
                jnp.asarray(gt_h, jnp.float32), jnp.asarray(x1),
                jnp.asarray(x2), jnp.ones(len(x1), bool), 3.0
            ).sum()) if len(x1) else 0
                for x1, x2 in zip(bres.xy1, bres.xy2)])
        dt_b = time.perf_counter() - t0
        bp = P * iters_b / dt_b
        batched = {
            "batched_pairs_per_sec": round(bp, 3),
            "batched_vs_baseline": round(bp / REFERENCE_PAIRS_PER_SEC,
                                         2),
            "batch_size": P,
            "batched_verified": [int(c) for c in bres.counts],
            "batched_gt_checked": btrues[-1],
            "batched_speedup_vs_serial": round(bp / pairs_per_sec, 2),
        }
    except Exception as e:                      # never lose the serial metric
        batched = {"batched_error": str(e)[:200]}

    print(json.dumps({
        "metric": "cviu_ladder_pairs_per_sec_single_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
        "true_matches": n_true,
        "true_matches_protocol": "verified (reference log TrueMatch1st"
                                 " semantics, mods.cpp:343); baseline=20",
        "gt_checked_matches": gt_true(clean),
        "gt_checked_runs": trues,
        "verified_runs": [int(r.n_matches) for r in results],
        "tentatives": int(res.n_tentatives),
        "steps_used": int(res.steps_used),
        "baseline_pairs_per_sec": REFERENCE_PAIRS_PER_SEC,
        **batched,
    }))


if __name__ == "__main__":
    main()
