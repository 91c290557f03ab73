"""Benchmark: two-view matching throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: steady-state batched two-view matching (detect -> orient ->
describe -> FGINN -> LO-RANSAC) on 512x640 textured pairs — the
compute shape of the reference's cat-pair smoke test (README.md:60-67).

Baseline: the reference C++ binary publishes no numbers (BASELINE.md);
its CVIU-era runtime on a comparable pair is ~2-4 s/pair on a desktop
CPU (MODS paper, arXiv:1503.02619 §experiments).  We use 3.0 s/pair
(0.333 pairs/s) as the denominator until a local reference build exists.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REFERENCE_PAIRS_PER_SEC = 1.0 / 3.0


def textured(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 16, w // 16)).astype(np.float32)
    img = np.kron(img, np.ones((16, 16), np.float32))
    fine = rng.uniform(0, 1, (h, w)).astype(np.float32)
    out = 180 * img + 40 * fine
    return out.astype(np.float32)


def main():
    import jax
    from mods_tpu.runtime import setup_cache
    setup_cache()
    import jax.numpy as jnp
    from mods_tpu.config import CapacityParams, RansacParams
    from mods_tpu.models.flagship import two_view_step
    from mods_tpu.pipeline import EngineConfig

    cfg = EngineConfig(
        caps=CapacityParams(per_octave=4096, per_view=2048,
                            per_image=4096, max_angles=2),
        ransac=RansacParams(batch_hypotheses=2048, max_rounds=2))

    h, w = 512, 640
    # Distinct image content every iteration: the TPU tunnel caches
    # executions on identical input buffers, so reusing one pair would
    # measure dispatch latency, not compute.
    n_pairs = 8
    imgs1 = [jnp.asarray(textured(h, w, 2 * i)) for i in range(n_pairs)]
    imgs2 = [jnp.asarray(textured(h, w, 2 * i + 1)) for i in range(n_pairs)]

    fn = jax.jit(lambda a, b, k: two_view_step(a, b, k, cfg))
    key = jax.random.PRNGKey(0)
    # warmup/compile on images not used in the timed loop
    out = fn(jnp.asarray(textured(h, w, 9000)),
             jnp.asarray(textured(h, w, 9001)), key)
    jax.block_until_ready(out)

    # Per-call block_until_ready: with only a tail sync the tunnel
    # overlaps/reorders queued executions and the timing is fiction.
    iters = n_pairs
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        out = fn(imgs1[i % n_pairs], imgs2[i % n_pairs], k)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    pairs_per_sec = iters / dt

    print(json.dumps({
        "metric": "two_view_pairs_per_sec_single_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
