"""Fused-program perf experiments on the real chip.

Times the flagship two_view_step as compiled (single pair) and vmapped
over a pair batch, with fresh input buffers per timed call (the tunnel
caches executions on identical buffers).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def textured(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 16, w // 16)).astype(np.float32)
    img = np.kron(img, np.ones((16, 16), np.float32))
    fine = rng.uniform(0, 1, (h, w)).astype(np.float32)
    return (180 * img + 40 * fine).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from mods_tpu.runtime import setup_cache
    setup_cache()
    from mods_tpu.config import CapacityParams, RansacParams
    from mods_tpu.models.flagship import two_view_step, batched_pair_step
    from mods_tpu.pipeline import EngineConfig

    cfg = EngineConfig(
        caps=CapacityParams(per_octave=4096, per_view=2048,
                            per_image=4096, max_angles=2),
        ransac=RansacParams(batch_hypotheses=2048, max_rounds=2))

    h, w = 512, 640
    key = jax.random.PRNGKey(0)

    # --- single pair ---
    fn = jax.jit(lambda a, b, k: two_view_step(a, b, k, cfg))
    n = 8
    i1 = [jnp.asarray(textured(h, w, 2 * i)) for i in range(n)]
    i2 = [jnp.asarray(textured(h, w, 2 * i + 1)) for i in range(n)]
    # Warm up on buffers not used in the timed loop, and split the key
    # per timed call (identical buffers+key would hit the tunnel's
    # execution cache and measure dispatch latency, not compute).
    jax.block_until_ready(
        fn(jnp.asarray(textured(h, w, 9000)),
           jnp.asarray(textured(h, w, 9001)), key))
    t0 = time.perf_counter()
    for i in range(n):
        key, k = jax.random.split(key)
        jax.block_until_ready(fn(i1[i], i2[i], k))
    dt = (time.perf_counter() - t0) / n
    print(f"single-pair fused        {dt*1e3:9.2f} ms/pair "
          f"({1/dt:6.2f} pairs/s)")

    # --- batched pairs (vmap over P) ---
    for P in (2, 4):
        bf = jax.jit(lambda a, b, k: batched_pair_step(a, b, k, cfg))
        keys = jax.random.split(key, P)
        a0 = jnp.stack([jnp.asarray(textured(h, w, 1000 + i))
                        for i in range(P)])
        b0 = jnp.stack([jnp.asarray(textured(h, w, 2000 + i))
                        for i in range(P)])
        jax.block_until_ready(bf(a0, b0, keys))
        reps = max(1, 8 // P)
        batches = []
        for r in range(reps):
            a = jnp.stack([jnp.asarray(textured(h, w, 3000 + 100 * r + i))
                           for i in range(P)])
            b = jnp.stack([jnp.asarray(textured(h, w, 4000 + 100 * r + i))
                           for i in range(P)])
            batches.append((a, b))
        t0 = time.perf_counter()
        for a, b in batches:
            jax.block_until_ready(bf(a, b, keys))
        dt = (time.perf_counter() - t0) / (reps * P)
        print(f"batched P={P} fused       {dt*1e3:9.2f} ms/pair "
              f"({1/dt:6.2f} pairs/s)")


if __name__ == "__main__":
    main()
