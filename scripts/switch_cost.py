"""Measure the tunnel's program-SWITCH cost: alternate dispatches
between distinct compiled programs vs repeat the same program."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from mods_tpu.pipeline import EngineConfig, _render_program

cfg = EngineConfig()
rng = np.random.default_rng(0)
h0, w0 = 1000, 598
imgs = [jnp.asarray(rng.uniform(0, 255, (h0, w0)).astype(np.float32) + i)
        for i in range(16)]
jax.block_until_ready(imgs)

# a family of distinct render programs (different canvas shapes)
shapes = [(8, 1280, 1280, 640, 1280), (8, 1280, 1280, 384, 1280),
          (4, 1280, 1280, 256, 1280), (8, 1152, 1152, 640, 1152)]
progs = []
for (V, hr, wr, hc, wc) in shapes:
    p = _render_program(V, h0, w0, hr, wr, hc, wc, True, False)
    rot = jnp.asarray(np.tile(np.asarray([[1, 0, 0], [0, 1, 0]],
                                         np.float32), (V, 1, 1)))
    sq = jnp.asarray(np.asarray([[1, 0, 0], [0, 0.5, 0]], np.float32))
    val = jnp.asarray(np.tile(np.asarray([[min(500, hc), min(1196, wc)]],
                                         np.int32), (V, 1)))
    out = p(imgs[0], rot, sq, jnp.float32(0.8), jnp.float32(1.6), val)
    jax.block_until_ready(out)
    progs.append((p, rot, sq, val))
print("compiled", len(progs), "programs", flush=True)

def run(seq, n, tag):
    t0 = time.perf_counter()
    k = 0
    for i in range(n):
        p, rot, sq, val = progs[seq[i % len(seq)]]
        out = p(imgs[k % 16], rot, sq, jnp.float32(0.8), jnp.float32(1.6),
                val)
        jax.block_until_ready(out)
        k += 1
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag:<40}{dt:9.1f} ms/dispatch", flush=True)

run([0], 12, "same program x12")
run([0, 1], 12, "alternate 2 programs")
run([0, 1, 2, 3], 12, "cycle 4 programs")
run([0], 12, "same program again x12")
