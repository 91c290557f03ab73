"""Round-robin over K loaded big programs (the ladder's true access
pattern): find max K before the executable cache thrashes."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from mods_tpu.pipeline import EngineConfig, _fused_group_program

cfg = EngineConfig()
h0, w0 = 1000, 598
imgs = [jax.block_until_ready(jnp.asarray(
    np.random.default_rng(0).uniform(0, 255, (h0, w0)).astype(np.float32)
    + i)) for i in range(8)]
cap = cfg.caps.per_image
def mk_stores():
    return ((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
             jnp.zeros((cap,)), jnp.zeros((cap,)),
             jnp.zeros((cap, 128)), jnp.zeros((), jnp.int32)),)

shapes = [(2, 1280, 1280, 640, 1280), (2, 1280, 1280, 384, 1280),
          (2, 1280, 1280, 256, 1280), (4, 1280, 1280, 640, 1280),
          (4, 1280, 1280, 384, 1280), (4, 1280, 1280, 256, 1280),
          (8, 1280, 1280, 640, 1280), (8, 1280, 1280, 384, 1280),
          (8, 1280, 1280, 256, 1280), (2, 1152, 1152, 640, 1152),
          (4, 1152, 1152, 640, 1152), (8, 1152, 1152, 640, 1152)]
entries = []
for (V, hr, wr, hc, wc) in shapes:
    p = _fused_group_program(V, h0, w0, hr, wr, hc, wc, True, False,
                             "HessianAffine", ("RootSIFT",), cfg)
    rot = jnp.asarray(np.tile(np.asarray([[1, 0, 0], [0, 1, 0]],
                                         np.float32), (V, 1, 1)))
    sq = jnp.asarray(np.asarray([[1, 0, 0], [0, 0.5, 0]], np.float32))
    val = jnp.asarray(np.tile(
        np.asarray([[min(500, hc), min(1196, wc)]], np.int32), (V, 1)))
    regn = jnp.full((V,), 10**9, jnp.int32)
    hv = jnp.asarray(np.tile(np.asarray([[1, 0, 0], [0, 2, 0]],
                                        np.float32), (V, 1, 1)))
    fn = (lambda p, rot, sq, val, regn, hv: lambda i: p(
        imgs[i % 8], rot, sq, jnp.float32(0.8), jnp.float32(1.6), val,
        regn, hv, mk_stores()))(p, rot, sq, val, regn, hv)
    jax.block_until_ready(fn(0))
    entries.append(fn)
print("loaded", len(entries), flush=True)

for K in (1, 2, 3, 4, 5, 6, 8, 10, 12):
    # settle: run the cycle once unmeasured
    for j in range(K):
        jax.block_until_ready(entries[j](j))
    t0 = time.perf_counter()
    n = 2 * K
    for i in range(n):
        jax.block_until_ready(entries[i % K](i))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"cycle K={K:2d}: {dt:8.1f} ms/dispatch", flush=True)
