"""Dispatch-overhead vs number of loaded big executables: find the
cliff that makes every dispatch cost 25-300 ms in a warmed process."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from mods_tpu.pipeline import EngineConfig, _fused_group_program

cfg = EngineConfig()

@jax.jit
def tiny(x):
    return x * 1.0001 + 0.5

def time_tiny(n=15):
    xs = [jax.block_until_ready(jnp.asarray(
        np.full((128,), i * 1.37 + time.time() % 977, np.float32)))
        for i in range(n)]
    t0 = time.perf_counter()
    for x in xs:
        jax.block_until_ready(tiny(x))
    return (time.perf_counter() - t0) / n * 1e3

def time_prog(p, args, n=6):
    t0 = time.perf_counter()
    for i in range(n):
        jax.block_until_ready(p(*args(i)))
    return (time.perf_counter() - t0) / n * 1e3

print(f"tiny with 1 program: {time_tiny():.1f} ms", flush=True)

h0, w0 = 1000, 598
imgs = [jax.block_until_ready(jnp.asarray(
    np.random.default_rng(0).uniform(0, 255, (h0, w0)).astype(np.float32)
    + i)) for i in range(8)]
cap = cfg.caps.per_image
def mk_stores():
    return ((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
             jnp.zeros((cap,)), jnp.zeros((cap,)),
             jnp.zeros((cap, 128)), jnp.zeros((), jnp.int32)),)

# distinct fused programs via distinct canvas shapes
shapes = [(2, 1280, 1280, 640, 1280), (2, 1280, 1280, 384, 1280),
          (2, 1280, 1280, 256, 1280), (4, 1280, 1280, 640, 1280),
          (4, 1280, 1280, 384, 1280), (4, 1280, 1280, 256, 1280),
          (8, 1280, 1280, 640, 1280), (8, 1280, 1280, 384, 1280),
          (8, 1280, 1280, 256, 1280), (2, 1152, 1152, 640, 1152),
          (4, 1152, 1152, 640, 1152), (8, 1152, 1152, 640, 1152)]
first = None
for k, (V, hr, wr, hc, wc) in enumerate(shapes):
    p = _fused_group_program(V, h0, w0, hr, wr, hc, wc, True, False,
                             "HessianAffine", ("RootSIFT",), cfg)
    rot = jnp.asarray(np.tile(np.asarray([[1, 0, 0], [0, 1, 0]],
                                         np.float32), (V, 1, 1)))
    sq = jnp.asarray(np.asarray([[1, 0, 0], [0, 0.5, 0]], np.float32))
    val = jnp.asarray(np.tile(
        np.asarray([[min(500, hc), min(1196, wc)]], np.int32), (V, 1)))
    regn = jnp.full((V,), 10**9, jnp.int32)
    args = (lambda rot, sq, val, regn: lambda i: (
        imgs[i % 8], rot, sq, jnp.float32(0.8), jnp.float32(1.6), val,
        regn, jnp.asarray(np.tile(np.asarray(
            [[1, 0, 0], [0, 2, 0]], np.float32), (V, 1, 1))),
        mk_stores()))(rot, sq, val, regn)
    jax.block_until_ready(p(*args(0)))
    if first is None:
        first = (p, args)
    tt = time_tiny()
    tp = time_prog(*first)
    print(f"loaded {k+1:2d} fused progs: tiny {tt:6.1f} ms | "
          f"fused#1 {tp:7.1f} ms", flush=True)
