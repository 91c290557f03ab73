"""Does ONE program containing 6 group-computations cost ~1 dispatch
(26-100ms) instead of 6 x 150 ms?  Flipped-session test."""
import sys, time
sys.path.insert(0, "/root/repo")
from mods_tpu.runtime import setup_cache
setup_cache()
import jax, jax.numpy as jnp, numpy as np
from mods_tpu.pipeline import (EngineConfig, _make_render_fn,
                               _make_detect_fn, _make_desc_fn)

# flip the session
x = jax.block_until_ready(jax.jit(lambda v: v + 1)(jnp.zeros((8,))))
_ = np.asarray(x)

cfg = EngineConfig()
h0, w0 = 1000, 598
V, hr, wr, hc, wc = 4, 1280, 1280, 640, 1280
pe = cfg.sift.patch_extraction
render = _make_render_fn(V, h0, w0, hr, wr, hc, wc, True, False)
detect = _make_detect_fn("HessianAffine", cfg)
desc = _make_desc_fn(V, hc, wc, h0, w0, cfg.caps.per_view,
                     ("RootSIFT",), cfg.dom_ori, pe.mr_size,
                     pe.patch_size, pe.photo_norm, cfg.caps)
cap = cfg.caps.per_image

def group(img, rot, sq, sx, sy, val, regn, hinv, stores):
    views = render(img, rot, sq, sx, sy, val)
    regs = detect(views, val, regn)
    return desc(views, val, regs.xy, regs.A, regs.s, regs.response,
                regs.mask, hinv, stores)

def six(img, rot, sq, sx, sy, val, regn, hinv):
    stores = ((jnp.zeros((cap, 2)), jnp.zeros((cap, 2, 2)),
               jnp.zeros((cap,)), jnp.zeros((cap,)),
               jnp.zeros((cap, 128)), jnp.zeros((), jnp.int32)),)
    for k in range(6):
        stores = group(img + k, rot, sq, sx + 0.1 * k, sy, val, regn,
                       hinv, stores)
    # tiny output: just the count + a checksum
    (bxy, bA, bs, br, bd, cnt) = stores[0]
    return cnt, bxy.sum()

prog = jax.jit(six)
rng = np.random.default_rng(0)
imgs = [jax.block_until_ready(jnp.asarray(
    rng.uniform(0, 255, (h0, w0)).astype(np.float32) + i))
    for i in range(8)]
rot = jnp.asarray(np.tile(np.asarray([[1, 0, 0], [0, 1, 0]],
                                     np.float32), (V, 1, 1)))
sq = jnp.asarray(np.asarray([[1, 0, 0], [0, 0.5, 0]], np.float32))
val = jnp.asarray(np.tile(np.asarray([[500, 1196]], np.int32), (V, 1)))
regn = jnp.full((V,), 10**9, jnp.int32)
hinv = jnp.asarray(np.tile(np.asarray([[1, 0, 0], [0, 2, 0]],
                                      np.float32), (V, 1, 1)))
args = lambda i: (imgs[i % 8], rot, sq, jnp.float32(0.8),
                  jnp.float32(1.6), val, regn, hinv)
t0 = time.perf_counter()
out = prog(*args(0))
jax.block_until_ready(out)
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
n = 6
for i in range(1, n + 1):
    jax.block_until_ready(prog(*args(i)))
print(f"6-group merged program: "
      f"{(time.perf_counter()-t0)/n*1e3:.1f} ms/dispatch", flush=True)
